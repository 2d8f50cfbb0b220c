"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Generalizes the reference's exact-key dedup (input-file dedup
/root/reference/StudiOCR/EditDocWindow.py:465-476; name-collision keep-first
/root/reference/StudiOCR/OcrEngine.py:112-118) to the near-duplicate removal a
web-scale training-data pipeline needs (Broder 1997 minhash shingling;
Charikar 2002 simhash; Leskovec/Rajaraman/Ullman MMDS ch.3 LSH banding).

Scale shape of every near-dup op here:

    map_batches(signatures)                  # vectorized, no shuffle
      → flat (bucket_key, doc_id) rows       # bands / chunks
      → groupby(bucket_key)                  # the only shuffle; bucket rows are tiny
      → candidate pairs                      # per-bucket pairs (skew-capped)
      → exact verify on the candidate set    # broadcast gather, no shuffle

Only narrow (hash, id) rows ever move through the shuffle — never text.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXU = np.uint64(0xFFFFFFFFFFFFFFFF)
_U3 = np.uint64(3)
_U29 = np.uint64(29)
_U32 = np.uint64(32)
_U61 = np.uint64(61)
_MASK29 = np.uint64((1 << 29) - 1)
_MASK32 = np.uint64((1 << 32) - 1)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise ``(a*b) mod (2^61-1)`` for a, b < 2^61 without 128-bit
    ints: split both into 32-bit halves and collapse the carries with
    2^61 ≡ 1 (mod p), so the minhash family really is the documented
    universal (a*x+b) mod p — not the wrapped-mod-2^64 variant.
    Every intermediate stays < 2^63 (see the bound comments)."""
    a0, a1 = a & _MASK32, a >> _U32          # a1 < 2^29
    b0, b1 = b & _MASK32, b >> _U32          # b1 < 2^29
    hi = a1 * b1                             # < 2^58
    mid = a1 * b0 + a0 * b1                  # < 2^62
    lo = a0 * b0                             # < 2^64 (fits uint64)
    r = hi << _U3                            # hi * 2^64 ≡ hi * 8;   < 2^61
    r += (mid >> _U29) + ((mid & _MASK29) << _U32)  # mid * 2^32;  +< 2^61+2^33
    r += (lo >> _U61) + (lo & _MERSENNE)     # lo mod-ish;         +< 2^61+2^3
    r = (r >> _U61) + (r & _MERSENNE)        # total was < 2^63
    r = (r >> _U61) + (r & _MERSENNE)
    return np.where(r >= _MERSENNE, r - _MERSENNE, r)


def _stable64(s: str) -> int:
    """Stable 64-bit token hash: first 8 bytes of md5, big-endian — chosen
    over blake2b because DuckDB can compute the identical value
    (``('0x' || substr(md5(s), 1, 16))::UBIGINT``), which lets the simhash
    oracle recompute signatures in pure SQL."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _shingles(text: str, mode: str, n: int) -> set[str]:
    if mode == "word":
        toks = text.lower().split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    t = text.lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column(text_col).to_pylist()]
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 64):
    """Keep-first exact dedup: bucket by crc32(content_hash) % B so every
    row of a given hash meets in one group, then ONE vectorized sort +
    neighbor scan per bucket keeps the smallest-id row per hash.  B groups
    total (not one Python call per distinct hash — the same trick as the
    extract stage's part-grouped dedup).  Returns the kept rows (all columns
    + content_hash)."""
    from ..functions.arrowutil import first_of_run_mask, string_buckets

    ds = ds.map_batches(
        add_content_hash, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = string_buckets(batch.column("content_hash"), num_buckets)
        return batch.append_column("hash_bucket", pa.array(b, pa.int32()))

    def keep_min_group(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("content_hash", "ascending"), (id_col, "ascending")]
        )
        first = first_of_run_mask([t.column("content_hash")])
        return t.filter(pa.array(first)).drop_columns(["hash_bucket"])

    return ds.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "hash_bucket"
    ).map_groups(keep_min_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Vectorized minhash signatures: h_i(x) = (a_i*x + b_i) mod p over
    stable 64-bit shingle hashes. Class-based so the permutation table is
    built once per actor."""

    def __init__(self, num_perm: int = 64, shingle: str = "word", n: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle
        self.n = n
        # shingle-hash cache: shingles repeat heavily across documents; the
        # cache lives per actor (warm state) and is bounded
        self._hcache: dict[str, int] = {}

    def _h64(self, s: str) -> int:
        v = self._hcache.get(s)
        if v is None:
            v = _stable64(s)
            if len(self._hcache) > 2_000_000:
                self._hcache.clear()
            self._hcache[s] = v
        return v

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.shingle, self.n)
        if not sh:
            return np.full(self.num_perm, int(_MERSENNE), dtype=np.uint64)
        hx = np.fromiter((self._h64(s) for s in sh), dtype=np.uint64, count=len(sh))
        # (a*x + b) mod p with a true mod-(2^61-1) multiply (no 2^64 wrap)
        prod = _mulmod61(
            np.broadcast_to(self.a[:, None], (self.num_perm, len(sh))),
            np.broadcast_to(hx[None, :] % _MERSENNE, (self.num_perm, len(sh))),
        )
        return ((prod + self.b[:, None]) % _MERSENNE).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "minhash": pa.array([s.astype(np.int64).tolist() for s in sigs],
                                     pa.list_(pa.int64())),
            }
        )


def _band_rows(batch: pa.Table, bands: int, rows_per_band: int) -> pa.Table:
    """(doc_id, minhash) → flat (band, band_hash, doc_id) rows, vectorized.

    ``doc_id`` keeps its input type — int64 surrogate keys and url strings
    both work.  ``band_hash`` is an FNV-style uint64 fold of the band's
    minhash rows (a bucketing key needs determinism, not crypto strength),
    computed for the whole batch with ``rows_per_band`` numpy ops instead of
    one blake2b call per (doc, band)."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {"band": pa.array([], pa.int32()),
             "band_hash": pa.array([], pa.int64()),
             "doc_id": batch.column("doc_id")}
        )
    mh = batch.column("minhash").combine_chunks()
    flat = mh.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    m = flat.reshape(n, bands, rows_per_band)
    mult = np.uint64(0x9E3779B97F4A7C15)
    h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    for j in range(rows_per_band):
        h = (h ^ m[:, :, j]) * mult  # wraps mod 2^64 — fine for bucketing
    ids = batch.column("doc_id").take(pa.array(np.repeat(np.arange(n), bands)))
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array(h.reshape(-1).view(np.int64), pa.int64()),
            "doc_id": ids,
        }
    )


def _bucket_pairs(group: pa.Table, max_bucket: int = 200) -> pa.Table:
    """Candidate pairs within one LSH bucket. Buckets larger than
    ``max_bucket`` are truncated (hot-bucket skew cap — a bucket that big is
    one near-identical cluster; the survivors still chain it together).
    Truncation is logged: it makes candidate recall corpus-dependent, which
    matters when the result is compared against an exact all-pairs oracle."""
    all_ids = sorted(set(group.column("doc_id").to_pylist()))
    ids = all_ids[:max_bucket]
    if len(all_ids) > max_bucket:
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket truncated: %d ids > max_bucket=%d (kept smallest)",
            len(all_ids), max_bucket,
        )
    a, b = [], []
    for x, y in itertools.combinations(ids, 2):
        a.append(x)
        b.append(y)
    id_type = group.column("doc_id").type
    return pa.table({"id_a": pa.array(a, id_type), "id_b": pa.array(b, id_type)})


def minhash_candidates(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle: str = "word",
    n: int = 3,
    concurrency=(1, 8),
):
    """documents ds → distinct candidate pair rows (id_a < id_b)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle": shingle, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    banded = sigs.map_batches(
        _band_rows,
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band},
        batch_format="pyarrow",
    )
    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    return pairs


def distinct_pairs_ds(pairs_ds, num_buckets: int = 64):
    """Dataset-side distinct over (id_a, id_b): bucket by a pair hash so the
    group count is B (vectorized per-bucket sort + neighbor scan), never one
    Python call per pair and never a driver-side ``to_pandas`` — pairs stay
    in the object store at crawl-scale dup rates."""
    from ..functions.arrowutil import first_of_run_mask, string_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch.column("id_a")
        if pa.types.is_integer(col.type):
            a = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ((a * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(
                num_buckets
            )
            b = h.astype(np.int32)
        else:  # string ids (urls)
            b = string_buckets(col, num_buckets)
        return batch.append_column("pair_bucket", pa.array(b, pa.int32()))

    def uniq(group: pa.Table) -> pa.Table:
        t = group.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
        first = first_of_run_mask([t.column("id_a"), t.column("id_b")])
        return t.filter(pa.array(first)).drop_columns(["pair_bucket"])

    return pairs_ds.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "pair_bucket"
    ).map_groups(uniq, batch_format="pyarrow")


def _pair_id_set(pairs_ds) -> list[int]:
    """Distinct doc ids involved in any candidate pair — tiny (8B/pair) rows,
    unique'd per batch before the driver collects them."""
    def ids_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        both = pa.chunked_array(
            [batch.column("id_a").combine_chunks(),
             batch.column("id_b").combine_chunks()]
        )
        return pa.table({"doc_id": pc.unique(both)})

    out: set[int] = set()
    for b in pairs_ds.map_batches(ids_of, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.update(b.column("doc_id").to_pylist())
    return sorted(out)


class JaccardVerifier:
    """Actor-pool pair verifier: exact Jaccard over shingle sets, texts of
    candidate-involved docs broadcast ONCE via ``ray.put`` (fetched per
    actor, zero-copy from the object store), shingle sets cached per actor."""

    def __init__(self, texts_ref, shingle: str, n: int):
        import ray

        self.id_to_text: dict[int, str] = ray.get(texts_ref)
        self.shingle = shingle
        self.n = n
        self._cache: dict[int, set] = {}

    def _sh(self, i: int) -> set:
        s = self._cache.get(i)
        if s is None:
            s = _shingles(self.id_to_text[i], self.shingle, self.n)
            self._cache[i] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ja = []
        for a, b in zip(
            batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()
        ):
            sa, sb = self._sh(a), self._sh(b)
            u = len(sa | sb)
            ja.append((len(sa & sb) / u) if u else 1.0)
        return batch.append_column("jaccard", pa.array(ja, pa.float64()))


def verify_jaccard(
    pairs: pa.Table, id_to_text: dict[int, str], shingle: str = "word", n: int = 3
) -> pa.Table:
    """Single-process exact-Jaccard verify (test/oracle helper; the pipeline
    path is :class:`JaccardVerifier` inside ``map_batches``)."""
    cache: dict[int, set] = {}

    def sh(i: int) -> set:
        if i not in cache:
            cache[i] = _shingles(id_to_text[i], shingle, n)
        return cache[i]

    ja = []
    for a, b in zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()):
        sa, sb = sh(a), sh(b)
        u = len(sa | sb)
        ja.append((len(sa & sb) / u) if u else 1.0)
    return pairs.append_column("jaccard", pa.array(ja, pa.float64()))


def _broadcast_candidate_texts(ds, cand_ids: list[int], id_col: str = "doc_id",
                               text_col: str = "text"):
    """Semi-join the corpus to candidate-involved ids and ``ray.put`` the
    id→text map once.  Only the candidate subset is ever collected."""
    import pyarrow.compute as pc
    import ray

    ids_arr = pa.array(cand_ids)  # type inferred: int64 keys or url strings
    id_to_text: dict[int, str] = {}
    filtered = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column(id_col), ids_arr)).select(
            [id_col, text_col]
        ),
        batch_format="pyarrow",
    )
    for b in filtered.iter_batches(batch_format="pyarrow"):
        id_to_text.update(
            zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist())
        )
    return ray.put(id_to_text)


def minhash_dedup_pairs(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle: str = "word",
    n: int = 3,
) -> pa.Table:
    """Near-duplicate pairs with exact-Jaccard verification ≥ threshold.

    Fully distributed shape: LSH candidates → dataset-side distinct →
    ``map_batches`` verify against a ``ray.put`` broadcast of the
    candidate-involved texts.  Only the final verified pairs (small by
    construction) are collected."""
    import pyarrow.compute as pc

    cand_ds = minhash_candidates(
        ds, num_perm=num_perm, bands=bands, shingle=shingle, n=n
    )
    pairs_ds = distinct_pairs_ds(cand_ds).materialize()
    id_type = _pairs_id_type(pairs_ds, ds)
    empty = pa.table(
        {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
         "jaccard": pa.array([], pa.float64())}
    )
    cand_ids = _pair_id_set(pairs_ds)
    if not cand_ids:
        return empty
    texts_ref = _broadcast_candidate_texts(ds, cand_ids)
    verified = pairs_ds.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"texts_ref": texts_ref, "shingle": shingle, "n": n},
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("jaccard"), threshold)),
        batch_format="pyarrow",
    )
    return _collect_pairs(verified, empty)


def _pairs_id_type(pairs_ds, source_ds=None) -> pa.DataType:
    """id column type of a (possibly empty) pairs Dataset; falls back to the
    source dataset's doc_id type, then int64."""
    try:
        sch = pairs_ds.schema(fetch_if_missing=True)
        return sch.base_schema.field("id_a").type
    except Exception:
        pass
    if source_ds is not None:
        try:
            sch = source_ds.schema(fetch_if_missing=True)
            return sch.base_schema.field("doc_id").type
        except Exception:
            pass
    return pa.int64()


def _collect_pairs(verified_ds, empty: pa.Table) -> pa.Table:
    """Collect a verified-pairs Dataset (small by construction) into one
    sorted Arrow table, preserving id types."""
    parts = [
        b for b in verified_ds.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return empty
    return pa.concat_tables(parts).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def duplicate_clusters(pairs: pa.Table) -> pa.Table:
    """Union-find over verified pairs → (doc_id, cluster_rep). Driver-side:
    the pair set is small (near-dup pairs, not the corpus); at extreme pair
    counts switch to iterated min-label propagation via groupby."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members = sorted(parent)
    id_type = pairs.column("id_a").type
    return pa.table(
        {
            "doc_id": pa.array(members, id_type),
            "cluster_rep": pa.array([find(m) for m in members], id_type),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over whitespace tokens (tf-weighted bit votes).

    Vectorized: hash each DISTINCT token once (per-actor cache), unpack all
    64 bits of the distinct-token hashes in one ``np.unpackbits``, and get
    the per-bit vote totals as a tf-weighted matvec — no per-token 64-lane
    python-loop work."""

    _BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def _h(self, tok: str) -> int:
        v = self._cache.get(tok)
        if v is None:
            v = _stable64(tok)
            self._cache[tok] = v
            if len(self._cache) > 1_000_000:
                self._cache.clear()
        return v

    def simhash(self, text: str) -> int:
        toks = text.lower().split()
        if not toks:
            return 0
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        hs = np.fromiter((self._h(t) for t in uniq), dtype=np.uint64, count=len(uniq))
        # bits[i, j] = bit j of hash i (little-endian byte+bit order == >> j & 1)
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int64)
        votes = counts @ (2 * bits - 1)  # (64,) tf-weighted bit votes
        return int(((votes > 0).astype(np.uint64) * self._BIT_WEIGHTS).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array([f"{h:016x}" for h in hs], pa.string()),
            }
        )


def simhash_signatures(ds, concurrency=(1, 8)):
    return ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)


class HammingVerifier:
    """Actor-pool pair verifier: exact hamming distance between broadcast
    simhash signatures (id→sig map ``ray.put`` once, tiny: 8B/doc)."""

    def __init__(self, sigs_ref):
        import ray

        self.sig_of: dict[int, int] = ray.get(sigs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig_of = self.sig_of
        ham = [
            (sig_of[a] ^ sig_of[b]).bit_count()
            for a, b in zip(
                batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()
            )
        ]
        return batch.append_column("hamming", pa.array(ham, pa.int32()))


def simhash_neardup_pairs(ds, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by simhash: 4×16-bit chunk banding (any pair within
    hamming distance ≤ 3 shares at least one exact 16-bit chunk — pigeonhole),
    then exact hamming verify on candidates.

    Signatures are computed ONCE (materialized: (doc_id, hex) rows, 24B/doc)
    and reused for both banding and the broadcast verify; candidate pairs are
    distinct'd dataset-side and verified in ``map_batches``."""
    import pyarrow.compute as pc

    sigs = simhash_signatures(ds).materialize()

    def chunk_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.int64()),
                 "doc_id": batch.column("doc_id")}
            )
        hs = np.fromiter(
            (int(x, 16) for x in batch.column("simhash").to_pylist()),
            dtype=np.uint64,
            count=n,
        )
        chunks = np.empty((n, 4), dtype=np.int64)
        for c in range(4):
            chunks[:, c] = ((hs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
        ids = batch.column("doc_id").take(pa.array(np.repeat(np.arange(n), 4)))
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
                "band_hash": pa.array(chunks.reshape(-1), pa.int64()),
                "doc_id": ids,
            }
        )

    pairs_ds = distinct_pairs_ds(
        sigs.map_batches(chunk_rows, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    ).materialize()
    id_type = _pairs_id_type(pairs_ds, ds)
    empty = pa.table(
        {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
         "hamming": pa.array([], pa.int32())}
    )
    if pairs_ds.count() == 0:
        return empty
    import ray

    cand = pa.array(_pair_id_set(pairs_ds))
    sig_of: dict[int, int] = {}
    for b in sigs.map_batches(
        lambda t: t.filter(pc.is_in(t.column("doc_id"), cand)),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        sig_of.update(
            (i, int(s, 16))
            for i, s in zip(
                b.column("doc_id").to_pylist(), b.column("simhash").to_pylist()
            )
        )
    sigs_ref = ray.put(sig_of)
    out = pairs_ds.map_batches(
        HammingVerifier,
        fn_constructor_kwargs={"sigs_ref": sigs_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).map_batches(
        lambda b: b.filter(pc.less_equal(b.column("hamming"), max_hamming)),
        batch_format="pyarrow",
    )
    return _collect_pairs(out, empty)


def ngram_jaccard_pairs(ds, threshold: float = 0.8, n: int = 3) -> pa.Table:
    """Character n-gram Jaccard near-dup: minhash-LSH candidates over char
    shingles, exact n-gram Jaccard verify."""
    return minhash_dedup_pairs(ds, threshold=threshold, shingle="char", n=n)
