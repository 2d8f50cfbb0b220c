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


def _stable64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


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


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep-first exact dedup: hash-partition on content hash, keep the row
    with the smallest id per hash. Returns the kept rows (all columns +
    content_hash)."""
    ds = ds.map_batches(
        add_content_hash, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )

    def keep_min(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        ids = group.column(id_col).to_pylist()
        return group.slice(min(range(len(ids)), key=lambda i: ids[i]), 1)

    return ds.groupby("content_hash").map_groups(keep_min, batch_format="pyarrow")


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
        # (a*x + b) mod p, all uint64 modular arithmetic (p = 2^61-1)
        prod = (self.a[:, None] * (hx[None, :] % _MERSENNE)) % _MERSENNE
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
    """(doc_id, minhash) → flat (band, band_hash, doc_id) rows."""
    out_band, out_hash, out_id = [], [], []
    ids = batch.column("doc_id").to_pylist()
    for did, sig in zip(ids, batch.column("minhash").to_pylist()):
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.blake2b(
                np.asarray(chunk, dtype=np.int64).tobytes(), digest_size=8
            ).hexdigest()
            out_band.append(b)
            out_hash.append(h)
            out_id.append(did)
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
        }
    )


def _bucket_pairs(group: pa.Table, max_bucket: int = 200) -> pa.Table:
    """Candidate pairs within one LSH bucket. Buckets larger than
    ``max_bucket`` are truncated (hot-bucket skew cap — a bucket that big is
    one near-identical cluster; the survivors still chain it together)."""
    ids = sorted(set(group.column("doc_id").to_pylist()))[:max_bucket]
    a, b = [], []
    for x, y in itertools.combinations(ids, 2):
        a.append(x)
        b.append(y)
    return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})


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


def verify_jaccard(
    pairs: pa.Table, id_to_text: dict[int, str], shingle: str = "word", n: int = 3
) -> pa.Table:
    """Exact Jaccard over shingle sets for candidate pairs (driver-side or
    broadcast: the candidate set is small by construction)."""
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


def minhash_dedup_pairs(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle: str = "word",
    n: int = 3,
) -> pa.Table:
    """Near-duplicate pairs with exact-Jaccard verification ≥ threshold.

    The verify step broadcasts only the texts of candidate-involved docs
    (semi-join via isin), not the corpus."""
    import pyarrow.compute as pc

    pairs_ds = minhash_candidates(ds, num_perm=num_perm, bands=bands, shingle=shingle, n=n)
    pairs = _distinct_pairs(pairs_ds)
    if pairs.num_rows == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    cand_ids = pa.array(
        sorted(set(pairs.column("id_a").to_pylist()) | set(pairs.column("id_b").to_pylist())),
        pa.int64(),
    )
    texts = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("doc_id"), cand_ids)).select(
            ["doc_id", "text"]
        ),
        batch_format="pyarrow",
    ).take_all()
    id_to_text = {r["doc_id"]: r["text"] for r in texts}
    verified = verify_jaccard(pairs, id_to_text, shingle=shingle, n=n)
    out = verified.filter(pc.greater_equal(verified.column("jaccard"), threshold))
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _distinct_pairs(pairs_ds) -> pa.Table:
    import pandas as pd

    df = pairs_ds.to_pandas()
    if df.empty:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    df = df.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(df[["id_a", "id_b"]], preserve_index=False)


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
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_rep": pa.array([find(m) for m in members], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over whitespace tokens (tf-weighted bit votes)."""

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
        votes = np.zeros(64, dtype=np.int64)
        for tok in text.lower().split():
            h = self._h(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if votes[i] > 0:
                out |= 1 << i
        return out

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


def simhash_neardup_pairs(ds, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by simhash: 4×16-bit chunk banding (any pair within
    hamming distance ≤ 3 shares at least one exact 16-bit chunk — pigeonhole),
    then exact hamming verify on candidates."""
    sigs = simhash_signatures(ds)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        band, key, ids = [], [], []
        for did, hx in zip(
            batch.column("doc_id").to_pylist(), batch.column("simhash").to_pylist()
        ):
            h = int(hx, 16)
            for c in range(4):
                band.append(c)
                key.append(f"{(h >> (16 * c)) & 0xFFFF:04x}")
                ids.append(did)
        return pa.table(
            {
                "band": pa.array(band, pa.int32()),
                "band_hash": pa.array(key, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    pairs = _distinct_pairs(
        sigs.map_batches(chunk_rows, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    if pairs.num_rows == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int32())}
        )
    import pyarrow.compute as pc

    cand = pa.array(
        sorted(set(pairs.column("id_a").to_pylist()) | set(pairs.column("id_b").to_pylist())),
        pa.int64(),
    )
    sig_rows = sigs.map_batches(
        lambda b: b.filter(pc.is_in(b.column("doc_id"), cand)), batch_format="pyarrow"
    ).take_all()
    sig_of = {r["doc_id"]: int(r["simhash"], 16) for r in sig_rows}
    ham = [
        bin(sig_of[a] ^ sig_of[b]).count("1")
        for a, b in zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist())
    ]
    out = pairs.append_column("hamming", pa.array(ham, pa.int32()))
    return out.filter(pc.less_equal(out.column("hamming"), max_hamming))


def ngram_jaccard_pairs(ds, threshold: float = 0.8, n: int = 3) -> pa.Table:
    """Character n-gram Jaccard near-dup: minhash-LSH candidates over char
    shingles, exact n-gram Jaccard verify."""
    return minhash_dedup_pairs(ds, threshold=threshold, shingle="char", n=n)
