"""Distributed probabilistic sketches: HyperLogLog cardinality and Bloom
membership.

The two sketch shapes a 100 TB corpus run needs constantly:

- **HyperLogLog** (Flajolet et al. 2007) — distinct counts per group
  without shuffling raw values: each batch folds into at most
  ``groups x m`` register rows (a max-partial), ONE small all-to-all
  merges registers, and the estimate is a per-group fold over <= m rows.
  Exact distinct (``ds.unique`` / ``groupby.count``) moves every value
  through the exchange; HLL moves a bounded register table.

- **Bloom filter** (Bloom 1970) — set membership against a large probe
  set without broadcasting the raw set: the probe side folds into an
  m-bit array (OR-partials, one small word-level groupby), the bit array
  (m/8 bytes, e.g. 32 KiB for m=2^18) is ``ray.put`` once, and the
  filter stage tests k bit positions per row vectorized.  The classic
  scale path for blocklists / decontamination probes whose *raw* value
  set would not fit a worker heap.

Exact-parity design (both sketches are deterministic functions of their
input, so a SQL oracle can reproduce them bit-for-bit, false positives
included):

- the 64-bit value hash is the repo-standard md5 prefix
  (``_stable64``), which DuckDB computes as
  ``('0x' || substr(md5(v), 1, 16))::UBIGINT``;
- HLL registers are integers; the register sum ``S = sum 2^(Rmax-M_j)``
  is an exact (Python / HUGEINT) integer; the float estimate is ONE
  identically-shaped expression over (m, V, S) on both sides;
- Bloom bit positions use the Kirsch-Mitzenmacher double-hash
  ``pos_i = (h_hi + i * h_lo) mod m``, reproduced in SQL with the same
  UBIGINT arithmetic (mod-2^64 wrap included).

No counterpart in the reference (its dedup is exact-key only,
/root/reference/StudiOCR/OcrEngine.py:112-118); these are the
training-data-pipeline extensions SURVEY §2.10 calls for.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .dedup import _flat_arr, _stable64

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hash64_strings(arr: pa.Array, cache: dict | None = None) -> np.ndarray:
    """md5-prefix 64-bit hash per element (as string), one md5 per DISTINCT
    value in the array (dictionary encode first)."""
    if arr.null_count:
        # a null has no hash; silently skipping would make sketch contents
        # depend on which batch the null landed in
        raise ValueError(
            "sketch inputs must be null-free; filter or fill nulls first"
        )
    d = pc.dictionary_encode(arr)
    dvals = d.dictionary.to_pylist()
    if cache is None:
        hv = np.fromiter(
            (_stable64(s) for s in dvals), dtype=np.uint64, count=len(dvals)
        )
    else:
        out = np.empty(len(dvals), np.uint64)
        for i, s in enumerate(dvals):
            v = cache.get(s)
            if v is None:
                v = _stable64(s)
                if len(cache) > 2_000_000:
                    cache.clear()
                cache[s] = v
            out[i] = v
        hv = out
    return hv[d.indices.to_numpy(zero_copy_only=False)]


def _as_strings(col) -> pa.Array:
    arr = _flat_arr(col)
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return arr


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact bit length per uint64 via byte-matrix unpack (no float log)."""
    if len(w) == 0:
        return np.zeros(0, np.int64)
    bits = np.unpackbits(w.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    lead = np.argmax(bits, axis=1)
    bl = 64 - lead
    return np.where(w == 0, 0, bl).astype(np.int64)


class _HLLPartial:
    """Per-batch HLL register partial: (group, register idx, max rho) rows —
    at most ``groups_in_batch x m`` rows out per batch regardless of batch
    size.  The value→hash cache is per-actor warm state."""

    def __init__(self, group_col: str, value_col: str, p: int):
        self.group_col = group_col
        self.value_col = value_col
        self.p = p
        self.q = 64 - p
        self.m = 1 << p
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"grp": pa.array([], pa.string()),
             "idx": pa.array([], pa.int32()),
             "rho": pa.array([], pa.int32())}
        )
        n = batch.num_rows
        if n == 0:
            return empty
        grp = _as_strings(batch.column(self.group_col))
        gd = pc.dictionary_encode(grp)
        gcodes = gd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ngroups = len(gd.dictionary)
        hv = _hash64_strings(
            _as_strings(batch.column(self.value_col)), self._cache
        )
        idx = (hv >> np.uint64(self.q)).astype(np.int64)
        w = hv & np.uint64((1 << self.q) - 1)
        rho = np.where(w == 0, self.q + 1, self.q - _bit_length_u64(w) + 1)
        regs = np.zeros(ngroups * self.m, np.int64)
        np.maximum.at(regs, gcodes * self.m + idx, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "grp": gd.dictionary.take(pa.array(nz // self.m)),
                "idx": pa.array((nz % self.m).astype(np.int32), pa.int32()),
                "rho": pa.array(regs[nz].astype(np.int32), pa.int32()),
            }
        )


def _reg_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    from ..functions.arrowutil import string_buckets

    gb = string_buckets(batch.column("grp"), num_buckets)
    idx = batch.column("idx").to_numpy(zero_copy_only=False)
    rb = ((gb.astype(np.int64) * 8191 + idx) % num_buckets).astype(np.int32)
    return batch.append_column("rb", pa.array(rb, pa.int32()))


def _reg_merge(group: pa.Table) -> pa.Table:
    """One register bucket: max rho per (grp, idx) — sort + run scan."""
    from ..functions.arrowutil import first_of_run_mask

    t = group.sort_by(
        [("grp", "ascending"), ("idx", "ascending"), ("rho", "descending")]
    )
    first = first_of_run_mask([t.column("grp"), t.column("idx")])
    t = t.filter(pa.array(first))
    from ..functions.arrowutil import string_buckets

    gb = string_buckets(t.column("grp"), 1 << 16)
    return pa.table(
        {
            "gb": pa.array((gb % 64).astype(np.int32), pa.int32()),
            "grp": t.column("grp"),
            "idx": t.column("idx"),
            "rho": t.column("rho"),
        }
    )


def _hll_estimate_expr(m: int, rmax: int, v: int, s: int) -> float:
    """The ONE estimate expression, mirrored token-for-token in SQL:
    linear counting while any register is empty, raw HLL otherwise."""
    if v > 0:
        return float(m) * math.log(float(m) / float(v))
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    return alpha * float(m) * float(m) * (2.0 ** rmax) / float(s)


def _hll_finalize(group: pa.Table, p: int) -> pa.Table:
    """One group-hash bucket: fold each group's <= m register rows into
    (n_registers, zero_registers, estimate).  S is an exact Python int
    (register terms can exceed int64; HUGEINT on the oracle side)."""
    m = 1 << p
    rmax = 64 - p + 1
    t = group.sort_by([("grp", "ascending")])
    grp = _flat_arr(t.column("grp"))
    from ..functions.arrowutil import first_of_run_mask

    first = first_of_run_mask([grp])
    starts = np.flatnonzero(first)
    ends = np.concatenate((starts[1:], [t.num_rows]))
    rho = t.column("rho").to_numpy(zero_copy_only=False)
    names, nreg, zreg, est = [], [], [], []
    for s_i, e_i in zip(starts, ends):
        r = rho[s_i:e_i]
        present = len(r)
        v = m - present
        s_int = sum(1 << (rmax - int(x)) for x in r) + v * (1 << rmax)
        names.append(grp[s_i].as_py())
        nreg.append(present)
        zreg.append(v)
        est.append(_hll_estimate_expr(m, rmax, v, s_int))
    return pa.table(
        {
            "grp": pa.array(names, pa.string()),
            "n_registers": pa.array(nreg, pa.int64()),
            "zero_registers": pa.array(zreg, pa.int64()),
            "estimate": pa.array(est, pa.float64()),
        }
    )


def hll_distinct(
    ds,
    group_col: str,
    value_col: str,
    p: int = 12,
    num_buckets: int = 64,
    concurrency=(1, 8),
):
    """Approximate distinct ``value_col`` per ``group_col`` via HyperLogLog
    with 2^p registers → ``(grp, n_registers, zero_registers, estimate)``.

    Scale shape: batches fold to register partials (<= groups x 2^p rows
    each) in an actor pool, ONE bucketed groupby merges registers
    (max-combinable, so re-bucketing at any cluster shape gives identical
    registers), and the per-group fold touches <= 2^p rows.  Raw values
    never enter the exchange — the classic count-distinct at scale.

    Deterministic: md5-derived hashes, integer registers, one shared float
    expression — bit-reproducible at any batch split and oracle-exact in
    SQL (HUGEINT register sums, ``bin()`` bit lengths)."""
    partials = ds.map_batches(
        _HLLPartial,
        fn_constructor_args=(group_col, value_col, p),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = partials.map_batches(
        _reg_bucket, fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
    ).groupby("rb").map_groups(_reg_merge, batch_format="pyarrow")
    out = merged.groupby("gb").map_groups(
        _hll_finalize, fn_kwargs={"p": p}, batch_format="pyarrow"
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            [group_col, "n_registers", "zero_registers", "estimate"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_positions(hv: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    pos_i = (h_hi + i * h_lo) mod m (uint64 wrap, then mod m — the SQL
    twin reproduces the same wrap with UBIGINT arithmetic)."""
    h_hi = hv >> np.uint64(32)
    h_lo = hv & np.uint64(0xFFFFFFFF)
    i = np.arange(1, k + 1, dtype=np.uint64)
    pos = (h_hi[:, None] + i[None, :] * h_lo[:, None]) % np.uint64(m_bits)
    return pos.astype(np.int64)


def _bloom_word_partial(batch: pa.Table, value_col: str, k: int,
                        m_bits: int, num_buckets: int) -> pa.Table:
    """Probe batch → nonzero 64-bit words of its bit-array partial:
    (wb, word_idx, word) rows, at most k x rows (deduped) per batch."""
    empty = pa.table(
        {"wb": pa.array([], pa.int32()),
         "word_idx": pa.array([], pa.int64()),
         "word": pa.array([], pa.int64())}
    )
    if batch.num_rows == 0:
        return empty
    hv = _hash64_strings(_as_strings(batch.column(value_col)))
    pos = _bloom_positions(hv, k, m_bits).reshape(-1)
    words = np.zeros(m_bits // 64, np.uint64)
    np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
    nz = np.flatnonzero(words)
    return pa.table(
        {
            "wb": pa.array((nz % num_buckets).astype(np.int32), pa.int32()),
            "word_idx": pa.array(nz, pa.int64()),
            "word": pa.array(words[nz].view(np.int64), pa.int64()),
        }
    )


def _bloom_word_merge(group: pa.Table) -> pa.Table:
    """One word bucket: OR all partial words per word_idx (sort + reduce)."""
    t = group.sort_by([("word_idx", "ascending")])
    wi = t.column("word_idx").to_numpy(zero_copy_only=False)
    w = t.column("word").to_numpy(zero_copy_only=False).view(np.uint64)
    uniq, inv = np.unique(wi, return_inverse=True)
    out = np.zeros(len(uniq), np.uint64)
    np.bitwise_or.at(out, inv, w)
    return pa.table(
        {"word_idx": pa.array(uniq, pa.int64()),
         "word": pa.array(out.view(np.int64), pa.int64())}
    )


def build_bloom(probe_ds, value_col: str, k: int = 2, m_bits: int = 1 << 18,
                num_buckets: int = 16):
    """Fold a probe Dataset's values into an m-bit Bloom array →
    ``ray.ObjectRef`` of a packed ``np.uint64[m/64]`` word array.

    The probe set streams through OR-partials (each batch contributes only
    its NONZERO words), one small word-level groupby merges them, and only
    the m/8-byte array is collected — the raw probe values never land on
    the driver.  OR-combinable ⇒ identical bits at any batch split."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    merged = probe_ds.map_batches(
        _bloom_word_partial,
        fn_kwargs={"value_col": value_col, "k": k, "m_bits": m_bits,
                   "num_buckets": num_buckets},
        batch_format="pyarrow",
    ).groupby("wb").map_groups(_bloom_word_merge, batch_format="pyarrow")
    words = np.zeros(m_bits // 64, np.uint64)
    for b in merged.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            wi = b.column("word_idx").to_numpy(zero_copy_only=False)
            words[wi] |= b.column("word").to_numpy(zero_copy_only=False).view(np.uint64)
    return ray.put(words)


class _BloomTest:
    """Actor-pool membership test: resolves the shared bit array once per
    actor, then tests k positions per row vectorized."""

    def __init__(self, words_ref, value_col: str, k: int, m_bits: int,
                 keep_hits: bool):
        self.words = ray.get(words_ref) if not isinstance(words_ref, np.ndarray) else words_ref
        self.value_col = value_col
        self.k = k
        self.m_bits = m_bits
        self.keep_hits = keep_hits
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hv = _hash64_strings(_as_strings(batch.column(self.value_col)),
                             self._cache)
        pos = _bloom_positions(hv, self.k, self.m_bits)
        bit = (self.words[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        hit = bit.astype(bool).all(axis=1)
        return batch.filter(pa.array(hit if self.keep_hits else ~hit))


def bloom_filter(ds, words_ref, value_col: str, k: int = 2,
                 m_bits: int = 1 << 18, keep_hits: bool = False,
                 concurrency=(1, 8)):
    """Filter ``ds`` by Bloom membership of ``value_col`` against a filter
    built with :func:`build_bloom` (same k / m_bits).  ``keep_hits=False``
    (default) drops probable members — the blocklist/decontamination
    direction, where false positives only over-drop (safe); ``True`` keeps
    them — the candidate-prefilter direction, where downstream exact
    verification removes false positives."""
    return ds.map_batches(
        _BloomTest,
        fn_constructor_args=(words_ref, value_col, k, m_bits, keep_hits),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _cm_partial(batch: pa.Table, text_col: str, depth: int, width: int,
                num_buckets: int) -> pa.Table:
    """Token batch → per-cell count partials (cellkey = i*width + cell, c):
    one md5 per DISTINCT token, depth positions per token, at most
    depth x distinct-tokens rows out per batch.  Sum-combinable, so the
    ONE cell groupby reproduces the exact sketch at any batch split."""
    import numpy as np

    from .relational import _dict_encode, _flat_tokens

    empty = pa.table(
        {"cb": pa.array([], pa.int32()),
         "cellkey": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64())}
    )
    flat, _ = _flat_tokens(batch, text_col)
    if len(flat) == 0:
        return empty
    d = _dict_encode(flat)
    counts = np.bincount(
        d.indices.to_numpy(zero_copy_only=False), minlength=len(d.dictionary)
    ).astype(np.int64)
    hv = np.fromiter(
        (_stable64(t) for t in d.dictionary.to_pylist()),
        dtype=np.uint64, count=len(d.dictionary),
    )
    pos = _bloom_positions(hv, depth, width)  # (ndistinct, depth)
    rows = np.arange(depth, dtype=np.int64)[None, :] * width + pos
    cellkey = rows.reshape(-1)
    c = np.repeat(counts, depth)
    # combine within the batch (tokens can collide into one cell)
    uniq, inv = np.unique(cellkey, return_inverse=True)
    csum = np.zeros(len(uniq), np.int64)
    np.add.at(csum, inv, c)
    return pa.table(
        {
            "cb": pa.array((uniq % num_buckets).astype(np.int32), pa.int32()),
            "cellkey": pa.array(uniq, pa.int64()),
            "c": pa.array(csum, pa.int64()),
        }
    )


def count_min_build(ds, text_col: str = "text", depth: int = 4,
                    width: int = 1 << 16, num_buckets: int = 32):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the corpus token
    frequencies → Dataset ``(cellkey, c)``, cellkey = row*width + cell.

    Scale shape: counters are SUMS, so per-batch partials (bounded by
    depth x distinct tokens) meet in one bucketed groupby over at most
    depth x width cells — raw tokens never shuffle, and the sketch is
    identical at any batch split or cluster shape."""
    from ray.data.aggregate import Sum

    return ds.map_batches(
        _cm_partial,
        fn_kwargs={"text_col": text_col, "depth": depth, "width": width,
                   "num_buckets": num_buckets},
        batch_format="pyarrow",
    ).groupby("cellkey").aggregate(Sum("c", alias_name="c"))


def count_min_estimate(sketch_ds, probes: list[str], depth: int = 4,
                       width: int = 1 << 16) -> pa.Table:
    """Point-frequency estimates for ``probes`` from a built sketch →
    ``(term, est)`` with ``est = min_i cells[i][pos_i(term)]`` (>= true
    count; equality unless a collision inflates every row).

    Only the depth x len(probes) needed cells are collected — the sketch
    Dataset itself is filtered, never materialized to the driver."""
    import numpy as np
    import pyarrow.compute as pc

    hv = np.fromiter(
        (_stable64(t) for t in probes), dtype=np.uint64, count=len(probes)
    )
    pos = _bloom_positions(hv, depth, width)
    keys = (np.arange(depth, dtype=np.int64)[None, :] * width + pos)
    need = pa.array(np.unique(keys.reshape(-1)))
    got = {}
    filtered = sketch_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("cellkey"), value_set=need)),
        batch_format="pyarrow",
    )
    for b in filtered.iter_batches(batch_format="pyarrow"):
        for k, v in zip(b.column("cellkey").to_pylist(),
                        b.column("c").to_pylist()):
            got[k] = v
    est = [int(min(got.get(int(k), 0) for k in keys[i])) for i in range(len(probes))]
    return pa.table(
        {"term": pa.array(probes, pa.string()),
         "est": pa.array(est, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Bottom-k priority sample → approximate percentiles
# ---------------------------------------------------------------------------

def sampled_percentiles(
    ds,
    val_col: str,
    id_col: str = "doc_id",
    k: int = 1024,
    qs: tuple = (0.25, 0.5, 0.75, 0.99),
) -> pa.Table:
    """Approximate percentiles of ``val_col`` from a deterministic
    bottom-k priority sample → ``(q, value)`` rows.

    The sample is the k rows with the smallest ``stable64(str(id))``
    (ties by the id's string form) — a MERGEABLE uniform sample: each
    batch keeps its own bottom-k (≤ k rows leave per batch no matter the
    batch size), one tiny single-group merge keeps the global bottom-k,
    and the percentile is the value at 1-based rank ``ceil(q·k)`` of the
    sorted sample (quantile_disc semantics).  Error is the standard
    O(1/sqrt(k)) of a uniform sample; unlike the bounded-histogram exact
    path (`relational.token_length_percentiles`) it needs NO bound on
    distinct values, so it works on arbitrary float columns.

    Deterministic by construction (the md5 priority is a pure function of
    the id), so a DuckDB oracle reproduces it exactly — false sampling
    included."""

    def _bottom_k(pr: np.ndarray, sid) -> np.ndarray:
        """Indices of the bottom-k by (priority, id-string).  The string
        tie-break only runs when two priorities actually collide (md5 —
        essentially never), so the common path is one integer argsort."""
        order = np.argsort(pr, kind="stable")[: min(k + 1, len(pr))]
        top = order[: min(k, len(order))]
        if len(order) > len(top) and pr[order[len(top) - 1]] == pr[order[len(top)]]:
            s = np.asarray(sid.to_pylist(), dtype=object)
            order = np.lexsort((s, pr))
            top = order[: min(k, len(order))]
        return top

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"g": pa.array([], pa.int32()),
                 "pr": pa.array([], pa.uint64()),
                 "sid": pa.array([], pa.string()),
                 "v": pa.array([], pa.float64())}
            )
        sid = _as_strings(batch.column(id_col))
        pr = _hash64_strings(sid)
        vals = pc.cast(_flat_arr(batch.column(val_col)), pa.float64())
        keep = _bottom_k(pr, sid)
        take = pa.array(keep)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(keep), np.int32)),
                "pr": pa.array(pr[keep], pa.uint64()),
                "sid": sid.take(take),
                "v": vals.take(take),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        pr = group.column("pr").to_numpy(zero_copy_only=False)
        sid = _flat_arr(group.column("sid"))
        v = group.column("v").to_numpy(zero_copy_only=False)
        keep = _bottom_k(pr, sid)
        sample = np.sort(v[keep])
        n = len(sample)
        out_q, out_v = [], []
        for q in qs:
            r = max(1, math.ceil(q * n)) if n else 0
            out_q.append(float(q))
            out_v.append(float(sample[r - 1]) if n else 0.0)
        return pa.table(
            {"q": pa.array(out_q, pa.float64()),
             "value": pa.array(out_v, pa.float64())}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "g"
    ).map_groups(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Heavy hitters (bounded-memory EXACT, candidate pass + recount pass)
# ---------------------------------------------------------------------------


def heavy_hitters(ds, k: int = 50, text_col: str = "text"):
    """All tokens with global frequency STRICTLY above N/k (N = corpus
    token count) → ``(term, cnt)``, computed exactly in two streaming
    passes with bounded memory — the scale-correct form of "top terms"
    when the vocabulary itself does not fit anywhere.

    Pass 1 (candidates): each batch counts its own tokens (dictionary
    encode + bincount, vocab bounded by the batch) and emits only tokens
    with ``batch_cnt * k > batch_tokens`` plus one row carrying the batch
    token total.  By pigeonhole, a token with global ``cnt * k > N`` must
    exceed the per-batch threshold in at least one batch (if
    ``cnt_b * k <= N_b`` for every batch then ``cnt * k <= N``), so the
    candidate union is a SUPERSET of the true heavy hitters — the same
    guarantee a per-batch Misra-Gries summary gives, computed with the
    kernels already in the hot path.  Candidate volume is <= k rows per
    batch (plus the total row); a tiny groupby dedupes them BEFORE the
    driver sees anything, so the collect is bounded by the number of
    DISTINCT candidates — heavy hitters are heavy in many batches, so in
    practice this is ~k + noise, and never more than num_batches * k —
    independent of vocabulary size either way.

    Pass 2 (exact recount): the candidate set is ``ray.put`` once; each
    batch counts ONLY candidate tokens (``pc.is_in`` prefilter before the
    bincount); a vocab-bounded groupby sums the partials; the final
    filter keeps ``cnt * k > N`` with exact integers on both sides.

    Raw tokens never shuffle; the only all-to-all carries
    <= num_batches * k narrow rows.  Oracle: GROUP BY token HAVING
    ``count(*) * k > total`` — exact, not sketch-approximate.

    No counterpart in the reference (its word stats are per-page Counters,
    /root/reference/StudiOCR/OcrPageData.py:38); this is the SURVEY §2.10
    corpus-analysis extension for web-scale vocabularies."""
    from .relational import _flat_tokens

    def candidates(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch, text_col)
        n_b = len(flat)
        if n_b == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        d = pc.dictionary_encode(flat)
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary))
        hot = np.flatnonzero(cnt.astype(np.int64) * k > n_b)
        return pa.table({
            "term": pa.concat_arrays(
                [pa.array([""], pa.string()),
                 _flat_arr(d.dictionary.take(pa.array(hot)))]),
            "n_tokens": pa.array(
                np.concatenate([[n_b], np.zeros(len(hot), np.int64)]),
                pa.int64()),
        })

    from ray.data.aggregate import Sum as _Sum

    cand = ds.map_batches(candidates, batch_format="pyarrow") \
        .groupby("term").aggregate(_Sum("n_tokens", alias_name="n_tokens")) \
        .take_all()
    total = sum(r["n_tokens"] for r in cand)
    cand_terms = sorted({r["term"] for r in cand if r["term"] != ""})
    if not cand_terms or total == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    ref = ray.put(pa.array(cand_terms, pa.string()))

    class Recount:
        def __init__(self):
            self.terms = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, _ = _flat_tokens(batch, text_col)
            if len(flat) == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            idx = pc.index_in(flat, value_set=self.terms)
            hit = pc.is_valid(idx)
            ix = pc.filter(idx, hit).to_numpy(zero_copy_only=False)
            if len(ix) == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            cnt = np.bincount(ix, minlength=len(self.terms))
            nz = np.flatnonzero(cnt)
            return pa.table({
                "term": self.terms.take(pa.array(nz)),
                "cnt": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            })

    from ray.data.aggregate import Sum

    agg = ds.map_batches(
        Recount, batch_format="pyarrow", concurrency=(1, 8)
    ).groupby("term").aggregate(Sum("cnt", alias_name="cnt"))

    def keep_hot(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(pc.multiply(pc.cast(batch.column("cnt"), pa.int64()),
                                   pa.scalar(k, pa.int64())),
                       pa.scalar(total, pa.int64())))

    return agg.map_batches(keep_hot, batch_format="pyarrow")


def kmv_distinct(ds, value_col: str = "user_id", k: int = 256):
    """K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002)
    over an int64 key column → one row ``(k, kth_hash, est_distinct)``.

    Each batch folds to its ≤``k`` smallest DISTINCT ``splitmix64``
    hashes (uint64), so the exchange carries at most ``k`` rows per
    block no matter how many raw values flow through — the
    mergeable-summary shape (a KMV from N partitions merges by
    concat+sort+take-k, exactly what the driver fold does here over
    per-block partials).  Estimate = ``(k−1) · 2⁶⁴ / h_k`` with ONE
    double multiply and ONE divide in the same order as the SQL
    oracle, so the float is bit-exact; when the stream has fewer than
    ``k`` distinct hashes the sketch is exhaustive and the EXACT count
    is returned with ``kth_hash = 0``.

    splitmix64 is a bijection on uint64, so distinct hashes = distinct
    keys exactly (no in-sketch collisions — the estimate's only error
    is the order-statistic variance ≈ 1/√k)."""
    from .sample import splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        hv = np.unique(splitmix64(v.astype(np.uint64)))
        return pa.table({"hv": pa.array(hv[:k], pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    hv = np.unique(np.array([r["hv"] for r in parts], np.uint64))
    if hv.size >= k:
        kth = int(hv[k - 1])
        est = (k - 1) * 18446744073709551616.0 / float(np.float64(kth))
        n_est = est
    else:
        kth, n_est = 0, float(hv.size)
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "kth_hash": pa.array([kth], pa.uint64()),
        "est_distinct": pa.array([n_est], pa.float64()),
    })


def kmv_intersect(ds, value_col: str = "user_id",
                  type_col: str = "event_type",
                  type_a: str = "purchase", type_b: str = "click",
                  k: int = 256):
    """KMV set-OPERATION sketch: estimated distinct keys seen under
    BOTH ``type_a`` and ``type_b`` → one row ``(k, m, est_a, est_b,
    est_intersection)`` — "how many users both purchased and clicked?"
    without ever shuffling keys.

    Shape: one streaming pass; each batch folds to ≤``k`` smallest
    distinct splitmix64 hashes PER SIDE (≤``2k`` rows per block); the
    driver merges per-side sketches, forms the union's k-minimum set
    K with threshold τ = max(K), counts ``m = |{h ∈ K : h ∈ A ∧ h ∈
    B}|`` (valid because τ ≤ both per-side thresholds), and estimates
    ``|A∩B| ≈ (m/k) · (k−1)·2⁶⁴/τ`` (Beyer et al. 2007) — float
    expressions in the exact order the SQL oracle repeats, with the
    exhaustive (<k) fallback returning the EXACT intersection count."""
    from .sample import splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column(type_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sides, hashes = [], []
        for side, tname in ((0, type_a), (1, type_b)):
            m = et == tname
            if m.any():
                hv = np.unique(splitmix64(v[m].astype(np.uint64)))[:k]
                sides.append(np.full(len(hv), side, np.int64))
                hashes.append(hv)
        if not sides:
            return pa.table({"side": pa.array([], pa.int64()),
                             "hv": pa.array([], pa.uint64())})
        return pa.table({
            "side": pa.array(np.concatenate(sides), pa.int64()),
            "hv": pa.array(np.concatenate(hashes), pa.uint64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    side = parts["side"].to_numpy(np.int64)
    hv = parts["hv"].to_numpy()  # uint64 preserved by pandas
    ha = np.unique(hv[side == 0])[:k]
    hb = np.unique(hv[side == 1])[:k]
    union = np.unique(np.concatenate([ha, hb]))[:k]
    in_a = np.isin(union, ha)
    in_b = np.isin(union, hb)
    m = int((in_a & in_b).sum())

    def side_est(h):
        if h.size >= k:
            return (k - 1) * 18446744073709551616.0 / float(
                np.float64(int(h[k - 1])))
        return float(h.size)

    if union.size >= k:
        tau = int(union[k - 1])
        est_union = (k - 1) * 18446744073709551616.0 / float(
            np.float64(tau))
        est_inter = float(m) * est_union / float(k)
    else:
        est_inter = float(m)
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "m": pa.array([m], pa.int64()),
        "est_a": pa.array([side_est(ha)], pa.float64()),
        "est_b": pa.array([side_est(hb)], pa.float64()),
        "est_intersection": pa.array([est_inter], pa.float64()),
    })


def hll_error_audit(events_ds, p: int = 12):
    """Sketch-trust audit → ``(event_type, exact_distinct, estimate,
    rel_error)``: the HyperLogLog estimate (:func:`hll_distinct`) next
    to the EXACT distinct-user count
    (:func:`..relational.distinct_users_per_type`) with the signed
    relative error — the check run before replacing exact count-distinct
    with registers in production rollups (|rel_error| should sit inside
    ~1.04/√2^p).

    Both sides are already scale-shaped (register partials / distinct
    narrow pairs); the audit itself joins two ≤|types|-row results
    driver-side.  ``rel_error`` mirrors the oracle's expression tree
    ``(estimate − exact)/exact`` on the identical doubles."""
    from .relational import distinct_users_per_type

    est = hll_distinct(events_ds, "event_type", "user_id",
                       p=p).to_pandas()
    exact = distinct_users_per_type(events_ds).to_pandas()
    m = est.merge(exact, on="event_type", how="inner").sort_values(
        "event_type").reset_index(drop=True)
    ex = m["n_users"].astype(np.int64).to_numpy()
    es = m["estimate"].astype(np.float64).to_numpy()
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "exact_distinct": pa.array(ex, pa.int64()),
        "estimate": pa.array(es, pa.float64()),
        "rel_error": pa.array(
            (es - ex.astype(np.float64)) / ex.astype(np.float64),
            pa.float64()),
    })
