"""Deterministic stratified sampling over a keyed corpus.

Training-data pipelines mix sources at explicit rates ("sample 10% of
Common Crawl, 100% of Wikipedia").  At 100 TB the sample decision must be
(a) a pure function of the row — so re-runs, resumes and the N- vs 4N-node
cluster produce the SAME sample with zero coordination — and (b) vectorized.

The decision here is ``splitmix64(doc_id) < rate(source) * 2**64``:
splitmix64 (Steele et al., "Fast Splittable Pseudorandom Number
Generators", OOPSLA 2014) is a 4-op avalanche mix whose numpy uint64
evaluation is reproduced bit-exactly in DuckDB HUGEINT arithmetic by the
``oracle_sql()['stratified_sample']`` entry — the per-source thresholds are
precomputed integers inlined into both sides, so the oracle match is exact,
not approximate.

No shuffle: one stateless ``map_batches`` filter; per-source rates ride in
as a plain dict (a handful of sources — configuration, not data).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return z ^ (z >> np.uint64(31))


def rate_thresholds(
    rates: dict[str, float], default_rate: float
) -> tuple[dict[str, int], int]:
    """Integer keep-thresholds (``rate * 2**64`` floored) — computed ONCE
    and shared verbatim with the SQL oracle so both sides compare the hash
    against the same integer."""
    return (
        {s: min(int(r * 2**64), 2**64) for s, r in rates.items()},
        min(int(default_rate * 2**64), 2**64),
    )


def stratified_sample(
    ds,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    strat_col: str = "source",
):
    """documents Dataset → the deterministic per-source sample.

    Keeps a row iff ``splitmix64(id) < threshold(source)``.  All columns
    pass through."""
    thresholds, default_thr = rate_thresholds(rates, default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        from .relational import _dict_encode

        h = splitmix64(
            batch.column(id_col).to_numpy(zero_copy_only=False)
        )
        src = batch.column(strat_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = _dict_encode(src)
        # distinct sources per batch only — the dict lookup is per STRATUM,
        # never per row; a threshold of exactly 2**64 (rate 1.0) is one past
        # uint64 range, so it becomes an unconditional-keep bit instead
        thr_ints = [
            thresholds.get(s, default_thr) for s in d.dictionary.to_pylist()
        ]
        thr_by_code = np.array(
            [min(t, 2**64 - 1) for t in thr_ints], dtype=np.uint64
        )
        all_by_code = np.array([t >= 2**64 for t in thr_ints], dtype=bool)
        idx = d.indices.to_numpy(zero_copy_only=False)
        mask = (h < thr_by_code[idx]) | all_by_code[idx]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def _topk_per_source(
    batch: pa.Table,
    k: int,
    id_col: str,
    strat_col: str,
    order_col: str,
    emit_rank: bool,
) -> pa.Table:
    """Vectorized keep-top-K-per-source over one table: lexsort by
    (source, order DESC, id ASC), run-rank, filter.  Used both as the
    per-batch combiner and as the per-bucket finalizer."""
    from ..functions.arrowutil import first_of_run_mask
    from .relational import _dict_encode

    if batch.num_rows == 0:
        out = batch.select([id_col, strat_col, order_col])
        if emit_rank:
            out = out.append_column("rank", pa.array([], pa.int64()))
        return out
    src = batch.column(strat_col)
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    codes = _dict_encode(src).indices.to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    order = batch.column(order_col).to_numpy(zero_copy_only=False)
    perm = np.lexsort((ids, -order, codes))
    t = batch.take(pa.array(perm))
    first = first_of_run_mask([t.column(strat_col)])
    starts = np.flatnonzero(first)
    runlen = np.diff(np.concatenate((starts, [len(perm)])))
    rank = np.arange(len(perm)) - np.repeat(starts, runlen) + 1
    keep = rank <= k
    out = t.filter(pa.array(keep)).select([id_col, strat_col, order_col])
    if emit_rank:
        out = out.append_column("rank", pa.array(rank[keep], pa.int64()))
    return out


def source_cap(
    ds,
    k: int,
    id_col: str = "doc_id",
    strat_col: str = "source",
    order_col: str = "n_chars",
    num_buckets: int = 32,
):
    """Per-source document quota: keep the top-``k`` rows of every source
    ordered by (``order_col`` DESC, ``id_col`` ASC) →
    ``(id, source, order, rank)``.

    The domain-cap step of web-corpus curation (bound any one domain's
    share of the training mix).  Scale shape: the per-batch combiner keeps
    ≤ k rows per source per batch BEFORE the exchange — the groupby moves
    O(k · sources · batches) narrow rows, never the corpus; hot domains
    cost k rows per batch, not their full row count.  Final ranking is a
    per-bucket vectorized lexsort + run scan (B groups, not per-source
    Python)."""

    def combiner(batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import string_buckets

        out = _topk_per_source(
            batch, k, id_col, strat_col, order_col, emit_rank=False
        )
        wb = (
            string_buckets(out.column(strat_col), num_buckets)
            if out.num_rows
            else np.zeros(0, np.int32)
        )
        return out.append_column("wb", pa.array(wb, pa.int32()))

    def finalize(group: pa.Table) -> pa.Table:
        return _topk_per_source(
            group, k, id_col, strat_col, order_col, emit_rank=True
        )

    return (
        ds.map_batches(combiner, batch_format="pyarrow")
        .groupby("wb")
        .map_groups(finalize, batch_format="pyarrow")
    )


def cluster_split(
    ds,
    clusters,
    val_frac: float = 0.2,
    id_col: str = "doc_id",
    num_buckets: int = 32,
):
    """Leakage-free train/validation split: every member of a duplicate
    cluster lands on the SAME side, decided by
    ``splitmix64(cluster_rep) < val_frac * 2**64`` → ``(id, cluster_rep,
    split)`` with split ∈ {'train', 'val'}.

    The standard fix for near-dup train/val contamination (a val doc whose
    near-duplicate sits in train leaks the answer).  Deterministic pure
    function of the cluster label — re-runs, resumes, and N- vs 4N-node
    clusters produce the identical split with zero coordination.  Labels
    attach via the co-partitioned merge of
    :func:`~studiocr_ray.datapipe.dedup.attach_cluster_labels`; the split
    itself is one stateless vectorized filter, no extra shuffle."""
    from .dedup import attach_cluster_labels

    thr = min(int(val_frac * 2**64), 2**64 - 1)
    labeled = attach_cluster_labels(
        ds, clusters, id_col=id_col, num_buckets=num_buckets
    )

    def tag(batch: pa.Table) -> pa.Table:
        rep = batch.column("cluster_rep")
        if isinstance(rep, pa.ChunkedArray):
            rep = rep.combine_chunks()
        h = splitmix64(rep.to_numpy(zero_copy_only=False))
        side = np.where(h < np.uint64(thr), "val", "train")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster_rep": rep,
                "split": pa.array(side, pa.string()),
            }
        )

    return labeled.map_batches(tag, batch_format="pyarrow")


def mix_parts(
    weights: dict[str, float], default_weight: float
) -> tuple[dict[str, tuple[int, int]], tuple[int, int]]:
    """Split each mixing weight into (whole_copies, frac_threshold) with
    ``frac_threshold = floor(frac * 2**64)`` — computed ONCE and shared
    verbatim with the SQL oracle (cf. rate_thresholds)."""

    def part(w: float) -> tuple[int, int]:
        base = int(math.floor(w))
        return base, min(int((w - base) * 2**64), 2**64)

    return {s: part(w) for s, w in weights.items()}, part(default_weight)


def mix_sources(
    ds,
    weights: dict[str, float],
    default_weight: float = 1.0,
    id_col: str = "doc_id",
    strat_col: str = "source",
):
    """Epoch-weighted source mixing (the training-mixture resampling step):
    a row with weight w is emitted ``floor(w)`` times, plus one more iff
    ``splitmix64(id) < frac(w) * 2**64`` → ``(id, source, copy)`` rows with
    copy = 0..n-1.

    Like stratified_sample this is a pure function of the row — shuffle-free,
    resumable, identical output at any cluster shape; expected output size
    is w * strata size without any coordination.  Upsampled copies carry an
    explicit copy index so downstream epoch shuffles can treat them as
    distinct rows."""
    parts, dflt = mix_parts(weights, default_weight)

    def expand(batch: pa.Table) -> pa.Table:
        from .relational import _dict_encode

        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = splitmix64(ids)
        src = batch.column(strat_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = _dict_encode(src)
        by_code = [
            parts.get(s, dflt) for s in d.dictionary.to_pylist()
        ]
        base_by_code = np.array([b for b, _ in by_code], dtype=np.int64)
        thr_by_code = np.array(
            [min(t, 2**64 - 1) for _, t in by_code], dtype=np.uint64
        )
        all_by_code = np.array([t >= 2**64 for _, t in by_code], dtype=bool)
        idx = d.indices.to_numpy(zero_copy_only=False)
        copies = base_by_code[idx] + (
            (h < thr_by_code[idx]) | all_by_code[idx]
        ).astype(np.int64)
        total = int(copies.sum())
        row_idx = np.repeat(np.arange(len(ids), dtype=np.int64), copies)
        starts = np.concatenate(([0], np.cumsum(copies)[:-1]))
        copy = np.arange(total, dtype=np.int64) - np.repeat(starts, copies)
        taken = batch.select([id_col, strat_col]).take(pa.array(row_idx))
        return taken.append_column("copy", pa.array(copy, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def weighted_sample(ds, k: int = 100, weight_col: str = "n_chars",
                    id_col: str = "doc_id"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): the k
    rows with the smallest exponential key ``-ln(u_i)/w_i`` are exactly
    a weight-proportional sample, and with ``u_i`` derived from
    ``splitmix64(id)`` the draw is a pure function of the row — no RNG
    state, coordination-free, re-runnable (same contract as
    :func:`stratified_sample`).

    Integer-exact ranking: the key is quantized to
    ``floor(-ln(u) * 1e6) * 2^20 // w`` (int64 micro-nats, integer
    divide by the weight), so rank comparisons are integer on both the
    Ray and SQL sides.  Shape: a per-batch top-k combiner (k rows out
    per batch) and ONE bounded merge — the corpus never sorts."""
    if k <= 0:
        raise ValueError("k must be positive")

    def combiner(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if (w <= 0).any():
            raise ValueError("weighted_sample requires positive weights")
        h = splitmix64(ids)
        # (h+1) exact in uint64, then ONE round-to-double — matches SQL
        # CAST(z+1 AS DOUBLE); the wrap guard keeps u=1.0 at h = 2^64-1
        u = np.where(
            h == _M64, 1.0, (h + np.uint64(1)).astype(np.float64) * 2.0**-64
        )
        key = np.floor(-np.log(u) * 1e6).astype(np.int64)
        prio = key * np.int64(1 << 20) // w
        order = np.lexsort((ids, prio))[:k]
        return pa.table(
            {id_col: pa.array(ids[order]),
             weight_col: pa.array(w[order], pa.int64()),
             "priority": pa.array(prio[order], pa.int64())}
        )

    top = ds.map_batches(combiner, batch_format="pyarrow") \
        .to_pandas()  # bounded: k rows per batch
    top = top.sort_values(["priority", id_col], kind="mergesort").head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True))


def shuffle_rank(ds, id_col: str = "doc_id", num_ranges: int = 4096):
    """EXACT deterministic global shuffle position per row →
    ``(id, shuffle_rank)`` with rank 1-based — SQL
    ``row_number() OVER (ORDER BY splitmix64(id), id)`` semantics
    WITHOUT a global sort.

    A training run needs the corpus in a reproducible pseudo-random
    order (epoch shuffling before :func:`~studiocr_ray.datapipe.pack.
    pack_sequences`); ``random_shuffle()`` is neither deterministic nor
    resumable.  Ordering by ``splitmix64(id)`` IS a shuffle — the hash
    avalanches — and is a pure function of the row, so N- and 4N-node
    runs, re-runs and resumes all agree.

    Two passes, both bounded: (1) rows count into ``num_ranges`` hash
    ranges (the TOP bits of the hash, so ranges are contiguous in hash
    order and uniformly sized by avalanche — no skew by construction);
    the ≤4096-row histogram merges once and its cumulative counts
    broadcast as per-range global offsets.  (2) rows exchange ONCE keyed
    by range, each range sorts locally by ``(h, id)``, and
    ``rank = offset[range] + local_index + 1``.  Equal ids tie-break the
    (astronomically unlikely) hash collision deterministically."""
    import ray

    from ray.data.aggregate import Sum

    shift = np.uint64(64 - int(math.log2(num_ranges)))
    if (1 << (64 - int(shift))) != num_ranges:
        raise ValueError("num_ranges must be a power of two")

    def hist_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        rng = (splitmix64(ids) >> shift).astype(np.int64)
        vals, cnts = np.unique(rng, return_counts=True)
        return pa.table({"rng": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("rng").aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: ≤ num_ranges rows
        .sort_values("rng").reset_index(drop=True)
    )
    offsets = np.zeros(num_ranges, np.int64)
    offsets[hist["rng"].to_numpy()] = hist["n"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))
    off_ref = ray.put(offsets)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = splitmix64(ids)
        return pa.table({
            id_col: batch.column(id_col),
            "h": pa.array(h, pa.uint64()),
            "rng": pa.array((h >> shift).astype(np.int64), pa.int64()),
        })

    _cache: list = []

    def rank_range(group: pa.Table) -> pa.Table:
        if not _cache:
            import ray as _ray

            _cache.append(_ray.get(off_ref))
        offs = _cache[0]
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        h = group.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        rng = int(group.column("rng")[0].as_py())
        rank = offs[rng] + np.arange(1, len(ids) + 1, dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids[order]),
            "shuffle_rank": pa.array(rank, pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(rank_range, batch_format="pyarrow")
    )


def temperature_sample(ds, budget_frac: float = 0.2,
                       id_col: str = "doc_id", strat_col: str = "source",
                       num_buckets: int = 32):
    """√-temperature source sampling (the τ = 0.5 mixture rule used for
    multilingual/multi-source LLM training sets: small sources are
    upweighted relative to proportional sampling): with a total budget
    ``B = floor(N · budget_frac)``, source *s* receives quota
    ``q_s = max(1, (B · w_s) // Σw)`` where ``w_s = floor(√n_s · 1e6)``
    — the √ weights are INTEGER-quantized before the sum, so the
    apportionment is exact integer arithmetic with no float-summation
    order anywhere — and contributes its ``q_s`` documents with the
    smallest ``splitmix64(id)`` → ``(doc_id, source, hv)``.

    Deterministic and coordination-free like
    :func:`stratified_sample` (the keep rule is a pure function of the
    row given the tiny per-source quota table); scale shape like
    :func:`source_cap` (per-batch ≤ q_s combiner before ONE
    source-hash exchange, so hot sources ship q_s rows per batch, never
    their corpus share)."""
    import math

    from ..functions.arrowutil import string_buckets
    from .relational import _dict_encode

    counts = ds.groupby(strat_col).count().to_pandas()
    counts = counts.sort_values(strat_col).reset_index(drop=True)
    n_total = int(counts["count()"].sum())
    budget = int(n_total * budget_frac)
    ws = {
        s: math.floor(math.sqrt(float(n)) * 1e6)
        for s, n in zip(counts[strat_col], counts["count()"])
    }
    wsum = sum(ws.values())
    quota = {s: max(1, (budget * w) // wsum) for s, w in ws.items()}

    def keep_smallest(batch: pa.Table, emit_rank: bool) -> pa.Table:
        if batch.num_rows == 0:
            out = batch.select([id_col, strat_col, "hv"])
            return out
        src = batch.column(strat_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = _dict_encode(src)
        codes = d.indices.to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        hv = batch.column("hv").to_numpy(zero_copy_only=False)
        perm = np.lexsort((ids, hv, codes))
        t = batch.take(pa.array(perm))
        c = codes[perm]
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        runlen = np.diff(np.concatenate((starts, [len(perm)])))
        rank = np.arange(len(perm)) - np.repeat(starts, runlen) + 1
        k_of = np.array([quota[str(s)] for s in d.dictionary.to_pylist()],
                        np.int64)
        keep = rank <= k_of[c]
        return t.filter(pa.array(keep)).select([id_col, strat_col, "hv"])

    def combiner(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        hv = splitmix64(ids.astype(np.uint64))
        t = pa.table({
            id_col: batch.column(id_col),
            strat_col: batch.column(strat_col),
            # uint64 end to end: an int64 view would flip the order of
            # hashes ≥ 2^63 (half of them)
            "hv": pa.array(hv, pa.uint64()),
        })
        out = keep_smallest(t, emit_rank=False)
        wb = (string_buckets(out.column(strat_col), num_buckets)
              if out.num_rows else np.zeros(0, np.int32))
        return out.append_column("wb", pa.array(wb, pa.int32()))

    def finalize(group: pa.Table) -> pa.Table:
        return keep_smallest(group.drop_columns(["wb"]), emit_rank=True)

    return (
        ds.map_batches(combiner, batch_format="pyarrow")
        .groupby("wb")
        .map_groups(finalize, batch_format="pyarrow")
    )


def token_budget_sample(
    ds,
    budget_tokens: int,
    id_col: str = "doc_id",
    strat_col: str = "source",
    text_col: str = "text",
    num_buckets: int = 32,
):
    """Deterministic per-source sampling to a TOKEN budget →
    ``(id, source, n_tokens, cum_tokens)``: each source keeps its
    smallest-``splitmix64(id)`` documents while the running token total
    stays ≤ ``budget_tokens`` — "give me ~10M tokens per source" as a
    pure function of the rows, so re-runs, resumes and different cluster
    shapes pick the SAME sample (the :func:`stratified_sample` /
    :func:`source_cap` discipline, but budgeted in tokens, the unit
    training actually consumes, instead of row quotas).

    Scale shape: the within-batch prefix is a LOWER bound of the global
    prefix at every hash position, so a per-batch combiner sorts its
    rows per source by ``(hash, id)``, cumsums tokens and drops
    everything past the budget BEFORE the exchange — each batch ships at
    most ⌈budget/min_doc_tokens⌉ narrow rows per source, never the
    corpus.  The per-source finalize is one vectorized lexsort + cumsum
    per bucket."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import string_buckets
    from .relational import _flat_tokens

    budget = int(budget_tokens)

    def _prefix(t: pa.Table, emit_cum: bool) -> pa.Table:
        """Sort per (source, hash, id), cumsum tokens per source, keep
        rows with running total ≤ budget."""
        src = t.column(strat_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ntok = t.column("n_tokens").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        sd = src.dictionary_encode()
        scodes = sd.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.lexsort((ids, h, scodes))
        sc, hs, idx = scodes[order], h[order], order
        nt = ntok[order]
        cum = np.cumsum(nt)
        starts = np.flatnonzero(
            np.concatenate(([True], sc[1:] != sc[:-1])))
        seg = np.cumsum(np.concatenate(
            ([True], sc[1:] != sc[:-1]))) - 1
        base = np.concatenate(([0], cum[starts[1:] - 1]))
        run = cum - base[seg]
        keep = run <= budget
        kept = t.take(pa.array(idx[keep]))
        if emit_cum:
            kept = kept.append_column(
                "cum_tokens", pa.array(run[keep], pa.int64()))
        return kept

    def combiner(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        ntok = np.bincount(doc_idx,
                           minlength=batch.num_rows).astype(np.int64)
        t = batch.select([id_col, strat_col]).append_column(
            "n_tokens", pa.array(ntok, pa.int64()))
        out = _prefix(t, emit_cum=False)
        wb = (string_buckets(out.column(strat_col), num_buckets)
              if out.num_rows else np.zeros(0, np.int32))
        return out.append_column("wb", pa.array(wb, pa.int32()))

    def finalize(group: pa.Table) -> pa.Table:
        return _prefix(group.drop_columns(["wb"]), emit_cum=True)

    return (
        ds.map_batches(combiner, batch_format="pyarrow")
        .groupby("wb")
        .map_groups(finalize, batch_format="pyarrow")
    )
