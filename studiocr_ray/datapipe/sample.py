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
