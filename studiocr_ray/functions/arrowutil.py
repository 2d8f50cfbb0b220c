"""Shared vectorized Arrow helpers for the bucketed-distinct pattern.

The engine's distincts all follow one shape: add a bucket column (so the
groupby has B groups, never one Python call per key), sort within the
bucket, keep the first row of each equal-key run.  These two kernels are the
shared subtleties (buffer-offset handling, chunk normalization, no per-row
Python) used by ``exact_dedup``, ``distinct_pairs_ds`` and
``distinct_urls_ds``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def string_buckets(arr, num_buckets: int) -> np.ndarray:
    """Vectorized bucket hash of a string array: FNV fold over the LAST 12
    bytes of each value (urls/hashes differ in their suffix), computed with
    numpy over the Arrow buffers — no per-row Python.  Internal exchange key
    only (nothing durable depends on this hash)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int32)
    off = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, np.uint8)
        if data_buf is not None and len(data_buf) > 0
        else np.zeros(1, np.uint8)
    )
    starts, ends = off[:-1], off[1:]
    h = np.full(n, 0xCBF29CE484222325, np.uint64)
    mult = np.uint64(0x100000001B3)
    for j in range(12):
        pos = ends - 1 - j
        valid = pos >= starts
        b = np.where(
            valid, data[np.clip(pos, 0, len(data) - 1)], 0
        ).astype(np.uint64)
        h = (h ^ b) * mult
    return ((h >> np.uint64(32)) % np.uint64(num_buckets)).astype(np.int32)


def first_of_run_mask(cols) -> np.ndarray:
    """Boolean mask marking the FIRST row of each run of equal values over
    the given (pre-sorted, null-free) Arrow columns — the vectorized
    keep-first/distinct scan."""
    cols = [
        c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        for c in cols
    ]
    n = len(cols[0])
    first = np.ones(n, dtype=bool)
    if n > 1:
        acc = None
        for c in cols:
            neq = pc.not_equal(c.slice(1), c.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            acc = neq if acc is None else (acc | neq)
        first[1:] = acc
    return first
