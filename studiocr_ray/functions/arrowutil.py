"""Shared vectorized Arrow helpers for the bucketed-distinct pattern.

The engine's distincts all follow one shape: add a bucket column (so the
groupby has B groups, never one Python call per key), sort within the
bucket, keep the first row of each equal-key run.  These two kernels are the
shared subtleties (buffer-offset handling, chunk normalization, no per-row
Python) used by ``exact_dedup``, the banded candidate scan and
``distinct_urls_ds``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def string_hash64(arr) -> np.ndarray:
    """Vectorized 64-bit hash of a string array: FNV fold over the LAST 12
    bytes of each value (urls/hashes differ in their suffix), computed with
    numpy over the Arrow buffers — no per-row Python.  Internal exchange key
    only (nothing durable depends on this hash)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    if arr.null_count:
        # a null hashed via raw buffers would read a garbage offset range and
        # could land the same value in different buckets across batches —
        # the downstream keep-first distinct would then silently emit dups
        raise ValueError("string_hash64 requires a null-free column")
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_width = np.int64  # large_* layouts carry 64-bit offsets
    elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        off_width = np.int32
    else:
        raise TypeError(f"string_hash64 got non-string column: {arr.type}")
    off = np.frombuffer(arr.buffers()[1], off_width)[
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
    return h


def string_buckets(arr, num_buckets: int) -> np.ndarray:
    """``string_hash64 >> 32  mod  num_buckets`` as int32 — the exchange-key
    form used by the bucketed-distinct pattern."""
    h = string_hash64(arr)
    return ((h >> np.uint64(32)) % np.uint64(num_buckets)).astype(np.int32)


def crc32_rows(arr) -> np.ndarray:
    """Per-row ``zlib.crc32(utf-8 bytes)`` of a string/binary column as
    uint32, slicing one shared memoryview of the value buffer per row — no
    per-row ``str``/``bytes`` objects (to_pylist()+encode allocates two
    objects per row and measures ~2× slower on url-length strings).

    This is the DURABLE partition hash (part = crc32(url) % P decides the
    on-disk layout, index url shards and oracle parity), so unlike
    string_hash64 it cannot be swapped for a cheaper fold."""
    import zlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint32)
    if arr.null_count:
        raise ValueError("crc32_rows requires a null-free column")
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_width = np.int64
    elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        off_width = np.int32
    else:
        raise TypeError(f"crc32_rows got non-string column: {arr.type}")
    off = np.frombuffer(arr.buffers()[1], off_width, count=arr.offset + n + 1)
    o = arr.offset
    mv = memoryview(arr.buffers()[2])
    crc = zlib.crc32
    return np.fromiter(
        (crc(mv[off[o + i]:off[o + i + 1]]) for i in range(n)),
        dtype=np.uint32,
        count=n,
    )


def crc32_buckets(arr, num_buckets: int) -> np.ndarray:
    """``crc32(value) % num_buckets`` as int32 — the durable partition-id
    form (extract parts, index url shards)."""
    return (crc32_rows(arr) % np.uint32(num_buckets)).astype(np.int32)


def id_hash64(col) -> np.ndarray:
    """64-bit hash of an id column — int64 surrogate keys (golden-ratio
    multiply) and url strings (FNV suffix fold) both supported, so every
    bucketed exchange in the dedup family is id-type-agnostic."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        if col.null_count:
            # a null int surfaces as NaN via to_numpy and astype(uint64)
            # would bucket it ARBITRARILY (platform-defined cast) — the
            # joins/dedups built on this hash would silently drop or
            # mismatch rows; fail loudly like string_hash64 does
            raise ValueError("id_hash64 requires a null-free key column")
        a = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return a * np.uint64(0x9E3779B97F4A7C15)
    return string_hash64(col)


def id_buckets(col, num_buckets: int) -> np.ndarray:
    """``id_hash64 >> 32  mod  num_buckets`` as int32."""
    h = id_hash64(col)
    return ((h >> np.uint64(32)) % np.uint64(num_buckets)).astype(np.int32)


def pair_buckets(col_a, col_b, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of an (id_a, id_b) pair — both halves of a pair
    carry the full (id_a, id_b), so they always land in the same bucket."""
    h = id_hash64(col_a) * np.uint64(3) + id_hash64(col_b)
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
