"""Vectorized LEB128 varint + zigzag-delta codec for posting lists.

The reference persists postings as SQLite rows (/root/reference/StudiOCR/
db.py:48-75, one OcrBlock row per token); at 10^12 documents the postings
payload dominates index bytes, so the standard search-engine codec —
sort postings, delta-encode the monotone keys, varint the small deltas —
is the storage path.  Everything here is numpy over flat buffers: encode
emits at most 10 masked passes over the value array (one per possible
varint byte position), decode reconstructs every value of the batch with
one ``np.add.reduceat``, and per-row segmentation is Arrow list/binary
offset arithmetic.  No Python object per posting, no Python loop per row.

Layout: the four posting fields (postings are already sorted by
``(url_idx, page, block)`` within a row, index_pipeline._merge_bucket_group)
become four binary columns — ``url_bin`` (plain deltas: url_idx is
non-decreasing), ``page_bin``/``block_bin`` (zigzag signed deltas: they
reset when the url changes) and ``conf_bin`` (raw) — plus the posting
count ``pn``.  Field-major beats posting-major because each stream's
deltas are uniformly tiny (mostly 0/1 → one byte).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1))).astype(np.uint64)).astype(
        np.int64
    )


def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array → (uint8 LEB128 stream, bytes-per-value).  Vectorized:
    ≤10 masked passes, one per varint byte position."""
    v = values.astype(np.uint64)
    n = len(v)
    if n == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    nbytes = np.ones(n, np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        nbytes += (shifted != 0).astype(np.int64)
        shifted >>= np.uint64(7)
    out = np.zeros(int(nbytes.sum()), np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(
            np.uint8
        )
        cont = ((nbytes[mask] > j + 1).astype(np.uint8)) << 7
        out[starts[mask] + j] = chunk | cont
    return out, nbytes


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """uint8 LEB128 stream → uint64 array (one reduceat)."""
    b = np.ascontiguousarray(buf).view(np.uint8)
    if len(b) == 0:
        return np.zeros(0, np.uint64)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated varint stream")
    starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    lens = np.diff(np.concatenate((starts, [len(b)])))
    pos = np.arange(len(b)) - np.repeat(starts, lens)
    contrib = (b & 0x7F).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts).astype(np.uint64)


def _seg_delta(flat: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-row deltas of a flat int64 array: within each row segment the
    first value is kept as-is, later values become successive differences."""
    d = np.diff(flat, prepend=np.int64(0))
    d[starts] = flat[starts]
    return d


def _seg_cumsum(flat: np.ndarray, starts: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_seg_delta`: cumulative sum restarting per row."""
    g = np.cumsum(flat)
    base = g[starts] - flat[starts]
    return (g - np.repeat(base, n)).astype(np.int64)


def _binary_from_stream(stream: np.ndarray, row_bytes: np.ndarray) -> pa.Array:
    """Zero-copy binary column: one shared byte buffer sliced per row."""
    if len(stream) >= 2**31:  # int32 binary offsets would wrap silently
        raise OverflowError(
            f"{len(stream)} stream bytes exceed int32 binary offsets; "
            "lower batch size"
        )
    offsets = np.concatenate(([0], np.cumsum(row_bytes))).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        len(row_bytes),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(stream).tobytes())],
    )


def _stream_of_binary(col) -> np.ndarray:
    """One uint8 view of a binary column's concatenated values.  Rows are
    back-to-back by construction (encode emits one shared buffer; a
    parquet read reconstructs values contiguously in row order) — a sliced
    or gap-bearing array would fail the decoder's count check loudly."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    if bufs[2] is None:
        return np.zeros(0, np.uint8)
    offs = np.frombuffer(bufs[1], np.int32)[
        arr.offset: arr.offset + len(arr) + 1
    ]
    return np.frombuffer(bufs[2], np.uint8)[offs[0]:offs[-1]]


_FIELDS = ("url_idx", "page", "block", "conf")
_BIN_COLS = ("url_bin", "page_bin", "block_bin", "conf_bin")


def encode_postings_batch(batch: pa.Table) -> pa.Table:
    """Index rows → ``postings`` replaced by the four varint stream columns
    + ``pn`` (posting count).  All rows of the batch encode in four
    whole-batch varint passes; per-row boundaries are reduceat sums of the
    per-value byte counts."""
    import pyarrow.compute as pc

    posts = batch.column("postings").combine_chunks()
    n = pc.list_value_length(posts).fill_null(0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = posts.flatten()
    starts = np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
    nonempty = n > 0
    seg_starts = starts[nonempty]
    out = batch.drop_columns(["postings"]).append_column(
        "pn", pa.array(n, pa.int64())
    )
    fields = {
        f: flat.field(f).to_numpy(zero_copy_only=False).astype(np.int64)
        for f in _FIELDS
    }
    encoded = {
        "url_bin": _seg_delta(fields["url_idx"], seg_starts).astype(np.uint64)
        if len(flat) else np.zeros(0, np.uint64),
        "page_bin": _zigzag(_seg_delta(fields["page"], seg_starts))
        if len(flat) else np.zeros(0, np.uint64),
        "block_bin": _zigzag(_seg_delta(fields["block"], seg_starts))
        if len(flat) else np.zeros(0, np.uint64),
        "conf_bin": fields["conf"].astype(np.uint64),
    }
    for col, vals in encoded.items():
        stream, nbytes = varint_encode(vals)
        # reduceat over the NONEMPTY segment starts only (an empty row's
        # start aliases the next row's, and a trailing empty row's start
        # would index past the end); empty rows keep 0 bytes
        row_bytes = np.zeros(len(n), np.int64)
        if len(nbytes):
            row_bytes[nonempty] = np.add.reduceat(nbytes, seg_starts)
        out = out.append_column(col, _binary_from_stream(stream, row_bytes))
    return out


def decode_postings_batch(batch: pa.Table) -> pa.Table:
    """Inverse of :func:`encode_postings_batch` — bit-exact round trip,
    one whole-batch varint decode per field."""
    from ..pipelines.index_pipeline import POSTINGS_LIST

    n = batch.column("pn").to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n.sum())
    starts = np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
    seg_starts = starts[n > 0]
    vals = {}
    for col in _BIN_COLS:
        decoded = varint_decode(_stream_of_binary(batch.column(col)))
        if len(decoded) != total:
            raise ValueError(
                f"{col}: {len(decoded)} varints for {total} postings"
            )
        vals[col] = decoded
    url_idx = _seg_cumsum(vals["url_bin"].astype(np.int64), seg_starts, n[n > 0]) \
        if total else np.zeros(0, np.int64)
    page = _seg_cumsum(_unzigzag(vals["page_bin"]), seg_starts, n[n > 0]) \
        if total else np.zeros(0, np.int64)
    block = _seg_cumsum(_unzigzag(vals["block_bin"]), seg_starts, n[n > 0]) \
        if total else np.zeros(0, np.int64)
    conf = vals["conf_bin"].astype(np.int64)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(url_idx.astype(np.int32), pa.int32()),
            pa.array(page.astype(np.int32), pa.int32()),
            pa.array(block.astype(np.int32), pa.int32()),
            pa.array(conf.astype(np.int32), pa.int32()),
        ],
        names=list(_FIELDS),
    )
    offsets = pa.array(
        np.concatenate(([0], np.cumsum(n))).astype(np.int32), pa.int32()
    )
    posts = pa.ListArray.from_arrays(offsets, struct)
    return batch.drop_columns(["pn", *_BIN_COLS]).append_column(
        "postings", posts.cast(POSTINGS_LIST)
    )
