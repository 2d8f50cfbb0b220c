"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata — the same
pattern as the reference's JPEG page blobs in SQLite
(/root/reference/StudiOCR/db.py:46, OcrEngine.py:82-83) lifted to Arrow.
Real codecs (Pillow/cv2/ffmpeg) are NOT in this container, so the decode
kernels are pluggable: a real decoder raises ``NotImplementedError`` here and
a **deterministic fake** stands in for tests — the Ray-side plumbing (schema,
actor-pool signature, batch sizing, output layout) is real and tested.

Batch-size guidance: media rows are MBs; run these stages with small
``batch_size`` (8–64) and let block splitting + object-store spilling handle
the rest rather than holding Python lists (SURVEY.md 'Memory-aware').
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                            ("duration_ms", pa.int32()), ("codec", pa.string())])),
    ]
)


class RealMediaDecoder:
    """Placeholder for a Pillow/ffmpeg-backed decoder. Swap point documented:
    implement decode() with the real library; everything downstream is
    unchanged."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        raise NotImplementedError(
            "real media decoding requires Pillow/ffmpeg, not present in this "
            "environment; use DeterministicFakeDecoder for tests"
        )


class DeterministicFakeDecoder:
    """Deterministic stand-in: bytes → fixed-shape float32 'pixels'/samples
    from an md5 keystream over the payload digest — value j is byte j of
    ``md5(md5(payload).hexdigest() + ':' + str(j // 16))`` divided by 256.
    Byte-derived (no RandomState), so the decoded values — and therefore the
    downstream feature vectors — are bit-reproducible in SQL
    (``('0x' || substr(md5(dh || ':' || blk), pos, 2))::INT / 256.0``); every
    value k/256 is exactly representable in float32/float64."""

    _SHAPES = {"image": (16, 16, 3), "audio": (1600,), "video": (8, 16, 16, 3)}

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        shape = self._SHAPES.get(media_type)
        if shape is None:
            raise ValueError(f"unknown media_type {media_type}")
        size = int(np.prod(shape))
        dh = hashlib.md5(payload).hexdigest()
        ks = np.empty(size, np.uint8)
        for i in range(size // 16):
            ks[i * 16 : (i + 1) * 16] = np.frombuffer(
                hashlib.md5(f"{dh}:{i}".encode()).digest(), np.uint8
            )
        return (ks.astype(np.float32) / 256.0).reshape(shape)


class MediaFeatures:
    """Actor-pool stage: decode → feature vector (mean/std/histogram).

    Use: ``ds.map_batches(MediaFeatures, fn_constructor_kwargs={...},
    batch_size=32, concurrency=(2, 8), num_cpus=1, batch_format="pyarrow")``.
    Decoder built once per actor (warm state, like the OCR engine)."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = (
            DeterministicFakeDecoder() if decoder == "fake" else RealMediaDecoder()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        feats = []
        for mid, mtype, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            arr = self.decoder.decode(payload, mtype)
            flat = arr.ravel().astype(np.float64)
            n = flat.size
            # explicit sum-based mean/std, written to MIRROR the SQL oracle's
            # expression tree exactly: values are exact multiples of 1/256
            # (so both sums are exact in float64) and the remaining ops are
            # single IEEE divisions/multiplies in the same order
            s1 = float(flat.sum())
            s2 = float((flat * flat).sum())
            mean = s1 / n
            std = math.sqrt(s2 / n - (s1 / n) * (s1 / n))
            hist = np.bincount(
                np.minimum((flat * 8).astype(np.int64), 7), minlength=8
            )
            feats.append(
                {
                    "media_id": mid,
                    "feature": [mean, std] + [h / n for h in hist.tolist()],
                }
            )
        return pa.Table.from_pylist(
            feats,
            schema=pa.schema(
                [("media_id", pa.int64()), ("feature", pa.list_(pa.float64()))]
            ),
        )


class MediaResize:
    """Actor-pool stage: decode → spatial downsample by ``factor`` →
    re-encode as raw float32 bytes with updated meta.

    The resize itself is a real numpy stride subsample (images: H×W×C →
    H/f×W/f×C; video per frame; audio: 1-D decimation), so the stage's data
    movement, batch sizing and meta bookkeeping are production-shaped — only
    the codec behind decode() is the documented swap point."""

    def __init__(self, factor: int = 2, decoder: str = "fake"):
        self.factor = factor
        self.decoder = (
            DeterministicFakeDecoder() if decoder == "fake" else RealMediaDecoder()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.factor
        ids, types, payloads, metas = [], [], [], []
        for mid, mtype, payload, meta in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("meta").to_pylist(),
        ):
            arr = self.decoder.decode(payload, mtype)
            if mtype == "image":
                small = arr[::f, ::f, :]
                meta = {**meta, "width": small.shape[1], "height": small.shape[0]}
            elif mtype == "video":
                small = arr[:, ::f, ::f, :]
                meta = {**meta, "width": small.shape[2], "height": small.shape[1]}
            else:
                # audio: decimation keeps the time span (duration_ms
                # unchanged) and lowers the sample RATE; with codec
                # "raw-f32" the rate is derivable as
                # len(payload)/4 / (duration_ms/1000)
                small = arr[::f]
            ids.append(mid)
            types.append(mtype)
            payloads.append(np.ascontiguousarray(small, np.float32).tobytes())
            metas.append({**meta, "codec": "raw-f32"})
        return pa.Table.from_pylist(
            [
                {"media_id": i, "media_type": t, "payload": p, "meta": m}
                for i, t, p, m in zip(ids, types, payloads, metas)
            ],
            schema=MEDIA_SCHEMA,
        )


class FrameSampler:
    """Actor-pool stage: video rows → one row per sampled frame
    (deterministic stride). One input row → many output rows."""

    def __init__(self, every_n: int = 2, decoder: str = "fake"):
        self.every_n = every_n
        self.decoder = (
            DeterministicFakeDecoder() if decoder == "fake" else RealMediaDecoder()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for mid, mtype, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mtype != "video":
                continue
            arr = self.decoder.decode(payload, "video")
            for f in range(0, arr.shape[0], self.every_n):
                ids.append(mid)
                frames.append(f)
                feats.append(float(arr[f].mean()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int32()),
                "frame_mean": pa.array(feats, pa.float64()),
            }
        )


def media_from_documents(sf_dir: str):
    """Deterministic media Dataset derived from the documents table (payload
    = utf-8 text bytes, media_type cycles by doc_id) — the oracle-able media
    fixture: DuckDB can recompute the whole decode→feature path from
    ``documents.text`` (md5 keystream, see DeterministicFakeDecoder)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    kinds = ["image", "audio", "video"]

    def conv(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").combine_chunks()
        mod = pc.cast(did, pa.int64()).to_numpy(zero_copy_only=False) % 3
        n = batch.num_rows
        meta = pa.array(
            [{"width": 16, "height": 16, "duration_ms": 1000, "codec": "fake"}] * n,
            MEDIA_SCHEMA.field("meta").type,
        )
        return pa.Table.from_arrays(
            [
                did,
                pa.array([kinds[m] for m in mod], pa.string()),
                pc.cast(batch.column("text"), pa.binary()),
                meta,
            ],
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(conv, batch_format="pyarrow")


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic media fixture: payload bytes are seeded noise."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(256 + (i % 64)))
        rows.append(
            {
                "media_id": i,
                "media_type": mtype,
                "payload": payload,
                "meta": {"width": 16, "height": 16, "duration_ms": 1000, "codec": "fake"},
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
