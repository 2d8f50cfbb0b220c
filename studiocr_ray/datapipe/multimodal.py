"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata — the same
pattern as the reference's JPEG page blobs in SQLite
(/root/reference/StudiOCR/db.py:46, OcrEngine.py:82-83) lifted to Arrow.
Real codecs (Pillow/cv2/ffmpeg) are NOT in this container, so the decode
kernels are pluggable: COMPRESSED codecs raise ``NotImplementedError``
(``RealMediaDecoder``, the Pillow/ffmpeg swap point), the library-free
raster formats decode for REAL (``PixmapDecoder``: binary PPM/PGM +
uncompressed 24-bit BMP, pure numpy, round-trip-tested against
``encode_ppm``/``encode_bmp``), and a **deterministic fake** stands in
where tests need SQL-oracle-able values — the Ray-side plumbing (schema,
actor-pool signature, batch sizing, output layout) is real throughout.

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
            "compressed-codec decoding requires Pillow/ffmpeg, not present "
            "in this environment; PixmapDecoder decodes PPM/PGM/BMP for "
            "real, DeterministicFakeDecoder serves oracle-able tests"
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
        self.decoder = make_decoder(decoder)

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
        self.decoder = make_decoder(decoder)

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
        self.decoder = make_decoder(decoder)

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


class PixmapDecoder:
    """REAL image decoder for the library-free raster formats — binary
    PPM (P6), PGM (P5) and uncompressed 24-bit BMP — in pure numpy byte
    plumbing.  This makes the decode swap point GENUINELY real for the
    formats this sandbox can produce and verify end-to-end
    (:func:`encode_ppm` / :func:`encode_bmp` are the exact inverses);
    :class:`RealMediaDecoder` remains the documented swap point for
    compressed codecs (JPEG/PNG/ffmpeg), which need external libraries.

    Output: float32 in [0, 1] — ``pixels / 255.0`` — shaped (H, W, 3)
    for color payloads, (H, W) for PGM."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type != "image":
            raise ValueError(
                f"PixmapDecoder handles images only, got {media_type!r}")
        if payload[:2] in (b"P6", b"P5"):
            return self._pnm(payload)
        if payload[:2] == b"BM":
            return self._bmp(payload)
        raise ValueError(
            "unsupported image payload: PixmapDecoder reads binary "
            "PPM/PGM and uncompressed 24-bit BMP")

    @staticmethod
    def _pnm(buf: bytes) -> np.ndarray:
        toks, i = [], 2
        while len(toks) < 3:
            while i < len(buf) and buf[i : i + 1].isspace():
                i += 1
            if buf[i : i + 1] == b"#":  # comment to end of line
                while i < len(buf) and buf[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(buf) and not buf[j : j + 1].isspace():
                j += 1
            toks.append(int(buf[i:j]))
            i = j
        i += 1  # exactly one whitespace byte after maxval (spec)
        w, h, maxval = toks
        if maxval != 255:
            raise ValueError(f"only maxval 255 supported, got {maxval}")
        ch = 3 if buf[:2] == b"P6" else 1
        px = np.frombuffer(buf, np.uint8, count=w * h * ch, offset=i)
        arr = px.reshape((h, w, 3) if ch == 3 else (h, w))
        return arr.astype(np.float32) / 255.0

    @staticmethod
    def _bmp(buf: bytes) -> np.ndarray:
        off = int.from_bytes(buf[10:14], "little")
        w = int.from_bytes(buf[18:22], "little", signed=True)
        h = int.from_bytes(buf[22:26], "little", signed=True)
        bpp = int.from_bytes(buf[28:30], "little")
        comp = int.from_bytes(buf[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError(
                f"only uncompressed 24-bit BMP supported "
                f"(bpp={bpp}, compression={comp})")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(
            buf, np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return rows[:, :, ::-1].astype(np.float32) / 255.0  # BGR→RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) → binary PPM (P6) bytes — the exact inverse of
    :meth:`PixmapDecoder._pnm` (up to the /255 scaling)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → uncompressed bottom-up 24-bit BMP bytes —
    the exact inverse of :meth:`PixmapDecoder._bmp` (the reference's
    JPEG save-as, /root/reference/StudiOCR/PhotoViewer.py:88-116, for a
    format this sandbox can write without libraries)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    stride = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR
    data = body.tobytes()
    size = 14 + 40 + len(data)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def make_decoder(name: str):
    """Decoder registry: ``fake`` (deterministic md5 keystream, SQL
    oracle-able), ``pixmap`` (REAL PPM/PGM/BMP decode, pure numpy),
    ``wave`` (REAL RIFF/WAVE PCM decode, pure numpy), or ``real`` (the
    Pillow/ffmpeg swap point for compressed codecs)."""
    if name == "fake":
        return DeterministicFakeDecoder()
    if name == "pixmap":
        return PixmapDecoder()
    if name == "wave":
        return WaveDecoder()
    return RealMediaDecoder()


class WaveDecoder:
    """REAL audio decoder for RIFF/WAVE PCM payloads — 16-bit or 8-bit,
    any channel count, pure numpy (the audio twin of
    :class:`PixmapDecoder`; :func:`encode_wav` is the exact inverse).
    Output: float32 in [-1, 1), shape (n_samples,) mono or
    (n_samples, channels)."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type != "audio":
            raise ValueError(
                f"WaveDecoder handles audio only, got {media_type!r}")
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("unsupported audio payload: RIFF/WAVE only")
        i, fmt, data = 12, None, None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            sz = int.from_bytes(payload[i + 4 : i + 8], "little")
            body = payload[i + 8 : i + 8 + sz]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            i += 8 + sz + (sz & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_fmt = int.from_bytes(fmt[0:2], "little")
        channels = int.from_bytes(fmt[2:4], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_fmt != 1 or bits not in (8, 16):
            raise ValueError(
                f"only 8/16-bit PCM supported (fmt={audio_fmt}, "
                f"bits={bits})")
        if bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        else:  # 8-bit WAV is unsigned, biased at 128
            x = (np.frombuffer(data, np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        return x.reshape(-1, channels) if channels > 1 else x


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 (n,) or (n, channels) PCM → RIFF/WAVE bytes — the exact
    inverse of :class:`WaveDecoder` (up to the /32768 scaling)."""
    assert samples.dtype == np.int16
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    data = np.ascontiguousarray(samples, "<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
