"""Raster payload codec + pluggable OCR engine.

The reference OCRs page images with Tesseract
(``/root/reference/StudiOCR/OcrEngine.py:88-89``:
``pytesseract.image_to_data(img, config=custom_config, output_type=Output.DICT)``)
returning a **columnar dict of parallel arrays** with keys
``left top width height conf text`` (one entry per detected token;
required-keys check mirrored from
``/root/reference/StudiOCR/OcrPageData.py:20-23``).

Neither the ``tesseract`` binary nor ``pytesseract``/``cv2`` exist in this
sandbox (SURVEY.md §0), so the engine is a *protocol*: anything with a
``process(payload, oem, psm, best, preprocessing) -> dict`` method.  The
shipped :class:`SyntheticRasterEngine` decodes a deterministic, self-defined
binary encoding of a token grid (FIXTURES.md §1) and emits exactly the
parallel-array shape pytesseract would.  A real Tesseract-backed engine slots
in behind the same protocol (see :class:`TesseractRasterEngine`) when the
dependencies are present.

Config semantics mirrored from the reference:

* ``oem``/``psm`` validation — ``OcrEngine.process_image`` raises on
  ``oem ∉ [0,3]`` / ``psm ∉ [3,13]``
  (``/root/reference/StudiOCR/OcrEngine.py:36-44``).
* ``best`` chooses the high-accuracy vs fast model
  (``--tessdata-dir {best|fast}``, ``/root/reference/StudiOCR/OcrEngine.py:49-54``);
  the synthetic engine models "fast" as a fixed confidence penalty so config
  plumbing is observable in tests.
* ``preprocessing`` toggles the image-cleanup pipeline
  (``/root/reference/StudiOCR/OcrEngine.py:74-85``); modeled as a fixed
  confidence bonus.
"""

from __future__ import annotations

import struct
from typing import Protocol

MAGIC = b"RSTR1"
_REC_FIXED = struct.Struct("<iiiihH")  # left, top, width, height, conf, text_len

# Confidence adjustments the synthetic engine applies for config plumbing
# observability (deterministic stand-ins for model / preprocessing effects).
FAST_CONF_PENALTY = 7
PREPROCESS_CONF_BONUS = 3

TOKEN_KEYS = ("left", "top", "width", "height", "conf", "text")


def validate_config(oem: int, psm: int) -> None:
    """Param validation, mirroring /root/reference/StudiOCR/OcrEngine.py:36-44."""
    if not 0 <= oem <= 3:
        raise ValueError(f"oem must be in [0, 3], got {oem}")
    if not 3 <= psm <= 13:
        raise ValueError(f"psm must be in [3, 13], got {psm}")


def encode_payload(tokens: list[tuple[int, int, int, int, int, str]]) -> bytes:
    """Encode (left, top, width, height, conf, text) records into a raster payload."""
    out = [MAGIC, struct.pack("<I", len(tokens))]
    for left, top, width, height, conf, text in tokens:
        tb = text.encode("utf-8")
        out.append(_REC_FIXED.pack(left, top, width, height, conf, len(tb)))
        out.append(tb)
    return b"".join(out)


def decode_payload(payload: bytes) -> dict[str, list]:
    """Decode a raster payload into pytesseract-shaped parallel arrays."""
    if payload[:5] != MAGIC:
        raise ValueError("not a raster payload (bad magic)")
    (n,) = struct.unpack_from("<I", payload, 5)
    off = 9
    cols: dict[str, list] = {k: [] for k in TOKEN_KEYS}
    for _ in range(n):
        left, top, width, height, conf, tlen = _REC_FIXED.unpack_from(payload, off)
        off += _REC_FIXED.size
        text = payload[off : off + tlen].decode("utf-8")
        off += tlen
        cols["left"].append(left)
        cols["top"].append(top)
        cols["width"].append(width)
        cols["height"].append(height)
        cols["conf"].append(conf)
        cols["text"].append(text)
    return cols


class RasterEngine(Protocol):
    """OCR engine protocol mirroring OcrEngine.process_image semantics
    (/root/reference/StudiOCR/OcrEngine.py:46-95): payload in, parallel
    token arrays out."""

    def process(
        self,
        payload: bytes,
        oem: int = 3,
        psm: int = 3,
        best: bool = True,
        preprocessing: bool = False,
    ) -> dict[str, list]: ...


class SyntheticRasterEngine:
    """Deterministic stand-in OCR engine decoding the RSTR1 token-grid codec.

    Stateless and cheap here, but deliberately used as an *actor-pool* stage
    (class-based ``map_batches`` UDF) so the plumbing matches a real warm
    Tesseract engine: construction cost paid once per actor, ``process`` per
    page (mirrors ``OMP_THREAD_LIMIT=1`` one-CPU-per-engine,
    /root/reference/StudiOCR/OcrEngine.py:87).
    """

    def __init__(self) -> None:
        self._warm = True  # placeholder for model load

    def process(
        self,
        payload: bytes,
        oem: int = 3,
        psm: int = 3,
        best: bool = True,
        preprocessing: bool = False,
    ) -> dict[str, list]:
        validate_config(oem, psm)
        cols = decode_payload(bytes(payload))
        adj = (0 if best else -FAST_CONF_PENALTY) + (
            PREPROCESS_CONF_BONUS if preprocessing else 0
        )
        if adj:
            cols["conf"] = [max(0, min(100, c + adj)) for c in cols["conf"]]
        return cols


class TesseractRasterEngine:
    """Real-Tesseract engine: same protocol, used when pytesseract+PIL exist.

    Builds the identical config string as the reference
    (``--oem {oem} --psm {psm} --tessdata-dir {best|fast}``,
    /root/reference/StudiOCR/OcrEngine.py:49-54) and pins
    ``OMP_THREAD_LIMIT=1`` (:87). Payload is expected to be an encoded image
    (PNG/JPEG bytes).
    """

    def __init__(self, tessdata_best: str | None = None, tessdata_fast: str | None = None):
        import os

        os.environ["OMP_THREAD_LIMIT"] = "1"
        import pytesseract  # noqa: F401 — fails fast if absent

        self._pt = pytesseract
        self._best_dir = tessdata_best
        self._fast_dir = tessdata_fast

    def process(
        self,
        payload: bytes,
        oem: int = 3,
        psm: int = 3,
        best: bool = True,
        preprocessing: bool = False,
    ) -> dict[str, list]:
        validate_config(oem, psm)
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        tessdata = self._best_dir if best else self._fast_dir
        config = f"--oem {oem} --psm {psm}"
        if tessdata:
            config += f' --tessdata-dir "{tessdata}"'
        data = self._pt.image_to_data(
            img, config=config, output_type=self._pt.Output.DICT
        )
        return {k: data[k] for k in TOKEN_KEYS}


def make_engine(kind: str = "synthetic") -> RasterEngine:
    if kind == "synthetic":
        return SyntheticRasterEngine()
    if kind == "tesseract":
        return TesseractRasterEngine()
    raise ValueError(f"unknown raster engine kind: {kind}")
