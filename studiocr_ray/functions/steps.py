"""StepPipeline — the user-extension surface (SURVEY.md §2 T7).

Re-expresses the reference's ``ImagePipeline``
(/root/reference/StudiOCR/ImagePipeline.py:20-145) without Qt/cv2/PIL:

* ordered, *named* steps (``add_step``, :78-100) — arbitrary callables, extra
  kwargs bound at registration;
* tuple-returning steps select the n-th element via ``capture_index``
  (the cv2.threshold idiom, Image_Preprocessing_Optimization/
  ImageGridSearch.py:92-93);
* method-by-name dispatch (the reference's PIL ``outer_function`` trick,
  ImagePipeline.py:88-96): pass a string and the step calls
  ``getattr(value, name)(**kwargs)``;
* prefix execution ``run(value, until=<step name>)`` (ImagePipeline.py:102-115);
* pipeline slicing ``copy_steps(other, start, end)`` (ImagePipeline.py:50-76);
* ``config_hash()`` so partition manifests can record the exact pipeline a
  run used (our manifests' ``config_hash`` field).

The default image-cleanup steps (T2-T5) are numpy re-implementations of the
reference's cv2 pipeline (/root/reference/StudiOCR/OcrEngine.py:60-85,
Image_Preprocessing_Optimization/CustomFunctions.py:7-15): colorspace flip,
luma grayscale, flat-field illumination correction (box-blur estimate standing
in for cv2.medianBlur — same ``gray * mean(blur) / blur`` formula), binary
threshold. They run inside one ``map_batches`` stage (steps are fused, not one
Ray stage per step — SURVEY.md T7 mapping).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class _Step:
    name: str
    fn: Callable | str  # str → method-by-name dispatch on the value
    capture_index: int | None = None
    kwargs: dict = field(default_factory=dict)

    def apply(self, value: Any) -> Any:
        if isinstance(self.fn, str):
            out = getattr(value, self.fn)(**self.kwargs)
        else:
            out = self.fn(value, **self.kwargs)
        if self.capture_index is not None:
            out = out[self.capture_index]
        return out

    def describe(self) -> str:
        fn_name = self.fn if isinstance(self.fn, str) else getattr(
            self.fn, "__name__", repr(self.fn)
        )
        kw = ",".join(f"{k}={self.kwargs[k]!r}" for k in sorted(self.kwargs))
        return f"{self.name}:{fn_name}({kw})@{self.capture_index}"


class StepPipeline:
    """Ordered named transform chain; see module docstring."""

    def __init__(self) -> None:
        self._steps: "OrderedDict[str, _Step]" = OrderedDict()

    def add_step(
        self,
        name: str,
        fn: Callable | str,
        capture_index: int | None = None,
        **kwargs: Any,
    ) -> "StepPipeline":
        if name in self._steps:
            raise ValueError(f"duplicate step name: {name}")
        self._steps[name] = _Step(name, fn, capture_index, kwargs)
        return self

    def remove_step(self, name: str) -> None:
        del self._steps[name]

    @property
    def step_names(self) -> list[str]:
        return list(self._steps)

    def run(self, value: Any, until: str | None = None) -> Any:
        """Pass ``value`` through the steps in order; with ``until``, stop
        after the named step (prefix execution, ImagePipeline.py:102-115)."""
        if until is not None and until not in self._steps:
            raise KeyError(f"unknown step: {until}")
        for step in self._steps.values():
            value = step.apply(value)
            if step.name == until:
                break
        return value

    def copy_steps(
        self,
        other: "StepPipeline",
        start: str | None = None,
        end: str | None = None,
    ) -> "StepPipeline":
        """Append a slice of another pipeline's steps (inclusive start..end),
        mirroring ImagePipeline.copy_steps (:50-76)."""
        names = other.step_names
        i = names.index(start) if start is not None else 0
        j = names.index(end) + 1 if end is not None else len(names)
        for name in names[i:j]:
            s = other._steps[name]
            self.add_step(s.name, s.fn, s.capture_index, **s.kwargs)
        return self

    def config_hash(self) -> str:
        h = hashlib.sha1("|".join(s.describe() for s in self._steps.values()).encode())
        return h.hexdigest()[:12]

    def __len__(self) -> int:
        return len(self._steps)


# ---------------------------------------------------------------------------
# Default image-cleanup steps (numpy; T2-T5)
# ---------------------------------------------------------------------------

def bgr_to_rgb(img):
    """T2 — channel flip (/root/reference/StudiOCR/OcrEngine.py:60)."""
    return img[..., ::-1]


def to_grayscale(img):
    """T3 — ITU-R 601 luma, the cv2.cvtColor(RGB2GRAY) weights
    (/root/reference/StudiOCR/OcrEngine.py:75-76)."""
    import numpy as np

    if img.ndim == 2:
        return img
    w = np.array([0.299, 0.587, 0.114])
    return (img[..., :3] @ w).astype(img.dtype if img.dtype.kind == "f" else "uint8")


def _box_blur(gray, ksize: int):
    """Separable box blur via cumulative sums (edge-clamped), the
    illumination estimator standing in for cv2.medianBlur."""
    import numpy as np

    def blur_1d(a, k, axis):
        pad = k // 2
        padded = np.concatenate(
            [np.repeat(a.take([0], axis=axis), pad, axis=axis), a,
             np.repeat(a.take([-1], axis=axis), pad, axis=axis)],
            axis=axis,
        ).astype(np.float64)
        c = np.cumsum(padded, axis=axis)
        zero = np.zeros_like(c.take([0], axis=axis))
        c = np.concatenate([zero, c], axis=axis)
        hi = c.take(range(k, c.shape[axis]), axis=axis)
        lo = c.take(range(0, c.shape[axis] - k), axis=axis)
        return (hi - lo) / k

    return blur_1d(blur_1d(gray, ksize, 0), ksize, 1)


def flat_field_correct(gray, ksize: int = 99):
    """T4 — illumination flattening: ``gray * mean(blur) / blur``
    (/root/reference/StudiOCR/OcrEngine.py:63-72, default ksize 99;
    Image_Preprocessing_Optimization/CustomFunctions.py:7-15 uses 91)."""
    import numpy as np

    blur = _box_blur(gray.astype(np.float64), ksize)
    blur = np.where(blur == 0, 1.0, blur)
    out = gray.astype(np.float64) * (blur.mean() / blur)
    return np.clip(out, 0, 255).astype("uint8")


def binary_threshold(gray, thresh: int = 20, maxval: int = 255):
    """T5 — cv2.threshold(THRESH_BINARY) semantics incl. the (retval, image)
    tuple return consumed via capture_index=1
    (Image_Preprocessing_Optimization/ImageGridSearch.py:92-93)."""
    import numpy as np

    return float(thresh), np.where(gray > thresh, maxval, 0).astype("uint8")


def default_preprocessing_pipeline(ksize: int = 99) -> StepPipeline:
    """The reference's registered-pipeline shape
    (/root/reference/StudiOCR/OcrEngine.py:74-85): grayscale → flat-field."""
    p = StepPipeline()
    p.add_step("grayscale", to_grayscale)
    p.add_step("flat_field", flat_field_correct, ksize=ksize)
    return p
