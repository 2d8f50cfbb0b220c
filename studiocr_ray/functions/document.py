"""Per-document extraction: html → pages → blocks → doc row.

This is THE definition of extraction semantics, used verbatim by both the
single-process golden oracle (``studiocr_ray.oracle``) and the distributed
Ray Data stage (``studiocr_ray.stages.extract``) — byte-identical extracted
text per url is guaranteed by construction and verified by golden tests.

Page model (mirrors the reference's document→pages→blocks hierarchy,
/root/reference/StudiOCR/db.py:22-61):

* page 0 — the HTML main content, tokenized with the deterministic layout
  (the web analogue of a rasterized note page);
* pages 1..N — embedded raster payloads in document order, decoded by the
  pluggable OCR engine.  Page numbers are 0-based and dense, assigned in
  submission (document) order, mirroring the reference's post-parallel
  ordering repair ``data.sort(key=lambda x: x[0])``
  (/root/reference/StudiOCR/OcrEngine.py:124-128); in this design each url
  is assembled within one task so the order is intrinsic.
* blocks keep only tokens passing the non-space filter ``not text.isspace()``
  (empty string kept — /root/reference/StudiOCR/OcrEngine.py:130-135), with
  dense 0-based block ids in insertion order.
* ``extracted_text`` — the byte-identity target — is
  ``"\\n".join(" ".join(block texts of page) for page in pages)``.
"""

from __future__ import annotations

from dataclasses import dataclass

from .html_extract import extract_content, layout_tokens
from .page_stats import build_page_stats, keep_token
from .raster import RasterEngine, validate_config


@dataclass(frozen=True)
class ExtractConfig:
    """OCR/engine config tuple threaded through the pipeline — the
    reference's (oem, psm, best, preprocessing) surface
    (/root/reference/StudiOCR/EditDocWindow.py:609-617; defaults oem=3,
    psm=3, best=True, preprocessing=False per :611,330,313,321)."""

    oem: int = 3
    psm: int = 3
    best: bool = True
    preprocessing: bool = False
    engine: str = "synthetic"

    def __post_init__(self) -> None:
        validate_config(self.oem, self.psm)

    def config_hash(self) -> str:
        import hashlib

        key = f"{self.oem}|{self.psm}|{self.best}|{self.preprocessing}|{self.engine}|v1"
        return hashlib.md5(key.encode()).hexdigest()[:12]


# The four GUI presets, (preprocessing, psm) pairs
# (/root/reference/StudiOCR/EditDocWindow.py:391-411).
PRESETS: dict[str, ExtractConfig] = {
    "screenshot": ExtractConfig(preprocessing=False, psm=3),
    "printed": ExtractConfig(preprocessing=False, psm=3),
    "written_paragraph": ExtractConfig(preprocessing=True, psm=6),
    "written_page": ExtractConfig(preprocessing=True, psm=3),
}


def extract_document(
    url: str,
    html: bytes,
    cfg: ExtractConfig,
    engine: RasterEngine,
    include_stats: bool = False,
) -> dict:
    """Extract one document. Returns the nested doc row (plain python).

    Shape::

        url, n_pages, n_blocks, mean_conf, boilerplate_ratio, extracted_text,
        pages: [ {page, blocks: [{block, left, top, width, height, conf, text}],
                  dropped: [{pos, text}]} ]

    ``dropped`` records the whitespace-only tokens the non-space filter
    removed, with their positions in the page's unfiltered token sequence —
    the minimal extra state that makes the per-page OcrPageData statistics
    (including the G3 char-stats-over-UNFILTERED-tokens asymmetry) exactly
    derivable from the stored row (``page_stats.stats_from_page``). Stats are
    therefore NOT stored (they were ~25% of the output bytes moving through
    the url-hash exchange) — consumers derive them on read. With
    ``include_stats=True`` (the sequential oracle) each page also carries
    ``stats`` computed directly from the raw token arrays, so golden tests
    prove the derive path is exact."""
    content = extract_content(html)

    raw_pages: list[dict[str, list]] = [layout_tokens(content.main_text)]
    for payload in content.raster_payloads:
        raw_pages.append(
            engine.process(
                payload,
                oem=cfg.oem,
                psm=cfg.psm,
                best=cfg.best,
                preprocessing=cfg.preprocessing,
            )
        )

    pages = []
    page_texts: list[str] = []
    n_blocks = 0
    conf_sum = 0
    for page_no, tokens in enumerate(raw_pages):
        blocks = []
        texts = []
        dropped = []
        b = 0
        for i, text in enumerate(tokens["text"]):
            if not keep_token(text):
                dropped.append({"pos": i, "text": text})
                continue
            conf = int(tokens["conf"][i])
            blocks.append(
                {
                    "block": b,
                    "left": int(tokens["left"][i]),
                    "top": int(tokens["top"][i]),
                    "width": int(tokens["width"][i]),
                    "height": int(tokens["height"][i]),
                    "conf": conf,
                    "text": text,
                }
            )
            texts.append(text)
            conf_sum += conf
            b += 1
        n_blocks += b
        page_texts.append(" ".join(texts))
        page = {"page": page_no, "blocks": blocks, "dropped": dropped}
        if include_stats:
            page["stats"] = build_page_stats(tokens)
        pages.append(page)

    text = "\n".join(page_texts)
    return {
        "url": url,
        "n_pages": len(pages),
        "n_blocks": n_blocks,
        "mean_conf": (conf_sum / n_blocks) if n_blocks else 0.0,
        "boilerplate_ratio": content.boilerplate_ratio,
        "n_chars": len(text),
        "extracted_text": text,
        "pages": pages,
    }


def layout_page_row(page_no: int, page_text: str) -> dict:
    """Reconstruct a layout page's full row from its stored text.

    EXACT inverse of the storage elision (schema.py EXTRACTED note): the
    stored page text is ``" ".join(tokens)`` where tokens came from
    ``layout_tokens(main_text)`` — whitespace-normalized, so
    ``layout_tokens(page_text)`` regenerates the identical token list, and
    bbox/conf are pure functions of it.  Layout pages never produce
    whitespace-only tokens, so ``dropped`` is always empty."""
    toks = layout_tokens(page_text)
    blocks = [
        {
            "block": i,
            "left": left,
            "top": top,
            "width": w,
            "height": h,
            "conf": conf,
            "text": t,
        }
        for i, (left, top, w, h, conf, t) in enumerate(
            zip(toks["left"], toks["top"], toks["width"], toks["height"],
                toks["conf"], toks["text"])
        )
    ]
    return {"page": page_no, "blocks": blocks, "dropped": []}


def materialize_pages(
    n_pages: int, extracted_text: str, stored_pages: list[dict] | None
) -> list[dict]:
    """Full ordered page list of a stored doc row: stored (raster) pages as
    recorded, missing page numbers regenerated as layout pages from the
    ``"\\n"``-segmented extracted_text."""
    stored = {int(p["page"]): p for p in (stored_pages or [])}
    if len(stored) == n_pages:
        return [stored[i] for i in range(n_pages)]
    texts = extracted_text.split("\n")
    return [
        stored.get(i) or layout_page_row(i, texts[i]) for i in range(n_pages)
    ]
