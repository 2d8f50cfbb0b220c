"""Single-process golden oracle — the byte-identity source of truth.

Runs the exact same per-document functions as the distributed pipeline
(``studiocr_ray.functions.document.extract_document``) sequentially over a
pages_in table, applying the same keep-first url dedup rule, with no Ray.
Golden tests assert the full Ray pipeline reproduces this byte-for-byte
per url (mirrors the reference's commit-time invariants:
idx-sorted page order /root/reference/StudiOCR/OcrEngine.py:124, dense
numbering :127-129, non-space block filter :130-135, name-collision
keep-first analogue :112-118)."""

from __future__ import annotations

import pyarrow as pa

from .functions.document import ExtractConfig, extract_document
from .functions.raster import make_engine


def dedup_key(warc_ts, html: bytes) -> tuple:
    """Keep-first rule: per url keep the row with the smallest
    (warc_ts, sha1(html)) — warc_ts is the tiebreak-of-record, the content
    digest a deterministic final tiebreak for pathological equal-ts rows.
    A 20-byte digest (not raw html bytes) so the key can travel through the
    post-extract exchange without shipping payloads."""
    import hashlib

    return (warc_ts, hashlib.sha1(html).digest())


def oracle_extract(pages: pa.Table, cfg: ExtractConfig | None = None) -> list[dict]:
    """Sequential reference extraction. Returns nested doc rows sorted by url."""
    cfg = cfg or ExtractConfig()
    engine = make_engine(cfg.engine)

    best: dict[str, tuple] = {}
    urls = pages.column("url").to_pylist()
    tss = pages.column("warc_ts").to_pylist()
    htmls = pages.column("html").to_pylist()
    langs = pages.column("lang").to_pylist()
    for i, url in enumerate(urls):
        k = dedup_key(tss[i], htmls[i])
        if url not in best or k < best[url][0]:
            best[url] = (k, i)

    out = []
    for url in sorted(best):
        _, i = best[url]
        # include_stats=True: the oracle computes page stats directly from
        # the raw token arrays; the pipeline derives them from blocks+dropped
        # — their equality is the reconstruction proof (see document.py).
        row = extract_document(url, htmls[i], cfg, engine, include_stats=True)
        row["warc_ts"] = tss[i]
        row["lang"] = langs[i]
        out.append(row)
    return out


def oracle_docs_table(pages: pa.Table, cfg: ExtractConfig | None = None) -> pa.Table:
    rows = oracle_extract(pages, cfg)
    from .schema import DOCS

    return pa.table(
        {
            "url": [r["url"] for r in rows],
            "n_pages": [r["n_pages"] for r in rows],
            "extracted_text": [r["extracted_text"] for r in rows],
            "n_blocks": [r["n_blocks"] for r in rows],
            "mean_conf": [r["mean_conf"] for r in rows],
            "boilerplate_ratio": [r["boilerplate_ratio"] for r in rows],
        },
        schema=DOCS,
    )


def oracle_blocks_table(pages: pa.Table, cfg: ExtractConfig | None = None) -> pa.Table:
    rows = oracle_extract(pages, cfg)
    from .schema import BLOCKS

    cols: dict[str, list] = {k: [] for k in BLOCKS.names}
    for r in rows:
        for p in r["pages"]:
            for b in p["blocks"]:
                cols["url"].append(r["url"])
                cols["page"].append(p["page"])
                for k in ("block", "left", "top", "width", "height", "conf", "text"):
                    cols[k].append(b[k])
    return pa.table(cols, schema=BLOCKS)
