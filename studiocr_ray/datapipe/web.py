"""Web-graph operators over HTML page columns: link/anchor extraction and
domain aggregation.

The extraction tier's pages table carries raw ``html`` (binary) per url
(cf. reference StudiOCR's per-document page payloads,
``/root/reference/db.py`` OcrPage.image — here the payload is HTML, the
graft's web-native analogue).  Link extraction is the webgraph primitive:
``(page, href, anchor_text)`` edges feed crawl frontiers, PageRank-style
quality priors, and anchor-text indexing.

Scale shape: stateless ``map_batches`` — each page's links are emitted in
the same task that read the page, no shuffle; the downstream domain rollup
is a vocabulary-bounded (distinct domains) partial-aggregate + small
groupby, the same shape as ``relational.word_count``.

Arrow has no extract-ALL regex kernel (``pc.extract_regex`` returns only
the first match), so the per-row findall uses ONE module-compiled regex
over Python strings — documented exception to the no-row-loops rule, same
trade as ``pii.py``; everything around it (id repeat, flattening, domain
parse, rollup) is Arrow/numpy."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# href + anchor text of each <a> tag.  Single quotes or double quotes,
# lazy anchor body; RE2 (DuckDB oracle) and Python re agree on this
# pattern class — no backrefs, no lookaround.
_LINK_RE = re.compile(r"""<a\s[^>]*href=["']([^"']*)["'][^>]*>(.*?)</a>""")

# scheme://host prefix → host; anything non-absolute (path-relative href)
# yields null.
_DOMAIN_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def extract_links(
    ds, html_col: str = "html", id_col: str = "url"
) -> "object":
    """``(id, href, anchor)`` rows for every ``<a href>`` in every page —
    one row per link, pages with no links emit nothing.

    Returns the mapped Dataset (lazy).  The per-batch flat output keeps
    link rows in the block of the page that produced them."""

    def links(batch: pa.Table) -> pa.Table:
        col = batch.column(html_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = pc.cast(col, pa.string())
        ids = batch.column(id_col)
        hrefs: list[str] = []
        anchors: list[str] = []
        counts = np.empty(batch.num_rows, dtype=np.int64)
        for i, page in enumerate(col.to_pylist()):
            m = _LINK_RE.findall(page) if page else []
            counts[i] = len(m)
            for h, a in m:
                hrefs.append(h)
                anchors.append(a)
        idx = np.repeat(np.arange(batch.num_rows), counts)
        return pa.table(
            {
                id_col: ids.take(pa.array(idx)),
                "href": pa.array(hrefs, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )

    return ds.map_batches(links, batch_format="pyarrow")


def domain_of(url_arr) -> pa.Array:
    """Vectorized host extraction: ``pc.extract_regex`` (first match — a
    url has one scheme prefix); non-absolute urls → null."""
    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    ex = pc.extract_regex(
        pc.utf8_lower(url_arr), _DOMAIN_RE.replace("(", "(?P<d>", 1)
    )
    return pc.struct_field(ex, "d")


def domain_counts(ds, url_col: str = "href"):
    """Links (or pages) per domain → ``(domain, cnt)``; relative hrefs
    are counted under domain ``''`` (kept — at crawl scale the
    relative/absolute split is itself a signal).  Partial bincount per
    batch, vocabulary-bounded shuffle."""

    from ray.data.aggregate import Sum

    from .relational import _dict_encode

    def partial(batch: pa.Table) -> pa.Table:
        dom = domain_of(batch.column(url_col)).fill_null("")
        d = _dict_encode(dom)
        counts = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table(
            {"domain": d.dictionary, "cnt": pa.array(counts, pa.int64())}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "domain"
    ).aggregate(Sum("cnt", alias_name="cnt"))
