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
    batch; domain-hash-bucketed merge."""
    from ..functions.arrowutil import string_buckets
    from .relational import _dict_encode

    def partial(batch: pa.Table) -> pa.Table:
        dom = domain_of(batch.column(url_col)).fill_null("")
        d = _dict_encode(dom)
        counts = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table(
            {"db": pa.array(string_buckets(d.dictionary, 64), pa.int32()),
             "domain": d.dictionary, "cnt": pa.array(counts, pa.int64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        # a big crawl has 10^7-10^8 distinct domains — merge by domain-hash
        # bucket (cf. relational.word_count), not a groupby("domain")
        # string-key sort shuffle
        d = _dict_encode(group.column("domain"))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("cnt").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        ).astype(np.int64)
        return pa.table(
            {"domain": d.dictionary, "cnt": pa.array(cnt, pa.int64())}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "db"
    ).map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

_PRE_RE = r"^(?P<pre>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(?P<rest>[\s\S]*)$"


def canonical_urls(url_arr) -> pa.Array:
    """Canonical form of absolute http(s) urls, the crawl-frontier /
    dedup-key normalization:

    1. scheme + host lowered (path/query case preserved)
    2. default ports stripped (``:80`` http, ``:443`` https)
    3. fragment dropped
    4. ``utm_*`` query params dropped; remaining params sorted bytewise
    5. repeated ``//`` in the path collapsed; trailing slashes stripped;
       empty path → ``/``

    Non-absolute inputs (no ``scheme://``) pass through unchanged.  All
    Arrow kernels; the within-url param sort is ONE Arrow table sort over
    (row, param) — no per-row Python."""
    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    ex = pc.extract_regex(url_arr, _PRE_RE)
    pre = pc.struct_field(ex, "pre")
    rest = pc.struct_field(ex, "rest")
    absolute = pc.is_valid(pre)

    pre_l = pc.utf8_lower(pre.fill_null(""))
    pre_l = pc.replace_substring_regex(
        pre_l, r"^(http://[^:/?#]+):80$", r"\1"
    )
    pre_l = pc.replace_substring_regex(
        pre_l, r"^(https://[^:/?#]+):443$", r"\1"
    )

    rest = pc.replace_substring_regex(rest.fill_null(""), r"#[\s\S]*$", "")
    ex2 = pc.extract_regex(rest, r"^(?P<path>[^?]*)(?:\?(?P<q>[\s\S]*))?$")
    path = pc.struct_field(ex2, "path").fill_null("")
    q = pc.struct_field(ex2, "q").fill_null("")

    path = pc.replace_substring_regex(path, r"/{2,}", "/")
    path = pc.replace_substring_regex(path, r"^([\s\S]*[^/])/+$", r"\1")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)

    # query params: split → drop '' and utm_* → per-row bytewise sort →
    # rejoin.  The sort is one Arrow sort_by over (row_idx, param).
    parts = pc.split_pattern(q, "&")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lens = pc.list_value_length(parts).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    flat = parts.flatten()
    row_idx = np.repeat(np.arange(len(url_arr), dtype=np.int64), lens)
    keep = pc.and_(
        pc.not_equal(flat, ""),
        pc.invert(pc.match_substring_regex(flat, r"^utm_")),
    ).to_numpy(zero_copy_only=False)
    kidx = np.flatnonzero(keep)
    flat = flat.take(pa.array(kidx))
    row_idx = row_idx[keep]
    srt = pa.table(
        {"r": pa.array(row_idx), "p": flat}
    ).sort_by([("r", "ascending"), ("p", "ascending")])
    counts = np.bincount(
        srt.column("r").to_numpy(zero_copy_only=False),
        minlength=len(url_arr),
    ) if srt.num_rows else np.zeros(len(url_arr), np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    from .dedup import _flat_arr

    qlist = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), _flat_arr(srt.column("p"))
    )
    qs = pc.binary_join(qlist, "&")
    canon = pc.binary_join_element_wise(
        pre_l,
        path,
        pc.if_else(
            pc.not_equal(qs, ""),
            pc.binary_join_element_wise("?", qs, ""),
            pa.scalar(""),
        ),
        "",
    )
    return pc.if_else(absolute, canon, url_arr)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Stateless map_batches wrapper: append ``out_col`` with the canonical
    form of ``url_col``.  No shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, canonical_urls(batch.column(url_col))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def anchor_texts(
    links_ds,
    href_col: str = "href",
    anchor_col: str = "anchor",
    num_buckets: int = 32,
    sep: str = " | ",
):
    """Per-target anchor-text rollup → ``(href, n_links, anchors)`` with
    ``anchors`` = bytewise-sorted anchor texts joined by ``sep`` — the
    incoming-anchor-text document enrichment of web search indexing
    (anchors describe the TARGET page better than its own body).

    Scale shape: href-hash bucketed (B groups, not per-target Python); the
    per-bucket rollup is ONE Arrow sort + run scan, and the string concat
    is a rebuilt ListArray + ``pc.binary_join`` — no per-row Python.  Rows
    moved are (href, anchor) pairs only."""
    from ..functions.arrowutil import first_of_run_mask, string_buckets
    from .dedup import _flat_arr

    def add_bucket(batch: pa.Table) -> pa.Table:
        wb = string_buckets(batch.column(href_col), num_buckets)
        return pa.table(
            {
                "wb": pa.array(wb, pa.int32()),
                href_col: batch.column(href_col),
                anchor_col: batch.column(anchor_col),
            }
        )

    def rollup(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [(href_col, "ascending"), (anchor_col, "ascending")]
        )
        first = first_of_run_mask([t.column(href_col)])
        starts = np.flatnonzero(first)
        ends = np.concatenate((starts[1:], [t.num_rows]))
        offsets = np.concatenate((starts, [t.num_rows]))
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), _flat_arr(t.column(anchor_col))
        )
        return pa.table(
            {
                href_col: _flat_arr(t.column(href_col)).take(
                    pa.array(starts)
                ),
                "n_links": pa.array(ends - starts, pa.int64()),
                "anchors": pc.binary_join(lst, sep),
            }
        )

    return links_ds.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "wb"
    ).map_groups(rollup, batch_format="pyarrow")


_TAG_RE = re.compile(r"</?([a-zA-Z][a-zA-Z0-9]*)")


def template_stats(ds, html_col: str = "html"):
    """Page-template detection: the md5 of a page's HTML TAG SEQUENCE
    (attributes and text stripped — pages sharing a DOM skeleton share the
    hash) → ``(template_md5, n_pages)`` frequency table, the
    boilerplate/template-clustering signal scrapers use to route
    extractors.

    Tag extraction is the same documented per-row-findall exception as
    :func:`extract_links` (Arrow has no extract-ALL kernel); everything
    downstream is the engine's bucketed-count shape: per-batch
    value_counts partial, md5-hash-bucketed merge (template cardinality
    ≪ page count, but unbounded — never a groupby over the raw md5
    strings)."""
    import hashlib

    from ..functions.arrowutil import string_buckets
    from .relational import _dict_encode

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(html_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = pc.cast(col, pa.string())
        sigs = [
            hashlib.md5(
                ",".join(t.lower() for t in _TAG_RE.findall(page or ""))
                .encode()
            ).hexdigest()
            for page in col.to_pylist()
        ]
        d = _dict_encode(pa.array(sigs, pa.string()))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table(
            {"tb": pa.array(string_buckets(d.dictionary, 64), pa.int32()),
             "template_md5": d.dictionary,
             "n_pages": pa.array(cnt, pa.int64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("template_md5"))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("n_pages").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        ).astype(np.int64)
        return pa.table(
            {"template_md5": d.dictionary,
             "n_pages": pa.array(cnt, pa.int64())}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "tb"
    ).map_groups(merge, batch_format="pyarrow")
