"""Search over the extracted corpus — the reference's two granularities.

Across documents (``ListDocuments.update_filter``,
/root/reference/StudiOCR/ListDocuments.py:194-223):

* DOC mode — case-insensitive substring on the document key (:203-205);
* OCR mode — lowercase the query, whitespace-split into words, a document
  matches if ANY word is a **substring** of any block's lowered text
  (:206-221); empty query matches all documents (:210-212).

Because the index is keyed by distinct lowered terms, substring-of-token
hits (query ``corn`` → token ``cornfield``) are answered by a vectorized
substring scan over the *distinct-term dictionary* (``pc.match_substring``
over index terms — millions of terms, not trillions of blocks), then a
postings union.  Fuzzy mode replaces the substring predicate with the
levenshtein rule of ``zero_one_loss`` (≤3-char terms exact,
Image_Preprocessing_Optimization/CustomFunctions.py:66-77).

Within a document (``DocWindow.exec_filter``,
/root/reference/StudiOCR/DocWindow.py:328-374): optional case sensitivity
(raw vs ``.lower()`` on BOTH sides, :357-367), ALL matching blocks per page,
pages in order (:352,372-373), confidence buckets for highlighting
(:221-227), first-match page = min matching page (:339-345).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .functions.textfns import conf_bucket, fuzzy_match


def _match_terms_batch(
    batch: pa.Table, words: list[str], fuzzy: bool, tol: int | float
) -> pa.Table:
    """Filter an index batch to terms matching ANY query word."""
    if not words:
        return batch
    terms = batch.column("term")
    if fuzzy:
        tl = terms.to_pylist()
        mask = pa.array(
            [any(fuzzy_match(t, w, tol) for w in words) for t in tl], pa.bool_()
        )
    else:
        mask = None
        for w in words:
            m = pc.match_substring(terms, w)
            mask = m if mask is None else pc.or_(mask, m)
    return batch.filter(mask)


def distinct_urls_ds(ds, num_buckets: int = 64):
    """Dataset-side distinct over a (url) dataset: bucket by a vectorized
    url-suffix hash % B, one vectorized sort + neighbor scan per bucket — B
    groups, never one Python call per url and never a driver-side
    collection.  Result is unsorted across buckets (callers sort their final
    small output if they need order)."""
    from .functions.arrowutil import first_of_run_mask, string_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = string_buckets(batch.column("url"), num_buckets)
        return batch.append_column("ubucket", pa.array(b, pa.int32()))

    def uniq(group: pa.Table) -> pa.Table:
        t = group.sort_by([("url", "ascending")])
        first = first_of_run_mask([t.column("url")])
        return t.filter(pa.array(first)).drop_columns(["ubucket"])

    return ds.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "ubucket"
    ).map_groups(uniq, batch_format="pyarrow")


def search_corpus(
    index_ds,
    query: str,
    fuzzy: bool = False,
    tol: int | float = 2,
):
    """OCR-mode search across documents → Dataset of distinct matching urls.

    ``index_ds``: Dataset over the INDEX schema. Empty query ⇒ all urls
    (ListDocuments.py:210-212). Returns a lazy ``ray.data.Dataset`` with one
    ``url`` column — a stopword query can match the whole corpus, so the
    result is never collected here (consume with write/iter, or ``to_pandas``
    on known-small results)."""
    words = query.lower().split()

    def matched_urls(batch: pa.Table) -> pa.Table:
        hit = _match_terms_batch(batch, words, fuzzy, tol)
        # the per-row distinct-url list (df-sized) answers search without
        # touching the block-level postings payload
        flat = hit.column("urls").combine_chunks().flatten()
        return pa.table({"url": pc.unique(flat)})

    ds = index_ds.map_batches(matched_urls, batch_format="pyarrow")
    return distinct_urls_ds(ds)


def search_corpus_indexed(
    index_dir: str,
    query: str,
    fuzzy: bool = False,
    tol: int | float = 2,
):
    """Two-phase search against the term-SORTED on-disk index (each
    bucket-shard file is written term-sorted with small row groups —
    SURVEY.md §7.3 "term-ordered files → pushdown lookups"):

    1. scan only the ``term`` column (the dictionary — tiny next to the
       postings) to resolve the substring/fuzzy predicate to exact terms;
    2. re-read with a ``term isin matched`` pyarrow filter — term-sorted row
       groups (per bucket file) give tight min/max statistics, so parquet
       reads only the row groups containing matches instead of the whole
       postings column.

    Matches ``search_corpus`` row-for-row (asserted in tests); empty query ⇒
    all urls (ListDocuments.py:210-212).  Returns a lazy Dataset of distinct
    urls (see ``search_corpus``)."""
    import ray.data as rd

    words = query.lower().split()
    # the index dir has O(buckets × shards) small files; without a block cap
    # each becomes its own read task and per-task overhead dominates the
    # (tiny) term-column scan
    terms_ds = rd.read_parquet(
        index_dir, columns=["term"], override_num_blocks=8
    )
    if words:
        # the distinct-term dictionary is tiny next to the postings; collect
        # the matched terms only (bounded by vocabulary, not corpus)
        mdf = terms_ds.map_batches(
            lambda b: _match_terms_batch(b, words, fuzzy, tol),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()
        # index rows are (term, url-shard): the same term appears once per
        # shard file — dedupe before building the pushdown filter
        matched = sorted(set(mdf["term"])) if "term" in mdf.columns else []
        if not matched:
            return rd.from_arrow(pa.table({"url": pa.array([], pa.string())}))
        import pyarrow.dataset as pads

        posts = rd.read_parquet(
            index_dir,
            columns=["urls"],
            filter=pads.field("term").isin(matched),
            override_num_blocks=32,
        )
    else:
        posts = rd.read_parquet(index_dir, columns=["urls"], override_num_blocks=32)

    def urls_of(batch: pa.Table) -> pa.Table:
        flat = batch.column("urls").combine_chunks().flatten()
        return pa.table({"url": pc.unique(flat)})

    ds = posts.map_batches(urls_of, batch_format="pyarrow")
    return distinct_urls_ds(ds)


def search_doc_names(docs_ds, query: str):
    """DOC-mode search: case-insensitive substring on url
    (ListDocuments.py:203-205). Returns a lazy Dataset of distinct urls."""
    q = query.lower()

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(pc.utf8_lower(batch.column("url")), q)
        return batch.filter(mask).select(["url"])

    return distinct_urls_ds(docs_ds.map_batches(f, batch_format="pyarrow"))


def search_in_document(
    blocks: pa.Table,
    query: str,
    case_sensitive: bool = False,
    fuzzy: bool = False,
    tol: int | float = 2,
) -> dict:
    """Within-document search over one url's blocks table (already small:
    one document), DocWindow.exec_filter semantics.

    Returns ``{"pages": {page -> [block rows + bucket]}, "first_match_page",
    "matched_pages"}``; empty query ⇒ no matches (DocWindow.py:347-350)."""
    words = (query if case_sensitive else query.lower()).split()
    result: dict[int, list[dict]] = {}
    if words:
        texts = blocks.column("text")
        hay = texts if case_sensitive else pc.utf8_lower(texts)
        if fuzzy:
            # levenshtein predicate is inherently per-value; evaluate it once
            # per DISTINCT block text (dictionary encode) — input is one
            # document's blocks by contract, so even the distinct set is small
            import numpy as np

            d = pc.dictionary_encode(
                hay.combine_chunks() if isinstance(hay, pa.ChunkedArray)
                else hay
            )
            hit = np.fromiter(
                (any(fuzzy_match(v, w, tol) for w in words)
                 for v in d.dictionary.to_pylist()),
                dtype=bool,
                count=len(d.dictionary),
            )
            matched = pa.array(
                hit[d.indices.to_numpy(zero_copy_only=False)], pa.bool_()
            )
        else:
            matched = None
            for w in words:
                m = pc.match_substring(hay, w)
                matched = m if matched is None else pc.or_(matched, m)
        sub = blocks.filter(matched)
        pages = sub.column("page").to_pylist()
        for p, r in zip(pages, sub.to_pylist()):
            r["bucket"] = conf_bucket(r["conf"])
            result.setdefault(p, []).append(r)
    matched_pages = sorted(result)
    return {
        "pages": {p: result[p] for p in matched_pages},
        "matched_pages": matched_pages,
        "first_match_page": matched_pages[0] if matched_pages else None,
    }


def doc_blocks(out_dir: str, url: str) -> pa.Table:
    """Point lookup of one document's blocks (the reference's FK traversal,
    /root/reference/StudiOCR/ListDocuments.py:143 + backrefs db.py:48,61):
    parquet read filtered to the url's partition + row groups."""
    import ray.data as rd

    from .stages.extract import explode_blocks, url_part
    from .state.manifest import part_dir

    import json
    import os

    with open(os.path.join(out_dir, "_meta.json")) as f:
        num_partitions = json.load(f)["num_partitions"]
    pdir = part_dir(out_dir, url_part(url, num_partitions))
    from .stages.extract import PAGES_READ_COLUMNS

    ds = rd.read_parquet(pdir, columns=PAGES_READ_COLUMNS)
    ds = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("url"), url)), batch_format="pyarrow"
    )
    tables = [explode_blocks(b) for b in ds.iter_batches(batch_format="pyarrow")]
    from .schema import BLOCKS

    if not tables:
        return pa.table({k: [] for k in BLOCKS.names}, schema=BLOCKS)
    return pa.concat_tables(tables)
