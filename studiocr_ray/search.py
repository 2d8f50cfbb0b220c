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


def search_corpus_phrase(index_ds, phrase: str, num_buckets: int = 64):
    """Positional PHRASE search across documents → Dataset of distinct urls
    whose text contains the exact consecutive token sequence on ONE page.

    Beyond the reference's any-word OCR search (ListDocuments.py:206-221):
    index postings already carry each token's layout position (``page``,
    ``block`` — within-page token index, index_pipeline._layout_flat), so
    the classic positional-index intersect answers phrase queries without
    re-reading the corpus.  Tokens match EXACTLY (lowered) — the phrase
    contract is adjacency of whole tokens, not the single-word substring
    rule — and adjacency never crosses a page boundary.

    Scale shape: stage 1 filters index rows to the ≤k distinct query terms
    (``pc.is_in`` over the term column — postings of non-query terms are
    never exploded) and emits one narrow ``(url, page, apos=block-i, qi=i)``
    row per occurrence of query-position i's term.  Stage 2 buckets by a
    url hash; within a bucket one lexsort groups ``(url, page, apos)`` runs
    and a run holding all k positions is a phrase hit at anchor ``apos``.
    The single exchange moves rows ∝ Σ tf(query terms) — the positional
    postings of the query terms alone — and a url's rows land in exactly
    one bucket, so the per-group unique IS the global distinct."""
    import numpy as np

    from .functions.arrowutil import string_buckets

    words = phrase.lower().split()
    k = len(words)
    if k == 0:
        return search_corpus(index_ds, "")
    pos_of: dict[str, list[int]] = {}
    for i, w in enumerate(words):
        pos_of.setdefault(w, []).append(i)
    value_set = pa.array(sorted(pos_of), pa.string())
    EMPTY = pa.table(
        {
            "pbucket": pa.array([], pa.int32()),
            "url": pa.array([], pa.string()),
            "page": pa.array([], pa.int32()),
            "apos": pa.array([], pa.int64()),
        }
    )

    def explode(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch.column("term"), value_set=value_set))
        if hit.num_rows == 0:
            return EMPTY
        posts = hit.column("postings").combine_chunks()
        n = pc.list_value_length(posts).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        flat = posts.flatten()
        urls_list = hit.column("urls").combine_chunks()
        u_off = urls_list.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        u_off = u_off - u_off[0]  # flatten() is rebased to offset 0
        rep = np.repeat(np.arange(hit.num_rows), n)
        url_strings = (
            urls_list.flatten().take(
                pa.array(
                    u_off[rep]
                    + flat.field("url_idx").to_numpy(zero_copy_only=False)
                )
            )
            if len(flat)
            else pa.array([], pa.string())
        )
        pages = flat.field("page")
        blocks = flat.field("block").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        starts = np.concatenate(([0], np.cumsum(n))).astype(np.int64)
        terms = hit.column("term").to_pylist()  # ≤ k×URL_SHARDS rows
        parts = []
        for r, t in enumerate(terms):
            s, e = int(starts[r]), int(starts[r + 1])
            if s == e:
                continue
            u = url_strings.slice(s, e - s)
            for qi in pos_of[t]:
                parts.append(
                    pa.table(
                        {
                            "pbucket": pa.array(
                                string_buckets(u, num_buckets), pa.int32()
                            ),
                            "url": u,
                            "page": pages.slice(s, e - s),
                            "apos": pa.array(blocks[s:e] - qi, pa.int64()),
                        }
                    )
                )
        return pa.concat_tables(parts) if parts else EMPTY

    def matches(group: pa.Table) -> pa.Table:
        d = pc.dictionary_encode(group.column("url").combine_chunks())
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pages = group.column("page").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        apos = group.column("apos").to_numpy(zero_copy_only=False)
        order = np.lexsort((apos, pages, codes))
        c, p, a = codes[order], pages[order], apos[order]
        neq = (c[1:] != c[:-1]) | (p[1:] != p[:-1]) | (a[1:] != a[:-1])
        run_starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        run_len = np.diff(np.concatenate((run_starts, [len(c)])))
        # a (url, page, apos) run holds one row per query position present
        # (qi values are distinct within a run by construction), so
        # run_len == k ⇔ every position matched ⇔ phrase hit at apos
        hit_codes = np.unique(c[run_starts[run_len == k]])
        return pa.table({"url": d.dictionary.take(pa.array(hit_codes))})

    ex = index_ds.map_batches(explode, batch_format="pyarrow")
    return ex.groupby("pbucket").map_groups(matches, batch_format="pyarrow")


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


def search_corpus_all(
    index_ds,
    query: str,
    fuzzy: bool = False,
    tol: int | float = 2,
    num_buckets: int = 64,
):
    """CONJUNCTIVE (ALL-words) search across documents → Dataset of
    distinct urls matching EVERY query word.

    The reference's OCR-mode search is ANY-word
    (/root/reference/StudiOCR/ListDocuments.py:206-221, `break` on first
    hit); AND semantics is the classic postings-intersection twin: a url
    qualifies when, for each query word w_i, SOME term containing w_i
    (same substring — or fuzzy — rule as :func:`search_corpus`) lists it.
    Empty query ⇒ all urls, consistent with ListDocuments.py:210-212.

    Scale shape: per index batch, each query word filters the distinct-
    term dictionary and unions that word's url lists — emitting narrow
    ``(url, wi)`` rows deduplicated within the batch, so the single
    url-hash exchange carries at most |words|·|matched urls| rows, never
    block-level postings.  Per bucket, one lexsort + run scan counts the
    distinct words each url matched; ``== len(words)`` is the verdict.
    A url's rows land in exactly ONE bucket, so the per-bucket verdict
    is the global one (the :func:`distinct_urls_ds` partitioning rule).
    """
    import numpy as np

    from .functions.arrowutil import first_of_run_mask, string_buckets

    words = query.lower().split()
    if not words:
        return search_corpus(index_ds, "")
    n_words = len(words)
    EMPTY = pa.table({"ubucket": pa.array([], pa.int32()),
                      "url": pa.array([], pa.string()),
                      "wi": pa.array([], pa.int8())})

    def word_hits(batch: pa.Table) -> pa.Table:
        outs = []
        for i, w in enumerate(words):
            hit = _match_terms_batch(batch, [w], fuzzy, tol)
            if hit.num_rows == 0:
                continue
            flat = hit.column("urls").combine_chunks().flatten()
            u = pc.unique(flat)
            outs.append(pa.table({
                "url": u,
                "wi": pa.array(np.full(len(u), i, np.int8)),
            }))
        if not outs:
            return EMPTY
        t = pa.concat_tables(outs)
        b = string_buckets(t.column("url"), num_buckets)
        return pa.table({
            "ubucket": pa.array(b, pa.int32()),
            "url": t.column("url"),
            "wi": t.column("wi")})

    def intersect(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string())})
        t = group.sort_by([("url", "ascending"), ("wi", "ascending")])
        urls = t.column("url")
        first_pair = first_of_run_mask([urls, t.column("wi")])
        first_url = first_of_run_mask([urls])
        # distinct words per url = distinct (url, wi) runs per url run
        starts = np.flatnonzero(first_url)
        cnt = np.add.reduceat(first_pair.astype(np.int64), starts)
        keep = starts[cnt == n_words]
        return pa.table({"url": urls.take(pa.array(keep))})

    return (
        index_ds.map_batches(word_hits, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(intersect, batch_format="pyarrow")
    )
