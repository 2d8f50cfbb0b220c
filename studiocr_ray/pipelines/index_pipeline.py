"""Corpus inverted index (SURVEY.md G9): term → sorted postings.

Replaces the reference's O(docs × pages × blocks × words) full-scan search
(/root/reference/StudiOCR/ListDocuments.py:206-221) with a term-keyed index
built by the one deliberate wide shuffle of the engine:

    extracted parquet (url, extracted_text, layout_pages, pages)
      → map_batches(partial_postings)      # explode + PER-BATCH pre-aggregation
                                           #   into (term, url-shard) rows
      → map_batches(add term bucket)       # bucket = crc32(term) % B
      → groupby(bucket, ushard)            # the ONE all-to-all, B×S groups
          .map_groups(merge + direct write)  # each group writes its own
                                             # term-sorted file → row-group
                                             # pushdown, no second shuffle

Pre-aggregation matters at scale: the batch-local combine turns one row per
token occurrence into one row per *distinct term per batch* (a large constant
reduction — stopword-like hot terms would otherwise each ship billions of tiny
rows through the shuffle).  Hot-term skew beyond that is bounded by
``max_postings`` (optional truncation of the stored posting list while df/tf
stay exact — document-frequency ranking stays correct, only deep posting
scans lose recall).

Terms are case-folded with ``str.lower`` (NOT casefold) mirroring the
reference's matching (/root/reference/StudiOCR/ListDocuments.py:204-217);
original-case tokens stay in the blocks table for case-sensitive within-doc
search (/root/reference/StudiOCR/DocWindow.py:357-360).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..functions.arrowutil import crc32_buckets
from ..schema import POSTING_STRUCT

POSTINGS_LIST = pa.list_(POSTING_STRUCT)

# Hot-key salt: each term's postings are split into URL_SHARDS rows keyed by
# crc32(url) % URL_SHARDS, so a stopword-grade term merges as URL_SHARDS
# parallel groups instead of one giant serial one.  Disjoint url sets per
# shard keep df/tf exact under summation; readers union/aggregate the shard
# rows (search unions urls anyway; term_df sums df/tf per term).
URL_SHARDS = 8


def _layout_flat(batch: pa.Table) -> pa.Table | None:
    """Flat (term,url,page,block,conf) rows of the IMPLICIT layout pages,
    exploded straight from ``extracted_text`` — no nested data is read or
    reconstructed.  Page texts are the text's "\\n" segments; token conf is
    the layout rule ``88 + len % 12`` (html_extract.layout_tokens), block
    ids are within-page positions.  All list-offset/numpy arithmetic."""
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    lp = batch.column("layout_pages").combine_chunks()
    lp_counts = pc.list_value_length(lp).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    total_lp = int(lp_counts.sum())
    if total_lp == 0:
        return None
    pt = pc.split_pattern(
        batch.column("extracted_text").combine_chunks(), pattern="\n"
    )
    if isinstance(pt, pa.ChunkedArray):
        pt = pt.combine_chunks()
    doc_idx = np.repeat(np.arange(n), lp_counts)
    lp_flat = lp.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    pt_off = pt.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    pt_off = pt_off - pt_off[0]  # flatten() is rebased to offset 0
    page_texts = pt.flatten().take(pa.array(pt_off[doc_idx] + lp_flat))
    nonempty = pc.not_equal(page_texts, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        keep = pa.array(np.flatnonzero(nonempty))
        page_texts = page_texts.take(keep)
        doc_idx = doc_idx[nonempty]
        lp_flat = lp_flat[nonempty]
    toks = pc.split_pattern(page_texts, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    tok_counts = pc.list_value_length(toks).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    tok_flat = toks.flatten()
    total = len(tok_flat)
    starts = np.concatenate(([0], np.cumsum(tok_counts)[:-1]))
    block = np.arange(total, dtype=np.int64) - np.repeat(starts, tok_counts)
    urls = batch.column("url").combine_chunks()
    return pa.table(
        {
            "term": pc.utf8_lower(tok_flat),
            "url": urls.take(pa.array(np.repeat(doc_idx, tok_counts))),
            "page": pa.array(
                np.repeat(lp_flat, tok_counts).astype(np.int32), pa.int32()
            ),
            "block": pa.array(block.astype(np.int32), pa.int32()),
            "conf": pa.array(
                88
                + pc.utf8_length(tok_flat)
                .to_numpy(zero_copy_only=False)
                .astype(np.int32)
                % 12,
                pa.int32(),
            ),
        }
    )


def partial_postings(batch: pa.Table) -> pa.Table:
    """EXTRACTED rows → per-batch combined (term, ushard, urls, postings, tf).

    Fully vectorized: layout tokens explode straight from extracted_text
    (``_layout_flat``), stored raster pages via Arrow list-offset
    arithmetic, and the within-batch combine is a sort + run-length boundary
    scan. No Python loop touches individual tokens.

    Postings carry ``url_idx`` into the row's distinct-urls list instead of
    repeated url strings: measured 5.7 GB → 3.0 GB through the bucket
    exchange on the 1.2M-doc bench corpus for ~+3s of segment-dictionary
    bookkeeping — roughly wall-neutral on one node, and the all-to-all is
    network-bound on a real cluster where halved bytes is the win."""
    import numpy as np
    import pyarrow.compute as pc

    pages_list = batch.column("pages").combine_chunks()
    n_pages = pc.list_value_length(pages_list).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    page_struct = pages_list.flatten()
    urls = batch.column("url").combine_chunks()
    url_per_page = urls.take(pa.array(np.repeat(np.arange(len(urls)), n_pages)))

    blocks_list = page_struct.field("blocks")
    n_blocks = pc.list_value_length(blocks_list).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    rep = pa.array(np.repeat(np.arange(len(page_struct)), n_blocks))
    block_struct = blocks_list.flatten()

    raster_flat = pa.table(
        {
            "term": pc.utf8_lower(block_struct.field("text")),
            "url": url_per_page.take(rep),
            "page": page_struct.field("page").take(rep),
            "block": block_struct.field("block"),
            "conf": block_struct.field("conf"),
        }
    )
    layout = _layout_flat(batch)
    flat = (
        raster_flat if layout is None
        else pa.concat_tables([layout, raster_flat]).combine_chunks()
    )
    if flat.num_rows == 0:
        return pa.table(
            {"term": pa.array([], pa.string()),
             "ushard": pa.array([], pa.int32()),
             "urls": pa.array([], pa.list_(pa.string())),
             "postings": pa.array([], POSTINGS_LIST),
             "tf": pa.array([], pa.int64())}
        )
    # Group by (term, url-shard) via dictionary codes + one integer argsort —
    # ~2× faster than sorting the term strings; any order works for the
    # combine.  The url shard (crc32(url) % URL_SHARDS, hashed once per
    # DISTINCT url in the batch) is the hot-key salt: a stopword-grade term's
    # postings split into URL_SHARDS independent rows, so the bucket merge
    # parallelizes within the term instead of serializing on it.  Disjoint
    # url sets per shard keep df/tf exact under summation.
    codes_arr = pc.dictionary_encode(flat.column("term")).combine_chunks()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    u_d = pc.dictionary_encode(flat.column("url")).combine_chunks()
    shard_of = crc32_buckets(u_d.dictionary, URL_SHARDS).astype(np.int64)
    ushard = shard_of[u_d.indices.to_numpy(zero_copy_only=False)]
    key = codes * URL_SHARDS + ushard
    order = np.argsort(key, kind="stable")
    flat = flat.take(pa.array(order))
    sorted_key = key[order]
    terms = flat.column("term").combine_chunks()
    bounds = np.flatnonzero(sorted_key[1:] != sorted_key[:-1]) + 1
    if len(terms) >= 2**31:  # int32 ListArray offsets would wrap silently
        raise OverflowError(
            f"{len(terms)} postings in one batch exceed int32 list offsets; "
            "lower batch size or raise num_buckets"
        )
    offsets = np.concatenate(([0], bounds, [len(terms)])).astype(np.int32)
    def _one(col):
        c = col.combine_chunks()
        return c.chunk(0) if isinstance(c, pa.ChunkedArray) else c

    # Per-segment url dictionary: postings carry a 4-byte index into the
    # row's distinct-urls list instead of repeating the url string per token
    # occurrence (schema.py POSTING_STRUCT note).
    tf = np.diff(offsets).astype(np.int64)
    nseg = len(tf)
    ucodes_sorted = u_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)[
        order
    ]
    ndict = len(u_d.dictionary)
    seg_id = np.repeat(np.arange(nseg, dtype=np.int64), tf)
    pairkey = seg_id * ndict + ucodes_sorted
    uniq = np.unique(pairkey)
    seg_starts = np.searchsorted(uniq // ndict, np.arange(nseg))
    url_idx = (np.searchsorted(uniq, pairkey) - seg_starts[seg_id]).astype(
        np.int32
    )
    seg_df = np.diff(np.append(seg_starts, len(uniq)))
    urls_vals = u_d.dictionary.take(pa.array(uniq % ndict))
    urls_offsets = np.concatenate(([0], np.cumsum(seg_df))).astype(np.int32)
    urls_col = pa.ListArray.from_arrays(
        pa.array(urls_offsets, pa.int32()), urls_vals
    )

    posting_struct = pa.StructArray.from_arrays(
        [
            pa.array(url_idx, pa.int32()),
            _one(flat.column("page")),
            _one(flat.column("block")),
            _one(flat.column("conf")),
        ],
        names=["url_idx", "page", "block", "conf"],
    )
    postings = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), posting_struct)
    starts = offsets[:-1].astype(np.int64)
    uniq_terms = terms.take(pa.array(starts))
    return pa.table(
        {
            "term": uniq_terms,
            "ushard": pa.array(
                (sorted_key[starts] % URL_SHARDS).astype(np.int32), pa.int32()
            ),
            "urls": urls_col,
            "postings": postings.cast(POSTINGS_LIST),
            "tf": pa.array(tf),
        }
    )


def _add_term_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """bucket = crc32(term) % B. Bucketing the merge keeps the group count at
    B (a handful of vectorized per-bucket calls) instead of one Python call
    per distinct term — same trick as the extract stage's part-grouped dedup."""
    b = crc32_buckets(batch.column("term"), num_buckets)
    return batch.append_column("bucket", pa.array(b, pa.int32()))


def _merge_bucket_group(group: pa.Table, max_postings: int | None = None) -> pa.Table:
    """Merge ALL terms of one bucket, fully vectorized: flatten every partial
    posting list (term repeated per posting via list-offset arithmetic), one
    sort by (term, url, page, block), then run-length boundaries give each
    term's merged postings / tf / df without touching individual postings in
    Python. Hot terms (stopword-like skew) cost a sort, not a Python loop."""
    import numpy as np
    import pyarrow.compute as pc

    posts_list = group.column("postings").combine_chunks()
    n = pc.list_value_length(posts_list).fill_null(0).to_numpy(zero_copy_only=False)
    terms = group.column("term").combine_chunks()
    rep_np = np.repeat(np.arange(len(terms)), n)
    rep = pa.array(rep_np)
    flat = posts_list.flatten()  # StructArray of postings
    # resolve each posting's url through its row's distinct-urls dictionary
    urls_list = group.column("urls").combine_chunks()
    u_off = urls_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    u_off = u_off - u_off[0]  # flatten() is rebased to offset 0
    url_strings = urls_list.flatten().take(
        pa.array(
            u_off[rep_np]
            + flat.field("url_idx").to_numpy(zero_copy_only=False)
        )
    ) if len(flat) else pa.array([], pa.string())
    ft = pa.table(
        {
            "term": terms.take(rep),
            "url": url_strings,
            "page": flat.field("page"),
            "block": flat.field("block"),
            "conf": flat.field("conf"),
        }
    )
    if ft.num_rows == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64()),
             "urls": pa.array([], pa.list_(pa.string())),
             "postings": pa.array([], POSTINGS_LIST)}
        )
    # One integer lexsort does both the term grouping and the within-term
    # (url, page, block) posting order: strings are dictionary-encoded and
    # replaced by their sorted rank (~2× faster than Arrow's multi-key
    # string sort on tens of millions of postings).
    def _ranks(col):
        d = pc.dictionary_encode(col).combine_chunks()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        dic, codes = d.dictionary, d.indices.to_numpy(zero_copy_only=False)
        rank_of = np.empty(len(dic), dtype=np.int64)
        rank_of[pc.sort_indices(dic).to_numpy(zero_copy_only=False)] = np.arange(
            len(dic)
        )
        return rank_of[codes]

    t_rank = _ranks(ft.column("term"))
    u_rank = _ranks(ft.column("url"))
    order = np.lexsort(
        (
            ft.column("block").to_numpy(zero_copy_only=False),
            ft.column("page").to_numpy(zero_copy_only=False),
            u_rank,
            t_rank,
        )
    )
    ft = ft.take(pa.array(order))
    t_sorted = t_rank[order]
    u_sorted = u_rank[order]
    t = ft.column("term").combine_chunks()
    t_neq = t_sorted[1:] != t_sorted[:-1]
    bounds = np.flatnonzero(t_neq) + 1
    offsets = np.concatenate(([0], bounds, [len(t)])).astype(np.int64)
    tf = np.diff(offsets)
    # df = number of (term, url) runs inside each term segment
    u_neq = u_sorted[1:] != u_sorted[:-1]
    run_start = np.concatenate(([True], t_neq | u_neq)).astype(np.int64)
    df = np.add.reduceat(run_start, offsets[:-1])

    def _one(col):
        c = col.combine_chunks()
        return c.chunk(0) if isinstance(c, pa.ChunkedArray) else c

    # postings reference the per-term urls dictionary by index: the
    # (term,url) run ordinal within the term segment IS the index into the
    # term's sorted distinct-urls list
    run_ord = np.cumsum(run_start) - 1  # global run index per posting
    cum_df = np.concatenate(([0], np.cumsum(df)[:-1]))
    url_idx = (run_ord - np.repeat(cum_df, tf)).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [pa.array(url_idx, pa.int32()), _one(ft.column("page")),
         _one(ft.column("block")), _one(ft.column("conf"))],
        names=["url_idx", "page", "block", "conf"],
    )
    starts = offsets[:-1]
    if max_postings is not None and (tf > max_postings).any():
        lens = np.minimum(tf, max_postings)
        cum = np.cumsum(lens)
        base = np.repeat(starts, lens)
        prev = np.concatenate(([0], cum[:-1]))
        within = np.arange(int(cum[-1])) - np.repeat(prev, lens)
        struct = struct.take(pa.array(base + within))
        list_offsets = np.concatenate(([0], cum))
    else:
        list_offsets = offsets
    if list_offsets[-1] >= 2**31:  # int32 ListArray offsets would wrap silently
        raise OverflowError(
            f"{int(list_offsets[-1])} postings in one term bucket exceed int32 "
            "list offsets; raise num_buckets or set max_postings"
        )
    list_offsets = list_offsets.astype(np.int32)
    postings = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
    uniq_terms = t.take(pa.array(starts))
    # distinct sorted urls per term — the (term,url) run starts the df count
    # already identified.  Search reads ONLY this column (df-sized, ~tf/df×
    # smaller than the postings payload) to resolve matching documents.
    run_idx = np.flatnonzero(run_start)
    url_vals = _one(ft.column("url")).take(pa.array(run_idx))
    url_offsets = np.concatenate(([0], np.cumsum(df))).astype(np.int32)
    urls_col = pa.ListArray.from_arrays(pa.array(url_offsets, pa.int32()), url_vals)
    return pa.table(
        {
            "term": uniq_terms,
            "df": pa.array(df, pa.int64()),
            "tf": pa.array(tf, pa.int64()),
            "urls": urls_col,
            "postings": postings.cast(POSTINGS_LIST),
        }
    )


def _default_num_buckets(input_bytes: int | None = None) -> int:
    """Term-bucket count: 2× cores for merge parallelism, but never more
    groups than the data justifies — a tiny corpus otherwise explodes into
    buckets × URL_SHARDS near-empty files (group-call and file overhead)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8)) \
        if ray.is_initialized() else (os.cpu_count() or 8)
    buckets = max(16, ncpu * 2)
    if input_bytes is not None:
        # ~one (bucket × URL_SHARDS) group per MB of extracted input, min 2
        # buckets — only corpora well under ncpu·shards MB lose parallelism
        by_bytes = max(2, input_bytes // (1 << 20) // URL_SHARDS)
        buckets = min(buckets, by_bytes)
    return buckets


def _bucketed_partials(extracted_ds, num_buckets: int):
    return extracted_ds.map_batches(
        partial_postings, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _add_term_bucket,
        fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _merge_write_bucket_group(
    group: pa.Table, staging_dir: str, max_postings: int | None,
    row_group_size: int = 2048,
) -> pa.Table:
    """Merge one bucket's partials AND write its index file directly.

    ``_merge_bucket_group`` output is already term-sorted within the bucket
    (the lexsort), so writing one small-row-group file per bucket gives
    equally tight per-row-group term min/max stats as a global sort would —
    without a second all-to-all over the postings payload (the round-1 index
    build's single biggest cost).  Write is temp+rename with a deterministic
    bucket-numbered name, so task retries are idempotent.  Returns a tiny
    (bucket, terms, bytes) summary row — only summaries flow back."""
    import pyarrow.parquet as pq

    bucket = int(group.column("bucket")[0].as_py())
    ushard = int(group.column("ushard")[0].as_py())
    t = _merge_bucket_group(
        group.drop_columns(["bucket", "ushard", "tf"]), max_postings
    )
    path = os.path.join(
        staging_dir, f"bucket-{bucket:05d}-{ushard:02d}.parquet"
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(t, tmp, row_group_size=row_group_size)
    os.replace(tmp, path)
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int32()),
            "ushard": pa.array([ushard], pa.int32()),
            "terms": pa.array([t.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        }
    )


def run_index(out_dir: str, index_dir: str | None = None, max_postings: int | None = None) -> dict:
    """Build the index from an extraction output dir: one term-sorted file
    per (term-bucket, url-shard), small row groups → row-group-granular term
    pushdown (search_corpus_indexed).  Exactly ONE all-to-all (the bucket
    exchange); files are staged then atomically moved into place.

    Not safe to run CONCURRENTLY for the same ``index_dir`` (the constant
    staging name is deliberate: it lets a rerun reclaim a crashed build's
    leftovers instead of leaking them)."""
    import functools
    import shutil
    import time

    from .extract_pipeline import read_extracted

    t0 = time.perf_counter()
    index_dir = index_dir or os.path.join(out_dir, "index")
    # constant staging name: a crashed build's leftovers are reclaimed by
    # the next run instead of leaking one pid-suffixed dir per failure
    staging = f"{index_dir}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    try:
        ds = read_extracted(
            out_dir,
            columns=["url", "extracted_text", "layout_pages", "pages"],
        )

        parts_dir = os.path.join(out_dir, "parts")
        input_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(parts_dir)
            for f in files
            if f.endswith(".parquet")
        )
        num_buckets = _default_num_buckets(input_bytes)
        partials = _bucketed_partials(ds, num_buckets)
        write_fn = functools.partial(
            _merge_write_bucket_group, staging_dir=staging,
            max_postings=max_postings,
        )
        summaries = partials.groupby(["bucket", "ushard"]).map_groups(
            write_fn, batch_format="pyarrow"
        ).take_all()
        # index rows are (term, url-shard); a term can span shards, so the
        # row count is reported as term_rows, not distinct terms
        n_rows = sum(int(r["terms"]) for r in summaries)
        _write_index_meta(staging, num_buckets, max_postings)
        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir)
        os.replace(staging, index_dir)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {"index_dir": index_dir, "term_rows": n_rows,
            "files": len(summaries),
            "elapsed_sec": time.perf_counter() - t0}


_INDEX_META = "_index_meta.json"


def _write_index_meta(d: str, num_buckets: int, max_postings: int | None) -> None:
    """Build parameters an incremental update must reuse: term buckets and
    the truncation limit must match or updated files would key the same
    term differently than untouched ones."""
    import json

    with open(os.path.join(d, _INDEX_META), "w") as f:
        json.dump({"num_buckets": num_buckets, "url_shards": URL_SHARDS,
                   "max_postings": max_postings}, f)


def _load_index_meta(index_dir: str) -> dict:
    import json

    try:
        with open(os.path.join(index_dir, _INDEX_META)) as f:
            return json.load(f)
    except (OSError, ValueError):
        # pre-meta index dir: the build parameters are unknowable — in
        # particular whether max_postings truncation was applied, and a
        # re-merge of truncated postings silently under-counts df/tf.
        # num_buckets=0 forces update_index's full_rebuild branch, which is
        # the contract its docstring promises for legacy indexes.
        return {"num_buckets": 0, "url_shards": URL_SHARDS,
                "max_postings": None, "meta_missing": True}


def index_dataset(index_dir: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(index_dir, columns=columns)


def _old_rows_to_partials(batch: pa.Table, ushard: int, part_set: frozenset,
                          num_partitions: int) -> pa.Table:
    """Merged index rows → partial-shaped rows with every posting belonging
    to an affected extract partition REMOVED (those urls' new content
    re-enters through the delta partials; disjointness keeps df/tf exact).

    Vectorized: one crc32 per DISTINCT url in the batch decides keep/drop;
    rows whose url lists survive intact pass through untouched (the common
    case — appends touch few partitions); dropped urls trigger one
    offset-arithmetic rebuild of the batch's posting lists."""
    import numpy as np
    import pyarrow.compute as pc

    empty = pa.table(
        {"term": pa.array([], pa.string()),
         "ushard": pa.array([], pa.int32()),
         "urls": pa.array([], pa.list_(pa.string())),
         "postings": pa.array([], POSTINGS_LIST),
         "tf": pa.array([], pa.int64())}
    )
    if batch.num_rows == 0:
        return empty

    def partial_of(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "term": t.column("term"),
                "ushard": pa.array(np.full(n, ushard, np.int32), pa.int32()),
                "urls": t.column("urls"),
                "postings": t.column("postings"),
                "tf": t.column("tf"),
            }
        )

    urls_list = batch.column("urls").combine_chunks()
    u_flat = urls_list.flatten()
    u_d = pc.dictionary_encode(u_flat)
    keep_dict = ~np.isin(
        crc32_buckets(u_d.dictionary, num_partitions),
        np.fromiter(part_set, np.int32, count=len(part_set)),
    )
    keep_u = keep_dict[u_d.indices.to_numpy(zero_copy_only=False)]
    if keep_u.all():
        return partial_of(batch)

    u_off = urls_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    u_off = u_off - u_off[0]
    # exclusive prefix of kept urls: new local index + per-row kept counts
    pref = np.concatenate(([0], np.cumsum(keep_u)))
    posts_list = batch.column("postings").combine_chunks()
    p_counts = pc.list_value_length(posts_list).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    struct = posts_list.flatten()
    rep = np.repeat(np.arange(batch.num_rows), p_counts)
    g = u_off[rep] + struct.field("url_idx").to_numpy(zero_copy_only=False)
    keep_p = keep_u[g]
    new_url_idx = (pref[g] - pref[u_off[rep]]).astype(np.int32)
    kept_struct = pa.StructArray.from_arrays(
        [
            pa.array(new_url_idx[keep_p], pa.int32()),
            struct.field("page").filter(pa.array(keep_p)),
            struct.field("block").filter(pa.array(keep_p)),
            struct.field("conf").filter(pa.array(keep_p)),
        ],
        names=["url_idx", "page", "block", "conf"],
    )
    # per-row kept posting counts via reduceat-free prefix diffs
    ppref = np.concatenate(([0], np.cumsum(keep_p)))
    p_off = np.concatenate(([0], np.cumsum(p_counts))).astype(np.int64)
    new_tf = (ppref[p_off[1:]] - ppref[p_off[:-1]]).astype(np.int64)
    new_ucnt = pref[u_off[1:]] - pref[u_off[:-1]]
    new_urls = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(new_ucnt))).astype(np.int32),
                 pa.int32()),
        u_flat.filter(pa.array(keep_u)),
    )
    new_posts = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(new_tf))).astype(np.int32),
                 pa.int32()),
        kept_struct,
    )
    out = pa.table(
        {
            "term": batch.column("term"),
            "ushard": pa.array(
                np.full(batch.num_rows, ushard, np.int32), pa.int32()
            ),
            "urls": new_urls,
            "postings": new_posts.cast(POSTINGS_LIST),
            "tf": pa.array(new_tf, pa.int64()),
        }
    )
    nz = new_tf > 0
    return out if nz.all() else out.filter(pa.array(nz))


def update_index(out_dir: str, parts: list[int],
                 index_dir: str | None = None) -> dict:
    """Incrementally refresh the index after ``append_extract`` touched
    ``parts`` (its returned ``"parts"`` list) — the index-side half of the
    reference's add-document flow (/root/reference/StudiOCR/OcrEngine.py:
    108-110 adds pages; ListDocuments search sees them immediately).

    Because extract partitions are ``crc32(url) % P`` and index files are
    sharded by ``crc32(url) % URL_SHARDS`` with ``URL_SHARDS | P``, an
    appended partition maps to exactly ONE url shard: only that shard's
    ``bucket-*-SS`` files are rebuilt (old rows minus affected-url postings,
    plus delta partials from ONLY the affected partitions), and the merge
    is deterministic, so the result is file-identical to a full
    ``run_index`` — at the cost of |affected shards|/URL_SHARDS of the
    index plus the delta, not the whole corpus.  Untouched files carry over
    as hard links into a staged dir swapped atomically (same crash contract
    as run_index).  Falls back to a full rebuild when URL_SHARDS does not
    divide P, the index predates sharded meta, or the index was built with
    ``max_postings`` truncation (truncated postings are lossy — a re-merge
    from them would under-count df/tf)."""
    import functools
    import shutil
    import time

    import ray.data as rd

    from ..state.manifest import load_meta
    from .extract_pipeline import part_dir

    t0 = time.perf_counter()
    index_dir = index_dir or os.path.join(out_dir, "index")
    meta = load_meta(out_dir)
    if not meta:
        raise ValueError(f"{out_dir} has no _meta.json — run run_extract first")
    num_partitions = int(meta["num_partitions"])
    imeta = _load_index_meta(index_dir) if os.path.isdir(index_dir) else {}
    num_buckets = int(imeta.get("num_buckets") or 0)
    if (
        not os.path.isdir(index_dir)
        or num_buckets <= 0
        or num_partitions % URL_SHARDS != 0
        or imeta.get("url_shards") != URL_SHARDS
        # truncated indexes are lossy: stored postings can't re-derive the
        # exact df/tf a re-merge needs, so incremental would shrink them
        or imeta.get("max_postings") is not None
    ):
        res = run_index(out_dir, index_dir=index_dir,
                        max_postings=imeta.get("max_postings"))
        res["mode"] = "full_rebuild"
        return res

    part_set = frozenset(int(p) for p in parts)
    if not part_set:
        return {"index_dir": index_dir, "mode": "noop", "files_rebuilt": 0,
                "elapsed_sec": time.perf_counter() - t0}
    shards = sorted({p % URL_SHARDS for p in part_set})
    max_postings = imeta.get("max_postings")

    old_files = [
        n for n in sorted(os.listdir(index_dir))
        if n.startswith("bucket-") and n.endswith(".parquet")
    ]
    affected = [
        n for n in old_files
        if int(n[:-8].rsplit("-", 1)[1]) in shards
    ]

    staging = f"{index_dir}.update-staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    try:
        partial_sets = []
        for s in shards:
            files = [os.path.join(index_dir, n) for n in affected
                     if int(n[:-8].rsplit("-", 1)[1]) == s]
            if files:
                partial_sets.append(
                    rd.read_parquet(files).map_batches(
                        _old_rows_to_partials,
                        fn_kwargs={"ushard": s, "part_set": part_set,
                                   "num_partitions": num_partitions},
                        batch_format="pyarrow",
                    ).map_batches(
                        _add_term_bucket,
                        fn_kwargs={"num_buckets": num_buckets},
                        batch_format="pyarrow",
                    )
                )
        # read_parquet with an explicit path list wants files, not dirs
        delta_files = [
            os.path.join(d, f)
            for p in sorted(part_set)
            if os.path.isdir(d := part_dir(out_dir, p))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        if delta_files:
            delta = rd.read_parquet(
                delta_files,
                columns=["url", "extracted_text", "layout_pages", "pages"],
            )
            partial_sets.append(_bucketed_partials(delta, num_buckets))
        if not partial_sets:
            return {"index_dir": index_dir, "mode": "noop",
                    "files_rebuilt": 0,
                    "elapsed_sec": time.perf_counter() - t0}
        partials = partial_sets[0]
        for extra in partial_sets[1:]:
            partials = partials.union(extra)
        write_fn = functools.partial(
            _merge_write_bucket_group, staging_dir=staging,
            max_postings=max_postings,
        )
        summaries = partials.groupby(["bucket", "ushard"]).map_groups(
            write_fn, batch_format="pyarrow"
        ).take_all()
        # untouched shards carry over as hard links; the swap is the same
        # rmtree+replace as run_index
        for n in old_files:
            if n not in affected:
                os.link(os.path.join(index_dir, n), os.path.join(staging, n))
        _write_index_meta(staging, num_buckets, max_postings)
        shutil.rmtree(index_dir)
        os.replace(staging, index_dir)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {
        "index_dir": index_dir,
        "mode": "incremental",
        "shards": shards,
        "files_rebuilt": len(summaries),
        "files_linked": len(old_files) - len(affected),
        "elapsed_sec": time.perf_counter() - t0,
    }
