"""Corpus inverted index (SURVEY.md G9): term → sorted postings.

Replaces the reference's O(docs × pages × blocks × words) full-scan search
(/root/reference/StudiOCR/ListDocuments.py:206-221) with a term-keyed index
built by the one deliberate wide shuffle of the engine:

    extracted parquet (url, pages — column-pruned read)
      → map_batches(partial_postings)     # explode + PER-BATCH pre-aggregation
      → groupby(term).map_groups(merge)   # the all-to-all exchange
      → sort(term) → write_parquet        # term-ordered files → pushdown lookups

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

from ..schema import POSTING_STRUCT

POSTINGS_LIST = pa.list_(POSTING_STRUCT)


def partial_postings(batch: pa.Table) -> pa.Table:
    """Nested EXTRACTED rows → per-batch combined (term, postings, df, tf)."""
    acc: dict[str, list[dict]] = {}
    urls = batch.column("url").to_pylist()
    pages_col = batch.column("pages").to_pylist()
    for url, pages in zip(urls, pages_col):
        for p in pages:
            page_no = p["page"]
            for b in p["blocks"]:
                acc.setdefault(b["text"].lower(), []).append(
                    {"url": url, "page": page_no, "block": b["block"], "conf": b["conf"]}
                )
    terms = sorted(acc)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "postings": pa.array([acc[t] for t in terms], POSTINGS_LIST),
            "tf": pa.array([len(acc[t]) for t in terms], pa.int64()),
        }
    )


def _merge_term_group(group: pa.Table, max_postings: int | None = None) -> pa.Table:
    term = group.column("term")[0].as_py()
    posts: list[dict] = []
    for chunk in group.column("postings").to_pylist():
        posts.extend(chunk)
    posts.sort(key=lambda p: (p["url"], p["page"], p["block"]))
    df = len({p["url"] for p in posts})
    tf = len(posts)
    if max_postings is not None and tf > max_postings:
        posts = posts[:max_postings]
    return pa.table(
        {
            "term": pa.array([term], pa.string()),
            "df": pa.array([df], pa.int64()),
            "tf": pa.array([tf], pa.int64()),
            "postings": pa.array([posts], POSTINGS_LIST),
        }
    )


def build_index_dataset(extracted_ds, max_postings: int | None = None):
    partials = extracted_ds.map_batches(
        partial_postings, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = partials.groupby("term").map_groups(
        lambda g: _merge_term_group(g, max_postings), batch_format="pyarrow"
    )
    return merged


def run_index(out_dir: str, index_dir: str | None = None, max_postings: int | None = None) -> dict:
    """Build the index from an extraction output dir and write it term-sorted."""
    import time

    from .extract_pipeline import read_extracted

    t0 = time.perf_counter()
    index_dir = index_dir or os.path.join(out_dir, "index")
    ds = read_extracted(out_dir, columns=["url", "pages"])
    idx = build_index_dataset(ds, max_postings=max_postings).sort("term")
    idx.write_parquet(index_dir)
    import pyarrow.parquet as pq

    n_terms = sum(
        pq.ParquetFile(os.path.join(index_dir, f)).metadata.num_rows
        for f in os.listdir(index_dir)
        if f.endswith(".parquet")
    )
    return {"index_dir": index_dir, "terms": n_terms,
            "elapsed_sec": time.perf_counter() - t0}


def index_dataset(index_dir: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(index_dir, columns=columns)
