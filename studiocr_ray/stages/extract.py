"""Ray Data stages for the extraction pipeline.

Design (SURVEY.md §3.1 "Ours"): one linear Dataset pipeline replaces the
reference's Queue → OcrWorker → multiprocessing.Pool → SQLite-commit chain
(/root/reference/StudiOCR/OcrWorker.py:46-93, OcrEngine.py:97-136).  Each url
is extracted and assembled inside a single actor task, so the reference's
post-parallel ordering repair (``data.sort(key=lambda x: x[0])``,
OcrEngine.py:124) is intrinsic — pages of one url never scatter.  Parallelism
is across urls (billions of rows ≫ cores at target scale) rather than across
pages within one url.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions.document import ExtractConfig, extract_document
from ..functions.raster import make_engine
from ..oracle import dedup_key
from ..schema import EXTRACTED


def url_part(url: str, num_partitions: int) -> int:
    """Deterministic partition id: crc32(url) % P. Stable across runs /
    processes (never use Python hash() — salted per process)."""
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def add_part_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    parts = np.fromiter(
        (url_part(u, num_partitions) for u in batch.column("url").to_pylist()),
        dtype=np.int32,
        count=batch.num_rows,
    )
    return batch.append_column("part", pa.array(parts, pa.int32()))


def keep_first_group(group: pa.Table) -> pa.Table:
    """Per-url keep-first: smallest (warc_ts, html) wins — the analogue of the
    reference's name-collision resolution (OcrEngine.py:112-118), resolved by
    keeping the first crawl instead of mutating the key (SURVEY.md J3/D2)."""
    if group.num_rows == 1:
        return group
    tss = group.column("warc_ts").to_pylist()
    htmls = group.column("html").to_pylist()
    best = min(range(group.num_rows), key=lambda i: dedup_key(tss[i], htmls[i]))
    return group.slice(best, 1)


def dedup_part_group(group: pa.Table) -> pa.Table:
    """Vectorized keep-first dedup within one url-hash partition: sort by
    (url, warc_ts), keep each url's first row. The rare (url, warc_ts) tie is
    resolved by html bytes in a python fallback so the result always matches
    the oracle's (warc_ts, html) rule."""
    import pyarrow.compute as pc

    if group.num_rows <= 1:
        return group
    t = group.sort_by([("url", "ascending"), ("warc_ts", "ascending")])
    urls = t.column("url").combine_chunks()
    prev = urls.slice(0, len(urls) - 1)
    cur = urls.slice(1)
    neq = pc.not_equal(cur, prev)
    first_mask = pa.chunked_array([pa.array([True]), neq]).combine_chunks()

    # detect ties: consecutive rows with equal url AND equal warc_ts
    ts = t.column("warc_ts").combine_chunks()
    ts_eq = pc.equal(ts.slice(1), ts.slice(0, len(ts) - 1))
    tie = pc.and_(pc.invert(neq), ts_eq)
    if pc.any(tie).as_py():
        tied_urls = set(pc.unique(pc.drop_null(
            pc.if_else(tie, cur, pa.scalar(None, pa.string())))).to_pylist())
        keep_rows = []
        seen: dict[str, tuple] = {}
        tss = t.column("warc_ts").to_pylist()
        htmls = t.column("html").to_pylist()
        ulist = urls.to_pylist()
        for i, u in enumerate(ulist):
            if u not in tied_urls:
                continue
            k = dedup_key(tss[i], htmls[i])
            if u not in seen or k < seen[u][0]:
                seen[u] = (k, i)
        winners = {i for _, i in seen.values()}
        mask = [
            (m and u not in tied_urls) or (i in winners)
            for i, (m, u) in enumerate(zip(first_mask.to_pylist(), ulist))
        ]
        first_mask = pa.array(mask, pa.bool_())
    return t.filter(first_mask)


def dedup_keep_first(ds):
    """keep-first url dedup, grouped by the url-hash partition column.

    The groupby("part") is the mandated url-hash exchange before OCR (north
    rule): it co-locates every url's rows (part = crc32(url) % P, so
    duplicate urls always meet) and spreads page-size skew. Grouping by part
    instead of url keeps the group count equal to P — the dedup is a handful
    of vectorized per-partition calls, not one Python call per url — and
    leaves downstream blocks part-contiguous, so the hive-partitioned write
    emits ~1 file per (partition, task) instead of one per (block, part).

    Scale note: this shuffles the html payload column once; size P so one
    input partition (~input_bytes/P) fits a worker (1-4 GB at 100 TB scale).
    """
    return ds.groupby("part").map_groups(dedup_part_group, batch_format="pyarrow")


def dedup_extracted_group(group: pa.Table, metrics_dir: str | None = None) -> pa.Table:
    """Keep-first url dedup over EXTRACTED rows (post-extract mode): one
    vectorized sort by (url, warc_ts, dedup_sha) — the oracle's dedup_key
    order, the 20-byte sha standing in for html bytes — then keep each url's
    first row and drop the carry column.

    With ``metrics_dir`` set, also writes this partition's metric sums as a
    tiny json sidecar (atomic temp+rename, deterministic → retry-idempotent):
    the group fn is the one place every part's final rows pass through, so
    manifest metrics cost zero extra passes over the data."""
    import numpy as np
    import pyarrow.compute as pc

    t = group
    if group.num_rows > 1:
        # Decide winners on a SLIM key table; never sort the nested payload
        # (pyarrow take/sort on list<struct<..list<struct>>> rebuilds offsets
        # per element — measured ~2× the whole exchange's memcpy cost).
        slim = pa.table(
            {
                "url": group.column("url"),
                "warc_ts": group.column("warc_ts"),
                "dedup_sha": group.column("dedup_sha"),
            }
        )
        idx = pc.sort_indices(
            slim,
            sort_keys=[("url", "ascending"), ("warc_ts", "ascending"),
                       ("dedup_sha", "ascending")],
        ).to_numpy(zero_copy_only=False)
        urls = slim.column("url").combine_chunks().take(pa.array(idx))
        first = np.ones(len(idx), dtype=bool)
        first[1:] = pc.not_equal(
            urls.slice(1), urls.slice(0, len(urls) - 1)
        ).to_numpy(zero_copy_only=False)
        if not first.all():
            mask = np.zeros(len(idx), dtype=bool)
            mask[idx[first]] = True  # winners, in original row order
            t = group.filter(pa.array(mask))
    t = t.drop_columns(["dedup_sha"])
    if metrics_dir is not None and t.num_rows:
        import json
        import os

        part = t.column("part")[0].as_py()
        stats = {
            "part": int(part),
            "rows": t.num_rows,
            "blocks": int(pc.sum(t.column("n_blocks")).as_py() or 0),
            "chars": int(pc.sum(t.column("n_chars")).as_py() or 0),
            "errors": t.num_rows - t.column("error").null_count,
            "conf_sum": float(pc.sum(t.column("mean_conf")).as_py() or 0.0),
            "bp_sum": float(pc.sum(t.column("boilerplate_ratio")).as_py() or 0.0),
        }
        os.makedirs(metrics_dir, exist_ok=True)
        path = os.path.join(metrics_dir, f"part-{int(part)}.json")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, path)
    return t


def dedup_extracted(ds, metrics_dir: str | None = None):
    """Post-extract keep-first url dedup + the url-hash exchange.

    The groupby("part") co-locates every url's EXTRACTED rows (part =
    crc32(url) % P, so duplicate urls always meet) and leaves downstream
    blocks part-contiguous for the hive-partitioned write.  Placed AFTER
    extraction so the read→extract stream stays fully pipelined (no barrier
    between the read and the expensive stage) and the exchange moves
    extracted text + spans, not raw html payloads — on real web corpora
    ~10× less data than the pre-extract exchange.  The cost: duplicate urls
    are extracted redundantly before losing the dedup (dup_fraction × extract
    cost); prefer pre-extract mode (`dedup="pre"`) when the duplicate rate is
    high or the per-doc extraction (OCR) dominates."""
    import functools

    fn = functools.partial(dedup_extracted_group, metrics_dir=metrics_dir)
    return ds.groupby("part").map_groups(fn, batch_format="pyarrow")


class ExtractAssemble:
    """Actor-pool map_batches UDF: pages_in rows → nested EXTRACTED rows.

    Class-based so the OCR engine is constructed ONCE per actor (the Ray
    analogue of the reference's warm per-process Tesseract with
    OMP_THREAD_LIMIT=1, /root/reference/StudiOCR/OcrEngine.py:87); use with
    ``map_batches(ExtractAssemble, fn_constructor_kwargs={'cfg': cfg},
    concurrency=N, num_cpus=1, batch_format='pyarrow')``.

    Poison-row quarantine: a row that throws is emitted with ``error`` set and
    empty pages, so one bad page cannot fail a 10^12-row job (SURVEY.md §4).
    """

    def __init__(
        self,
        cfg: ExtractConfig | None = None,
        num_partitions: int = 64,
        carry_dedup_sha: bool = False,
    ):
        self.cfg = cfg or ExtractConfig()
        self.engine = make_engine(self.cfg.engine)
        self.num_partitions = num_partitions
        self.carry_dedup_sha = carry_dedup_sha
        self.schema = EXTRACTED
        if carry_dedup_sha:
            self.schema = EXTRACTED.append(pa.field("dedup_sha", pa.binary()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        has_part = "part" in batch.column_names
        parts = batch.column("part").to_pylist() if has_part else None
        rows = []
        for i, url in enumerate(urls):
            try:
                row = extract_document(url, htmls[i], self.cfg, self.engine)
                row["error"] = None
            except Exception as e:  # quarantine, never fail the job
                row = {
                    "url": url,
                    "n_pages": 0,
                    "n_blocks": 0,
                    "mean_conf": 0.0,
                    "boilerplate_ratio": 0.0,
                    "n_chars": 0,
                    "extracted_text": "",
                    "pages": [],
                    "error": f"{type(e).__name__}: {e}",
                }
            row["warc_ts"] = tss[i]
            row["lang"] = langs[i]
            row["part"] = parts[i] if has_part else url_part(url, self.num_partitions)
            if self.carry_dedup_sha:
                row["dedup_sha"] = hashlib.sha1(htmls[i]).digest()
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=self.schema)


def explode_blocks(batch: pa.Table) -> pa.Table:
    """Nested EXTRACTED rows → flat BLOCKS rows (url, page, block, bbox, conf,
    text), ordered (url-row order, page, block)."""
    from ..schema import BLOCKS

    cols: dict[str, list] = {k: [] for k in BLOCKS.names}
    urls = batch.column("url").to_pylist()
    pages_col = batch.column("pages").to_pylist()
    for url, pages in zip(urls, pages_col):
        for p in pages:
            for b in p["blocks"]:
                cols["url"].append(url)
                cols["page"].append(p["page"])
                for k in ("block", "left", "top", "width", "height", "conf", "text"):
                    cols[k].append(b[k])
    return pa.table(cols, schema=BLOCKS)


def explode_page_stats(batch: pa.Table) -> pa.Table:
    """Nested EXTRACTED rows → flat (url, page, stats) rows; stats are
    DERIVED from the stored blocks+dropped (page_stats.stats_from_page) —
    they are not persisted (schema.py PAGE_STRUCT note)."""
    from ..functions.page_stats import stats_from_page
    from ..schema import PAGE_STATS_STRUCT

    urls_out, pages_out, stats_out = [], [], []
    urls = batch.column("url").to_pylist()
    pages_col = batch.column("pages").to_pylist()
    for url, pages in zip(urls, pages_col):
        for p in pages:
            urls_out.append(url)
            pages_out.append(p["page"])
            stats_out.append(stats_from_page(p))
    return pa.table(
        {
            "url": pa.array(urls_out, pa.string()),
            "page": pa.array(pages_out, pa.int32()),
            "stats": pa.array(stats_out, PAGE_STATS_STRUCT),
        }
    )
