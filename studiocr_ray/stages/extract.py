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

from ..functions.arrowutil import crc32_buckets
from ..functions.document import ExtractConfig, extract_document  # noqa: F401 — oracle parity reference
from ..functions.html_extract import extract_content, layout_tokens
from ..functions.raster import make_engine
from ..oracle import dedup_key
from ..schema import BLOCK_STRUCT, DROPPED_STRUCT, EXTRACTED, PAGE_STRUCT


def url_part(url: str, num_partitions: int) -> int:
    """Deterministic partition id: crc32(url) % P. Stable across runs /
    processes (never use Python hash() — salted per process)."""
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def add_part_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    parts = crc32_buckets(batch.column("url"), num_partitions)
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
        # integer conf total (Σ per-token conf) recovered exactly from the
        # per-doc means: mean_conf*n_blocks is an integer up to fp rounding,
        # so rint is exact — keeps corpus mean_conf_block = conf_total/blocks
        # a single deterministic division (SQL-oracle-able).
        mc = t.column("mean_conf").to_numpy(zero_copy_only=False)
        nb = t.column("n_blocks").to_numpy(zero_copy_only=False)
        stats = {
            "part": int(part),
            "rows": t.num_rows,
            "blocks": int(pc.sum(t.column("n_blocks")).as_py() or 0),
            "chars": int(pc.sum(t.column("n_chars")).as_py() or 0),
            "errors": t.num_rows - t.column("error").null_count,
            "conf_sum": float(pc.sum(t.column("mean_conf")).as_py() or 0.0),
            "conf_total": int(np.rint(mc * nb).sum()),
            "bp_sum": float(pc.sum(t.column("boilerplate_ratio")).as_py() or 0.0),
            # J3/D2 collision metric (SURVEY): duplicate-url rows dropped by
            # keep-first, recorded instead of mutating the key
            # (/root/reference/StudiOCR/OcrEngine.py:112-118 semantics).
            "duplicates": group.num_rows - t.num_rows,
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
        """Columnar assembly: extraction appends into flat per-level python
        lists (block / dropped / page / doc) and the nested Arrow arrays are
        built ONCE per batch from those lists + offset arrays — no per-row
        dicts, no ``from_pylist`` of nested rows, and the pass-through columns
        (url, warc_ts, lang, part) are reused zero-copy from the input batch.
        Extraction semantics are THE ones defined by
        ``functions.document.extract_document`` (the sequential oracle);
        byte-identity between the two paths is asserted by the golden tests.
        """
        import hashlib

        htmls = batch.column("html").to_pylist()
        cfg, engine = self.cfg, self.engine

        # doc level
        n_pages_a: list[int] = []
        n_blocks_a: list[int] = []
        mean_conf_a: list[float] = []
        bp_a: list[float] = []
        n_chars_a: list[int] = []
        text_a: list[str] = []
        err_a: list[str | None] = []
        doc_off = [0]
        # page level
        page_no_a: list[int] = []
        blk_off = [0]
        drop_off = [0]
        # block level (flat across the batch)
        b_id: list[int] = []
        b_left: list[int] = []
        b_top: list[int] = []
        b_w: list[int] = []
        b_h: list[int] = []
        b_conf: list[int] = []
        b_text: list[str] = []
        # dropped level (flat)
        d_pos: list[int] = []
        d_text: list[str] = []
        # implicit layout page numbers per doc ([0] normally, [] on error)
        layout_a: list[list[int]] = []

        for html in htmls:
            try:
                content = extract_content(html)
                raw_pages = [layout_tokens(content.main_text)]
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
                for t in raw_pages:  # shape check before any accumulation
                    if len(t["text"]) != len(t["conf"]):
                        raise ValueError("engine output length mismatch")
            except Exception as e:  # quarantine, never fail the job
                n_pages_a.append(0)
                n_blocks_a.append(0)
                mean_conf_a.append(0.0)
                bp_a.append(0.0)
                n_chars_a.append(0)
                text_a.append("")
                err_a.append(f"{type(e).__name__}: {e}")
                doc_off.append(len(page_no_a))
                layout_a.append([])
                continue
            page_texts: list[str] = []
            doc_blocks = 0
            conf_sum = 0
            for page_no, tokens in enumerate(raw_pages):
                texts = tokens["text"]
                if page_no == 0:
                    # Layout page: fully derivable from its text
                    # (materialize_pages), so it is NOT stored — only its
                    # stats fold into the doc aggregates.  layout_tokens
                    # never emits whitespace-only tokens (split() tokens),
                    # so every token is kept and contributes conf.
                    confs = tokens["conf"]
                    conf_sum += sum(confs)
                    doc_blocks += len(texts)
                    page_texts.append(" ".join(texts))
                    continue
                # Raster page: stored verbatim.  The reference's non-space
                # filter keeps ``not t.isspace()`` ('' kept —
                # /root/reference/StudiOCR/OcrEngine.py:130-135).
                drops = [i for i, t in enumerate(texts) if t.isspace()]
                if drops:
                    for i in drops:
                        d_pos.append(i)
                        d_text.append(texts[i])
                    keep = [i for i, t in enumerate(texts) if not t.isspace()]
                    kept_texts = [texts[i] for i in keep]
                    b_left.extend(tokens["left"][i] for i in keep)
                    b_top.extend(tokens["top"][i] for i in keep)
                    b_w.extend(tokens["width"][i] for i in keep)
                    b_h.extend(tokens["height"][i] for i in keep)
                    kept_confs = [int(tokens["conf"][i]) for i in keep]
                else:
                    kept_texts = texts
                    b_left.extend(tokens["left"])
                    b_top.extend(tokens["top"])
                    b_w.extend(tokens["width"])
                    b_h.extend(tokens["height"])
                    kept_confs = [int(c) for c in tokens["conf"]]
                nk = len(kept_texts)
                b_id.extend(range(nk))
                b_conf.extend(kept_confs)
                b_text.extend(kept_texts)
                conf_sum += sum(kept_confs)
                doc_blocks += nk
                page_texts.append(" ".join(kept_texts))
                page_no_a.append(page_no)
                blk_off.append(len(b_text))
                drop_off.append(len(d_text))
            doc_off.append(len(page_no_a))
            layout_a.append([0])
            text = "\n".join(page_texts)
            n_pages_a.append(len(raw_pages))
            n_blocks_a.append(doc_blocks)
            mean_conf_a.append((conf_sum / doc_blocks) if doc_blocks else 0.0)
            bp_a.append(content.boilerplate_ratio)
            n_chars_a.append(len(text))
            text_a.append(text)
            err_a.append(None)

        blocks_struct = pa.StructArray.from_arrays(
            [
                pa.array(b_id, pa.int32()),
                pa.array(b_left, pa.int32()),
                pa.array(b_top, pa.int32()),
                pa.array(b_w, pa.int32()),
                pa.array(b_h, pa.int32()),
                pa.array(b_conf, pa.int32()),
                pa.array(b_text, pa.string()),
            ],
            fields=list(BLOCK_STRUCT),
        )
        dropped_struct = pa.StructArray.from_arrays(
            [pa.array(d_pos, pa.int32()), pa.array(d_text, pa.string())],
            fields=list(DROPPED_STRUCT),
        )
        page_struct = pa.StructArray.from_arrays(
            [
                pa.array(page_no_a, pa.int32()),
                pa.ListArray.from_arrays(pa.array(blk_off, pa.int32()), blocks_struct),
                pa.ListArray.from_arrays(pa.array(drop_off, pa.int32()), dropped_struct),
            ],
            fields=list(PAGE_STRUCT),
        )
        pages_list = pa.ListArray.from_arrays(pa.array(doc_off, pa.int32()), page_struct)

        if "part" in batch.column_names:
            part_col = batch.column("part")
        else:
            part_col = pa.array(
                crc32_buckets(batch.column("url"), self.num_partitions),
                pa.int32(),
            )
        cols: dict = {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "part": part_col,
            "n_pages": pa.array(n_pages_a, pa.int32()),
            "n_blocks": pa.array(n_blocks_a, pa.int64()),
            "mean_conf": pa.array(mean_conf_a, pa.float64()),
            "boilerplate_ratio": pa.array(bp_a, pa.float64()),
            "n_chars": pa.array(n_chars_a, pa.int64()),
            "extracted_text": pa.array(text_a, pa.string()),
            "layout_pages": pa.array(layout_a, pa.list_(pa.int32())),
            "pages": pages_list.cast(self.schema.field("pages").type),
            "error": pa.array(err_a, pa.string()),
        }
        if self.carry_dedup_sha:
            cols["dedup_sha"] = pa.array(
                [hashlib.sha1(h).digest() for h in htmls], pa.binary()
            )
        return pa.table(cols, schema=self.schema)


def _full_pages_iter(batch: pa.Table):
    """(url, full page list) per row — stored raster pages + regenerated
    layout pages (functions.document.materialize_pages)."""
    from ..functions.document import materialize_pages

    for url, n_pages, text, pages in zip(
        batch.column("url").to_pylist(),
        batch.column("n_pages").to_pylist(),
        batch.column("extracted_text").to_pylist(),
        batch.column("pages").to_pylist(),
    ):
        yield url, materialize_pages(int(n_pages), text, pages)


# columns a batch must carry for _full_pages_iter
PAGES_READ_COLUMNS = ["url", "n_pages", "extracted_text", "pages"]


def explode_blocks(batch: pa.Table) -> pa.Table:
    """Nested EXTRACTED rows → flat BLOCKS rows (url, page, block, bbox, conf,
    text), ordered (url-row order, page, block)."""
    from ..schema import BLOCKS

    cols: dict[str, list] = {k: [] for k in BLOCKS.names}
    for url, pages in _full_pages_iter(batch):
        for p in pages:
            for b in p["blocks"]:
                cols["url"].append(url)
                cols["page"].append(p["page"])
                for k in ("block", "left", "top", "width", "height", "conf", "text"):
                    cols[k].append(b[k])
    return pa.table(cols, schema=BLOCKS)


def explode_page_stats(batch: pa.Table) -> pa.Table:
    """Nested EXTRACTED rows → flat (url, page, stats) rows; stats are
    DERIVED from the stored/reconstructed blocks+dropped
    (page_stats.stats_from_page) — they are not persisted (schema.py
    PAGE_STRUCT note)."""
    from ..functions.page_stats import stats_from_page
    from ..schema import PAGE_STATS_STRUCT

    urls_out, pages_out, stats_out = [], [], []
    for url, pages in _full_pages_iter(batch):
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
