"""The flagship extraction pipeline: pages_in parquet → extracted parquet.

Stage graph (all lazy, streaming, backpressured)::

    read_parquet(columns=url,warc_ts,html,lang)     # column-pruned read
      → map_batches(add_part)                        # part = crc32(url) % P
      → [resume filter: drop complete partitions]    # vectorized mask
      → map_batches(ExtractAssemble, actor pool)     # html strip + OCR decode
      → repartition → groupby(part).map_groups       # url-hash exchange +
                                                     #   keep-first dedup
      → write_parquet(staging, partition_cols=part)  # hive layout
      → move parts into place, write manifests       # manifest-last atomicity

The url-hash exchange defaults to AFTER extraction (dedup="post": streaming
read→extract with no barrier; the shuffle moves extracted rows, not html);
dedup="pre" places it before extraction (dedup first, extract once per url —
for high duplicate rates or OCR-dominated cost).

Replaces the reference's per-document Pool fan-out + single-writer SQLite txn
(/root/reference/StudiOCR/OcrWorker.py:74-83, OcrEngine.py:97-136) with
streamed, partition-atomic parquet writes.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.document import ExtractConfig
from ..stages.extract import (
    ExtractAssemble,
    add_part_column,
    dedup_keep_first,
    explode_blocks,
    explode_page_stats,
)
from ..state.manifest import (
    load_complete_parts,
    load_manifests,
    manifest_path,
    part_dir,
    write_manifest,
    write_meta,
)

INPUT_COLUMNS = ["url", "warc_ts", "html", "lang"]


def build_extracted(
    input_path: str,
    cfg: ExtractConfig | None = None,
    num_partitions: int = 64,
    skip_parts: set[int] | None = None,
    dedup: bool | str = True,
    concurrency=None,
    batch_size: int = 128,
    metrics_dir: str | None = None,
    quarantine_dir: str | None = None,
):
    """Build the lazy EXTRACTED dataset (no writes)."""
    import ray

    from ..sources.pages import read_pages

    cfg = cfg or ExtractConfig()
    ncpu = int(
        ray.cluster_resources().get("CPU", os.cpu_count() or 8)
        if ray.is_initialized()
        else (os.cpu_count() or 8)
    )
    # Read into ~3 blocks per core (see _read_num_blocks): Ray's default
    # read splits to ≥200 blocks regardless of size, and the downstream
    # all-to-all's cost grows with block-count², not bytes. Malformed rows
    # (null/bad url, null html/warc_ts) go to the quarantine sink (S3
    # input-gatekeeping analogue, SURVEY.md §2.1).
    ds = read_pages(
        input_path,
        quarantine_dir=quarantine_dir,
        override_num_blocks=_read_num_blocks(input_path, ncpu),
    )
    ds = ds.map_batches(
        add_part_column,
        fn_kwargs={"num_partitions": num_partitions},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if skip_parts:
        skip = pa.array(sorted(skip_parts), pa.int32())

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.is_in(batch.column("part"), skip)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)
    from ..stages.extract import dedup_extracted

    mode = {True: "post", False: None}.get(dedup, dedup)
    if mode == "pre":
        # url-hash exchange of the RAW input before extraction: dedup first,
        # extract each url once. Wins when the duplicate rate is high or the
        # per-doc extraction (OCR) dominates; costs a pipeline barrier before
        # the expensive stage and ships html payloads through the shuffle.
        ds = dedup_keep_first(ds)
    if concurrency is None:
        # fixed-size pool: Ray's autoscaling actor pool ramps too slowly for
        # short jobs (observed ~5 concurrent actors on a 32-cpu 10s run);
        # ncpu-2 leaves headroom for the read/shuffle/write stages
        concurrency = max(2, ncpu - 2)
    ds = ds.map_batches(
        ExtractAssemble,
        fn_constructor_kwargs={
            "cfg": cfg,
            "num_partitions": num_partitions,
            "carry_dedup_sha": mode == "post",
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    if mode == "post":
        # Default: url-hash exchange AFTER extraction. read→extract streams
        # with no barrier, and the shuffle moves extracted text+spans, not
        # html payloads (~10× lighter on real web corpora). Duplicate urls
        # are extracted redundantly before the keep-first drops them — cheap
        # at crawl-typical dup rates; switch to dedup="pre" otherwise.
        ds = dedup_extracted(ds, metrics_dir=metrics_dir)
    return ds


def _read_num_blocks(input_path: str, ncpu: int) -> int:
    """Block count for the input read: max(3× cores, compressed_bytes /
    target block size) — enough blocks that the actor pool dispatches ~3
    waves of tasks (load balance), few enough that the part exchange stays
    off the quadratic block-count cliff (the same exchange measured 141s at
    ~208 blocks vs 15s at ≤96 on a 250MB input). At 100 TB the byte cap,
    not the core count, sets the count."""
    total = 0
    paths = [input_path] if isinstance(input_path, str) else list(input_path)
    for p in paths:
        if os.path.isdir(p):
            for root, _, names in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, n))
                    for n in names
                    if n.endswith(".parquet")
                )
        elif os.path.isfile(p):
            total += os.path.getsize(p)
    target = rd.DataContext.get_current().target_max_block_size or (128 << 20)
    return max(3 * ncpu, -(-total // target))


def _load_metric_sidecars(sidecar_dir: str) -> dict[int, dict]:
    """Per-part metric sums written by the dedup group fn (tiny jsons)."""
    import json

    out: dict[int, dict] = {}
    if not os.path.isdir(sidecar_dir):
        return out
    for name in os.listdir(sidecar_dir):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                with open(os.path.join(sidecar_dir, name)) as f:
                    m = json.load(f)
                out[int(m["part"])] = m
            except (OSError, ValueError, KeyError):
                continue
    return out


def _partition_metrics(staging: str) -> dict[int, dict]:
    """Per-partition metric sums from the staged output: one parallel,
    column-pruned read with per-batch partial aggregation (no text or nested
    columns leave the workers beyond P small rows per batch)."""
    import pandas as pd

    if not os.path.isdir(staging) or not os.listdir(staging):
        return {}
    ds = rd.read_parquet(
        staging,
        columns=["part", "n_blocks", "mean_conf", "boilerplate_ratio",
                 "n_chars", "error"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "part": pc.cast(batch.column("part"), pa.int32()).to_pandas(),
                "blocks": batch.column("n_blocks").to_pandas(),
                "conf_sum": batch.column("mean_conf").to_pandas(),
                "bp_sum": batch.column("boilerplate_ratio").to_pandas(),
                "chars": batch.column("n_chars").to_pandas(),
                "errors": batch.column("error").to_pandas().notna().astype("int64"),
            }
        )
        g = df.groupby("part", as_index=False).agg(
            rows=("blocks", "size"), blocks=("blocks", "sum"),
            chars=("chars", "sum"), errors=("errors", "sum"),
            conf_sum=("conf_sum", "sum"), bp_sum=("bp_sum", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts_df = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts_df.empty:
        return {}
    agg = parts_df.groupby("part").sum()
    return {int(p): row.to_dict() for p, row in agg.iterrows()}


def run_extract(
    input_path: str,
    out_dir: str,
    cfg: ExtractConfig | None = None,
    num_partitions: int = 64,
    resume: bool = True,
    dedup: bool | str = True,
    concurrency=None,
    batch_size: int = 128,
) -> dict:
    """Run extraction end-to-end with partition-granular resume.

    Returns a summary dict (docs, blocks, elapsed, parts computed/skipped)."""
    cfg = cfg or ExtractConfig()
    chash = cfg.config_hash()
    t0 = time.perf_counter()

    # Refuse a silent re-bucketing: rerunning into an out_dir that was built
    # with a different num_partitions would mix two crc32 moduli (point
    # lookups would then read the wrong partition and return empty).
    from ..state.manifest import load_meta

    meta = load_meta(out_dir)
    if meta and int(meta.get("num_partitions", num_partitions)) != num_partitions:
        raise ValueError(
            f"out_dir {out_dir} was built with num_partitions="
            f"{meta.get('num_partitions')}, got {num_partitions}; use the "
            "original value, a fresh out_dir, or invalidate_parts() first"
        )
    done = (
        load_complete_parts(out_dir, chash, num_partitions=num_partitions,
                            input_path=str(input_path))
        if resume
        else set()
    )
    scheduled = [p for p in range(num_partitions) if p not in done]
    summary = {
        "config_hash": chash,
        "num_partitions": num_partitions,
        "parts_skipped": len(done),
        "parts_computed": len(scheduled),
    }
    if not scheduled:
        summary.update(elapsed_sec=0.0, docs=0, blocks=0)
        return summary

    staging = os.path.join(out_dir, f"_staging-{os.getpid()}")
    if os.path.isdir(staging):
        shutil.rmtree(staging)

    sidecar_dir = os.path.join(staging, "_metrics")
    ds = build_extracted(
        input_path,
        cfg,
        num_partitions=num_partitions,
        skip_parts=done,
        dedup=dedup,
        concurrency=concurrency,
        batch_size=batch_size,
        metrics_dir=sidecar_dir,
        quarantine_dir=os.path.join(out_dir, "quarantine"),
    )
    ds.write_parquet(staging, partition_cols=["part"])
    t_write = time.perf_counter()

    # Promote each staged partition, then write its manifest (manifest-last).
    # Metrics come from the per-part sidecars the dedup group fn wrote (zero
    # extra passes); fall back to one parallel column-pruned read of the
    # staged output when sidecars are absent (dedup="pre" / dedup=False).
    part_stats = _load_metric_sidecars(sidecar_dir)
    if not part_stats:
        part_stats = _partition_metrics(staging)
    t_metrics = time.perf_counter()
    total_docs = total_blocks = 0
    for part in scheduled:
        src = os.path.join(staging, f"part={part}")
        dst = part_dir(out_dir, part)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        files = []
        st = part_stats.get(part, {})
        rows = int(st.get("rows", 0))
        blocks = int(st.get("blocks", 0))
        chars = int(st.get("chars", 0))
        errors = int(st.get("errors", 0))
        duplicates = int(st.get("duplicates", 0))
        conf_sum = float(st.get("conf_sum", 0.0))
        conf_total = int(st.get("conf_total", 0))
        bp_sum = float(st.get("bp_sum", 0.0))
        if os.path.isdir(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
            for name in sorted(os.listdir(dst)):
                if name.endswith(".parquet"):
                    fp = os.path.join(dst, name)
                    files.append({"name": name, "bytes": os.path.getsize(fp)})
        write_manifest(
            out_dir,
            part,
            {
                "part": part,
                "status": "complete",
                "config_hash": chash,
                "num_partitions": num_partitions,
                "input_path": str(input_path),
                "files": files,
                "metrics": {
                    "docs": rows,
                    "blocks": blocks,
                    "chars": chars,
                    "errors": errors,
                    "duplicates": duplicates,
                    "conf_total": conf_total,
                    "mean_conf": (conf_sum / rows) if rows else 0.0,
                    "mean_boilerplate_ratio": (bp_sum / rows) if rows else 0.0,
                    "chars_per_doc": (chars / rows) if rows else 0.0,
                },
            },
        )
        total_docs += rows
        total_blocks += blocks
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    write_meta(
        out_dir,
        {
            "config_hash": chash,
            "num_partitions": num_partitions,
            "input_path": str(input_path),
        },
    )
    t_end = time.perf_counter()
    summary.update(
        elapsed_sec=t_end - t0,
        docs=total_docs,
        blocks=total_blocks,
        phase_sec={
            "extract_write": round(t_write - t0, 3),
            "metrics": round(t_metrics - t_write, 3),
            "promote": round(t_end - t_metrics, 3),
        },
    )
    return summary


def read_extracted(out_dir: str, columns: list[str] | None = None):
    """Read the nested extracted table back (column-pruned).

    Block count is capped by bytes, NOT by the partition-dir file count: the
    hive layout has O(num_partitions) small files, Ray's default read splits
    to ≥200 blocks regardless, and any downstream all-to-all (the index
    build's bucket exchange) pays the block-count² cliff (measured 141s at
    ~208 blocks vs 15s at ≤96 for the same bytes)."""
    import ray

    ncpu = int(
        ray.cluster_resources().get("CPU", os.cpu_count() or 8)
        if ray.is_initialized()
        else (os.cpu_count() or 8)
    )
    path = os.path.join(out_dir, "parts")
    return rd.read_parquet(
        path,
        columns=columns,
        override_num_blocks=_read_num_blocks(path, ncpu),
    )


def docs_dataset(out_dir: str):
    return read_extracted(
        out_dir,
        columns=["url", "n_pages", "extracted_text", "n_blocks", "mean_conf",
                 "boilerplate_ratio"],
    )


def blocks_dataset(out_dir: str):
    from ..stages.extract import PAGES_READ_COLUMNS

    ds = read_extracted(out_dir, columns=PAGES_READ_COLUMNS)
    return ds.map_batches(explode_blocks, batch_format="pyarrow")


def _list_col(t: pa.Table, name: str) -> pa.ListArray:
    c = t.column(name)
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _list_lens(arr) -> "np.ndarray":
    import numpy as np
    import pyarrow.compute as pc

    return (
        pc.list_value_length(arr).fill_null(0)
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )


def _concat_list_rows(la, va, lb, vb) -> pa.ListArray:
    """Element-wise concat of two list columns given per-row lengths and
    flattened values (null rows = empty).  One vectorized index build + one
    take — Arrow has no list-concat kernel."""
    import numpy as np

    tot = la + lb
    out_off = np.zeros(len(tot) + 1, np.int64)
    np.cumsum(tot, out=out_off[1:])
    r = np.arange(int(tot.sum()), dtype=np.int64) - np.repeat(out_off[:-1], tot)
    la_rep = np.repeat(la, tot)
    in_a = r < la_rep
    a_start = np.cumsum(la) - la
    b_start = np.cumsum(lb) - lb
    src = np.where(
        in_a,
        np.repeat(a_start, tot) + r,
        len(va) + np.repeat(b_start, tot) + (r - la_rep),
    )
    vals = pa.concat_arrays([va, vb]).take(pa.array(src, pa.int64()))
    return pa.ListArray.from_arrays(
        pa.array(out_off, pa.int32()), vals
    )


def _merge_matched(old_hit: pa.Table, new_hit: pa.Table) -> pa.Table:
    """Vectorized merge of re-crawled docs onto their live rows (the hot
    half of ``_merge_append_part``: every matched url on a full re-crawl).

    Per matched url, one of three outcomes — old crawl errored (0 pages):
    the new row REPLACES it (appending onto empty text would leave a phantom
    leading "\\n" segment misaligning ``layout_pages``); new crawl errored:
    the old row stays untouched; else pages/layout positions of the new
    crawl append with ``page`` offset by the old ``n_pages`` and the
    doc-level text/blocks/conf/boilerplate recompute.  All three paths are
    Arrow/numpy kernels — no per-row Python, so a re-crawl touching every
    url in a partition merges at memory bandwidth."""
    import numpy as np
    import pyarrow.compute as pc

    from ..schema import PAGE_STRUCT

    n = old_hit.num_rows
    # align new rows to old order (urls are unique per partition post-dedup)
    align = pc.index_in(
        old_hit.column("url").combine_chunks(),
        value_set=new_hit.column("url").combine_chunks(),
    )
    new_a = new_hit.take(align)

    off = old_hit.column("n_pages").to_numpy(zero_copy_only=False).astype(np.int64)
    nnp = new_a.column("n_pages").to_numpy(zero_copy_only=False).astype(np.int64)
    replace = off == 0
    keep_old = (~replace) & (nnp == 0)
    merge = (~replace) & (~keep_old)
    mi = np.flatnonzero(merge)
    m_old = old_hit.take(pa.array(mi))
    m_new = new_a.take(pa.array(mi))
    m_off = off[mi]
    m_nnp = nnp[mi]

    # --- merged-row columns (dense over merge rows) ---
    ob = m_old.column("n_blocks").to_numpy(zero_copy_only=False).astype(np.int64)
    nb = m_new.column("n_blocks").to_numpy(zero_copy_only=False).astype(np.int64)
    omc = m_old.column("mean_conf").to_numpy(zero_copy_only=False)
    nmc = m_new.column("mean_conf").to_numpy(zero_copy_only=False)
    conf_tot = np.rint(omc * ob) + np.rint(nmc * nb)
    tb = (ob + nb).astype(np.float64)
    mean_conf = np.divide(conf_tot, tb, out=np.zeros_like(tb), where=tb > 0)
    obr = m_old.column("boilerplate_ratio").to_numpy(zero_copy_only=False)
    nbr = m_new.column("boilerplate_ratio").to_numpy(zero_copy_only=False)
    boiler = (obr * m_off + nbr * m_nnp) / (m_off + m_nnp)
    text = pc.binary_join_element_wise(
        m_old.column("extracted_text").combine_chunks(),
        m_new.column("extracted_text").combine_chunks(),
        "\n",
    )
    # layout positions of the new crawl shift by the old page count
    lp_old = _list_col(m_old, "layout_pages")
    lp_new = _list_col(m_new, "layout_pages")
    lp_new_lens = _list_lens(lp_new)
    lp_new_vals = pc.add(
        lp_new.flatten(),
        pa.array(np.repeat(m_off, lp_new_lens), pa.int32()),
    )
    layout_pages = _concat_list_rows(
        _list_lens(lp_old), lp_old.flatten(), lp_new_lens, lp_new_vals
    )
    # stored (raster) pages: new crawl's page numbers shift likewise; the
    # nested blocks/dropped children pass through untouched
    pg_old = _list_col(m_old, "pages")
    pg_new = _list_col(m_new, "pages")
    pg_new_lens = _list_lens(pg_new)
    pg_new_flat = pg_new.flatten()
    pg_new_vals = pa.StructArray.from_arrays(
        [
            pc.add(
                pg_new_flat.field("page"),
                pa.array(np.repeat(m_off, pg_new_lens), pa.int32()),
            ),
            pg_new_flat.field("blocks"),
            pg_new_flat.field("dropped"),
        ],
        fields=list(PAGE_STRUCT),
    )
    pages = _concat_list_rows(
        _list_lens(pg_old), pg_old.flatten(), pg_new_lens, pg_new_vals
    )
    m_cols = {
        "n_pages": pa.array(m_off + m_nnp, pa.int32()),
        "n_blocks": pa.array(ob + nb, pa.int64()),
        "mean_conf": pa.array(mean_conf, pa.float64()),
        "boilerplate_ratio": pa.array(boiler, pa.float64()),
        "extracted_text": text,
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "layout_pages": layout_pages,
        "pages": pages,
        "error": pa.array([None] * len(mi), pa.string()),
    }

    # --- assemble in old_hit order: pool = [old | new | merged], one take
    # per column ---
    dense = np.cumsum(merge) - 1
    idx = np.where(keep_old, np.arange(n),
                   np.where(replace, n + np.arange(n), 2 * n + dense))
    take = pa.array(idx, pa.int64())
    out = {}
    for field in old_hit.schema:
        name = field.name
        oc = old_hit.column(name).combine_chunks()
        nc = pc.cast(new_a.column(name).combine_chunks(), field.type)
        mc = (
            pc.cast(m_cols[name], field.type)
            if name in m_cols
            else oc.take(pa.array(mi))  # url/warc_ts/lang: old == merged
        )
        out[name] = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in (oc, nc, mc)]
        ).take(take)
    return pa.table(out, schema=old_hit.schema)


def _merge_append_part(out_dir: str, tmp_out: str, part: int,
                       new_duplicates: int, meta_identity: dict) -> dict:
    """Merge one partition's freshly-extracted append rows into the live
    partition (the incremental path of /root/reference/StudiOCR/
    OcrEngine.py:108-110,128 — pages added to an existing doc continue its
    page numbering).

    Existing urls get the new crawl's pages appended with ``page`` offset by
    the current ``n_pages`` (doc-level text/blocks/conf recomputed); new urls
    are plain new rows.  Only matched urls are touched in Python — unmatched
    rows on both sides move as whole Arrow tables.  Swap is rename-aside
    (crash leaves data in ``.old``), manifest written last."""
    import numpy as np

    new_t = pq.read_table(part_dir(tmp_out, part))
    if "part" in new_t.column_names:
        new_t = new_t.drop_columns(["part"])
    d = part_dir(out_dir, part)
    old_t = pq.read_table(d) if os.path.isdir(d) else None
    if old_t is not None and "part" in old_t.column_names:
        old_t = old_t.drop_columns(["part"])

    if old_t is None:
        merged = new_t
        appended = 0
    else:
        old_urls = old_t.column("url")
        new_urls = new_t.column("url")
        match = pc.is_in(old_urls, pc.unique(new_urls))
        old_hit = old_t.filter(match)
        old_keep = old_t.filter(pc.invert(match))
        nmatch = pc.is_in(new_urls, pc.unique(old_hit.column("url")))
        new_hit = new_t.filter(nmatch)
        new_keep = new_t.filter(pc.invert(nmatch))
        appended = old_hit.num_rows
        if appended:
            merged_hit = _merge_matched(old_hit, new_hit)
            merged = pa.concat_tables([old_keep, merged_hit, new_keep])
        else:
            merged = pa.concat_tables([old_keep, new_keep])

    tmp = d + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    fp = os.path.join(tmp, "data.parquet")
    pq.write_table(merged, fp)
    fsize = os.path.getsize(fp)
    if os.path.isdir(d):
        old_dir = d + ".old"
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        os.replace(d, old_dir)
        os.replace(tmp, d)
        shutil.rmtree(old_dir)
    else:
        os.makedirs(os.path.dirname(d), exist_ok=True)
        os.replace(tmp, d)

    rows_n = merged.num_rows
    blocks = int(pc.sum(merged.column("n_blocks")).as_py() or 0)
    chars = int(pc.sum(merged.column("n_chars")).as_py() or 0)
    mc = merged.column("mean_conf").to_numpy(zero_copy_only=False)
    nb = merged.column("n_blocks").to_numpy(zero_copy_only=False)
    # read ONLY this partition's manifest (a full load_manifests here would
    # make the whole append O(P²) manifest reads)
    import json

    prev = {}
    try:
        with open(manifest_path(out_dir, part)) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    prev_metrics = prev.get("metrics", {})
    m = {
        **prev,
        "part": part,
        "status": "complete",
        # partitions first created by an append must still carry the resume
        # identity (config_hash / num_partitions / ORIGINAL input_path) or a
        # later resumed run_extract treats them as incomplete and clobbers
        # the appended docs
        **meta_identity,
        "files": [{"name": "data.parquet", "bytes": fsize}],
        "metrics": {
            "docs": rows_n,
            "blocks": blocks,
            "chars": chars,
            "errors": rows_n - merged.column("error").null_count,
            "duplicates": int(prev_metrics.get("duplicates", 0)) + new_duplicates,
            "conf_total": int(np.rint(mc * nb).sum()) if rows_n else 0,
            "mean_conf": float(
                (pc.sum(merged.column("mean_conf")).as_py() or 0.0) / rows_n
            ) if rows_n else 0.0,
            "mean_boilerplate_ratio": float(
                (pc.sum(merged.column("boilerplate_ratio")).as_py() or 0.0)
                / rows_n
            ) if rows_n else 0.0,
            "chars_per_doc": (chars / rows_n) if rows_n else 0.0,
        },
    }
    write_manifest(out_dir, part, m)
    return {"part": part, "docs": rows_n, "appended": appended,
            "new": new_t.num_rows - appended}


def append_extract(
    input_path: str,
    out_dir: str,
    cfg: ExtractConfig | None = None,
    dedup: bool | str = True,
    concurrency=None,
    batch_size: int = 128,
) -> dict:
    """Incrementally extract NEW crawl rows into an existing out_dir.

    The reference's add-pages-to-existing-document path
    (/root/reference/StudiOCR/OcrEngine.py:108-110,128) at corpus scale: the
    new input runs through the same distributed pipeline (same partition
    modulus, read from ``_meta.json``), then ONLY the partitions that
    received new rows are merged — one Ray task per affected partition, each
    a local parquet merge + atomic swap + manifest update.  Untouched
    partitions are never read or written."""
    import ray

    from ..state.manifest import load_meta

    cfg = cfg or ExtractConfig()
    meta = load_meta(out_dir)
    if not meta:
        raise ValueError(f"{out_dir} has no _meta.json — run run_extract first")
    if meta.get("config_hash") != cfg.config_hash():
        raise ValueError(
            f"append config_hash {cfg.config_hash()} != existing "
            f"{meta.get('config_hash')}; appending with a different config "
            "would mix extraction semantics in one corpus"
        )
    num_partitions = int(meta["num_partitions"])
    t0 = time.perf_counter()

    tmp_out = f"{out_dir}.append-{os.getpid()}"
    shutil.rmtree(tmp_out, ignore_errors=True)
    try:
        run_extract(
            input_path, tmp_out, cfg=cfg, num_partitions=num_partitions,
            resume=False, dedup=dedup, concurrency=concurrency,
            batch_size=batch_size,
        )
        new_dups = {
            int(m["part"]): int(m["metrics"].get("duplicates", 0))
            for m in load_manifests(tmp_out)
        }
        parts = [
            p for p in range(num_partitions)
            if os.path.isdir(part_dir(tmp_out, p))
        ]
        meta_identity = {
            "config_hash": meta["config_hash"],
            "num_partitions": num_partitions,
            "input_path": meta.get("input_path"),
        }
        merge = ray.remote(num_cpus=1)(_merge_append_part)
        results = ray.get(
            [merge.remote(out_dir, tmp_out, p, new_dups.get(p, 0),
                          meta_identity)
             for p in parts]
        )
    finally:
        shutil.rmtree(tmp_out, ignore_errors=True)
    return {
        "parts_touched": len(results),
        "parts": sorted(r["part"] for r in results),
        "parts_untouched": num_partitions - len(results),
        "docs_appended_to": sum(r["appended"] for r in results),
        "docs_new": sum(r["new"] for r in results),
        "elapsed_sec": time.perf_counter() - t0,
    }


def _compact_one_part(out_dir: str, part: int) -> dict:
    """Rewrite one fragmented partition into a single parquet file:
    staged write → rename-aside swap (crash leaves data in ``.old``) →
    manifest updated LAST, the committer discipline of
    :func:`_merge_append_part`.  Rows are preserved exactly (files concat
    in sorted name order); metrics are untouched."""
    import json

    d = part_dir(out_dir, part)
    names = sorted(n for n in os.listdir(d) if n.endswith(".parquet"))
    t = pa.concat_tables(
        [pq.read_table(os.path.join(d, n)) for n in names]
    )
    if "part" in t.column_names:
        t = t.drop_columns(["part"])
    tmp = d + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    fp = os.path.join(tmp, "data.parquet")
    pq.write_table(t, fp)
    fsize = os.path.getsize(fp)
    old_dir = d + ".old"
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)
    os.replace(d, old_dir)
    os.replace(tmp, d)
    shutil.rmtree(old_dir)
    prev = {}
    try:
        with open(manifest_path(out_dir, part)) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    write_manifest(out_dir, part, {
        **prev,
        "files": [{"name": "data.parquet", "bytes": fsize}],
    })
    return {"part": part, "files_before": len(names), "rows": t.num_rows,
            "bytes": fsize}


def compact_output(out_dir: str, min_files: int = 2,
                   parts: list[int] | None = None) -> dict:
    """Small-file compaction over an extracted corpus — the maintenance
    answer to the small-file problem that incremental appends and
    fine-grained write blocks create at 100 TB (a 10⁶-file corpus reads
    an order of magnitude slower than the same bytes in right-sized
    files).  Every COMPLETE partition currently holding ≥ ``min_files``
    parquet files is rewritten into one file, one Ray task per partition
    (partitions are independent; untouched partitions are never read),
    each with the atomic rename-aside swap + manifest-last discipline, so
    a crash mid-compaction loses nothing and a rerun just picks up the
    still-fragmented remainder."""
    import ray

    t0 = time.perf_counter()
    complete = {
        int(m["part"]) for m in load_manifests(out_dir)
        if m.get("status") == "complete"
    }
    todo = []
    for p in sorted(complete if parts is None else
                    (set(parts) & complete)):
        d = part_dir(out_dir, p)
        if not os.path.isdir(d):
            continue
        nf = sum(1 for n in os.listdir(d) if n.endswith(".parquet"))
        if nf >= min_files:
            todo.append(p)
    if not todo:
        return {"parts_compacted": 0, "files_before": 0,
                "elapsed_sec": round(time.perf_counter() - t0, 3)}
    one = ray.remote(num_cpus=1)(_compact_one_part)
    results = ray.get([one.remote(out_dir, p) for p in todo])
    return {
        "parts_compacted": len(results),
        "files_before": sum(r["files_before"] for r in results),
        "rows": sum(r["rows"] for r in results),
        "bytes": sum(r["bytes"] for r in results),
        "elapsed_sec": round(time.perf_counter() - t0, 3),
    }


def page_stats_dataset(out_dir: str):
    from ..stages.extract import PAGES_READ_COLUMNS

    ds = read_extracted(out_dir, columns=PAGES_READ_COLUMNS)
    return ds.map_batches(explode_page_stats, batch_format="pyarrow")


def invalidate_parts(out_dir: str, parts: list[int]) -> None:
    """Drop partitions (data + manifest) — e.g. to reprocess after a bad run.
    The delete-cascade analogue (/root/reference/StudiOCR/db.py:26-38): at
    partition granularity instead of row-level VACUUM."""
    for p in parts:
        d = part_dir(out_dir, p)
        if os.path.isdir(d):
            shutil.rmtree(d)
        mp = manifest_path(out_dir, p)
        if os.path.exists(mp):
            os.remove(mp)


def delete_docs(out_dir: str, urls: list[str]) -> int:
    """Row-level delete: remove documents by url and rewrite only the affected
    partitions, updating their manifests.

    The delete-cascade analogue (/root/reference/StudiOCR/db.py:26-38 —
    doc→pages→blocks in one txn, returning rows deleted): the nested layout
    makes the cascade implicit (a url row carries its pages and blocks), and
    crc32 partition pruning means only ``|{part(u)}|`` partitions are touched,
    not the corpus. Rewrite is write-temp-then-rename per partition with a
    manifest update last, preserving resume atomicity. Returns rows deleted
    (G8 semantics)."""
    from ..stages.extract import url_part
    from ..state.manifest import load_meta

    meta = load_meta(out_dir)
    num_partitions = int(meta.get("num_partitions", 64))
    by_part: dict[int, set[str]] = {}
    for u in urls:
        by_part.setdefault(url_part(u, num_partitions), set()).add(u)

    manifests = {int(m["part"]): m for m in load_manifests(out_dir)}
    deleted = 0
    for part, part_urls in sorted(by_part.items()):
        d = part_dir(out_dir, part)
        if not os.path.isdir(d):
            continue
        t = pq.read_table(d)
        mask = pc.invert(pc.is_in(t.column("url"), pa.array(sorted(part_urls))))
        kept = t.filter(mask)
        n_del = t.num_rows - kept.num_rows
        if n_del == 0:
            continue
        deleted += n_del
        tmp = d + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        fp = os.path.join(tmp, "data.parquet")
        pq.write_table(kept.drop_columns(["part"]) if "part" in kept.column_names
                       else kept, fp)
        fsize = os.path.getsize(fp)
        # Swap via rename-aside, never rmtree-the-live-dir first: a crash
        # between the two renames leaves the data recoverable in ``.old``
        # (and the absent-dir window is two renames, not a tree delete).
        old = d + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.replace(d, old)
        os.replace(tmp, d)
        shutil.rmtree(old)
        m = manifests.get(part)
        if m is not None:
            import numpy as np

            rows = kept.num_rows
            blocks = pc.sum(kept.column("n_blocks")).as_py() or 0
            chars = pc.sum(pc.utf8_length(kept.column("extracted_text"))).as_py() or 0
            conf = pc.sum(kept.column("mean_conf")).as_py() or 0.0
            bp = pc.sum(kept.column("boilerplate_ratio")).as_py() or 0.0
            errors = rows - kept.column("error").null_count
            mc = kept.column("mean_conf").to_numpy(zero_copy_only=False)
            nb = kept.column("n_blocks").to_numpy(zero_copy_only=False)
            m["files"] = [{"name": "data.parquet", "bytes": fsize}]
            m["metrics"] = {
                "docs": rows,
                "blocks": int(blocks),
                "chars": int(chars),
                "errors": int(errors),
                "duplicates": m["metrics"].get("duplicates", 0),
                "conf_total": int(np.rint(mc * nb).sum()) if rows else 0,
                "mean_conf": (conf / rows) if rows else 0.0,
                "mean_boilerplate_ratio": (bp / rows) if rows else 0.0,
                "chars_per_doc": (chars / rows) if rows else 0.0,
            }
            write_manifest(out_dir, part, m)
    return deleted


def export_document(out_dir: str, url: str) -> dict:
    """Point-lookup one document and re-assemble its ordered pages for export.

    The PDF-export analogue (/root/reference/StudiOCR/DocWindow.py:157-185 —
    concat page images → one PDF) over the nested layout: crc32 partition
    pruning reads ONE partition directory (the S5 point-lookup,
    ListDocuments.py:143), pages come back in page order, and the export body
    is the page texts joined in that order (byte-equal to ``extracted_text``).
    Returns {url, n_pages, pages: [{page, text, n_blocks}], body}."""
    from ..stages.extract import url_part
    from ..state.manifest import load_meta

    meta = load_meta(out_dir)
    num_partitions = int(meta.get("num_partitions", 64))
    d = part_dir(out_dir, url_part(url, num_partitions))
    if not os.path.isdir(d):
        return {}
    t = pq.read_table(d, columns=["url", "n_pages", "extracted_text", "pages"])
    t = t.filter(pc.equal(t.column("url"), url))
    if t.num_rows == 0:
        return {}
    row = t.to_pylist()[0]
    from ..functions.document import materialize_pages

    pages = materialize_pages(
        int(row["n_pages"]), row["extracted_text"], row["pages"]
    )
    out_pages = [
        {
            "page": p["page"],
            "text": " ".join(b["text"] for b in p["blocks"]),
            "n_blocks": len(p["blocks"]),
        }
        for p in pages
    ]
    return {
        "url": url,
        "n_pages": row["n_pages"],
        "pages": out_pages,
        "body": row["extracted_text"],
    }


def corpus_metrics(out_dir: str) -> dict:
    """Aggregate per-partition metrics from manifests (no data read)."""
    ms = load_manifests(out_dir)
    docs = sum(m["metrics"]["docs"] for m in ms)
    blocks = sum(m["metrics"]["blocks"] for m in ms)
    chars = sum(m["metrics"]["chars"] for m in ms)
    conf = sum(m["metrics"]["mean_conf"] * m["metrics"]["docs"] for m in ms)
    conf_total = sum(m["metrics"].get("conf_total", 0) for m in ms)
    bp = sum(m["metrics"]["mean_boilerplate_ratio"] * m["metrics"]["docs"] for m in ms)
    return {
        "partitions": len(ms),
        "docs": docs,
        "blocks": blocks,
        "chars": chars,
        "chars_per_doc": chars / docs if docs else 0.0,
        # block-weighted mean conf: integer total / integer count — a single
        # deterministic division, exactly reproducible by the SQL oracle
        "conf_total": conf_total,
        "mean_conf_block": conf_total / blocks if blocks else 0.0,
        "mean_conf": conf / docs if docs else 0.0,
        "mean_boilerplate_ratio": bp / docs if docs else 0.0,
        "errors": sum(m["metrics"]["errors"] for m in ms),
        # duplicate-url rows dropped by keep-first (J3/D2 collision metric);
        # recorded by the post-extract dedup sidecars — 0 under dedup="pre"
        # (dropped before the metrics point) or dedup=False.
        "duplicates": sum(m["metrics"].get("duplicates", 0) for m in ms),
    }


def export_corpus_jsonl(out_dir: str, dest_dir: str) -> str:
    """Export the extracted corpus as JSONL shards — the
    training-consumption format most LLM data loaders read directly.

    Streams ``docs_dataset`` (derived columns only, no nested payload)
    through Ray's distributed JSON writer: one shard per block, no driver
    materialization.  The inverse of the JSONL pages source
    (sources/pages.py ``file_format="jsonl"``)."""
    docs_dataset(out_dir).write_json(dest_dir)
    return dest_dir
