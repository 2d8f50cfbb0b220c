"""The flagship extraction pipeline: pages_in parquet → extracted parquet.

Stage graph (all lazy, streaming, backpressured)::

    read_parquet(columns=url,warc_ts,html,lang)     # column-pruned read
      → map_batches(add_part)                        # part = crc32(url) % P
      → [resume filter: drop complete partitions]    # vectorized mask
      → groupby(url).map_groups(keep_first)          # dedup + url-hash exchange
      → map_batches(ExtractAssemble, actor pool)     # html strip + OCR decode
      → write_parquet(staging, partition_cols=part)  # hive layout
      → move parts into place, write manifests       # manifest-last atomicity

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
    dedup: bool = True,
    concurrency=None,
    batch_size: int = 64,
):
    """Build the lazy EXTRACTED dataset (no writes)."""
    cfg = cfg or ExtractConfig()
    ds = rd.read_parquet(input_path, columns=INPUT_COLUMNS)
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
    if dedup:
        ds = dedup_keep_first(ds)
    if concurrency is None:
        # autoscaling actor pool sized to the cluster, leaving headroom for
        # the read / shuffle / write stages so no stage starves (SURVEY §4)
        import ray

        ncpu = int(
            ray.cluster_resources().get("CPU", os.cpu_count() or 8)
            if ray.is_initialized()
            else (os.cpu_count() or 8)
        )
        # fixed-size pool: Ray's autoscaling actor pool ramps too slowly for
        # short jobs (observed ~5 concurrent actors on a 32-cpu 10s run);
        # ncpu-2 leaves headroom for the read/shuffle/write stages
        concurrency = max(2, ncpu - 2)
    ds = ds.map_batches(
        ExtractAssemble,
        fn_constructor_kwargs={"cfg": cfg, "num_partitions": num_partitions},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return ds


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
                 "extracted_text", "error"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "part": pc.cast(batch.column("part"), pa.int32()).to_pandas(),
                "blocks": batch.column("n_blocks").to_pandas(),
                "conf_sum": batch.column("mean_conf").to_pandas(),
                "bp_sum": batch.column("boilerplate_ratio").to_pandas(),
                "chars": pc.utf8_length(batch.column("extracted_text")).to_pandas(),
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
    dedup: bool = True,
    concurrency=None,
    batch_size: int = 64,
) -> dict:
    """Run extraction end-to-end with partition-granular resume.

    Returns a summary dict (docs, blocks, elapsed, parts computed/skipped)."""
    cfg = cfg or ExtractConfig()
    chash = cfg.config_hash()
    t0 = time.perf_counter()

    done = load_complete_parts(out_dir, chash) if resume else set()
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

    ds = build_extracted(
        input_path,
        cfg,
        num_partitions=num_partitions,
        skip_parts=done,
        dedup=dedup,
        concurrency=concurrency,
        batch_size=batch_size,
    )
    ds.write_parquet(staging, partition_cols=["part"])

    # Promote each staged partition, then write its manifest (manifest-last).
    # Per-partition metrics come from ONE parallel column-pruned read of the
    # staged output (partial-aggregated per batch), not a sequential
    # driver-side file loop.
    part_stats = _partition_metrics(staging)
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
        conf_sum = float(st.get("conf_sum", 0.0))
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
                "input_path": str(input_path),
                "files": files,
                "metrics": {
                    "docs": rows,
                    "blocks": blocks,
                    "chars": chars,
                    "errors": errors,
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
    summary.update(
        elapsed_sec=time.perf_counter() - t0, docs=total_docs, blocks=total_blocks
    )
    return summary


def read_extracted(out_dir: str, columns: list[str] | None = None):
    """Read the nested extracted table back (column-pruned)."""
    return rd.read_parquet(os.path.join(out_dir, "parts"), columns=columns)


def docs_dataset(out_dir: str):
    return read_extracted(
        out_dir,
        columns=["url", "n_pages", "extracted_text", "n_blocks", "mean_conf",
                 "boilerplate_ratio"],
    )


def blocks_dataset(out_dir: str):
    ds = read_extracted(out_dir, columns=["url", "pages"])
    return ds.map_batches(explode_blocks, batch_format="pyarrow")


def page_stats_dataset(out_dir: str):
    ds = read_extracted(out_dir, columns=["url", "pages"])
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


def corpus_metrics(out_dir: str) -> dict:
    """Aggregate per-partition metrics from manifests (no data read)."""
    ms = load_manifests(out_dir)
    docs = sum(m["metrics"]["docs"] for m in ms)
    blocks = sum(m["metrics"]["blocks"] for m in ms)
    chars = sum(m["metrics"]["chars"] for m in ms)
    conf = sum(m["metrics"]["mean_conf"] * m["metrics"]["docs"] for m in ms)
    bp = sum(m["metrics"]["mean_boilerplate_ratio"] * m["metrics"]["docs"] for m in ms)
    return {
        "partitions": len(ms),
        "docs": docs,
        "blocks": blocks,
        "chars": chars,
        "chars_per_doc": chars / docs if docs else 0.0,
        "mean_conf": conf / docs if docs else 0.0,
        "mean_boilerplate_ratio": bp / docs if docs else 0.0,
        "errors": sum(m["metrics"]["errors"] for m in ms),
    }
