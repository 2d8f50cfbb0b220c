"""Distributed table profiler — per-column row/null counts, exact distinct
cardinality, and min/max, in ONE pass and ONE narrow all-to-all.

The schema-quality step of a data-lake ingest (what Deequ/TFDV-style
profilers compute) re-expressed in the engine's bucketed-distinct shape.
(No reference analogue: StudiOCR's closest surface is the per-page
stats rollup, `/root/reference/StudiOCR/db.py` OcrPage fields — this
generalizes the idea to arbitrary columns of arbitrary tables.)

* per batch, each profiled column contributes its batch-DISTINCT values
  (deduped before the exchange — the combiner) tagged ``(col, bucket)``
  where ``bucket = hash(value) % B``, plus one meta row per (col, batch)
  carrying the batch's row/null counts at ``bucket = -1``;
* one groupby over ``(col, bucket)`` merges: value buckets count exact
  distincts and fold min/max over their values, the ``-1`` buckets sum
  counts — no raw row ever shuffles, only batch-distinct values;
* the per-bucket partials (≤ cols × (B+1) rows) reduce in a final tiny
  task.

Numeric and string columns profile together: values travel in a typed
pair of nullable columns (``val_num`` / ``val_str``), so one exchange
serves any column mix.  Exact-distinct hashing is only a BUCKETING key
(collisions just co-locate values); equality is decided on the real
values inside the bucket, so the count is exact, not a sketch — use the
HLL operator (``sketch.hll_distinct``) when an estimate is enough.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Max, Min, Sum

from ..functions.arrowutil import id_buckets


def _is_num(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def profile_columns(ds, cols: list[str], num_buckets: int = 32):
    """Profile ``cols`` of a Dataset → one row per column:
    ``(col_name, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    max_str)`` — numeric columns fill the ``_num`` pair (as float64),
    string columns the ``_str`` pair; the other pair is null."""

    def partial(batch: pa.Table) -> pa.Table:
        out_col, out_bucket = [], []
        out_vnum, out_vstr = [], []
        out_n, out_null = [], []

        for name in cols:
            arr = batch.column(name)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            n_null = arr.null_count
            uniq = pc.unique(arr.drop_null())
            k = len(uniq)
            out_col.append(pa.array([name] * (k + 1), pa.string()))
            if _is_num(arr.type):
                vnum = uniq.cast(pa.float64())
                # bucket on the raw float bits (bucketing only — equality
                # is re-decided on values inside the bucket)
                bits = vnum.to_numpy(zero_copy_only=False).view(np.uint64)
                b = (
                    (bits * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
                ) % np.uint64(num_buckets)
                out_vnum.append(vnum)
                out_vstr.append(pa.nulls(k, pa.string()))
                out_bucket.append(
                    pa.array(b.astype(np.int32), pa.int32())
                )
            else:
                vstr = uniq.cast(pa.string())
                out_vnum.append(pa.nulls(k, pa.float64()))
                out_vstr.append(vstr)
                out_bucket.append(
                    pa.array(id_buckets(vstr, num_buckets), pa.int32())
                )
            # meta row: batch row/null counts at bucket -1
            out_bucket.append(pa.array([-1], pa.int32()))
            out_vnum.append(pa.nulls(1, pa.float64()))
            out_vstr.append(pa.nulls(1, pa.string()))
            out_n.append(
                pa.array(np.concatenate([np.zeros(k, np.int64), [n]]))
            )
            out_null.append(
                pa.array(np.concatenate([np.zeros(k, np.int64), [n_null]]))
            )
        return pa.table(
            {
                "col_name": pa.concat_arrays(out_col),
                "bucket": pa.concat_arrays(out_bucket),
                "val_num": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_vnum]
                ),
                "val_str": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_vstr]
                ),
                "n_rows": pa.concat_arrays(out_n),
                "n_null": pa.concat_arrays(out_null),
            }
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        name = group.column("col_name")[0].as_py()
        bucket = group.column("bucket")[0].as_py()
        if bucket == -1:
            return pa.table(
                {
                    "col_name": pa.array([name], pa.string()),
                    "n_rows": pa.array(
                        [pc.sum(group.column("n_rows")).as_py()], pa.int64()
                    ),
                    "n_null": pa.array(
                        [pc.sum(group.column("n_null")).as_py()], pa.int64()
                    ),
                    "n_distinct": pa.array([0], pa.int64()),
                    "min_num": pa.nulls(1, pa.float64()),
                    "max_num": pa.nulls(1, pa.float64()),
                    "min_str": pa.nulls(1, pa.string()),
                    "max_str": pa.nulls(1, pa.string()),
                }
            )
        vnum = group.column("val_num")
        if vnum.null_count < len(vnum):
            u = pc.unique(vnum.combine_chunks().drop_null())
            mn, mx = pc.min(u).as_py(), pc.max(u).as_py()
            return pa.table(
                {
                    "col_name": pa.array([name], pa.string()),
                    "n_rows": pa.array([0], pa.int64()),
                    "n_null": pa.array([0], pa.int64()),
                    "n_distinct": pa.array([len(u)], pa.int64()),
                    "min_num": pa.array([mn], pa.float64()),
                    "max_num": pa.array([mx], pa.float64()),
                    "min_str": pa.nulls(1, pa.string()),
                    "max_str": pa.nulls(1, pa.string()),
                }
            )
        u = pc.unique(group.column("val_str").combine_chunks().drop_null())
        return pa.table(
            {
                "col_name": pa.array([name], pa.string()),
                "n_rows": pa.array([0], pa.int64()),
                "n_null": pa.array([0], pa.int64()),
                "n_distinct": pa.array([len(u)], pa.int64()),
                "min_num": pa.nulls(1, pa.float64()),
                "max_num": pa.nulls(1, pa.float64()),
                "min_str": pa.array([pc.min(u).as_py()], pa.string()),
                "max_str": pa.array([pc.max(u).as_py()], pa.string()),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        # ≤ cols × (B+1) partial rows — bounded, single tiny task
        names, rows = [], {}
        for i in range(t.num_rows):
            name = t.column("col_name")[i].as_py()
            if name not in rows:
                names.append(name)
                rows[name] = dict(n_rows=0, n_null=0, n_distinct=0,
                                  min_num=None, max_num=None,
                                  min_str=None, max_str=None)
            r = rows[name]
            r["n_rows"] += t.column("n_rows")[i].as_py()
            r["n_null"] += t.column("n_null")[i].as_py()
            r["n_distinct"] += t.column("n_distinct")[i].as_py()
            for key, red in (("min_num", min), ("max_num", max),
                             ("min_str", min), ("max_str", max)):
                v = t.column(key)[i].as_py()
                if v is not None:
                    r[key] = v if r[key] is None else red(r[key], v)
        names.sort()
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n_rows": pa.array(
                    [rows[n]["n_rows"] for n in names], pa.int64()
                ),
                "n_null": pa.array(
                    [rows[n]["n_null"] for n in names], pa.int64()
                ),
                "n_distinct": pa.array(
                    [rows[n]["n_distinct"] for n in names], pa.int64()
                ),
                "min_num": pa.array(
                    [rows[n]["min_num"] for n in names], pa.float64()
                ),
                "max_num": pa.array(
                    [rows[n]["max_num"] for n in names], pa.float64()
                ),
                # '' sentinel (not null) for numeric columns' string pair:
                # a null string round-trips as None-vs-NaN ambiguity in
                # pandas frames, breaking order-insensitive comparison
                "min_str": pa.array(
                    [rows[n]["min_str"] or "" for n in names], pa.string()
                ),
                "max_str": pa.array(
                    [rows[n]["max_str"] or "" for n in names], pa.string()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["col_name", "bucket"])
        .map_groups(merge_bucket, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def footer_stats(path: str, id_col: str = "doc_id",
                 concurrency: int = 8):
    """Metadata-only table statistics: row count and ``id_col`` min/max
    read from PARQUET FOOTERS alone → one row ``(n_rows, min_id,
    max_id)`` — zero data pages are decoded.

    This is the planning primitive behind partition pruning and
    manifest-level query answering (Iceberg/Delta manifests carry the
    same triple): at 100 TB the footers are megabytes while the data is
    the lake, so "how many rows / what key range" must never scan.
    Shape: the FILE LIST is the dataset (``from_items``), each task
    opens only its files' footers (``pyarrow.parquet.ParquetFile``),
    and one tiny aggregate folds the per-file triples.  Raises if a
    footer lacks ``id_col`` statistics (never silently rescans)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet"))
    else:
        files = [path]
    if not files:
        raise ValueError(f"footer_stats: no parquet files under {path}")

    def per_file(batch: pa.Table) -> pa.Table:
        rows, lo, hi = [], [], []
        for f in batch.column("file").to_pylist():
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    if col.path_in_schema != id_col:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"footer_stats: {f} row group {g} has no "
                            f"min/max statistics for {id_col!r}")
                    fmin = st.min if fmin is None else min(fmin, st.min)
                    fmax = st.max if fmax is None else max(fmax, st.max)
            if fmin is None:
                raise ValueError(
                    f"footer_stats: column {id_col!r} not in {f}")
            rows.append(md.num_rows)
            lo.append(fmin)
            hi.append(fmax)
        return pa.table({
            "n_rows": pa.array(rows, pa.int64()),
            "min_id": pa.array(lo, pa.int64()),
            "max_id": pa.array(hi, pa.int64()),
        })

    per = rd.from_items(
        [{"file": f} for f in files]
    ).map_batches(per_file, batch_format="pyarrow",
                  concurrency=min(concurrency, len(files)))
    agg = per.aggregate(Sum("n_rows", alias_name="n_rows"),
                        Min("min_id", alias_name="min_id"),
                        Max("max_id", alias_name="max_id"))
    return pa.table({
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
        "min_id": pa.array([int(agg["min_id"])], pa.int64()),
        "max_id": pa.array([int(agg["max_id"])], pa.int64()),
    })
