"""Sorted range-partitioned Parquet export.

Warehouses expose ``ORDER BY`` on write so downstream consumers get
merge-readable, range-prunable files; Ray Data's ``Dataset.sort`` is a
full shuffle whose output order is then lost at ``write_parquet`` unless
partitioning preserves it.  This module writes a dataset globally sorted
by an integer key WITHOUT a global sort operator: an exact equi-depth
histogram picks range boundaries, rows route to their range (one keyed
exchange), each range sorts locally, and ranges land in ``range=<i>``
directories whose lexicographic order IS the global order.

Reading back in range order (``read_sorted``) yields a globally sorted
stream; a range a consumer doesn't need is a directory it never opens
(range pruning).  No counterpart in the reference (SQLite orders at
query time, /root/reference/StudiOCR/db.py); this is the sorted-export
feature a 100 TB corpus needs for merge joins and binary-searchable
artifacts.

Boundary discipline: boundaries come from an EXACT value histogram, so
they are deterministic and resume-stable — right while the key's
distinct-value count is bounded (lengths, cents, dates, small ids).  For
open-ended keys swap the histogram for a sampled quantile sketch; the
routing/write shape is unchanged (documented swap point).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def write_sorted(ds, path: str, key: str, num_ranges: int = 16) -> list:
    """Write ``ds`` to ``path`` globally sorted by integer column
    ``key``: ``range=<i>`` hive directories in key order, rows sorted
    within each.  Returns the boundary list (range i holds keys in
    ``(b[i-1], b[i]]``)."""
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False).astype(
            np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"))
    ).to_pandas().sort_values("v").reset_index(drop=True)
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()
    # equi-depth cuts: boundary j = smallest value with cum ≥ j*total/R
    cuts = [int(vals[np.searchsorted(cum, (j * total) // num_ranges,
                                     side="left")])
            for j in range(1, num_ranges)]
    boundaries = sorted(set(cuts))  # ties can collapse ranges

    b_arr = np.asarray(boundaries, np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False).astype(
            np.int64)
        rid = np.searchsorted(b_arr, v, side="left")
        return batch.append_column(
            "range", pa.array(rid.astype(np.int32), pa.int32()))

    def sort_range(group: pa.Table) -> pa.Table:
        return group.sort_by([(key, "ascending")])

    (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("range")
        .map_groups(sort_range, batch_format="pyarrow")
        .write_parquet(path, partition_cols=["range"])
    )
    return boundaries


def read_sorted(path: str):
    """Iterate the ``write_sorted`` output in global key order: range
    directories ascending, one ``pyarrow.parquet`` read each (a
    consumer needing keys in one range opens one directory)."""
    import pyarrow.parquet as pq

    def rid(name: str) -> int:
        return int(name.split("=", 1)[1])

    for d in sorted((e for e in os.listdir(path)
                     if e.startswith("range=")), key=rid):
        yield rid(d), pq.read_table(os.path.join(path, d))


def merge_sorted(base_path: str, delta_ds, out_path: str, key: str) -> dict:
    """Incrementally merge ``delta_ds`` into the sorted export at
    ``base_path`` → a NEW sorted export at ``out_path``, touching only
    the ranges that receive delta rows: each touched range re-sorts
    (base rows + routed delta rows, one bounded local sort inside the
    range task); every untouched range's files carry over as HARD LINKS
    (the ``update_index`` single-shard-rebuild discipline) — cost scales
    with the delta's key spread, not the corpus.

    Base range intervals are recovered from parquet column statistics
    (per-range max of ``key`` — a metadata-only scan), so no boundary
    sidecar is needed; delta keys beyond the last base boundary land in
    the final range.  Returns ``{"ranges_touched": …,
    "ranges_linked": …}``."""
    import pyarrow.parquet as pq

    def rid_of(name: str) -> int:
        return int(name.split("=", 1)[1])

    range_dirs = sorted(
        (e for e in os.listdir(base_path) if e.startswith("range=")),
        key=rid_of)
    if not range_dirs:
        raise ValueError(f"no range= directories under {base_path}")
    maxes = []
    for d in range_dirs:
        mx = None
        dirp = os.path.join(base_path, d)
        for f in os.listdir(dirp):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(dirp, f))
            ci = md.schema.to_arrow_schema().get_field_index(key)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    mx = st.max if mx is None else max(mx, st.max)
        if mx is None:  # stats unavailable: read the one column
            mx = int(np.max(
                pq.read_table(dirp, columns=[key]).column(key)
                .to_numpy(zero_copy_only=False)))
        maxes.append(int(mx))
    rids = [rid_of(d) for d in range_dirs]
    b_arr = np.asarray(maxes[:-1], np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False).astype(
            np.int64)
        pos = np.searchsorted(b_arr, v, side="left")
        rid = np.asarray(rids, np.int64)[pos]
        return batch.append_column(
            "range", pa.array(rid.astype(np.int32), pa.int32()))

    os.makedirs(out_path, exist_ok=True)
    base_abs = os.path.abspath(base_path)
    out_abs = os.path.abspath(out_path)

    def merge_range(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"range": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        rid = int(group.column("range")[0].as_py())
        dirp = os.path.join(base_abs, f"range={rid}")
        base_tbl = pq.read_table(dirp)
        delta_tbl = group.drop_columns(["range"]).select(
            base_tbl.column_names)
        merged = pa.concat_tables(
            [base_tbl, delta_tbl]).sort_by([(key, "ascending")])
        od = os.path.join(out_abs, f"range={rid}")
        os.makedirs(od, exist_ok=True)
        pq.write_table(merged, os.path.join(od, "merged.parquet"))
        return pa.table({"range": pa.array([rid], pa.int32()),
                         "n": pa.array([merged.num_rows], pa.int64())})

    touched = (
        delta_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("range")
        .map_groups(merge_range, batch_format="pyarrow")
        .to_pandas()  # ≤ |ranges| rows
    )
    touched_set = set(int(r) for r in touched["range"])
    linked = 0
    for d in range_dirs:
        rid = rid_of(d)
        if rid in touched_set:
            continue
        od = os.path.join(out_abs, f"range={rid}")
        os.makedirs(od, exist_ok=True)
        src = os.path.join(base_abs, d)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.link(os.path.join(src, f), os.path.join(od, f))
        linked += 1
    return {"ranges_touched": len(touched_set), "ranges_linked": linked}
