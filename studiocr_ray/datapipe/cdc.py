"""Change-data-capture merge: apply a changelog (insert / update /
delete rows with a sequence number) onto a base snapshot — the SCD-1
"MERGE INTO" every incrementally-maintained corpus needs (the dataset
twin of the extract pipeline's append path, extract_pipeline.py
``append_extract``).

Scale shape: both sides conform to one narrow schema, union into a
single stream, ONE key-hash-bucketed exchange co-partitions every
version of a key, and the per-bucket resolve is one sort + first-of-run
take.  Neither side is materialized; a key's history never spans
buckets, so latest-wins needs no second pass.

No counterpart in the reference (its updates are whole-document SQLite
rewrites, /root/reference/StudiOCR/db.py); this is the
training-data-pipeline extension for recurring-crawl maintenance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def apply_changes(
    base_ds,
    changes_ds,
    key_col: str,
    payload_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    num_buckets: int = 64,
):
    """Latest-wins merge of ``changes_ds`` onto ``base_ds`` →
    Dataset of the new snapshot (``key_col`` + ``payload_cols``).

    ``changes_ds`` rows carry ``op_col`` ('I' insert / 'U' update /
    'D' delete — I and U are both upserts) and ``seq_col`` (int64; the
    highest sequence per key wins; base rows rank below every change).
    A delete whose key is absent is a no-op; an insert for an existing
    key replaces it.  Deterministic for distinct ``seq`` per key (ties
    resolve by op desc — documented, not load-bearing for a well-formed
    changelog)."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import (first_of_run_mask, id_buckets,
                                       string_buckets)

    cols = [key_col] + list(payload_cols)

    def conform(batch: pa.Table, is_base: bool) -> pa.Table:
        n = batch.num_rows
        if is_base:
            t = batch.select(cols)
            t = t.append_column("op", pa.array(np.full(n, "B"), pa.string()))
            t = t.append_column(
                "seq", pa.array(np.full(n, -1, np.int64), pa.int64())
            )
        else:
            t = batch.select(cols + [op_col, seq_col])
            if op_col != "op" or seq_col != "seq":
                t = t.rename_columns(cols + ["op", "seq"])
        k = t.column(key_col)
        b = (id_buckets(k, num_buckets) if pa.types.is_integer(k.type)
             else string_buckets(k, num_buckets))
        return t.append_column("bucket", pa.array(b, pa.int32()))

    bt = base_ds.map_batches(conform, fn_kwargs={"is_base": True},
                             batch_format="pyarrow")
    ct = changes_ds.map_batches(conform, fn_kwargs={"is_base": False},
                                batch_format="pyarrow")

    def resolve(group: pa.Table) -> pa.Table:
        t = group.sort_by([(key_col, "ascending"), ("seq", "descending"),
                           ("op", "descending")])
        t = t.filter(pa.array(first_of_run_mask([t.column(key_col)])))
        t = t.filter(pc.not_equal(t.column("op"), "D"))
        return t.select(cols)

    return bt.union(ct).groupby("bucket").map_groups(
        resolve, batch_format="pyarrow"
    )


def incremental_daily(base_ds, changes_ds, num_buckets: int = 64):
    """Incremental aggregate maintenance: given the BASE events and a
    changelog of inserts/deletes, produce the updated daily counts
    WITHOUT re-reading days the changelog never touched — the
    materialized-view delta-maintenance shape (count is self-maintainable:
    Δview = +1 per insert, −1 per delete).

    Engine path: one pass of per-batch ``(day, +n)`` partials over the
    base, one pass of SIGNED ``(day, ±n)`` partials over the changelog
    (``op`` ∈ insert/delete), one tiny day-keyed sum; days whose count
    reaches zero drop out.  At 100 TB the base pass is itself the stored
    aggregate (a day-partitioned count table read back in), so the
    recurring cost is proportional to the CHANGELOG, not the corpus —
    here both sides stream through the same partial for a
    self-contained, oracle-checkable operator.

    ``changes_ds``: rows ``(op: 'insert'|'delete', ts_us: int64)`` — a
    delete carries the timestamp of the row it removes."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    day_us = 86_400_000_000

    def base_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = (ts // day_us) * day_us
        vals, cnts = np.unique(day, return_counts=True)
        return pa.table({"day_us": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    def delta_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        sign = np.where(
            pc.equal(batch.column("op"), "insert").to_numpy(
                zero_copy_only=False),
            np.int64(1), np.int64(-1))
        day = (ts // day_us) * day_us
        # signed bincount via two uniques (insert and delete days)
        out_day, out_n = [], []
        for s in (1, -1):
            m = sign == s
            if m.any():
                vals, cnts = np.unique(day[m], return_counts=True)
                out_day.append(vals)
                out_n.append(cnts.astype(np.int64) * s)
        if not out_day:
            return pa.table({"day_us": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "day_us": pa.array(np.concatenate(out_day), pa.int64()),
            "n": pa.array(np.concatenate(out_n), pa.int64()),
        })

    merged = base_ds.map_batches(
        base_partial, batch_format="pyarrow"
    ).union(
        changes_ds.map_batches(delta_partial, batch_format="pyarrow")
    ).groupby("day_us").aggregate(Sum("n", alias_name="n"))

    def nonzero(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("n"), 0))

    return merged.map_batches(nonzero, batch_format="pyarrow")
