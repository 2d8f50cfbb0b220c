"""Data-quality constraint validation: a dbt-test-style violations report
computed distributed, without ever shuffling raw rows.

A 100 TB ingest needs its contract checks (nullability, uniqueness,
value ranges, referential integrity) to run as cheap streaming passes,
not as driver-side scans.  Shapes used here:

- **row-local checks** (NOT NULL, value range): ONE ``map_batches`` pass
  emits a per-batch partial count per check; a check-keyed aggregate of
  those few-row partials is the only exchange.
- **uniqueness**: per-batch (key, n) partial counts, one key-hash
  exchange of narrow partials, per-bucket excess = ``sum(n - 1)`` over
  keys with n > 1 — duplicate keys split across batches are counted
  exactly, raw rows never move.
- **referential integrity**: the distributed anti-join
  (:func:`..datapipe.join.hash_join` ``how="anti"``), counting orphans;
  both sides ship key columns only.

No counterpart in the reference (its only integrity guard is the
per-document SQLite transaction, /root/reference/StudiOCR/OcrEngine.py:
97-136); this is the pipeline-engine extension a training-data ingest
needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def validate_table(
    ds,
    unique_cols: list[str] = (),
    not_null_cols: list[str] = (),
    positive_cols: list[str] = (),
    fk: tuple[str, object, str] | None = None,
    num_buckets: int = 64,
) -> pa.Table:
    """Constraint-check ``ds`` → ``(check, violations)`` report table,
    one row per declared check, sorted by check name.

    ``unique_cols``: violations = rows beyond the first per duplicated
    key (``sum(n-1)`` over keys with n > 1).  ``not_null_cols``:
    null-row count.  ``positive_cols``: rows with value <= 0 (nulls are
    the NOT-NULL check's job, not counted here).  ``fk``: a
    ``(col, ref_ds, ref_col)`` referential-integrity check; violations =
    rows whose key has no match in ``ref_ds`` (exact distributed
    anti-join).  The report is bounded by the number of checks, so
    returning a driver-side table is scale-correct."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.arrowutil import id_buckets, string_buckets
    from .join import hash_join

    results: dict[str, int] = {}

    local = [("null", c) for c in not_null_cols] + \
            [("nonpos", c) for c in positive_cols]
    if local:
        def partial(batch: pa.Table) -> pa.Table:
            names, counts = [], []
            for kind, c in local:
                col = batch.column(c)
                if kind == "null":
                    v = col.null_count
                    name = f"not_null:{c}"
                else:
                    v = pc.sum(
                        pc.less_equal(col, 0).fill_null(False).cast(pa.int64())
                    ).as_py() or 0
                    name = f"positive:{c}"
                names.append(name)
                counts.append(int(v))
            return pa.table({"check": pa.array(names, pa.string()),
                             "v": pa.array(counts, pa.int64())})

        agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("check").aggregate(Sum("v", alias_name="violations"))
        for row in agg.take_all():  # bounded: one row per declared check
            results[row["check"]] = int(row["violations"])

    for c in unique_cols:
        def key_partial(batch: pa.Table, col=c) -> pa.Table:
            t = batch.select([col]).group_by(col) \
                .aggregate([([], "count_all")]).rename_columns([col, "n"])
            k = t.column(col)
            b = (id_buckets(k, num_buckets)
                 if pa.types.is_integer(k.type)
                 else string_buckets(k, num_buckets))
            return t.append_column("bucket", pa.array(b, pa.int32()))

        def excess(group: pa.Table, col=c) -> pa.Table:
            g = group.select([col, "n"]).group_by(col) \
                .aggregate([("n", "sum")])
            n = g.column("n_sum").to_numpy(zero_copy_only=False)
            return pa.table(
                {"v": pa.array([int(np.maximum(n - 1, 0).sum())], pa.int64())}
            )

        merged = ds.map_batches(key_partial, batch_format="pyarrow") \
            .groupby("bucket").map_groups(excess, batch_format="pyarrow") \
            .sum("v")
        results[f"unique:{c}"] = int(merged or 0)

    if fk is not None:
        col, ref_ds, ref_col = fk
        orphans = hash_join(
            ds, ref_ds, on=col, right_on=ref_col, how="anti",
            left_cols=[], num_buckets=num_buckets,
        ).count()
        results[f"fk:{col}->{ref_col}"] = int(orphans)

    checks = sorted(results)
    return pa.table(
        {"check": pa.array(checks, pa.string()),
         "violations": pa.array([results[c] for c in checks], pa.int64())}
    )
