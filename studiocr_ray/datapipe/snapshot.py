"""Snapshot diffing: classify every document across two crawl snapshots.

The incremental-recrawl primitive: given the previous snapshot and the new
crawl, label each key ``added`` / ``removed`` / ``changed`` / ``unchanged``
so downstream stages (re-extract, re-index, re-embed) touch ONLY the
changed slice instead of the full 100 TB corpus.

Scale shape: each side reduces to narrow ``(id, content_md5, side)`` rows
inside stateless ``map_batches`` (text never leaves its scan); both sides
co-partition by id-hash bucket (ONE all-to-all of 24-byte rows); the
per-bucket merge is two vectorized ``index_in`` lookups — no driver
collection, no per-row Python."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STATUSES = ("added", "removed", "changed", "unchanged")


def _hash_rows(
    batch: pa.Table, side: int, id_col: str, content_col: str,
    num_buckets: int,
) -> pa.Table:
    from ..functions.arrowutil import id_buckets

    ids = batch.column(id_col)
    digests = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column(content_col).to_pylist()
    ]
    return pa.table(
        {
            "ib": pa.array(id_buckets(ids, num_buckets), pa.int32()),
            "side": pa.array(np.full(batch.num_rows, side, np.int8)),
            id_col: ids,
            "h": pa.array(digests, pa.string()),
        }
    )


def _diff_bucket(group: pa.Table, id_col: str) -> pa.Table:
    from .dedup import _flat_arr

    old = group.filter(pc.equal(group.column("side"), 0))
    new = group.filter(pc.equal(group.column("side"), 1))
    old_ids = _flat_arr(old.column(id_col))
    new_ids = _flat_arr(new.column(id_col))
    new_in_old = pc.index_in(new_ids, value_set=old_ids)
    old_in_new = pc.index_in(old_ids, value_set=new_ids)

    matched = ~pc.is_null(new_in_old).to_numpy(zero_copy_only=False)
    old_h = _flat_arr(old.column("h"))
    new_h = _flat_arr(new.column("h"))
    matched_old_h = old_h.take(new_in_old)
    same = pc.equal(new_h, matched_old_h).fill_null(False).to_numpy(
        zero_copy_only=False
    )

    status_new = np.where(
        matched, np.where(same, "unchanged", "changed"), "added"
    )
    removed_mask = pc.is_null(old_in_new).to_numpy(zero_copy_only=False)
    parts = [
        pa.table(
            {
                id_col: new_ids,
                "status": pa.array(status_new, pa.string()),
            }
        ),
        pa.table(
            {
                id_col: old_ids.filter(pa.array(removed_mask)),
                "status": pa.array(
                    np.full(int(removed_mask.sum()), "removed"), pa.string()
                ),
            }
        ),
    ]
    return pa.concat_tables(parts)


def snapshot_diff(
    old_ds,
    new_ds,
    id_col: str = "doc_id",
    content_col: str = "text",
    num_buckets: int = 64,
):
    """→ ``(id, status)`` with one row per key present in either snapshot;
    status ∈ {added, removed, changed, unchanged} (content compared by
    md5)."""
    old_rows = old_ds.map_batches(
        _hash_rows,
        fn_kwargs={"side": 0, "id_col": id_col, "content_col": content_col,
                   "num_buckets": num_buckets},
        batch_format="pyarrow",
    )
    new_rows = new_ds.map_batches(
        _hash_rows,
        fn_kwargs={"side": 1, "id_col": id_col, "content_col": content_col,
                   "num_buckets": num_buckets},
        batch_format="pyarrow",
    )
    return old_rows.union(new_rows).groupby("ib").map_groups(
        _diff_bucket, fn_kwargs={"id_col": id_col}, batch_format="pyarrow"
    )


def _keep_latest(t: pa.Table, key_col: str, ts_col: str,
                 tie_cols: list[str]) -> pa.Table:
    """One vectorized sort + first-of-run scan: newest ``ts_col`` per key,
    ties broken ascending on ``tie_cols`` so the result is deterministic
    regardless of block arrival order."""
    from ..functions.arrowutil import first_of_run_mask

    order = [(key_col, "ascending"), (ts_col, "descending")]
    order += [(c, "ascending") for c in tie_cols]
    t = t.sort_by(order)
    first = first_of_run_mask([t.column(key_col)])
    return t.filter(pa.array(first))


def latest_snapshot(ds, key_col: str = "url", ts_col: str = "warc_ts",
                    num_buckets: int = 64):
    """Crawl-recency dedup: keep, per ``key_col``, the single row with the
    newest ``ts_col`` — the keep-latest twin of ``dedup.exact_dedup``'s
    keep-first (a recurring crawl re-fetches urls; downstream wants only
    the freshest snapshot of each).

    Scale shape (same two-level pattern as exact_dedup): a per-batch
    partial argmax first shrinks every batch to one row per distinct key —
    recrawls of a url that land in the same scan block never reach the
    exchange — then a key-hash bucketed groupby (B groups total, not one
    per key) repeats the identical vectorized sort + neighbor scan per
    bucket.  Full rows ride the exchange exactly once; nothing is
    collected on the driver.  Ties on ``ts_col`` break ascending on the
    remaining columns, so output is bit-deterministic."""
    from ..functions.arrowutil import id_buckets, string_buckets

    def _buckets(col):
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            return string_buckets(col, num_buckets)
        return id_buckets(col, num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        tie = [c for c in batch.column_names if c not in (key_col, ts_col)]
        t = _keep_latest(batch, key_col, ts_col, tie)
        return t.append_column(
            "kb", pa.array(_buckets(t.column(key_col)), pa.int32())
        )

    def merge(group: pa.Table) -> pa.Table:
        tie = [c for c in group.column_names
               if c not in (key_col, ts_col, "kb")]
        return _keep_latest(group, key_col, ts_col, tie).drop_columns(["kb"])

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "kb"
    ).map_groups(merge, batch_format="pyarrow")


def scd2_history(ds, key_col: str = "url", ts_col: str = "warc_ts",
                 num_buckets: int = 64):
    """Slowly-changing-dimension (type 2) version history: every version
    row gains ``valid_from`` (its own ``ts_col``), ``valid_to`` (the NEXT
    version's timestamp, null while current) and ``is_current`` — the
    full-history twin of ``latest_snapshot`` (which keeps only the newest
    row).  The classic warehouse shape for "what did this url say at time
    T" queries over a recurring crawl.

    Scale shape: a key-hash bucketed groupby (B groups total, never one
    per key) co-locates every version of a key, then each bucket does ONE
    vectorized sort + one shifted same-key compare — no per-key Python,
    no window-function state.  Full rows ride the exchange exactly once
    (inherent: the output IS the history).  Ties on ``ts_col`` break
    ascending on the remaining columns, so output is bit-deterministic."""
    from ..functions.arrowutil import id_buckets, string_buckets

    def _buckets(col):
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            return string_buckets(col, num_buckets)
        return id_buckets(col, num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "kb", pa.array(_buckets(batch.column(key_col)), pa.int32())
        )

    def hist(group: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc2

        g = group.drop_columns(["kb"])
        tie = [c for c in g.column_names if c not in (key_col, ts_col)]
        order = [(key_col, "ascending"), (ts_col, "ascending")]
        order += [(c, "ascending") for c in tie]
        t = g.sort_by(order)
        n = t.num_rows
        ts = t.column(ts_col).to_numpy(zero_copy_only=False)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        same_next = np.zeros(n, bool)
        if n > 1:
            same_next[:-1] = pc2.equal(
                keys.slice(0, n - 1), keys.slice(1, n)
            ).to_numpy(zero_copy_only=False)
        nxt = np.empty(n, dtype=ts.dtype)
        if n > 1:
            nxt[:-1] = ts[1:]
        valid_to = pa.array(
            np.where(same_next, nxt, 0), pa.int64(),
            mask=~same_next,
        )
        cols = {key_col: keys,
                "valid_from": pc.cast(t.column(ts_col), pa.int64()),
                "valid_to": valid_to,
                "is_current": pa.array(~same_next)}
        for c in tie:
            cols[c] = t.column(c)
        return pa.table(cols)

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "kb"
    ).map_groups(hist, batch_format="pyarrow")


def survivorship(ds, key_col: str = "url", ts_col: str = "ts_us",
                 text_col: str = "text", num_buckets: int = 64):
    """Golden-record merge over a recurring crawl: per ``key_col``, fuse
    every version's fields into ONE survivor row — ``first_ts`` /
    ``last_ts`` (crawl span), ``n_versions``, ``n_texts`` (distinct
    contents), ``max_len`` (longest version), ``latest_text`` (content
    of the newest version; ties on ``ts_col`` break text-descending so
    output is bit-deterministic) — the MDM-style survivorship twin of
    :func:`latest_snapshot` (which keeps a raw row) and
    :func:`scd2_history` (which keeps them all).

    Scale shape: the per-batch partial first collapses to DISTINCT
    ``(key, text)`` rows carrying combinable stats (min/max ts, count,
    len) — recrawls with unchanged content collapse before the exchange,
    and distinct-text counting stays exact across batches because the
    (key, text) identity itself rides to the merge.  Then ONE key-hash
    bucketed groupby repeats the same vectorized sort + ``reduceat``
    per bucket and folds texts per key.  No driver state, no per-key
    Python."""
    import pyarrow.compute as pc2

    from ..functions.arrowutil import (first_of_run_mask, id_buckets,
                                       string_buckets)

    def _buckets(col):
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            return string_buckets(col, num_buckets)
        return id_buckets(col, num_buckets)

    def _collapse(t: pa.Table, min_col: str, max_col: str, cnt_col: str,
                  cnt_is_sum: bool) -> pa.Table:
        """Distinct (key, text) rows with min/max ts and version count,
        via one sort + reduceat."""
        t = t.sort_by([(key_col, "ascending"), (text_col, "ascending"),
                       (min_col, "ascending")])
        keys = t.column(key_col)
        texts = t.column(text_col)
        starts = np.flatnonzero(first_of_run_mask([keys, texts]))
        mn = np.minimum.reduceat(
            t.column(min_col).to_numpy(zero_copy_only=False), starts)
        mx = np.maximum.reduceat(
            t.column(max_col).to_numpy(zero_copy_only=False), starts)
        if cnt_is_sum:
            cnt = np.add.reduceat(
                t.column(cnt_col).to_numpy(zero_copy_only=False), starts)
        else:
            n = t.num_rows
            cnt = np.diff(np.concatenate((starts, [n])))
        sel = pa.array(starts.astype(np.int64))
        return pa.table({
            key_col: pc2.take(keys, sel),
            text_col: pc2.take(texts, sel),
            "min_ts": pa.array(mn, pa.int64()),
            "max_ts": pa.array(mx, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, ts_col, text_col])
        t = t.set_column(t.column_names.index(ts_col), ts_col,
                         pc2.cast(t.column(ts_col), pa.int64()))
        t = t.rename_columns(
            [{"%s" % ts_col: "min_ts"}.get(c, c) for c in t.column_names])
        t = t.append_column("max_ts", t.column("min_ts"))
        out = _collapse(t, "min_ts", "max_ts", "cnt", cnt_is_sum=False)
        return out.append_column(
            "kb", pa.array(_buckets(out.column(key_col)), pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        g = _collapse(group.drop_columns(["kb"]), "min_ts", "max_ts",
                      "cnt", cnt_is_sum=True)
        # per-key fold over the distinct-text rows: newest-first order
        # puts each key's survivor text at its run head
        g = g.sort_by([(key_col, "ascending"), ("max_ts", "descending"),
                       (text_col, "descending")])
        keys = g.column(key_col)
        starts = np.flatnonzero(first_of_run_mask([keys]))
        ends = np.concatenate((starts[1:], [g.num_rows]))
        mn = np.minimum.reduceat(
            g.column("min_ts").to_numpy(zero_copy_only=False), starts)
        mx = np.maximum.reduceat(
            g.column("max_ts").to_numpy(zero_copy_only=False), starts)
        nv = np.add.reduceat(
            g.column("cnt").to_numpy(zero_copy_only=False), starts)
        lens = pc2.utf8_length(g.column(text_col)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ml = np.maximum.reduceat(lens, starts)
        sel = pa.array(starts.astype(np.int64))
        return pa.table({
            key_col: pc2.take(keys, sel),
            "first_ts": pa.array(mn, pa.int64()),
            "last_ts": pa.array(mx, pa.int64()),
            "n_versions": pa.array(nv, pa.int64()),
            "n_texts": pa.array(ends - starts, pa.int64()),
            "max_len": pa.array(ml, pa.int64()),
            "latest_text": pc2.take(g.column(text_col), sel),
        })

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "kb"
    ).map_groups(merge, batch_format="pyarrow")
