"""Generic distributed equi-join.

Ray Data has no native join operator; the engine's special-purpose joins
(as-of, range, search semi-join, co-partitioned verify) each hand-roll the
same shape.  This module is that shape as a reusable primitive:

    tag side → bucket by key-hash → ONE all-to-all (groupby) →
    vectorized per-bucket merge (sort + searchsorted, m×n key expansion)

Scale properties: both sides are column-pruned BEFORE the exchange; the
exchange moves each side once; per-bucket work is one sort of the smaller
(right) side plus two searchsorted probes — no per-key Python.  Hot keys
cost their own m×n output (inherent to the join semantics), not a serial
bucket: raise ``num_buckets`` to spread distinct keys, and pre-aggregate
or salt upstream when a single key's output itself is the bottleneck
(the usual join-skew discipline).

For small-side joins prefer a broadcast lookup inside ``map_batches``
(see relational.orders_per_nation) — this operator is for the
large ⨝ large case where neither side fits a worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowutil import id_buckets


def _prune(t: pa.Table, key: str, cols: list[str] | None) -> pa.Table:
    if cols is None:
        return t
    keep = [key] + [c for c in cols if c != key]
    return t.select(keep)


def hash_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    num_buckets: int = 64,
    suffix: str = "_r",
):
    """Distributed equi-join of two Datasets on a key column →
    Dataset of joined rows (duplicate keys expand m×n, SQL semantics).

    ``how``: ``inner``, ``left`` (keeps unmatched left rows with right
    columns null), ``full`` (additionally keeps unmatched RIGHT rows with
    left columns null; the key column holds COALESCE(left, right) key so
    it is never null), ``semi`` (left rows whose key exists on the right —
    each at most once), or ``anti`` (left rows whose key does NOT exist
    on the right — the decontamination / blocklist shape when the
    blocklist is too large to broadcast; a Bloom side
    (`sketch.bloom_filter_rows`) is the cheaper probabilistic twin).
    ``left_cols`` / ``right_cols`` prune payload columns BEFORE the
    exchange (always pass them at scale); semi/anti ship only the
    right side's KEY column regardless.  A right column whose name
    collides with a left column gets ``suffix``."""
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(
            f"how must be inner/left/full/semi/anti, got {how!r}"
        )
    if how in ("semi", "anti"):
        right_cols = []  # membership needs the key only
    right_on = right_on or on

    def add_side(batch: pa.Table, side: int, key: str) -> pa.Table:
        out = _prune(batch, key, left_cols if side == 0 else right_cols)
        if side == 1 and key != on:
            names = [on if n == key else n for n in out.column_names]
            out = out.rename_columns(names)
        jb = id_buckets(out.column(on), num_buckets)
        out = out.append_column("jb", pa.array(jb, pa.int32()))
        return out.append_column(
            "side", pa.array(np.full(out.num_rows, side, np.int8))
        )

    lt = left.map_batches(
        add_side, fn_kwargs={"side": 0, "key": on}, batch_format="pyarrow"
    )
    rt = right.map_batches(
        add_side, fn_kwargs={"side": 1, "key": right_on},
        batch_format="pyarrow",
    )
    # align the union schema: each side carries the other's columns as
    # nulls (unioned blocks must agree on schema; the nulls never survive
    # the merge).  Schemas come from the INPUT datasets (pure metadata —
    # post-map .schema() is None when a side has zero rows) with the
    # add_side prune/rename applied symbolically.
    def _side_schema(ds, key, cols, rename_to):
        sch = ds.schema()
        m = dict(zip(sch.names, sch.types))
        keep = (list(sch.names) if cols is None
                else [key] + [c for c in cols if c != key])
        return {(rename_to if n == key else n): m[n] for n in keep}

    l_sch = _side_schema(left, on, left_cols, on)
    r_sch = _side_schema(right, right_on, right_cols, on)
    l_names = [n for n in l_sch if n not in ("jb", "side")]
    r_names = [n for n in r_sch if n not in ("jb", "side", on)]
    # suffix right-side collisions
    r_out = {
        n: (n + suffix if n in l_names else n) for n in r_names
    }
    all_names = l_names + [r_out[n] for n in r_names]
    l_types = {n: l_sch[n] for n in l_names}
    r_types = {r_out[n]: r_sch[n] for n in r_names}

    def conform(batch: pa.Table, side: int) -> pa.Table:
        if side == 1:
            batch = batch.rename_columns(
                [r_out.get(n, n) if n not in ("jb", "side", on) else n
                 for n in batch.column_names]
            )
        for n in all_names:
            if n not in batch.column_names:
                ty = l_types.get(n) or r_types.get(n)
                batch = batch.append_column(n, pa.nulls(batch.num_rows, ty))
        return batch.select([on, "jb", "side"]
                            + [n for n in all_names if n != on])

    lt = lt.map_batches(conform, fn_kwargs={"side": 0},
                        batch_format="pyarrow")
    rt = rt.map_batches(conform, fn_kwargs={"side": 1},
                        batch_format="pyarrow")
    payload = [n for n in all_names if n != on]
    l_payload = [n for n in l_names if n != on]
    r_payload = [r_out[n] for n in r_names]

    def merge(group: pa.Table) -> pa.Table:
        sides = group.column("side").to_numpy(zero_copy_only=False)
        lrows = group.filter(pa.array(sides == 0))
        rrows = group.filter(pa.array(sides == 1))
        empty_cols = {on: group.column(on).slice(0, 0)}
        for n in payload:
            empty_cols[n] = group.column(n).slice(0, 0)
        if lrows.num_rows == 0 or (
            how in ("inner", "semi") and rrows.num_rows == 0
        ):
            if how in ("left", "full") and lrows.num_rows:
                li = np.arange(lrows.num_rows)
                return _emit(lrows, rrows, li, np.full(len(li), -1),
                             on, l_payload, r_payload)
            if how == "full" and rrows.num_rows:
                ri = np.arange(rrows.num_rows)
                return _emit(lrows, rrows, np.full(len(ri), -1), ri,
                             on, l_payload, r_payload)
            return pa.table(empty_cols)
        rsorted = rrows.sort_by(on)
        rkeys = rsorted.column(on)
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        lkeys = lrows.column(on)
        if isinstance(lkeys, pa.ChunkedArray):
            lkeys = lkeys.combine_chunks()
        rk = rkeys.to_numpy(zero_copy_only=False)
        lk = lkeys.to_numpy(zero_copy_only=False)
        starts = np.searchsorted(rk, lk, side="left")
        ends = np.searchsorted(rk, lk, side="right")
        counts = ends - starts
        if how in ("semi", "anti"):
            keep = counts > 0 if how == "semi" else counts == 0
            return lrows.filter(pa.array(keep)).drop_columns(["jb", "side"])
        total = int(counts.sum())
        li_m = np.repeat(np.arange(lrows.num_rows), counts)
        base = np.repeat(starts, counts)
        off = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        ri_m = base + off
        if how in ("left", "full"):
            miss = np.flatnonzero(counts == 0)
            li_m = np.concatenate([li_m, miss])
            ri_m = np.concatenate([ri_m, np.full(len(miss), -1)])
        if how == "full":
            # unmatched RIGHT rows: scatter-mark every right index some
            # left row matched, emit the rest with null left payload
            hit = np.zeros(rsorted.num_rows, dtype=bool)
            hit[ri_m[ri_m >= 0]] = True
            rmiss = np.flatnonzero(~hit)
            li_m = np.concatenate([li_m, np.full(len(rmiss), -1)])
            ri_m = np.concatenate([ri_m, rmiss])
        return _emit(lrows, rsorted, li_m, ri_m, on, l_payload, r_payload)

    return lt.union(rt).groupby("jb").map_groups(
        merge, batch_format="pyarrow"
    )


def _emit(lrows, rrows, li, ri, on, l_payload, r_payload) -> pa.Table:
    has_l = li >= 0
    if len(li) and has_l.all():
        lt = pa.array(li)
        cols = {on: _one(lrows.column(on)).take(lt)}
        for n in l_payload:
            cols[n] = _one(lrows.column(n)).take(lt)
    else:
        # full outer: rows with no left match — key = COALESCE(l, r),
        # left payload null
        lmask = pa.array(~has_l)
        rt0 = pa.array(np.where(ri >= 0, ri, 0), pa.int64())
        rkey = (_one(rrows.column(on)).take(rt0) if rrows.num_rows
                else pa.nulls(len(li), lrows.schema.field(on).type))
        if lrows.num_rows:
            lt = pa.array(np.where(has_l, li, 0), pa.int64())
            lkey = _one(lrows.column(on)).take(lt)
            cols = {on: pc.if_else(lmask, rkey, lkey)}
            for n in l_payload:
                taken = _one(lrows.column(n)).take(lt)
                cols[n] = pc.if_else(lmask, pa.nulls(len(li), taken.type),
                                     taken)
        else:
            cols = {on: rkey}
            for n in l_payload:
                cols[n] = pa.nulls(len(li), lrows.schema.field(n).type)
    has_r = ri >= 0
    if len(ri) and has_r.all():
        rt = pa.array(ri)
        for n in r_payload:
            cols[n] = _one(rrows.column(n)).take(rt)
    else:
        mask = pa.array(~has_r)
        if rrows.num_rows:
            rt = pa.array(np.where(has_r, ri, 0), pa.int64())
            for n in r_payload:
                taken = _one(rrows.column(n)).take(rt)
                cols[n] = pc.if_else(
                    mask, pa.nulls(len(ri), taken.type), taken
                )
        else:  # left join, no right rows in this bucket at all
            for n in r_payload:
                cols[n] = pa.nulls(len(ri), rrows.schema.field(n).type)
    return pa.table(cols)


def _one(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def bloom_semi_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    k: int = 2,
    m_bits: int = 1 << 18,
    num_buckets: int = 64,
):
    """Bloom-prefiltered distributed semi-join — output identical to
    ``hash_join(..., how="semi")``, exchange volume bounded by the Bloom
    survivors instead of the whole left side.

    The scale pattern: the right side's keys fold into an m-bit Bloom
    array (``sketch.build_bloom`` — m/8 bytes, e.g. 32 KiB, broadcast
    once via ``ray.put``), the left side drops definite non-members
    INSIDE ``map_batches`` *before* the all-to-all, and the exact
    bucketed semi-join runs only on the surviving fraction, removing the
    Bloom's false positives.  With a selective filter this turns an
    exchange of the full probe table into an exchange of roughly the
    matching rows — the standard Bloom-join discipline for
    large-⨝-selective at 100 TB.  Exactness does not depend on the
    Bloom parameters (FPs are verified away; FNs are impossible)."""
    from .sketch import bloom_filter, build_bloom

    right_on = right_on or on
    keys = right.map_batches(
        lambda b, c=right_on: b.select([c]), batch_format="pyarrow"
    )
    words_ref = build_bloom(keys, right_on, k=k, m_bits=m_bits)
    survivors = bloom_filter(
        left, words_ref, on, k=k, m_bits=m_bits, keep_hits=True
    )
    return hash_join(
        survivors, right, on=on, right_on=right_on, how="semi",
        left_cols=left_cols, num_buckets=num_buckets,
    )


def hash_join_multi(
    left,
    right,
    on: list[str],
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    num_buckets: int = 64,
    suffix: str = "_r",
):
    """Composite-key distributed equi-join — ``on`` is a LIST of key
    columns present on both sides.  Same exchange shape as
    :func:`hash_join` (tag side → bucket by combined key hash → one
    all-to-all), but the per-bucket merge delegates to Arrow's acero
    hash join (``pa.Table.join``) which handles multi-column equality
    exactly and vectorized; the bucket hash combines per-column
    ``id_hash64`` with distinct odd multipliers so co-partition holds for
    every composite value.  ``how``: inner / left / semi / anti."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner/left/semi/anti, got {how!r}")
    arrow_how = {
        "inner": "inner",
        "left": "left outer",
        "semi": "left semi",
        "anti": "left anti",
    }[how]
    from ..functions.arrowutil import id_hash64

    def key_buckets(t: pa.Table) -> np.ndarray:
        h = np.zeros(t.num_rows, np.uint64)
        for i, k in enumerate(on):
            h = h * np.uint64(0x100000001B3) + id_hash64(t.column(k))
        return ((h >> np.uint64(32)) % np.uint64(num_buckets)).astype(
            np.int32
        )

    def prune_side(batch: pa.Table, cols: list[str] | None) -> pa.Table:
        if cols is not None:
            keep = list(on) + [c for c in cols if c not in on]
            batch = batch.select(keep)
        return batch.append_column(
            "jb", pa.array(key_buckets(batch), pa.int32())
        )

    lt = left.map_batches(
        prune_side, fn_kwargs={"cols": left_cols}, batch_format="pyarrow"
    )
    rt = right.map_batches(
        prune_side, fn_kwargs={"cols": right_cols}, batch_format="pyarrow"
    )
    l_names = [n for n in lt.schema().names if n != "jb"]
    r_names = [n for n in rt.schema().names if n != "jb"]
    l_types = dict(zip(lt.schema().names, lt.schema().types))
    r_types = dict(zip(rt.schema().names, rt.schema().types))

    # side tag survives the union; each side carries the other's payload
    # columns as nulls so the unioned blocks share one schema
    def conform(batch: pa.Table, side: int) -> pa.Table:
        batch = batch.append_column(
            "side", pa.array(np.full(batch.num_rows, side, np.int8))
        )
        for n in l_names + r_names:
            if n not in batch.column_names:
                batch = batch.append_column(
                    n, pa.nulls(batch.num_rows, l_types.get(n) or r_types[n])
                )
        return batch.select(["jb", "side"] + list(dict.fromkeys(
            l_names + r_names
        )))

    lt = lt.map_batches(conform, fn_kwargs={"side": 0},
                        batch_format="pyarrow")
    rt = rt.map_batches(conform, fn_kwargs={"side": 1},
                        batch_format="pyarrow")

    r_payload = [n for n in r_names if n not in on]
    l_only = [n for n in l_names]

    def merge(group: pa.Table) -> pa.Table:
        sides = group.column("side").to_numpy(zero_copy_only=False)
        ltab = group.filter(pa.array(sides == 0)).select(l_only)
        rtab = group.filter(pa.array(sides == 1)).select(
            list(on) + r_payload
        )
        out = ltab.join(
            rtab, keys=list(on), join_type=arrow_how,
            right_suffix=suffix, coalesce_keys=True,
        )
        return out.combine_chunks()

    return lt.union(rt).groupby("jb").map_groups(
        merge, batch_format="pyarrow"
    )


def broadcast_join(
    left,
    right_table: pa.Table,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    suffix: str = "_r",
):
    """Small-side broadcast equi-join — the zero-shuffle twin of
    :func:`hash_join` for when the right side fits a worker heap: the
    Arrow table is ``ray.put`` ONCE, each ``map_batches`` task resolves
    it from the local object store (cached per worker process) and joins
    its batch with Arrow's acero hash join.  The left side streams;
    nothing is exchanged.  ``how``: inner / left / semi / anti.

    This is the first-class form of the broadcast-lookup pattern used
    ad hoc by ``relational.orders_per_nation``; prefer it over
    :func:`hash_join` whenever the right side is dimension-table-sized
    (the classic star-schema discipline)."""
    import ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner/left/semi/anti, got {how!r}")
    arrow_how = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti"}[how]
    right_on = right_on or on
    if right_on != on:
        names = [on if c == right_on else c
                 for c in right_table.column_names]
        right_table = right_table.rename_columns(names)
    ref = ray.put(right_table)
    _cache: list = []

    def join_batch(batch: pa.Table) -> pa.Table:
        if not _cache:
            import ray as _ray

            _cache.append(ref if isinstance(ref, pa.Table)
                          else _ray.get(ref))
        out = batch.join(_cache[0], keys=[on], join_type=arrow_how,
                         right_suffix=suffix, coalesce_keys=True)
        return out.combine_chunks()

    return left.map_batches(join_batch, batch_format="pyarrow")


def overlap_pairs(
    ds,
    key: str,
    id_col: str,
    start: str,
    end: str,
    num_buckets: int = 64,
):
    """Keyed interval-overlap self-join → ``(key, id_a, id_b)`` for every
    unordered pair of same-key rows whose half-open intervals
    ``[start, end)`` overlap (``a.start < b.end AND b.start < a.end``),
    with ``id_a < id_b`` — the range-join member of the join family
    (as-of = nearest-earlier, range_count = point-in-interval count,
    this = interval×interval pairs).

    Scale shape: ONE key-hash bucketed exchange (B groups, never one per
    key), then per bucket a single vectorized sweep: dictionary-encode
    keys, sort by (key, start), and for every row count same-key
    candidates with ``start_j < end_i`` via TWO composite searchsorted
    probes over start-ranks (no per-key Python, no lexicographic loop);
    candidates expand m×n and a final mask applies ``end_j > start_i``
    and the ``id_i < id_j`` dedup (each overlapping pair is generated in
    both directions, the id order keeps exactly one).  Hot keys cost
    their own pair output — inherent to the semantics; bound upstream
    (e.g. cap intervals per key) when a single key's pairs explode."""

    def tag(batch: pa.Table) -> pa.Table:
        out = batch.select([key, id_col, start, end])
        jb = id_buckets(out.column(key), num_buckets)
        return out.append_column("jb", pa.array(jb, pa.int32()))

    def sweep(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["jb"])
        n = g.num_rows
        empty = pa.table({
            key: pa.array([], g.schema.field(key).type),
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
        })
        if n < 2:
            return empty
        d = _one(g.column(key)).dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        s = g.column(start).to_numpy(zero_copy_only=False).astype(np.int64)
        e = g.column(end).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((s, codes))
        codes, s, e, ids = codes[order], s[order], e[order], ids[order]
        # start-rank normalization keeps the composite key inside int64:
        # code * (U+1) + rank(start), U = distinct starts in the bucket
        uniq = np.unique(s)
        U = len(uniq) + 1
        comp = codes * U + np.searchsorted(uniq, s)
        lo = np.searchsorted(comp, codes * U)                # key segment
        hi = np.searchsorted(
            comp, codes * U + np.searchsorted(uniq, e, side="left")
        )  # same-key rows with start_j < end_i
        counts = hi - lo
        li = np.repeat(np.arange(n), counts)
        off = np.arange(len(li)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        ri = np.repeat(lo, counts) + off
        keep = (e[ri] > s[li]) & (ids[li] < ids[ri])
        li, ri = li[keep], ri[keep]
        if not len(li):
            return empty
        keys_sorted = _one(g.column(key)).take(pa.array(order))
        return pa.table({
            key: keys_sorted.take(pa.array(li)),
            "id_a": pa.array(ids[li], pa.int64()),
            "id_b": pa.array(ids[ri], pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "jb"
    ).map_groups(sweep, batch_format="pyarrow")


def skew_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    hot_threshold: int = 10_000,
    candidate_frac: float = 0.01,
    num_buckets: int = 64,
    suffix: str = "_r",
):
    """Skew-mitigated inner equi-join: hot probe keys bypass the
    all-to-all exchange through a broadcast of just their dimension rows,
    the cold remainder goes through the bucketed :func:`hash_join`, and
    the two branches union.  Result is bit-identical to a plain inner
    join — skew handling is an execution strategy, not a semantics
    change.

    Hot detection is the heavy-hitters pigeonhole: one column-pruned
    counting pass over the LEFT side emits per-batch keys holding at
    least ``candidate_frac`` of their batch, candidates dedupe through a
    small ``groupby`` (never the raw per-batch rows on the driver), and
    a key is *hot* when its exact recount is ≥ ``hot_threshold``.  A key
    globally hot but under ``candidate_frac`` in every batch is missed —
    that is an efficiency miss only (it joins correctly on the cold
    path), and such a key is by construction at most
    ``candidate_frac × |left|`` rows anyway.

    Scale shape: hot dimension rows are collected (|hot keys| × dup
    factor rows — dimension-sized by assumption) and ``ray.put`` once;
    hot fact rows stream through an Arrow acero join with zero exchange,
    so the single-bucket serialization a hot key would impose on the
    shuffle path never happens.  The left side is read twice (hot and
    cold filters are separate column-pruned lineages) — two cheap pruned
    scans in exchange for removing the skew bottleneck."""
    import ray

    right_on = right_on or on
    frac = candidate_frac

    def cand(batch: pa.Table) -> pa.Table:
        k = _one(batch.column(on))
        vc = pc.value_counts(k)
        keys, cnts = vc.field("values"), vc.field("counts")
        # null keys never enter the hot set (sorted() over None would
        # crash); they flow to the cold path where hash_join raises its
        # documented null-free-key error instead of a confusing sort
        # failure here
        m = pc.and_(
            pc.greater_equal(
                cnts,
                pa.scalar(max(1, int(frac * batch.num_rows)), pa.int64()),
            ),
            pc.is_valid(keys),
        )
        return pa.table({on: keys.filter(m), "cnt": cnts.filter(m)})

    cands = (
        left.select_columns([on])
        .map_batches(cand, batch_format="pyarrow")
        .groupby(on)
        .sum("cnt")
        .take_all()
    )
    hot = [r[on] for r in cands if r["sum(cnt)"] >= hot_threshold]
    if not hot:
        return hash_join(
            left, right, on, right_on=right_on, how="inner",
            left_cols=left_cols, right_cols=right_cols,
            num_buckets=num_buckets, suffix=suffix,
        )
    key_type = left.schema().types[left.schema().names.index(on)]
    hot_arr = pa.array(sorted(hot), key_type)
    hot_ref = ray.put(hot_arr)
    _cache: list = []

    def _hot_values():
        if not _cache:
            _cache.append(
                hot_ref if isinstance(hot_ref, pa.Array) else ray.get(hot_ref)
            )
        return _cache[0]

    def split(batch: pa.Table, key: str, cols, keep_hot: bool) -> pa.Table:
        out = _prune(batch, key, cols)
        mask = pc.is_in(out.column(key), value_set=_hot_values())
        return out.filter(mask if keep_hot else pc.invert(mask))

    # hot dimension rows: small by assumption -> collect + broadcast
    r_hot_ds = right.map_batches(
        split, fn_kwargs={"key": right_on, "cols": right_cols,
                          "keep_hot": True},
        batch_format="pyarrow",
    )
    r_hot = pa.concat_tables(
        [ray.get(ref) for ref in r_hot_ds.to_arrow_refs()]
    ).combine_chunks()
    hot_out = broadcast_join(
        left.map_batches(
            split, fn_kwargs={"key": on, "cols": left_cols,
                              "keep_hot": True},
            batch_format="pyarrow",
        ),
        r_hot, on, right_on=right_on, how="inner", suffix=suffix,
    )
    cold_out = hash_join(
        left.map_batches(
            split, fn_kwargs={"key": on, "cols": left_cols,
                              "keep_hot": False},
            batch_format="pyarrow",
        ),
        right.map_batches(
            split, fn_kwargs={"key": right_on, "cols": right_cols,
                              "keep_hot": False},
            batch_format="pyarrow",
        ),
        on, right_on=right_on, how="inner",
        left_cols=None, right_cols=None,  # already pruned by split
        num_buckets=num_buckets, suffix=suffix,
    )

    # conform both branches to one canonical column order before union
    l_sch = left.schema()
    l_keep = (list(l_sch.names) if left_cols is None
              else [on] + [c for c in left_cols if c != on])
    r_sch = right.schema()
    r_keep = (list(r_sch.names) if right_cols is None
              else [right_on] + [c for c in right_cols if c != right_on])
    r_payload = [c for c in r_keep if c != right_on]
    all_names = l_keep + [
        (c + suffix if c in l_keep else c) for c in r_payload
    ]

    def conform(batch: pa.Table) -> pa.Table:
        return batch.select(all_names)

    return hot_out.map_batches(conform, batch_format="pyarrow").union(
        cold_out.map_batches(conform, batch_format="pyarrow")
    )


def bucket_write(ds, path: str, on: str, num_buckets: int = 64,
                 cols: list[str] | None = None) -> str:
    """Bucketed (hive-partitioned) write: key-hash each row and write
    one ``jb=<b>`` directory per bucket — the storage half of the
    sort-merge-bucket (SMB) pattern.  Pay the shuffle ONCE at write
    time; every later :func:`smb_join` between tables bucketed with the
    SAME ``num_buckets`` and key hash is exchange-free.

    Columns are pruned before the write (pass ``cols`` at scale); the
    bucket id is derived from :func:`~.functions.arrowutil.id_buckets`,
    the same hash every bucketed exchange in the engine uses, so a
    bucket-written table is also drop-in co-partitioned with the
    in-flight side of any hash_join-family operator."""
    def tag(batch: pa.Table) -> pa.Table:
        t = _prune(batch, on, cols)
        return t.append_column(
            "jb", pa.array(id_buckets(t.column(on), num_buckets),
                           pa.int32()))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        path, partition_cols=["jb"])
    return path


def smb_join(left_path: str, right_path: str, on: str,
             num_buckets: int = 64, right_on: str | None = None,
             suffix: str = "_r"):
    """Shuffle-free join of two :func:`bucket_write`-bucketed tables →
    Dataset of inner-joined rows.  Because both sides were hash-bucketed
    on the join key with the same ``num_buckets``, matching keys can
    only live in matching ``jb=<b>`` directories — so the join is one
    INDEPENDENT task per bucket (read both small bucket dirs, one local
    hash join), with no all-to-all anywhere.  This is the Hive/Iceberg
    sort-merge-bucket join shape: the 100 TB win is that N downstream
    joins against the same bucketed fact table cost zero additional
    shuffles (the write amortizes the only exchange).

    The per-bucket driver is a Dataset of bucket ids fanned out via
    ``map_batches(batch_size=1)`` — Ray Data schedules/retries each
    bucket like any other block, and a failed bucket re-reads only its
    own two directories (resume granularity = bucket)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    right_on = right_on or on

    def join_bucket(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("jb").to_pylist():
            lp = os.path.join(left_path, f"jb={b}")
            rp = os.path.join(right_path, f"jb={b}")
            if not (os.path.isdir(lp) and os.path.isdir(rp)):
                continue  # a hash bucket one side never populated
            lt = pq.read_table(lp)
            rt = pq.read_table(rp)
            if rt.num_rows == 0 or lt.num_rows == 0:
                continue
            if right_on != on:
                rt = rt.rename_columns(
                    [on if c == right_on else c for c in rt.column_names])
            out.append(lt.join(rt, keys=on, join_type="inner",
                               right_suffix=suffix))
        if not out:
            # schema-stable empty result derived from the file footers
            ls = pq.read_schema(
                next(_first_file(left_path)))
            rs = pq.read_schema(next(_first_file(right_path)))
            names = list(ls.names)
            fields = list(ls)
            for f in rs:
                nm = on if f.name == right_on else f.name
                if nm == on:
                    continue
                if nm in names:
                    nm = nm + suffix
                names.append(nm)
                fields.append(pa.field(nm, f.type))
            return pa.table({nm: pa.array([], f.type)
                             for nm, f in zip(names, fields)})
        return pa.concat_tables(out, promote_options="default")

    buckets = rd.from_items(
        [{"jb": b} for b in range(num_buckets)]
    ).repartition(num_buckets)
    return buckets.map_batches(join_bucket, batch_size=1,
                               batch_format="pyarrow")


def _first_file(root):
    import os

    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet"):
                yield os.path.join(dirpath, f)
