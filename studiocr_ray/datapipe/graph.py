"""Webgraph link analysis: distributed integer PageRank.

PageRank is the canonical crawl-prioritization / page-quality prior
(Page et al. 1999).  This variant keeps every score an int64 in
micro-units (1.0 → 1_000_000) and replaces the float damping update with

    p'(v) = (unit * (100 - d)) // 100  +  (d * Σ_{u→v} p(u) // out(u)) // 100

— all integer ``//`` / ``+`` arithmetic, so K iterations are
bit-reproducible across batch sizes, partitionings and cluster shapes, and
a SQL oracle can unroll the exact same K steps.  (Float PageRank sums are
addition-order-dependent — the same reason the repo's other scores use
integer quantization.)

Scale shape — ONE all-to-all per iteration: because the damp key
``hash(dst)`` of round t equals the contribute key ``hash(src)`` of round
t+1, both halves fuse into a single ``groupby(bucket).map_groups`` step:
each bucket damps its nodes' incoming contributions, immediately emits the
next round's outgoing contributions (out-degrees are recomputed in-bucket
— every edge of a src lives in src's bucket), and passes its edge rows
through unchanged.  Rows are narrow (int8 role + 3 int64s); node scores
never touch the driver.  The K rounds build one fixed-depth lazy lineage
executed in a single streaming run (no per-round materialize — there is no
convergence check, unlike dedup.duplicate_clusters_ds)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ib(col, num_buckets: int) -> pa.Array:
    from ..functions.arrowutil import id_buckets

    return pa.array(id_buckets(col, num_buckets), pa.int32())


def _damp_bucket(group: pa.Table, base: int, damping_pct: int):
    """Contribution rows (a=dst, val=c) of one bucket → (v, p) via sorted
    run int64 sums (``np.add.reduceat`` — bincount's float weights would
    cap exactness at 2^53)."""
    from ..functions.arrowutil import first_of_run_mask
    from .dedup import _flat_arr

    t = group.sort_by([("a", "ascending")])
    first = first_of_run_mask([t.column("a")])
    c = t.column("val").to_numpy(zero_copy_only=False)
    sums = np.add.reduceat(c, np.flatnonzero(first))
    v = _flat_arr(t.column("a")).filter(pa.array(first))
    p = base + (damping_pct * sums) // 100
    return v, p


def pagerank_int(
    edges_ds,
    nodes_ds,
    iters: int = 5,
    damping_pct: int = 85,
    unit: int = 1_000_000,
    num_buckets: int = 32,
):
    """→ ``(doc_id, rank_u)`` — integer-micro-unit PageRank after ``iters``
    synchronous iterations over ``edges_ds`` (src, dst) and ``nodes_ds``
    (v).  Self-loops and duplicate edges must already be removed (the
    degree and contribution math assumes a simple graph).  Every node is
    assumed to have out-degree ≥ 1 (no dangling-mass redistribution)."""
    base = (unit * (100 - damping_pct)) // 100

    # Unified row schema for the per-round union:
    #   role 0 (contribution): b = hash(dst),  a = dst,  val = c
    #   role 1 (edge):         b = hash(src),  a = src,  dst, val unused
    def seed_rows(batch: pa.Table) -> pa.Table:
        v = batch.column("v")
        return pa.table(
            {
                "b": _ib(v, num_buckets),
                "role": pa.array(np.zeros(batch.num_rows, np.int8)),
                "a": v,
                "dst": v,
                # damp(seed=unit) = base + (d*unit)//100 = unit exactly for
                # unit divisible by 100 ⇒ round 1 reproduces p0 = unit
                "val": pa.array(np.full(batch.num_rows, unit, np.int64)),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        return pa.table(
            {
                "b": _ib(src, num_buckets),
                "role": pa.array(np.ones(batch.num_rows, np.int8)),
                "a": src,
                "dst": batch.column("dst"),
                "val": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    def fused_step(group: pa.Table) -> pa.Table:
        """damp(contributions) → emit next contributions + zero rows, pass
        edges through.  One vectorized pass, no per-node Python."""
        from .dedup import _flat_arr
        from .relational import _dict_encode

        contrib = group.filter(pc.equal(group.column("role"), 0))
        edges = group.filter(pc.equal(group.column("role"), 1))
        v, p = _damp_bucket(contrib, base, damping_pct)

        # next round's zero rows keep every node present in its bucket
        zero = pa.table(
            {
                "b": _ib(v, num_buckets),
                "role": pa.array(np.zeros(len(v), np.int8)),
                "a": v,
                "dst": v,
                "val": pa.array(np.zeros(len(v), np.int64)),
            }
        )
        if edges.num_rows == 0:
            return zero
        src = _flat_arr(edges.column("a"))
        d = _dict_encode(src)
        codes = d.indices.to_numpy(zero_copy_only=False)
        deg = np.bincount(codes, minlength=len(d.dictionary))[codes]
        idx = pc.index_in(src, value_set=v)
        p_src = pa.array(p, pa.int64()).take(idx).to_numpy(
            zero_copy_only=False
        )
        out = pa.table(
            {
                "b": _ib(edges.column("dst"), num_buckets),
                "role": pa.array(np.zeros(edges.num_rows, np.int8)),
                "a": edges.column("dst"),
                "dst": edges.column("dst"),
                "val": pa.array(p_src // deg, pa.int64()),
            }
        )
        return pa.concat_tables([zero, out, edges])

    def final_damp(group: pa.Table) -> pa.Table:
        contrib = group.filter(pc.equal(group.column("role"), 0))
        v, p = _damp_bucket(contrib, base, damping_pct)
        return pa.table({"doc_id": v, "rank_u": pa.array(p, pa.int64())})

    rows = nodes_ds.map_batches(seed_rows, batch_format="pyarrow").union(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
    )
    for _ in range(iters):
        rows = rows.groupby("b").map_groups(
            fused_step, batch_format="pyarrow"
        )
    return rows.groupby("b").map_groups(final_damp, batch_format="pyarrow")


def triangle_count(edges_ds, num_buckets: int = 64):
    """EXACT triangle count over an undirected graph → one-row table
    ``(n_triangles,)`` — the standard two-round wedge algorithm (Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW 2011; node-iterator MR form).

    ``edges_ds``: (src, dst) rows, any direction, duplicates allowed.
    Round 0 canonicalizes to distinct ``u < v`` edges (pair-hash
    bucketed dedup; self-loops dropped).  Round 1 groups edges by their
    LOWER endpoint and emits each node's wedges — the (v_i, v_j)
    neighbor pairs that close a triangle iff they are themselves an
    edge.  Round 2 co-partitions wedges with edges by pair hash and
    counts matches with one acero join per bucket.  Narrow int rows
    throughout; the known skew cost is a hub's d² wedges (inherent to
    exact counting — cap/split hot nodes upstream if a true hub graph
    needs it)."""
    from ..functions.arrowutil import (first_of_run_mask, id_buckets,
                                       pair_buckets)
    from .dedup import _flat_arr

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = np.minimum(s, d), np.maximum(s, d)
        key = np.unique(np.stack([u, v], axis=1), axis=0)
        t = pa.table({"u": pa.array(key[:, 0], pa.int64()),
                      "v": pa.array(key[:, 1], pa.int64())})
        return t.append_column(
            "pb", pa.array(pair_buckets(t.column("u"), t.column("v"),
                                        num_buckets), pa.int32()),
        )

    def dedup(group: pa.Table) -> pa.Table:
        t = group.sort_by([("u", "ascending"), ("v", "ascending")])
        first = first_of_run_mask([t.column("u"), t.column("v")])
        t = t.filter(pa.array(first)).select(["u", "v"])
        return t.append_column(
            "ub", pa.array(id_buckets(t.column("u"), num_buckets),
                           pa.int32()),
        )

    edges = edges_ds.map_batches(canon, batch_format="pyarrow") \
        .groupby("pb").map_groups(dedup, batch_format="pyarrow")

    def wedges(group: pa.Table) -> pa.Table:
        t = group.sort_by([("u", "ascending"), ("v", "ascending")])
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = _flat_arr(t.column("v")).to_numpy(zero_copy_only=False)
        n = len(u)
        out_a, out_b = [], []
        change = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1,
                                 [n]))
        for s, e in zip(change[:-1], change[1:]):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, 1)
            out_a.append(v[i + s])  # neighbors sorted ⇒ a < b
            out_b.append(v[j + s])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "qb": pa.array([], pa.int32())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        t2 = pa.table({"a": pa.array(a, pa.int64()),
                       "b": pa.array(b, pa.int64()),
                       "kind": pa.array(np.zeros(len(a), np.int8))})
        return t2.append_column(
            "qb", pa.array(pair_buckets(t2.column("a"), t2.column("b"),
                                        num_buckets), pa.int32()),
        )

    def as_edge_rows(batch: pa.Table) -> pa.Table:
        t = pa.table({"a": batch.column("u"), "b": batch.column("v"),
                      "kind": pa.array(np.ones(batch.num_rows, np.int8))})
        return t.append_column(
            "qb", pa.array(pair_buckets(t.column("a"), t.column("b"),
                                        num_buckets), pa.int32()),
        )

    wedge_rows = edges.groupby("ub").map_groups(
        wedges, batch_format="pyarrow"
    )
    edge_rows = edges.map_batches(as_edge_rows, batch_format="pyarrow")

    def close(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        w = group.filter(pa.array(kind == 0)).select(["a", "b"])
        e = group.filter(pa.array(kind == 1)).select(["a", "b"])
        if w.num_rows == 0 or e.num_rows == 0:
            n = 0
        else:
            n = w.join(e, keys=["a", "b"], join_type="inner").num_rows
        return pa.table({"n": pa.array([n], pa.int64())})

    total = wedge_rows.union(edge_rows).groupby("qb").map_groups(
        close, batch_format="pyarrow"
    ).sum("n")
    return pa.table(
        {"n_triangles": pa.array([int(total or 0)], pa.int64())}
    )


def two_hop_counts(edges_ds, num_buckets: int = 64):
    """EXACT distinct two-hop neighborhood size per node over a DIRECTED
    graph → ``(v, n_two_hop)`` rows, one per node with at least one
    two-hop neighbor: ``n_two_hop(v) = |{w : v→u, u→w, w ≠ v}|`` — the
    friends-of-friends count (SQL: self-join on the mid node + COUNT
    DISTINCT).

    ``edges_ds``: (src, dst) rows, duplicates allowed; self-loops dropped.
    Three narrow-row exchanges: (0) distinct directed edges via pair-hash
    bucketed dedup; (1) each edge ships twice keyed by its MID-node hash
    — once as an in-edge of ``dst``, once as an out-edge of ``src`` — and
    each mid-node run emits its in×out walk pairs vectorized; (2) walk
    pairs co-partition by (v, w) pair hash so a per-bucket distinct is a
    GLOBAL distinct, and per-bucket per-v partial counts merge in one
    final small groupby.  The known skew cost is a hub's d_in·d_out walk
    pairs (inherent to the exact count — cap or sketch hot mids upstream
    if a true hub graph needs it; cf. HLL in sketch.py for the
    approximate twin)."""
    from ..functions.arrowutil import (first_of_run_mask, id_buckets,
                                       pair_buckets)
    from .dedup import _flat_arr

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        key = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        t = pa.table({"src": pa.array(key[:, 0], pa.int64()),
                      "dst": pa.array(key[:, 1], pa.int64())})
        return t.append_column(
            "pb", pa.array(pair_buckets(t.column("src"), t.column("dst"),
                                        num_buckets), pa.int32()),
        )

    def dedup(group: pa.Table) -> pa.Table:
        t = group.sort_by([("src", "ascending"), ("dst", "ascending")])
        first = first_of_run_mask([t.column("src"), t.column("dst")])
        t = t.filter(pa.array(first))
        s = _flat_arr(t.column("src"))
        d = _flat_arr(t.column("dst"))
        # each distinct edge twice: keyed by its mid node (dst for the
        # in-edge role, src for the out-edge role)
        mid = pa.concat_arrays([d, s])
        other = pa.concat_arrays([s, d])
        role = np.concatenate([np.zeros(len(s), np.int8),
                               np.ones(len(s), np.int8)])
        out = pa.table({"mid": mid, "other": other,
                        "role": pa.array(role)})
        return out.append_column(
            "mb", pa.array(id_buckets(out.column("mid"), num_buckets),
                           pa.int32()),
        )

    halves = edges_ds.map_batches(canon, batch_format="pyarrow") \
        .groupby("pb").map_groups(dedup, batch_format="pyarrow")

    def walks(group: pa.Table) -> pa.Table:
        t = group.sort_by([("mid", "ascending"), ("role", "ascending")])
        mid = t.column("mid").to_numpy(zero_copy_only=False)
        role = t.column("role").to_numpy(zero_copy_only=False)
        other = _flat_arr(t.column("other")).to_numpy(zero_copy_only=False)
        n = len(mid)
        change = np.concatenate(([0], np.flatnonzero(mid[1:] != mid[:-1]) + 1,
                                 [n]))
        # fully vectorized in×out expansion over the mid-node runs (no
        # per-mid Python): roles sort 0…0,1…1 within a run, so pair k of
        # run r is (ins[k // n_out_r], outs[k % n_out_r])
        starts, ends = change[:-1], change[1:]
        n_in = np.add.reduceat(
            (role == 0).astype(np.int64), starts
        ) if n else np.array([], np.int64)
        n_out = (ends - starts) - n_in
        pairs = n_in * n_out
        total = int(pairs.sum())
        if total == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "wb": pa.array([], pa.int32())})
        seg = np.repeat(np.arange(len(starts)), pairs)
        p = np.arange(total) - np.repeat(np.cumsum(pairs) - pairs, pairs)
        b = n_out[seg]
        v = other[starts[seg] + p // b]
        w = other[starts[seg] + n_in[seg] + p % b]
        keep = v != w
        if not keep.any():
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "wb": pa.array([], pa.int32())})
        t2 = pa.table({"v": pa.array(v[keep], pa.int64()),
                       "w": pa.array(w[keep], pa.int64())})
        return t2.append_column(
            "wb", pa.array(pair_buckets(t2.column("v"), t2.column("w"),
                                        num_buckets), pa.int32()),
        )

    def distinct_partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("v", "ascending"), ("w", "ascending")])
        first = first_of_run_mask([t.column("v"), t.column("w")])
        v = t.column("v").to_numpy(zero_copy_only=False)[first]
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum

    return (
        halves.groupby("mb").map_groups(walks, batch_format="pyarrow")
        .groupby("wb").map_groups(distinct_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n_two_hop"))
    )


def random_walks(edges_ds, nodes_ds, length: int = 4,
                 num_buckets: int = 32):
    """DETERMINISTIC pseudo-random walks of ``length`` steps from every
    node → ``(start, step, node)`` rows, step 0..length — graph-context
    sampling for node2vec/DeepWalk-style training data (Grover &
    Leskovec, KDD 2016) made reproducible: the next hop from ``cur`` in
    the walk started at ``s`` on step ``t`` is the out-neighbor ``w``
    minimizing ``(splitmix64(s·1000003 + t·999983 + w), w)`` — a pure
    function of the row, so N- and 4N-node runs, re-runs and resumes
    produce byte-identical walks, and a SQL oracle can unroll the same
    steps (splitmix64 is UHUGEINT-expressible, see
    ``oracle_sql()['shuffle_rank']``).  Walks terminate early at sinks
    (no out-edges).

    Scale shape — ONE all-to-all per step, the pagerank_int pattern:
    walk rows (narrow ints) co-partition with edge rows by
    ``hash(cur) == hash(src)``; each bucket advances its walks with a
    fully vectorized segment-argmin over the walks' neighbor runs
    (searchsorted + repeat + lexsort, no per-walk Python), emits visit
    rows, and passes edges through re-keyed.  The ``length`` steps build
    one fixed-depth lazy lineage executed in a single streaming run."""
    from ..functions.arrowutil import id_buckets
    from .dedup import _flat_arr
    from .sample import splitmix64

    K1 = np.uint64(1000003)
    K2 = np.uint64(999983)

    def _b(arr) -> pa.Array:
        return pa.array(id_buckets(arr, num_buckets), pa.int32())

    # unified row schema:
    #   role 0 (walk):  a = cur,   o = start, t = step   (bucket hash(cur))
    #   role 1 (edge):  a = src,   o = dst,   t unused   (bucket hash(src))
    #   role 2 (visit): a = start, o = node,  t = step   (passthrough)
    def seed_rows(batch: pa.Table) -> pa.Table:
        v = batch.column("v")
        n = batch.num_rows
        return pa.table({
            "b": pa.concat_arrays([_b(v), _b(v)]),
            "role": pa.array(np.concatenate(
                [np.zeros(n, np.int8), np.full(n, 2, np.int8)])),
            "a": pa.concat_arrays([_flat_arr(v), _flat_arr(v)]),
            "o": pa.concat_arrays([_flat_arr(v), _flat_arr(v)]),
            "t": pa.array(np.zeros(2 * n, np.int64)),
        })

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        return pa.table({
            "b": _b(src),
            "role": pa.array(np.ones(batch.num_rows, np.int8)),
            "a": src,
            "o": batch.column("dst"),
            "t": pa.array(np.zeros(batch.num_rows, np.int64)),
        })

    def step(group: pa.Table) -> pa.Table:
        walks = group.filter(pc.equal(group.column("role"), 0))
        edges = group.filter(pc.equal(group.column("role"), 1))
        visits = group.filter(pc.equal(group.column("role"), 2))
        out = [visits, edges]
        if walks.num_rows and edges.num_rows:
            e = edges.sort_by([("a", "ascending")])
            esrc = e.column("a").to_numpy(zero_copy_only=False)
            edst = e.column("o").to_numpy(zero_copy_only=False)
            cur = walks.column("a").to_numpy(zero_copy_only=False)
            start = walks.column("o").to_numpy(zero_copy_only=False)
            ts = walks.column("t").to_numpy(zero_copy_only=False)
            lo = np.searchsorted(esrc, cur, side="left")
            hi = np.searchsorted(esrc, cur, side="right")
            alive = hi > lo
            if alive.any():
                lo, hi = lo[alive], hi[alive]
                start, ts = start[alive], ts[alive]
                reps = hi - lo
                total = int(reps.sum())
                base = np.repeat(lo, reps)
                offs = np.arange(total) - np.repeat(
                    np.cumsum(reps) - reps, reps)
                dsts = edst[base + offs]
                h = splitmix64(
                    np.repeat(start, reps).astype(np.uint64) * K1
                    + np.repeat(ts, reps).astype(np.uint64) * K2
                    + dsts.astype(np.uint64)
                )
                seg = np.repeat(np.arange(len(reps)), reps)
                order = np.lexsort((dsts, h, seg))
                first = np.concatenate(
                    ([0], np.cumsum(reps)[:-1])).astype(np.int64)
                nxt = dsts[order[first]]
                nb = pa.array(id_buckets(
                    pa.array(nxt, pa.int64()), num_buckets), pa.int32())
                n = len(nxt)
                out.append(pa.table({
                    "b": pa.concat_arrays([nb, nb]),
                    "role": pa.array(np.concatenate(
                        [np.zeros(n, np.int8), np.full(n, 2, np.int8)])),
                    "a": pa.array(np.concatenate([nxt, start]), pa.int64()),
                    "o": pa.array(np.concatenate([start, nxt]), pa.int64()),
                    "t": pa.array(np.concatenate([ts + 1, ts + 1]),
                                  pa.int64()),
                }))
        return pa.concat_tables([t for t in out if t.num_rows]) \
            if any(t.num_rows for t in out) else group.slice(0, 0)

    def finish(batch: pa.Table) -> pa.Table:
        v = batch.filter(pc.equal(batch.column("role"), 2))
        return pa.table({"start": v.column("a"),
                         "step": v.column("t"),
                         "node": v.column("o")})

    rows = nodes_ds.map_batches(seed_rows, batch_format="pyarrow").union(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
    )
    for _ in range(length):
        rows = rows.groupby("b").map_groups(step, batch_format="pyarrow")
    return rows.map_batches(finish, batch_format="pyarrow")


def hits_int(edges_ds, nodes_ds, iters: int = 2, unit: int = 10_000,
             div: int = 1, num_buckets: int = 32):
    """Integer HITS hubs & authorities (Kleinberg, JACM 1999) →
    ``(doc_id, hub_u, auth_u)`` after ``iters`` synchronous rounds:
    ``a'(v) = (Σ_{u→v} h(u)) // div`` then ``h'(u) = (Σ_{u→v} a'(v)) //
    div``, seeded ``h0 = unit``.  All arithmetic is int64 ``+``/``//``,
    so the scores are bit-reproducible across batch sizes, partitionings
    and cluster shapes, and a SQL oracle unrolls the same rounds.  In
    place of the float L2 normalization (addition-order-dependent, never
    hash-matchable) the fixed ``div`` bounds growth: magnitudes scale
    ~``(d_in·d_out/div²)`` per round, so pick ``div ≈ mean degree`` (or
    leave 1 for small ``iters``) to keep ``unit·(d²/div²)^iters`` inside
    int64 — rankings, the product HITS consumes, are unaffected.

    Scale shape — the :func:`pagerank_int` fusion with an ALTERNATING
    key: each half-round is ONE all-to-all in which a bucket sums its
    nodes' incoming contributions, immediately emits the opposite-role
    contributions along its resident edges, and re-keys the edges for
    the next half-round (src-hash ↔ dst-hash).  Rows are narrow ints;
    scores never touch the driver; the ``2·iters`` half-rounds build one
    fixed-depth lazy lineage.  Nodes with no in-edges hold a = 0 (and
    h = 0 once out-contributions require them); every node appears in
    the output because zero rows persist node presence per bucket."""
    from .dedup import _flat_arr

    def _b(arr) -> pa.Array:
        from ..functions.arrowutil import id_buckets

        return pa.array(id_buckets(arr, num_buckets), pa.int32())

    def _sums(vals: np.ndarray, first_idx: np.ndarray) -> np.ndarray:
        """Per-run int64 sums with an a-priori overflow guard: with div=1
        score magnitudes grow ~unit·(d_in·d_out)^iters per round, and
        np.add.reduceat wraps SILENTLY past int64 — the output would still
        look bit-reproducible while being wrong.  The bound n·max|val| <
        2^62 (Python-int arithmetic, cannot itself overflow) is sufficient
        for every intermediate partial sum, so a dense graph fails loudly
        with a div/iters hint instead of wrapping (ADVICE r4)."""
        if len(vals):
            m = int(np.abs(vals).max())
            if m and len(vals) * m >= 2 ** 62:
                raise OverflowError(
                    "hits_int: potential int64 overflow in score sums "
                    f"(n={len(vals)}, max|val|={m}); raise div (≈ mean "
                    "degree) or lower iters to keep unit·(d²/div²)^iters "
                    "inside int64")
        return np.add.reduceat(vals, first_idx) // div

    # role 0: contribution/score row  (a = node, val = score term)
    # role 1: edge row                (a = key end, o = other end)
    # Invariant entering a half-round keyed for side S ∈ {src, dst}:
    # contribution rows of S-nodes and edge rows keyed by their S end.
    def seed_scores(batch: pa.Table) -> pa.Table:
        v = batch.column("v")
        return pa.table({
            "b": _b(v),
            "role": pa.array(np.zeros(batch.num_rows, np.int8)),
            "a": v,
            "o": v,
            "val": pa.array(np.full(batch.num_rows, unit * div, np.int64)),
        })

    def seed_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        return pa.table({
            "b": _b(src),
            "role": pa.array(np.ones(batch.num_rows, np.int8)),
            "a": src,
            "o": batch.column("dst"),
            "val": pa.array(np.zeros(batch.num_rows, np.int64)),
        })

    def half(group: pa.Table, last: bool = False) -> pa.Table:
        """Sum contributions → score; emit score along edges keyed by the
        OTHER end; re-key edges by their other end."""
        contrib = group.filter(pc.equal(group.column("role"), 0))
        edges = group.filter(pc.equal(group.column("role"), 1))
        t = contrib.sort_by([("a", "ascending")])
        from ..functions.arrowutil import first_of_run_mask

        first = first_of_run_mask([t.column("a")])
        sums = _sums(t.column("val").to_numpy(zero_copy_only=False),
                     np.flatnonzero(first))
        v = _flat_arr(t.column("a")).filter(pa.array(first))
        if last:
            return pa.table({"doc_id": v,
                             "score_u": pa.array(sums, pa.int64())})
        zero = pa.table({
            "b": _b(v),
            "role": pa.array(np.zeros(len(v), np.int8)),
            "a": v,
            "o": v,
            "val": pa.array(np.zeros(len(v), np.int64)),
        })
        if edges.num_rows == 0:
            return zero
        idx = pc.index_in(edges.column("a"), value_set=v)
        sc = pa.array(sums, pa.int64()).take(idx) \
            .to_numpy(zero_copy_only=False)
        sc = np.nan_to_num(sc, nan=0.0).astype(np.int64) \
            if sc.dtype != np.int64 else sc
        other = edges.column("o")
        out = pa.table({
            "b": _b(other),
            "role": pa.array(np.zeros(edges.num_rows, np.int8)),
            "a": other,
            "o": other,
            "val": pa.array(sc, pa.int64()),
        })
        flipped = pa.table({
            "b": _b(other),
            "role": pa.array(np.ones(edges.num_rows, np.int8)),
            "a": other,
            "o": edges.column("a"),
            "val": pa.array(np.zeros(edges.num_rows, np.int64)),
        })
        return pa.concat_tables([zero, out, flipped])

    def half_emit_auth(group: pa.Table) -> pa.Table:
        """The (2·iters-1)-th half-round: advance normally AND emit the
        authority scores as role-2 passthrough rows keyed by node hash,
        so one lineage yields both final score families."""
        out = half(group)
        if "doc_id" in out.column_names:  # pragma: no cover - not last
            return out
        contrib = group.filter(pc.equal(group.column("role"), 0))
        t = contrib.sort_by([("a", "ascending")])
        from ..functions.arrowutil import first_of_run_mask

        first = first_of_run_mask([t.column("a")])
        sums = _sums(t.column("val").to_numpy(zero_copy_only=False),
                     np.flatnonzero(first))
        v = _flat_arr(t.column("a")).filter(pa.array(first))
        keep = pa.table({
            "b": _b(v),
            "role": pa.array(np.full(len(v), 2, np.int8)),
            "a": v,
            "o": v,
            "val": pa.array(sums, pa.int64()),
        })
        return pa.concat_tables([out, keep])

    def last_half(group: pa.Table) -> pa.Table:
        """Final half-round: hub sums + the passthrough authority rows
        combine in-bucket into (doc_id, hub_u, auth_u)."""
        from ..functions.arrowutil import first_of_run_mask

        contrib = group.filter(pc.equal(group.column("role"), 0))
        auth = group.filter(pc.equal(group.column("role"), 2))
        t = contrib.sort_by([("a", "ascending")])
        first = first_of_run_mask([t.column("a")])
        sums = _sums(t.column("val").to_numpy(zero_copy_only=False),
                     np.flatnonzero(first))
        v = _flat_arr(t.column("a")).filter(pa.array(first))
        idx = pc.index_in(v, value_set=auth.column("a"))
        a_val = auth.column("val").take(idx).to_numpy(
            zero_copy_only=False)
        a_val = np.where(np.isnan(a_val), 0, a_val).astype(np.int64) \
            if a_val.dtype.kind == "f" else a_val.astype(np.int64)
        return pa.table({
            "doc_id": v,
            "hub_u": pa.array(sums, pa.int64()),
            "auth_u": pa.array(a_val, pa.int64()),
        })

    rows = nodes_ds.map_batches(
        seed_scores, batch_format="pyarrow"
    ).union(edges_ds.map_batches(seed_edges, batch_format="pyarrow"))
    # Half-round k's bucket SUM recovers the score emitted by half-round
    # k-1 (the pagerank_int phasing): hr1 recovers h0 = unit (seeds carry
    # val = unit·div so the division restores unit exactly) and emits it;
    # hr2 recovers a1; ...; hr 2·iters recovers a_iters (emitted as the
    # role-2 authority rows); hr 2·iters+1 recovers h_iters.
    for _ in range(2 * iters - 1):
        rows = rows.groupby("b").map_groups(half, batch_format="pyarrow")
    rows = rows.groupby("b").map_groups(
        half_emit_auth, batch_format="pyarrow"
    )
    return rows.groupby("b").map_groups(
        last_half, batch_format="pyarrow"
    )


def kcore(edges_ds, k: int = 3, rounds: int = 8, num_buckets: int = 32):
    """Synchronous k-core peeling (Matula & Beck, JACM 1983; the
    Batagelj–Zaveršnik sequential form replaced by the standard
    synchronous-rounds distributed variant) over an undirected simple
    graph → ``(doc_id, degree)`` for every node still present after
    ``rounds`` peel rounds, with ``degree`` measured on the surviving
    edge set.  Each round simultaneously removes ALL nodes of current
    degree < k plus their incident edges; with enough rounds the result
    is exactly the k-core, and a SQL oracle unrolls the same fixed
    number of rounds so the two sides agree bit-for-bit regardless of
    convergence.

    ``edges_ds``: (src, dst) int64 rows, any direction, duplicates and
    self-loops allowed — round 0 canonicalizes to distinct ``u < v``
    edges (triangle_count's pair-hash bucketed dedup).

    Scale shape: the alternating-key trick from :func:`hits_int`.  Every
    undirected edge lives as TWO directed arcs ``(a, o)`` keyed by
    ``hash(a) % num_buckets``, so a bucket holds each of its nodes'
    complete incidence lists and a group-local run count IS the global
    degree.  A peel round is two co-partitioned half-rounds in one lazy
    lineage: HR1 computes deg(a) per arc, stamps the arc with
    ``keep_a``, and re-keys it by its other end; HR2 computes deg of the
    new key end from the SAME (pre-removal) arc multiset, and an arc
    survives iff BOTH stamps hold — precisely the synchronous rule.
    Rows are three ints + a bool; degrees, not neighbor sets, cross the
    exchange; nothing touches the driver between seed and result.

    No counterpart in the reference (no graph ops); SURVEY §2.10
    extension — k-core is the standard web-graph spam/quality prefilter
    step before PageRank-family scoring."""
    from ..functions.arrowutil import (first_of_run_mask, id_buckets,
                                       pair_buckets)
    from .dedup import _flat_arr

    def _ib32(arr) -> pa.Array:
        return pa.array(id_buckets(arr, num_buckets), pa.int32())

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = np.minimum(s, d), np.maximum(s, d)
        key = np.unique(np.stack([u, v], axis=1), axis=0)
        t = pa.table({"u": pa.array(key[:, 0], pa.int64()),
                      "v": pa.array(key[:, 1], pa.int64())})
        return t.append_column(
            "pb", pa.array(pair_buckets(t.column("u"), t.column("v"),
                                        num_buckets), pa.int32()))

    def dedup_to_arcs(group: pa.Table) -> pa.Table:
        t = group.sort_by([("u", "ascending"), ("v", "ascending")])
        first = first_of_run_mask([t.column("u"), t.column("v")])
        t = t.filter(pa.array(first))
        u, v = _flat_arr(t.column("u")), _flat_arr(t.column("v"))
        a = pa.concat_arrays([u, v])
        o = pa.concat_arrays([v, u])
        return pa.table({
            "b": _ib32(a), "a": a, "o": o,
            "keep": pa.array(np.ones(len(a), bool)),
        })

    arcs = edges_ds.map_batches(canon, batch_format="pyarrow") \
        .groupby("pb").map_groups(dedup_to_arcs, batch_format="pyarrow")

    def _deg_of_row(t: pa.Table) -> np.ndarray:
        first = first_of_run_mask([t.column("a")])
        runs = np.flatnonzero(first)
        counts = np.diff(np.append(runs, t.num_rows))
        return np.repeat(counts, counts)

    def half_stamp(group: pa.Table) -> pa.Table:
        """HR1: stamp each arc with keep(a-end), re-key by the other end."""
        if group.num_rows == 0:
            return group
        t = group.sort_by([("a", "ascending")])
        keep_a = _deg_of_row(t) >= k
        o, a = _flat_arr(t.column("o")), _flat_arr(t.column("a"))
        return pa.table({"b": _ib32(o), "a": o, "o": a,
                         "keep": pa.array(keep_a)})

    def half_filter(group: pa.Table) -> pa.Table:
        """HR2: keep arcs whose key end ALSO survives; key stays put."""
        if group.num_rows == 0:
            return group
        t = group.sort_by([("a", "ascending")])
        keep_a = _deg_of_row(t) >= k
        keep_other = t.column("keep").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep_a & keep_other))

    for _ in range(rounds):
        arcs = arcs.groupby("b").map_groups(
            half_stamp, batch_format="pyarrow"
        ).groupby("b").map_groups(half_filter, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "degree": pa.array([], pa.int64())})
        t = group.sort_by([("a", "ascending")])
        first = first_of_run_mask([t.column("a")])
        runs = np.flatnonzero(first)
        counts = np.diff(np.append(runs, t.num_rows))
        return pa.table({
            "doc_id": _flat_arr(t.column("a")).filter(pa.array(first)),
            "degree": pa.array(counts.astype(np.int64), pa.int64()),
        })

    return arcs.groupby("b").map_groups(final, batch_format="pyarrow")


def adamic_adar(edges_ds, num_buckets: int = 64):
    """Adamic–Adar link-prediction scores over an undirected graph →
    ``(u, v, score_u, score)`` for every node pair with at least one
    common neighbor: ``AA(u,v) = Σ_{c ∈ N(u)∩N(v)} 1/ln(deg(c))``
    (Adamic & Adar, "Friends and neighbors on the Web", Social
    Networks 25(3), 2003).

    ``edges_ds``: (src, dst) rows, any direction, duplicates allowed;
    self-loops dropped.  Exactness: each common neighbor's weight is the
    INTEGER ``floor(1e9 / ln(deg))`` so the per-pair sum is an exact
    int64 (float Σ would be order-sensitive and irreproducible across
    partitionings); ``score`` is the single pinned division at the end.

    Scale shape: (0) pair-hash bucketed distinct of canonical ``u < v``
    edges (the :func:`triangle_count` round-0); (1) each edge ships
    twice keyed by NEIGHBOR-hash, so a node c's full adjacency lands in
    one run — deg(c) is the run length, no separate degree join — and
    the run emits its (i < j) neighbor pairs via the vectorized
    repeat/arange expansion with c's weight attached; (2) one
    ``groupby(u, v)`` sum.  The known skew cost is a hub's d² pairs —
    inherent to exact AA; cap hot nodes upstream if a true hub graph
    needs it."""
    from ..functions.arrowutil import first_of_run_mask, pair_buckets
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = np.minimum(s, d), np.maximum(s, d)
        key = np.unique(np.stack([u, v], axis=1), axis=0)
        t = pa.table({"u": pa.array(key[:, 0], pa.int64()),
                      "v": pa.array(key[:, 1], pa.int64())})
        return t.append_column(
            "pb", pa.array(pair_buckets(t.column("u"), t.column("v"),
                                        num_buckets), pa.int32()))

    def distinct(group: pa.Table) -> pa.Table:
        t = group.sort_by([("u", "ascending"), ("v", "ascending")])
        keep = first_of_run_mask([t.column("u"), t.column("v")])
        return t.filter(pa.array(keep)).drop_columns(["pb"])

    und = edges_ds.map_batches(canon, batch_format="pyarrow").groupby(
        "pb"
    ).map_groups(distinct, batch_format="pyarrow")

    from ..functions.arrowutil import id_buckets

    def ship_by_neighbor(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        c = np.concatenate((u, v))
        nb = np.concatenate((v, u))
        t = pa.table({"c": pa.array(c, pa.int64()),
                      "nb": pa.array(nb, pa.int64())})
        return t.append_column(
            "cb", pa.array(id_buckets(t.column("c"), num_buckets),
                           pa.int32()))

    pair_empty = pa.table({"u": pa.array([], pa.int64()),
                           "v": pa.array([], pa.int64()),
                           "w_u": pa.array([], pa.int64())})

    def pairs_per_neighbor(group: pa.Table) -> pa.Table:
        t = group.sort_by([("c", "ascending"), ("nb", "ascending")])
        n = t.num_rows
        if n == 0:
            return pair_empty
        c = t.column("c").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        lens = np.diff(np.concatenate((starts, [n])))
        deg = np.repeat(lens, lens)
        # weight per run (deg >= 2 only contributes pairs anyway)
        w_run = np.zeros(len(lens), np.int64)
        m = lens >= 2
        w_run[m] = np.floor(
            1e9 / np.log(lens[m].astype(np.float64))).astype(np.int64)
        pos = np.arange(n) - np.repeat(starts, lens)
        reps = deg - 1 - pos
        first = np.repeat(nb, reps)
        base = np.repeat(np.arange(n) + 1, reps)
        off = np.arange(int(reps.sum())) - np.repeat(
            np.cumsum(reps) - reps, reps)
        second = nb[base + off]
        w = np.repeat(np.repeat(w_run, lens), reps)
        return pa.table({
            "u": pa.array(first, pa.int64()),
            "v": pa.array(second, pa.int64()),
            "w_u": pa.array(w, pa.int64()),
        })

    scored = (
        und.map_batches(ship_by_neighbor, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(pairs_per_neighbor, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("w_u", alias_name="score_u"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("score_u").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "score", pa.array(s.astype(np.float64) / np.float64(1e9),
                              pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def degree_hist(edges_ds, num_buckets: int = 64):
    """Degree distribution of a directed graph: per out-degree value,
    how many nodes have it → ``(degree, n_nodes)`` (distinct targets per
    source; duplicate edges count once) — the first plot of any webgraph
    audit.

    Shape: per-batch distinct (src, dst) partials, ONE src-hash bucketed
    merge (a node's whole adjacency lands in one bucket, so its distinct
    out-degree is exact there), then a degree-keyed sum bounded by the
    max degree."""
    from ray.data.aggregate import Sum

    from ..functions.arrowutil import id_buckets

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        pairs = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        t = pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                      "dst": pa.array(pairs[:, 1], pa.int64())})
        return t.append_column(
            "sb", pa.array(id_buckets(t.column("src"), num_buckets),
                           pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        s = group.column("src").to_numpy(zero_copy_only=False)
        d = group.column("dst").to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        _, counts = np.unique(pairs[:, 0], return_counts=True)
        dv, dn = np.unique(counts, return_counts=True)
        return pa.table({
            "degree": pa.array(dv.astype(np.int64), pa.int64()),
            "n_nodes": pa.array(dn.astype(np.int64), pa.int64()),
        })

    return (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(merge, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
    )


def reciprocity(edges_ds, num_buckets: int = 64):
    """Directed-graph reciprocity: of the distinct non-loop edges
    u→v, what fraction have the reverse v→u → one row ``(n_edges,
    n_reciprocal, reciprocity)`` — the link-spam / follow-back signal.

    Shape: per-batch distinct edges tagged by UNORDERED pair hash, so
    u→v and v→u always co-locate; per bucket a canonical-pair sort
    counts, per unordered pair, whether one or both directions exist;
    two tiny counters fold on the driver with the single pinned
    division."""
    from ..functions.arrowutil import first_of_run_mask, pair_buckets

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        pairs = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        t = pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                      "dst": pa.array(pairs[:, 1], pa.int64())})
        return t.append_column(
            "pb", pa.array(pair_buckets(
                pa.array(np.minimum(pairs[:, 0], pairs[:, 1])),
                pa.array(np.maximum(pairs[:, 0], pairs[:, 1])),
                num_buckets), pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        s = group.column("src").to_numpy(zero_copy_only=False)
        d = group.column("dst").to_numpy(zero_copy_only=False)
        # global distinct within the bucket (u→v may arrive from many
        # batches)
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        s, d = pairs[:, 0], pairs[:, 1]
        u, v = np.minimum(s, d), np.maximum(s, d)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        new = np.ones(len(u), bool)
        if len(u) > 1:
            new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [len(u)])))
        n_edges = int(len(u))
        n_recip = int((sizes == 2).sum() * 2)
        return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                         "n_reciprocal": pa.array([n_recip], pa.int64())})

    from ray.data.aggregate import Sum

    sums = (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(merge, batch_format="pyarrow")
        .sum(["n_edges", "n_reciprocal"])
    )
    ne = int(sums["sum(n_edges)"])
    nr = int(sums["sum(n_reciprocal)"])
    return pa.table({
        "n_edges": pa.array([ne], pa.int64()),
        "n_reciprocal": pa.array([nr], pa.int64()),
        "reciprocity": pa.array(
            [float(nr) / float(ne) if ne else 0.0], pa.float64()),
    })


def bfs_depths(edges_ds, seed: int = 0, max_depth: int = 8):
    """Breadth-first search from ``seed`` over a DIRECTED edge set →
    ``(depth, n_nodes)``: how many nodes sit at each minimum distance
    ``0 … max_depth`` — the reachability / crawl-radius profile of a
    webgraph (the same frontier-expansion loop a distributed crawler
    scheduler runs).

    ``edges_ds``: (src, dst) int64 rows; duplicates and self-loops are
    harmless (they never shorten a path).

    Scale shape: broadcast-frontier BFS.  Edges are materialized ONCE
    (object-store resident, spillable) and scanned once per round; the
    frontier ships to every scan task as a single ``ray.put`` sorted
    int64 array (one copy per node, zero-copy reads — never re-shipped
    per batch) and each batch reduces to its DISTINCT newly-reached
    ``dst`` before anything leaves the task, so the per-round exchange
    is bounded by |new frontier|, not |E|.  Per-round dedup across
    batches and the visited anti-set are sorted-array set ops on node
    IDs only — 8 bytes/node, fine to |V| ≈ 10^9–10^10; beyond that
    switch to the bucketed semi/anti-join formulation over a
    `join.bucket_write` edge layout (same rounds, no broadcast).  Edges
    never move; only node-ID sets do.
    """
    import ray

    edges = edges_ds.materialize()
    frontier = np.array([int(seed)], np.int64)
    visited = frontier
    out_depth, out_n = [0], [1]
    for depth in range(1, max_depth + 1):
        ref = ray.put(frontier)  # sorted; read zero-copy in each task

        def expand(batch: pa.Table, ref=ref) -> pa.Table:
            f = ray.get(ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            # membership via searchsorted against the sorted frontier
            pos = np.searchsorted(f, src)
            pos[pos == len(f)] = 0
            hit = f[pos] == src
            dst = batch.column("dst").to_numpy(zero_copy_only=False)[hit]
            return pa.table({"node": pa.array(np.unique(dst), pa.int64())})

        # unique() of an all-empty round yields None (or [None])
        uniq = edges.map_batches(
            expand, batch_format="pyarrow").unique("node")
        reached = np.array(
            [v for v in (uniq or []) if v is not None], np.int64)
        nxt = np.setdiff1d(reached, visited, assume_unique=False)
        if nxt.size == 0:
            break
        out_depth.append(depth)
        out_n.append(int(nxt.size))
        visited = np.union1d(visited, nxt)
        frontier = np.sort(nxt)
    return pa.table({
        "depth": pa.array(out_depth, pa.int64()),
        "n_nodes": pa.array(out_n, pa.int64()),
    })


def clustering_coefficient(edges_ds, num_buckets: int = 64):
    """Per-node local clustering coefficient over an undirected graph:
    for every node, its triangle count, degree, and
    ``2·tri / (deg·(deg−1))`` → ``(node, tri, deg, coeff)`` (coeff 0.0
    when deg < 2).  Input is a Dataset of (src, dst) rows — direction,
    duplicates and self-loops are normalized away here.

    The wedge-check algorithm of :func:`triangle_count` (Suri &
    Vassilvitskii, WWW 2011), kept per-CENTER instead of globally
    summed: t(w) = closed wedges centered at w, because a wedge
    (a–w–b) closed by edge (a,b) IS a triangle containing w.  Stages:
    (1) canonical-dedup edges (one pair-keyed exchange); (2) degrees
    from edge partials (node-keyed sum); (3) adjacency buckets emit all
    neighbor pairs per center vectorized (ranges trick — no per-node
    Python); (4) wedge⨝edge SEMI join via `hash_join_multi` on the
    composite (u, v) key; (5) per-center count, LEFT-joined onto
    degrees so wedge-free nodes keep tri = 0.  Skew caveat: wedge count
    is Σ deg² — a celebrity node needs the SV degree-split refinement
    before this runs on power-law graphs."""
    from ray.data.aggregate import Count, Sum

    from ..functions.arrowutil import id_buckets
    from .join import hash_join, hash_join_multi

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        uniq = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table({"u": pa.array(uniq[:, 0], pa.int64()),
                         "v": pa.array(uniq[:, 1], pa.int64())})

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()  # reused by degrees, wedges and the semi join
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            batch.column("u").to_numpy(zero_copy_only=False),
            batch.column("v").to_numpy(zero_copy_only=False)])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "d": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )

    def adj(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        node = np.concatenate([u, v])
        nbr = np.concatenate([v, u])
        t = pa.table({"node": pa.array(node, pa.int64()),
                      "nbr": pa.array(nbr, pa.int64())})
        return t.append_column(
            "bucket", pa.array(id_buckets(t.column("node"),
                                          num_buckets), pa.int32()))

    def wedges(group: pa.Table) -> pa.Table:
        t = group.sort_by([("node", "ascending"),
                           ("nbr", "ascending")])
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        n = len(node)
        if n == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "center": pa.array([], pa.int64())})
        is_start = np.empty(n, np.bool_)
        is_start[0] = True
        is_start[1:] = node[1:] != node[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg = np.maximum.accumulate(np.where(is_start, idx, -1))
        local = idx - seg  # position within the node's run
        # each element j pairs with every EARLIER element of its run:
        # j contributes `local[j]` pairs (the ranges trick, no loop)
        total = int(local.sum())
        if total == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "center": pa.array([], pa.int64())})
        j = np.repeat(idx, local)
        csum = np.concatenate([[0], np.cumsum(local)[:-1]])
        i = (np.arange(total, dtype=np.int64)
             - np.repeat(csum, local) + np.repeat(seg, local))
        a, b = nbr[i], nbr[j]
        return pa.table({
            "u": pa.array(np.minimum(a, b), pa.int64()),
            "v": pa.array(np.maximum(a, b), pa.int64()),
            "center": pa.array(node[j], pa.int64())})

    wedge_ds = (
        edges.map_batches(adj, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pyarrow")
    )
    closed = hash_join_multi(wedge_ds, edges, on=["u", "v"],
                             how="semi", left_cols=["center"])

    def tri_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("center").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "t": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    tri = (
        closed.map_batches(tri_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("t", alias_name="tri"))
    )
    both = hash_join(degrees, tri, on="node", how="left",
                     left_cols=["deg"], right_cols=["tri"])

    def finish(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        deg = batch.column("deg").to_numpy(zero_copy_only=False)
        tri_col = batch.column("tri")
        if isinstance(tri_col, pa.ChunkedArray):
            tri_col = tri_col.combine_chunks()
        tri_ = tri_col.fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        denom = deg * (deg - 1)
        coeff = np.where(denom > 0, (2.0 * tri_) / np.maximum(
            denom, 1).astype(np.float64), 0.0)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "tri": pa.array(tri_, pa.int64()),
            "deg": pa.array(deg.astype(np.int64), pa.int64()),
            "coeff": pa.array(coeff, pa.float64())})

    return both.map_batches(finish, batch_format="pyarrow")


def degree_assortativity(edges_ds, num_buckets: int = 64):
    """Degree assortativity coefficient (Newman, "Assortative mixing
    in networks", PRL 2002) of an undirected graph: the Pearson
    correlation of end-point degrees over all DIRECTED edge incidences
    (each undirected edge counted in both orientations) → ONE row
    ``(m_inc, sum_j, sum_jk, sum_j2, r)``.

    Every moment is an exact int64 sum (degrees are integers;
    Σjk ≤ M·deg_max² needs the same int64 budget as `hits_int`), and
    ``r`` derives driver-side from Python-int arithmetic — no float
    accumulation, so the value is bit-identical across partitionings.
    By j↔k symmetry of the incidence list, Σj = Σk and Σj² = Σk², so
    three sums suffice.  Shape: canonical edge dedup (pair-keyed
    exchange), degree rollup (node-keyed sum), then degrees attach to
    both end points via two node-hash joins and the moments reduce
    from one-row-per-batch partials."""
    from ray.data.aggregate import Count, Sum

    from .join import hash_join

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        uniq = np.unique(np.stack([np.minimum(s, d),
                                   np.maximum(s, d)], axis=1), axis=0)
        return pa.table({"u": pa.array(uniq[:, 0], pa.int64()),
                         "v": pa.array(uniq[:, 1], pa.int64())})

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()  # reused: degrees + both joins
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            batch.column("u").to_numpy(zero_copy_only=False),
            batch.column("v").to_numpy(zero_copy_only=False)])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "d": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )
    with_u = hash_join(edges, degrees, on="u", right_on="node",
                       left_cols=["v"], right_cols=["deg"],
                       num_buckets=num_buckets)
    both = hash_join(with_u, degrees, on="v", right_on="node",
                     left_cols=["deg"], right_cols=["deg"],
                     num_buckets=num_buckets, suffix="_v")

    def moments(batch: pa.Table) -> pa.Table:
        j = batch.column("deg").to_numpy(zero_copy_only=False)
        kk = batch.column("deg_v").to_numpy(zero_copy_only=False)
        # both orientations: (j,k) and (k,j)
        return pa.table({
            "m_inc": pa.array([2 * len(j)], pa.int64()),
            "sum_j": pa.array([int(j.sum() + kk.sum())], pa.int64()),
            "sum_jk": pa.array([int(2 * (j * kk).sum())], pa.int64()),
            "sum_j2": pa.array([int((j * j).sum()
                                    + (kk * kk).sum())], pa.int64()),
        })

    sums = both.map_batches(moments, batch_format="pyarrow").sum(
        ["m_inc", "sum_j", "sum_jk", "sum_j2"])
    if sums is None or not int(sums["sum(m_inc)"]):
        return pa.table({"m_inc": pa.array([0], pa.int64()),
                         "sum_j": pa.array([0], pa.int64()),
                         "sum_jk": pa.array([0], pa.int64()),
                         "sum_j2": pa.array([0], pa.int64()),
                         "r": pa.array([0.0], pa.float64())})
    m = int(sums["sum(m_inc)"])
    sj = int(sums["sum(sum_j)"])
    sjk = int(sums["sum(sum_jk)"])
    sj2 = int(sums["sum(sum_j2)"])
    num = m * sjk - sj * sj
    den = m * sj2 - sj * sj
    r = float(num) / float(den) if den else 0.0
    return pa.table({"m_inc": pa.array([m], pa.int64()),
                     "sum_j": pa.array([sj], pa.int64()),
                     "sum_jk": pa.array([sjk], pa.int64()),
                     "sum_j2": pa.array([sj2], pa.int64()),
                     "r": pa.array([r], pa.float64())})


def label_propagation(edges_ds, labels_ds, iters: int = 3,
                      num_buckets: int = 32):
    """Synchronous majority-vote label propagation (Raghavan et al.
    2007, made deterministic): each round every node takes the most
    frequent label among its IN-neighBOR labels, ties to the SMALLEST
    label code → ``(doc_id, label)`` after ``iters`` rounds.
    ``labels_ds`` is (v, label) integer seed labels; ``edges_ds`` is
    directed (src, dst) — pass both orientations for undirected
    semantics.  Deterministic by construction (integer counts + total
    tie order), so N- and 4N-node runs agree bit-for-bit.

    Scale shape — the `pagerank_int` fused exchange: vote rows
    (bucket(dst), dst, label) and edge rows (bucket(src), src, dst)
    co-live in one ``groupby(bucket).map_groups`` per round; each
    bucket resolves its nodes' majorities vectorized (one lexsort —
    no per-node Python) and immediately emits next-round votes along
    its out-edges.  One all-to-all per round, node labels never touch
    the driver."""
    from .dedup import _flat_arr

    def seed_rows(batch: pa.Table) -> pa.Table:
        v = batch.column("v")
        return pa.table({
            "b": _ib(v, num_buckets),
            "role": pa.array(np.zeros(batch.num_rows, np.int8)),
            "a": v,
            "dst": v,
            "val": batch.column("label").cast(pa.int64()),
        })

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        return pa.table({
            "b": _ib(src, num_buckets),
            "role": pa.array(np.ones(batch.num_rows, np.int8)),
            "a": src,
            "dst": batch.column("dst"),
            "val": pa.array(np.zeros(batch.num_rows, np.int64)),
        })

    def majority(votes: pa.Table):
        """(a=node, val=label) vote rows → (nodes, labels) arrays."""
        t = votes.sort_by([("a", "ascending"), ("val", "ascending")])
        node = _flat_arr(t.column("a")).to_numpy(zero_copy_only=False)
        lbl = t.column("val").to_numpy(zero_copy_only=False)
        n = len(node)
        if n == 0:
            return node, lbl
        pair_start = np.empty(n, np.bool_)
        pair_start[0] = True
        pair_start[1:] = (node[1:] != node[:-1]) | (lbl[1:] != lbl[:-1])
        starts = np.flatnonzero(pair_start)
        cnts = np.diff(np.append(starts, n))
        pn, pl = node[starts], lbl[starts]
        order = np.lexsort((pl, -cnts, pn))
        pn, pl = pn[order], pl[order]
        first = np.empty(len(pn), np.bool_)
        first[0] = True
        first[1:] = pn[1:] != pn[:-1]
        return pn[first], pl[first]

    def fused_step(group: pa.Table) -> pa.Table:
        # pure neighbor-majority: labels travel ONLY along out-edges,
        # so every node needs in-degree ≥ 1 AND out-degree ≥ 1 (the
        # synthetic webgraph guarantees both); a sink/source node
        # would otherwise silently drop out — hence the fail-loud
        # check below.
        votes = group.filter(pc.equal(group.column("role"), 0))
        edges = group.filter(pc.equal(group.column("role"), 1))
        nodes, labels = majority(votes)
        if edges.num_rows == 0:
            return pa.table({
                "b": _ib(pa.array(nodes, pa.int64()), num_buckets),
                "role": pa.array(np.zeros(len(nodes), np.int8)),
                "a": pa.array(nodes, pa.int64()),
                "dst": pa.array(nodes, pa.int64()),
                "val": pa.array(labels, pa.int64()),
            })
        src = _flat_arr(edges.column("a")).to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(nodes, src)
        pos_c = np.minimum(pos, max(len(nodes) - 1, 0))
        if len(nodes) == 0 or not (nodes[pos_c] == src).all():
            raise ValueError("edge source with no label vote")
        out = pa.table({
            "b": _ib(edges.column("dst"), num_buckets),
            "role": pa.array(np.zeros(edges.num_rows, np.int8)),
            "a": edges.column("dst"),
            "dst": edges.column("dst"),
            "val": pa.array(labels[pos_c], pa.int64()),
        })
        return pa.concat_tables([out, edges])

    def final_labels(group: pa.Table) -> pa.Table:
        votes = group.filter(pc.equal(group.column("role"), 0))
        nodes, labels = majority(votes)
        return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                         "label": pa.array(labels, pa.int64())})

    rows = labels_ds.map_batches(seed_rows,
                                 batch_format="pyarrow").union(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow"))
    for _ in range(iters):
        rows = rows.groupby("b").map_groups(fused_step,
                                            batch_format="pyarrow")
    return rows.groupby("b").map_groups(final_labels,
                                        batch_format="pyarrow")


def joint_degree_hist(edges_ds, num_buckets: int = 64):
    """Joint degree distribution of an undirected graph: for every
    edge, the UNORDERED pair of endpoint degrees →
    ``(deg_lo, deg_hi, n_edges)`` — the two-dimensional refinement of
    the degree histogram (what `degree_assortativity` summarizes into
    one number).

    Same shape as assortativity: canonical edge dedup, degree rollup,
    two node-hash joins to attach both endpoint degrees, then packed
    (lo, hi) integer partials into a ≤|distinct-degree|²-row groupby.
    """
    from ray.data.aggregate import Count, Sum

    from .join import hash_join

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        uniq = np.unique(np.stack([np.minimum(s, d),
                                   np.maximum(s, d)], axis=1), axis=0)
        return pa.table({"u": pa.array(uniq[:, 0], pa.int64()),
                         "v": pa.array(uniq[:, 1], pa.int64())})

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            batch.column("u").to_numpy(zero_copy_only=False),
            batch.column("v").to_numpy(zero_copy_only=False)])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "d": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )
    with_u = hash_join(edges, degrees, on="u", right_on="node",
                       left_cols=["v"], right_cols=["deg"],
                       num_buckets=num_buckets)
    both = hash_join(with_u, degrees, on="v", right_on="node",
                     left_cols=["deg"], right_cols=["deg"],
                     num_buckets=num_buckets, suffix="_v")

    def pair_partial(batch: pa.Table) -> pa.Table:
        a = batch.column("deg").to_numpy(zero_copy_only=False)
        b = batch.column("deg_v").to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        packed = (lo.astype(np.int64) << 32) | hi.astype(np.int64)
        uniq, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "deg_lo": pa.array(uniq >> 32, pa.int64()),
            "deg_hi": pa.array(uniq & 0xFFFFFFFF, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    out = (
        both.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["deg_lo", "deg_hi"])
        .aggregate(Sum("n", alias_name="n_edges"))
        .to_pandas()  # ≤ distinct-degrees² rows
    ).sort_values(["deg_lo", "deg_hi"]).reset_index(drop=True)
    return pa.table({
        "deg_lo": pa.array(out["deg_lo"].astype(np.int64), pa.int64()),
        "deg_hi": pa.array(out["deg_hi"].astype(np.int64), pa.int64()),
        "n_edges": pa.array(out["n_edges"].astype(np.int64),
                            pa.int64()),
    })


def edge_locality(edges_ds, num_buckets: int = 32):
    """Partitioning diagnostic: the fraction of (deduped, undirected)
    edges whose two endpoints hash to the SAME bucket under the
    engine's own `id_buckets` partitioner → ONE row
    ``(num_buckets, n_edges, n_local, frac_local)``.  Every
    co-partitioned graph stage (wedge join, vote exchange) ships only
    the non-local complement, so this measures exactly the network
    traffic a bucketing choice buys; a hash partitioner should sit at
    frac ≈ 1/num_buckets — a significantly higher reading means key
    structure leaks into the hash (a locality win), lower means
    adversarial structure.

    Per-batch vectorized canon + count partials, ONE pair-keyed
    dedup exchange, one-row-per-batch sums — no driver data."""
    from ray.data.aggregate import Count, Sum

    from ..functions.arrowutil import id_buckets

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        uniq = np.unique(np.stack([np.minimum(s, d),
                                   np.maximum(s, d)], axis=1), axis=0)
        return pa.table({"u": pa.array(uniq[:, 0], pa.int64()),
                         "v": pa.array(uniq[:, 1], pa.int64())})

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def local_partial(batch: pa.Table) -> pa.Table:
        bu = id_buckets(batch.column("u"), num_buckets)
        bv = id_buckets(batch.column("v"), num_buckets)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "loc": pa.array([int((bu == bv).sum())], pa.int64())})

    sums = edges.map_batches(local_partial,
                             batch_format="pyarrow").sum(["n", "loc"])
    n = int(sums["sum(n)"]) if sums else 0
    loc = int(sums["sum(loc)"]) if sums else 0
    return pa.table({
        "num_buckets": pa.array([num_buckets], pa.int64()),
        "n_edges": pa.array([n], pa.int64()),
        "n_local": pa.array([loc], pa.int64()),
        "frac_local": pa.array([loc / n if n else 0.0], pa.float64()),
    })
