"""Embedding operators: brute-force + IVF ANN search, cosine near-dup.

Over the ``embeddings`` table ``(vec_id:int64, embedding:list<float>,
label:int32)``.  The query matrix / centroids / hyperplanes are broadcast
ONCE via ``ray.put`` and read per actor — never re-shipped per batch.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteTopK:
    """Per-batch cosine top-k against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)  # fetched once per actor
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = self.q @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        qi, vi, sc = [], [], []
        for qidx in range(sims.shape[0]):
            for j in top[qidx]:
                qi.append(qidx)
                vi.append(int(ids[j]))
                sc.append(float(sims[qidx, j]))
        return pa.table(
            {
                "query_id": pa.array(qi, pa.int64()),
                "vec_id": pa.array(vi, pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )


def ann_topk_brute(ds, queries: np.ndarray, k: int = 10, concurrency=(1, 8)) -> pa.Table:
    """Exact cosine top-k: batched matmul against the broadcast query matrix,
    per-batch top-k, tiny driver-side merge of (batches × nq × k) partials.

    Ties broken by (-score, vec_id) so results are partitioning-invariant.
    Returns (query_id, rank, vec_id, score)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        _BruteTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        heaps.setdefault(r["query_id"], []).append((-r["score"], r["vec_id"]))
    qi, rk, vi, sc = [], [], [], []
    for q in sorted(heaps):
        for rank, (negs, vid) in enumerate(heapq.nsmallest(k, heaps[q])):
            qi.append(q)
            rk.append(rank)
            vi.append(vid)
            sc.append(-negs)
    return pa.table(
        {
            "query_id": pa.array(qi, pa.int64()),
            "rank": pa.array(rk, pa.int32()),
            "vec_id": pa.array(vi, pa.int64()),
            "score": pa.array(sc, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# IVF: the scale path — probe a few clusters instead of scanning everything.
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    ds, nlist: int = 16, sample_rows: int = 4096, iters: int = 10, seed: int = 0
) -> np.ndarray:
    """k-means on a driver-side sample (Lloyd's, seeded, normalized)."""
    sample = ds.random_sample(1.0, seed=seed).limit(sample_rows).take_all()
    m = _normalize(
        np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    )
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(nlist, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            pts = m[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class _IvfAssign:
    def __init__(self, cent_ref):
        import ray

        self.cent = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        assign = np.argmax(m @ self.cent.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cluster", pa.array(assign, pa.int32()))


def ivf_index(ds, nlist: int = 16, concurrency=(1, 8)):
    """Assign every vector to its nearest centroid. Returns (centroids,
    dataset with ivf_cluster column). At scale, write the dataset partitioned
    by ivf_cluster so probes read only nprobe partitions."""
    import ray

    cent = train_ivf_centroids(ds, nlist=nlist)
    cref = ray.put(cent)
    assigned = ds.map_batches(
        _IvfAssign,
        fn_constructor_kwargs={"cent_ref": cref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return cent, assigned


def ann_topk_ivf(
    ds, queries: np.ndarray, k: int = 10, nlist: int = 16, nprobe: int = 4,
    concurrency=(1, 8),
) -> pa.Table:
    """IVF ANN: scan only vectors whose cluster is among each query's nprobe
    nearest centroids. Approximate — recall measured in tests vs brute."""
    import pyarrow.compute as pc

    cent, assigned = ivf_index(ds, nlist=nlist, concurrency=concurrency)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = pa.array(sorted({int(c) for row in probes for c in row}), pa.int32())
    pruned = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b.column("ivf_cluster"), wanted)),
        batch_format="pyarrow",
    )
    # exact top-k within the probed subset, per query restricted to its clusters
    full = ann_topk_brute(pruned, q, k=max(k * nprobe, k), concurrency=concurrency)
    # restrict each query's results to vectors in its probed clusters
    cluster_of: dict[int, int] = {}
    for r in pruned.select_columns(["vec_id", "ivf_cluster"]).take_all():
        cluster_of[r["vec_id"]] = r["ivf_cluster"]
    keep_rows = []
    per_q_count: dict[int, int] = {}
    for r in sorted(
        full.to_pylist(), key=lambda r: (r["query_id"], -r["score"], r["vec_id"])
    ):
        qid = r["query_id"]
        if cluster_of.get(r["vec_id"]) in set(int(c) for c in probes[qid]):
            if per_q_count.get(qid, 0) < k:
                r["rank"] = per_q_count.get(qid, 0)
                keep_rows.append(r)
                per_q_count[qid] = per_q_count.get(qid, 0) + 1
    return pa.Table.from_pylist(
        keep_rows,
        schema=pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int32()),
             ("vec_id", pa.int64()), ("score", pa.float64())]
        ),
    )


# ---------------------------------------------------------------------------
# Cosine near-duplicate pairs
# ---------------------------------------------------------------------------

def cosine_neardup_exact(ds, threshold: float = 0.95, concurrency=(1, 8)) -> pa.Table:
    """Exact pairwise cosine ≥ threshold (id_a < id_b). Blocked matmul of
    each batch against the broadcast full matrix — O(n²) compute but
    streaming memory; the corpus-side matrix must fit a worker (use the LSH
    variant beyond ~10^6 vectors)."""
    import ray

    rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    mat = _normalize(np.asarray([r["embedding"] for r in rows], dtype=np.float64))
    ref = ray.put((ids, mat))

    class Pairs:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bm = _normalize(_batch_matrix(batch))
            bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            sims = bm @ self.mat.T
            ai, bi, sc = [], [], []
            for r in range(sims.shape[0]):
                hits = np.where(sims[r] >= threshold)[0]
                for j in hits:
                    if bids[r] < self.ids[j]:
                        ai.append(int(bids[r]))
                        bi.append(int(self.ids[j]))
                        sc.append(float(sims[r, j]))
            return pa.table(
                {
                    "id_a": pa.array(ai, pa.int64()),
                    "id_b": pa.array(bi, pa.int64()),
                    "cosine": pa.array(sc, pa.float64()),
                }
            )

    out = ds.map_batches(Pairs, batch_format="pyarrow", concurrency=concurrency).take_all()
    t = pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
        ),
    )
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def cosine_neardup_lsh(
    ds, threshold: float = 0.95, num_planes: int = 16, bands: int = 4, seed: int = 0,
    concurrency=(1, 8),
) -> pa.Table:
    """Scale path: random-hyperplane LSH (Charikar 2002) — signature bits
    grouped into bands; same-band vectors become candidates; exact cosine
    verify on the (small) candidate set."""
    import itertools

    import ray

    rows_per_band = num_planes // bands

    # dim from the first row
    first = ds.take(1)[0]["embedding"]
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_planes, len(first))
    pref = ray.put(planes)

    class Sign:
        def __init__(self):
            self.planes = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch)
            bits = (m @ self.planes.T) >= 0  # (nb, num_planes)
            ids = batch.column("vec_id").to_pylist()
            band_c, key_c, id_c = [], [], []
            for i, did in enumerate(ids):
                for b in range(bands):
                    chunk = bits[i, b * rows_per_band : (b + 1) * rows_per_band]
                    key = "".join("1" if x else "0" for x in chunk)
                    band_c.append(b)
                    key_c.append(key)
                    id_c.append(did)
            return pa.table(
                {
                    "band": pa.array(band_c, pa.int32()),
                    "band_hash": pa.array(key_c, pa.string()),
                    "doc_id": pa.array(id_c, pa.int64()),
                }
            )

    from .dedup import _bucket_pairs, _distinct_pairs

    cands = _distinct_pairs(
        ds.map_batches(Sign, batch_format="pyarrow", concurrency=concurrency)
        .groupby(["band", "band_hash"])
        .map_groups(lambda g: _bucket_pairs(g, max_bucket=500), batch_format="pyarrow")
    )
    if cands.num_rows == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    import pyarrow.compute as pc

    ids_needed = pa.array(
        sorted(set(cands.column("id_a").to_pylist()) | set(cands.column("id_b").to_pylist())),
        pa.int64(),
    )
    vec_rows = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), ids_needed)),
        batch_format="pyarrow",
    ).take_all()
    vec = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in vec_rows}
    for k in vec:
        n = np.linalg.norm(vec[k])
        if n > 0:
            vec[k] = vec[k] / n
    ai, bi, sc = [], [], []
    for a, b in zip(cands.column("id_a").to_pylist(), cands.column("id_b").to_pylist()):
        c = float(vec[a] @ vec[b])
        if c >= threshold:
            ai.append(a)
            bi.append(b)
            sc.append(c)
    return pa.table(
        {"id_a": pa.array(ai, pa.int64()), "id_b": pa.array(bi, pa.int64()),
         "cosine": pa.array(sc, pa.float64())}
    ).sort_by([("id_a", "ascending"), ("id_b", "ascending")])
