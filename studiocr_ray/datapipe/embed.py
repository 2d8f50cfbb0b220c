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


_EMPTY_PARTIAL = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    }
)


class _BruteTopK:
    """Per-batch cosine top-k against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)  # fetched once per actor
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # upstream filters can emit empty blocks
            return _EMPTY_PARTIAL
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


def _merge_topk(partials: list[dict], k: int) -> pa.Table:
    """Driver-side merge of per-batch top-k partials (tiny: batches × nq × k
    rows).  Ties broken by (-score, vec_id) so results are
    partitioning-invariant.  Returns (query_id, rank, vec_id, score)."""
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


def ann_topk_brute(ds, queries: np.ndarray, k: int = 10, concurrency=(1, 8)) -> pa.Table:
    """Exact cosine top-k: batched matmul against the broadcast query matrix,
    per-batch top-k, tiny driver-side merge of (batches × nq × k) partials."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        _BruteTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# IVF: the scale path — probe a few clusters instead of scanning everything.
# ---------------------------------------------------------------------------

def _priority_sample_matrix(
    ds, sample_rows: int, id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic corpus-spread training sample: the ``sample_rows``
    vectors with the smallest md5 priority of their id.  Layout-invariant
    (``random_sample``'s draw depends on block boundaries — and at
    fraction 1.0 it is a no-op, making ``.limit()`` a HEAD sample that
    only sees the first blocks of a clustered corpus) and pruned per
    batch, so at most ``sample_rows`` rows leave any batch."""
    from .dedup import _stable64

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"pr": pa.array([], pa.uint64()),
                 "embedding": batch.column("embedding")}
            )
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        pr = np.fromiter(
            (_stable64(str(i)) for i in ids.to_pylist()),
            dtype=np.uint64,
            count=batch.num_rows,
        )
        keep = np.argsort(pr, kind="stable")[:sample_rows]
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {"pr": pa.array(pr[keep], pa.uint64()),
             "embedding": emb.take(pa.array(keep))}
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["pr"])
    return np.asarray(
        [r["embedding"] for r in rows[:sample_rows]], dtype=np.float64
    )


def train_ivf_centroids(
    ds, nlist: int = 16, sample_rows: int = 4096, iters: int = 10, seed: int = 0
) -> np.ndarray:
    """k-means on a driver-side sample (Lloyd's, seeded, normalized)."""
    m = _normalize(_priority_sample_matrix(ds, sample_rows))
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


class _IvfTopK:
    """Per-batch cosine top-k with per-query cluster restriction applied
    INSIDE the distributed stage: scores of vectors outside a query's probed
    clusters are masked to -inf before the per-batch top-k, so the driver
    only merges valid partials — no re-rank loop."""

    def __init__(self, queries_ref, probe_mask_ref, k: int):
        import ray

        self.q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        # (nq, nlist) bool: query qi may see cluster cl
        self.allowed = ray.get(probe_mask_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:  # cluster filter upstream can empty a block
            return _EMPTY_PARTIAL
        m = _normalize(_batch_matrix(batch))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        # in-memory probes carry ivf_cluster; on-disk probes carry the
        # duplicated data column cluster_id (hive partition types are
        # reader-dependent, so the disk path never reads the partition col)
        col = "cluster_id" if "cluster_id" in batch.column_names else "ivf_cluster"
        cval = batch.column(col)
        clusters = pc.cast(
            cval.combine_chunks().cast(pa.string())
            if pa.types.is_dictionary(cval.type)
            else cval,
            pa.int32(),
        ).to_numpy(zero_copy_only=False)
        sims = self.q @ m.T  # (nq, nb)
        sims = np.where(self.allowed[:, clusters], sims, -np.inf)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        qi, vi, sc = [], [], []
        for qidx in range(sims.shape[0]):
            for j in top[qidx]:
                s = sims[qidx, j]
                if s != -np.inf:
                    qi.append(qidx)
                    vi.append(int(ids[j]))
                    sc.append(float(s))
        return pa.table(
            {
                "query_id": pa.array(qi, pa.int64()),
                "vec_id": pa.array(vi, pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )


def _probe_mask(cent: np.ndarray, q: np.ndarray, nprobe: int) -> np.ndarray:
    """(nq, nlist) bool membership mask of each query's nprobe nearest
    centroids (deterministic ties: argsort is stable on index order)."""
    probes = np.argsort(-(q @ cent.T), kind="stable", axis=1)[:, :nprobe]
    mask = np.zeros((q.shape[0], cent.shape[0]), dtype=bool)
    mask[np.arange(q.shape[0])[:, None], probes] = True
    return mask


def ann_topk_ivf(
    ds, queries: np.ndarray, k: int = 10, nlist: int = 16, nprobe: int = 4,
    concurrency=(1, 8),
) -> pa.Table:
    """IVF ANN: scan only vectors whose cluster is among each query's nprobe
    nearest centroids, cluster restriction enforced inside the distributed
    top-k stage. Approximate — recall measured in tests vs brute."""
    import pyarrow.compute as pc
    import ray

    cent, assigned = ivf_index(ds, nlist=nlist, concurrency=concurrency)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    mask = _probe_mask(cent, q, nprobe)
    wanted = pa.array(sorted(np.flatnonzero(mask.any(axis=0)).tolist()), pa.int32())
    pruned = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b.column("ivf_cluster"), wanted)),
        batch_format="pyarrow",
    )
    partials = pruned.map_batches(
        _IvfTopK,
        fn_constructor_kwargs={
            "queries_ref": ray.put(q),
            "probe_mask_ref": ray.put(mask),
            "k": k,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    return _merge_topk(partials, k)


def write_ivf_index(ds, index_dir: str, nlist: int = 16, concurrency=(1, 8)) -> np.ndarray:
    """Materialize the IVF index on disk, hive-partitioned by ``ivf_cluster``
    (the scale path: a probe reads only its nprobe partition directories via
    partition-pruned parquet filters).  Centroids are stored alongside as a
    tiny parquet table.  Returns the centroid matrix."""
    import os

    import pyarrow.parquet as pq

    cent, assigned = ivf_index(ds, nlist=nlist, concurrency=concurrency)
    # the cluster id is both the hive partition key (directory pruning) and a
    # plain data column (per-row masking on read) — hive partition TYPES are
    # inferred inconsistently between readers, so probes never rely on them
    assigned = assigned.map_batches(
        lambda b: b.append_column("cluster_id", b.column("ivf_cluster")),
        batch_format="pyarrow",
    )
    assigned.write_parquet(os.path.join(index_dir, "vectors"),
                           partition_cols=["ivf_cluster"])
    cent_table = pa.table(
        {
            "cluster": pa.array(range(len(cent)), pa.int32()),
            "centroid": pa.array([c.tolist() for c in cent],
                                  pa.list_(pa.float64())),
        }
    )
    pq.write_table(cent_table, os.path.join(index_dir, "centroids.parquet"))
    return cent


def ann_topk_ivf_indexed(
    index_dir: str, queries: np.ndarray, k: int = 10, nprobe: int = 4,
    concurrency=(1, 8),
) -> pa.Table:
    """Probe a written IVF index: read ONLY the probed clusters' hive
    partition directories (pruning by path), distributed per-query-masked
    top-k, tiny driver merge."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cent_t = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cent = np.asarray(cent_t.column("centroid").to_pylist(), dtype=np.float64)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    mask = _probe_mask(cent, q, nprobe)
    wanted = sorted(int(c) for c in np.flatnonzero(mask.any(axis=0)))
    # directory-level partition pruning by PATH: only the probed clusters'
    # hive directories are listed/read — no partition-type-dependent filter
    # expression (Ray and pyarrow infer hive types differently)
    vec_dir = os.path.join(index_dir, "vectors")
    import glob as _glob

    paths = [
        f
        for c in wanted
        for f in sorted(
            _glob.glob(os.path.join(vec_dir, f"ivf_cluster={c}", "*.parquet"))
        )
    ]
    pruned = rd.read_parquet(
        paths, columns=["vec_id", "embedding", "cluster_id"]
    )
    partials = pruned.map_batches(
        _IvfTopK,
        fn_constructor_kwargs={
            "queries_ref": ray.put(q),
            "probe_mask_ref": ray.put(mask),
            "k": k,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# Cosine near-duplicate pairs
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# PQ: product quantization (Jégou et al. 2011, public method) — the
# memory-bandwidth scale path: codes are m bytes per vector instead of 8·D,
# and the ADC scan gathers from a tiny per-query LUT instead of re-reading
# float vectors.  At 100 TB the encoded corpus is ~1-2% of the raw
# embedding bytes, which is what makes exhaustive re-ranking candidates or
# full scans affordable at all.
# ---------------------------------------------------------------------------

def train_pq_codebooks(
    ds, m: int = 8, ksub: int = 16, sample_rows: int = 4096,
    iters: int = 10, seed: int = 0,
) -> np.ndarray:
    """Per-subspace k-means codebooks ``(m, ksub, dsub)`` trained on a
    driver-side sample of NORMALIZED vectors — deterministic (seeded init,
    Lloyd's, argmin lowest-index tie-break).  When the sample has fewer
    than ksub points the spare rows repeat centroid 0 (argmin prefers the
    lower index, so padding is never selected)."""
    mat = _normalize(_priority_sample_matrix(ds, sample_rows))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.zeros((m, ksub, dsub), np.float64)
    for s in range(m):
        x = mat[:, s * dsub:(s + 1) * dsub]
        # init from DISTINCT subvectors: duplicate inits would collapse two
        # clusters onto one value and Lloyd's never re-splits an empty one
        # (also makes ksub ≥ |distinct| quantization exactly lossless)
        ux = np.unique(x, axis=0)
        k_eff = min(ksub, len(ux))
        cent = ux[rng.choice(len(ux), size=k_eff, replace=False)].copy()
        for _ in range(iters):
            d2 = (
                -2.0 * (x @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            for c in range(k_eff):
                pts = x[a == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[s, :k_eff] = cent
        if k_eff < ksub:
            books[s, k_eff:] = cent[0]
    return books


def _codes_matrix(batch: pa.Table) -> np.ndarray:
    arr = batch.column("codes")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), -1)


class _PqEncode:
    """Streaming encoder: per subspace, nearest-codebook-centroid id →
    m uint8 codes per vector.  Codebooks resolved once per actor."""

    def __init__(self, books_ref):
        import ray

        self.books = ray.get(books_ref)
        # ||c||² per (subspace, centroid), reused every batch
        self.c2 = (self.books * self.books).sum(axis=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "codes": pa.array([], pa.list_(pa.uint8()))}
            )
        mat = _normalize(_batch_matrix(batch))
        m, ksub, dsub = self.books.shape
        codes = np.empty((len(mat), m), np.uint8)
        for s in range(m):
            x = mat[:, s * dsub:(s + 1) * dsub]
            d2 = -2.0 * (x @ self.books[s].T) + self.c2[s][None, :]
            codes[:, s] = np.argmin(d2, axis=1)
        off = np.arange(0, (len(mat) + 1) * m, m, dtype=np.int32)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "codes": pa.ListArray.from_arrays(
                    pa.array(off, pa.int32()),
                    pa.array(codes.ravel(), pa.uint8()),
                ),
            }
        )


def pq_encode(ds, books, concurrency=(1, 8)):
    """Encode every vector to m uint8 codes → (vec_id, codes).  This is
    the persistable form: ``write_parquet`` it next to the codebooks and
    every later query scans codes only (the raw embedding column never
    re-reads).  ``books`` may be the ndarray or an existing ``ray.put``
    object ref (so callers that also broadcast the codebooks to a scan
    stage ship them once, not twice)."""
    import ray

    bref = (
        books
        if isinstance(books, ray.ObjectRef)
        else ray.put(np.asarray(books, dtype=np.float64))
    )
    return ds.map_batches(
        _PqEncode,
        fn_constructor_kwargs={"books_ref": bref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _PqScan:
    """ADC (asymmetric distance computation) top-k over encoded rows: the
    per-query LUT ``lut[q, s, c] = q_sub_s · codebook[s][c]`` is built once
    per actor; scoring a batch is m gathers + adds, no float vectors."""

    def __init__(self, books_ref, queries_ref, k: int):
        import ray

        books = ray.get(books_ref)
        q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        m, ksub, dsub = books.shape
        self.m = m
        self.lut = np.empty((len(q), m, ksub), np.float64)
        for s in range(m):
            self.lut[:, s, :] = q[:, s * dsub:(s + 1) * dsub] @ books[s].T
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_PARTIAL
        codes = _codes_matrix(batch)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        nq = self.lut.shape[0]
        scores = np.zeros((nq, len(codes)), np.float64)
        for s in range(self.m):
            scores += self.lut[:, s, codes[:, s]]
        k = min(self.k, scores.shape[1])
        top = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        qi, vi, sc = [], [], []
        for qidx in range(nq):
            for j in top[qidx]:
                qi.append(qidx)
                vi.append(int(ids[j]))
                sc.append(float(scores[qidx, j]))
        return pa.table(
            {
                "query_id": pa.array(qi, pa.int64()),
                "vec_id": pa.array(vi, pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )


def ann_topk_pq(
    ds,
    queries: np.ndarray,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 0,
    concurrency=(1, 8),
) -> pa.Table:
    """Approximate cosine top-k via product quantization: train codebooks
    on a sample, encode the corpus streaming, ADC-scan the codes, merge
    per-batch partials driver-side (same merge as ann_topk_brute).  Scores
    are the quantized inner products — approximate by construction; with
    ksub ≥ distinct per-subspace values the quantization is lossless and
    the result equals the brute path (asserted by tests)."""
    import ray

    books = train_pq_codebooks(
        ds, m=m, ksub=ksub, sample_rows=sample_rows, iters=iters, seed=seed
    )
    bref = ray.put(books)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = pq_encode(ds, bref, concurrency=concurrency).map_batches(
        _PqScan,
        fn_constructor_kwargs={"books_ref": bref, "queries_ref": qref,
                               "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    return _merge_topk(partials, k)


def ann_topk_rerank(
    ds,
    queries: np.ndarray,
    k: int = 10,
    shortlist_mult: int = 4,
    m: int = 8,
    ksub: int = 16,
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 0,
    concurrency=(1, 8),
) -> pa.Table:
    """Two-stage retrieval: PQ shortlist of ``k × shortlist_mult``
    candidates per query (cheap ADC over codes), then EXACT cosine
    re-rank of only the candidate vectors — the standard recall repair
    for quantized indexes.  The candidate id set (nq × k × mult ids) is
    broadcast; the re-rank pass streams the corpus once and scores only
    rows whose vec_id is in the set, so the float vectors of
    non-candidates are never touched past the membership test.  Recall
    equals the shortlist's recall@k·mult, which approaches 1 quickly with
    ``shortlist_mult`` (asserted by tests)."""
    import pyarrow.compute as pc
    import ray

    short = ann_topk_pq(
        ds, queries, k=k * shortlist_mult, m=m, ksub=ksub,
        sample_rows=sample_rows, iters=iters, seed=seed,
        concurrency=concurrency,
    )
    cand_ref = ray.put(
        np.unique(short.column("vec_id").to_numpy(zero_copy_only=False))
    )
    qref = ray.put(np.asarray(queries, dtype=np.float64))

    class Rerank:
        def __init__(self):
            self.cands = ray.get(cand_ref)
            self.q = _normalize(np.asarray(ray.get(qref), dtype=np.float64))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            keep = np.isin(ids, self.cands)
            if not keep.any():
                return _EMPTY_PARTIAL
            sub = batch.filter(pa.array(keep))
            m_ = _normalize(_batch_matrix(sub))
            sids = sub.column("vec_id").to_numpy(zero_copy_only=False)
            sims = self.q @ m_.T
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
            qi, vi, sc = [], [], []
            for qidx in range(sims.shape[0]):
                for j in top[qidx]:
                    qi.append(qidx)
                    vi.append(int(sids[j]))
                    sc.append(float(sims[qidx, j]))
            return pa.table(
                {
                    "query_id": pa.array(qi, pa.int64()),
                    "vec_id": pa.array(vi, pa.int64()),
                    "score": pa.array(sc, pa.float64()),
                }
            )

    partials = ds.map_batches(
        Rerank, batch_format="pyarrow", concurrency=concurrency
    ).take_all()
    return _merge_topk(partials, k)


class _CosineMetric:
    """Row-wise cosine between aligned list<float64> value columns
    (normalized per pair bucket — vectorized matmul-free dot)."""

    def __call__(self, id_a, id_b, va, vb):
        n = len(va)
        if n == 0:
            return pa.array([], pa.float64())
        ma = _normalize(_batch_matrix(pa.table({"embedding": va})))
        mb = _normalize(_batch_matrix(pa.table({"embedding": vb})))
        return pa.array(np.einsum("ij,ij->i", ma, mb), pa.float64())

def cosine_neardup_exact(
    ds, threshold: float = 0.95, concurrency=(1, 8),
    max_vectors: int = 1_000_000,
) -> pa.Table:
    """Exact pairwise cosine ≥ threshold (id_a < id_b). Blocked matmul of
    each batch against the broadcast full matrix — O(n²) compute but
    streaming memory; the corpus-side matrix must fit a worker.  This is the
    small-scale oracle/debug twin of :func:`cosine_neardup_lsh`; the
    ``max_vectors`` guard ENFORCES that contract (raise, don't let an
    accidental 10^9-vector call take_all the corpus onto the driver)."""
    import ray

    # limit(max+1) enforces the contract in the SAME pass that collects
    # the matrix (a count() here would execute the lineage twice) and
    # bounds driver memory to max_vectors+1 rows even on oversized input
    rows = (
        ds.select_columns(["vec_id", "embedding"])
        .limit(max_vectors + 1)
        .take_all()
    )
    if len(rows) > max_vectors:
        raise ValueError(
            f"cosine_neardup_exact is the small-scale oracle path; got "
            f"more than max_vectors={max_vectors} vectors. Use "
            "cosine_neardup_lsh (same threshold semantics, banded "
            "candidates + co-partitioned verify) at this scale."
        )
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
    concurrency=(1, 8), max_bucket: int | None = None,
) -> pa.Table:
    """Scale path: random-hyperplane LSH (Charikar 2002) — signature bits
    grouped into bands; same-band vectors become candidates; exact cosine
    verify on the (small) candidate set."""
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
            nb = m.shape[0]
            bits = ((m @ self.planes.T) >= 0).astype(np.int64)  # (nb, planes)
            # pack each band's sign bits into an int64 key (vectorized)
            weights = 1 << np.arange(rows_per_band, dtype=np.int64)
            keys = bits.reshape(nb, bands, rows_per_band) @ weights  # (nb, bands)
            ids = batch.column("vec_id").combine_chunks()
            return pa.table(
                {
                    "band": pa.array(
                        np.tile(np.arange(bands, dtype=np.int32), nb), pa.int32()
                    ),
                    "band_hash": pa.array(keys.reshape(-1), pa.int64()),
                    "doc_id": ids.take(pa.array(np.repeat(np.arange(nb), bands))),
                }
            )

    import pyarrow.compute as pc

    from .dedup import _collect_pairs, banded_candidate_pairs, copartition_verify

    cands_ds = banded_candidate_pairs(
        ds.map_batches(Sign, batch_format="pyarrow", concurrency=concurrency),
        max_bucket=max_bucket,
    )
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )
    # co-partitioned verify: candidate vectors travel through the bucketed
    # exchange (normalized per group), never into a driver dict (VERDICT r2)
    side = ds.map_batches(
        lambda t: t.select(["vec_id", "embedding"]).rename_columns(
            ["doc_id", "value"]
        ),
        batch_format="pyarrow",
    )
    out = copartition_verify(
        cands_ds, side, _CosineMetric(), "cosine",
        id_type=pa.int64(), value_type=pa.list_(pa.float64()),
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("cosine"), threshold)),
        batch_format="pyarrow",
    )
    return _collect_pairs(out, empty)


# ---------------------------------------------------------------------------
# Distributed integer Lloyd's k-means: the cluster-scale upgrade of
# train_ivf_centroids' driver-sample k-means.  Embeddings quantize to int64
# micro-units (floor(x*1e6+0.5)) so assignments, per-cluster sums and the
# floor-division centroid update are bit-reproducible at ANY batch split or
# cluster shape — and reproducible in unrolled SQL.  Each iteration is one
# streaming pass: centroids broadcast via ray.put (k*d*8 bytes), per-batch
# scatter-add partials (<= k rows per batch), a tiny driver reduce.  No
# all-to-all exchange anywhere.
# ---------------------------------------------------------------------------

KMEANS_SCALE = 1_000_000.0


def _quantize_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    return np.floor(
        _batch_matrix(batch, col) * KMEANS_SCALE + 0.5
    ).astype(np.int64)


def _kmeans_assign(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact int64 squared-L2 argmin; ties break to the lowest cluster id.

    Decomposed as ||q||^2 + ||c||^2 - 2 q.c so the (n,k) distance matrix
    is one int64 matmul, not an (n,k,d) broadcast temp."""
    qq = np.einsum("ij,ij->i", q, q)
    cc = np.einsum("ij,ij->i", cent, cent)
    d2 = qq[:, None] + cc[None, :] - 2 * (q @ cent.T)
    return d2, np.argmin(d2, axis=1)


class _KMeansPartial:
    """Per-batch partial sums for one Lloyd iteration: rows (cluster,
    count, comp_sums list<int64>) — at most k rows per batch regardless of
    batch size, so the driver reduce is k*num_batches rows."""

    def __init__(self, cent_ref):
        import ray

        self.cent = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        k, d = self.cent.shape
        q = _quantize_matrix(batch)
        _, a = _kmeans_assign(q, self.cent)
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, a, q)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        present = np.flatnonzero(counts)
        return pa.table(
            {
                "cluster": pa.array(present.astype(np.int32), pa.int32()),
                "count": pa.array(counts[present], pa.int64()),
                "comp_sums": pa.array(
                    list(sums[present]), pa.list_(pa.int64())
                ),
            }
        )


class _KMeansFinal:
    def __init__(self, cent_ref):
        import ray

        self.cent = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = _quantize_matrix(batch)
        d2, a = _kmeans_assign(q, self.cent)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int32), pa.int32()),
                "dist2_q": pa.array(
                    d2[np.arange(len(a)), a], pa.int64()
                ),
            }
        )


def kmeans_centroids(
    ds,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency=(1, 8),
) -> np.ndarray:
    """Train the final int64 centroid matrix (see kmeans_embeddings).

    Init = the k vectors with the smallest ids (deterministic, no RNG);
    ``iters`` assign+update rounds.  Update is elementwise
    ``floor(sum/count)``; empty clusters keep their previous centroid.
    ``iters`` streaming passes over the input, zero shuffles — the only
    cross-node traffic is the k*d-int broadcast down and <=k partial rows
    per batch up."""
    import ray

    def init_partial(b: pa.Table) -> pa.Table:
        t = b.select([id_col, col])
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.argsort(ids, kind="stable")[:k]))

    seed = pa.concat_tables(
        p for p in ds.map_batches(
            init_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    )
    order = np.argsort(
        seed.column(id_col).to_numpy(zero_copy_only=False), kind="stable"
    )[:k]
    cent = _quantize_matrix(seed.take(pa.array(order)), col)
    d = cent.shape[1]

    for _ in range(iters):
        cref = ray.put(cent)
        sums = np.zeros((k, d), np.int64)
        counts = np.zeros(k, np.int64)
        partials = ds.map_batches(
            _KMeansPartial,
            fn_constructor_kwargs={"cent_ref": cref},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        for b in partials.iter_batches(batch_format="pyarrow"):
            # one iter batch can hold rows from several input batches, so
            # the same cluster id may repeat — scatter-ADD, never sums[cl] +=
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            np.add.at(
                counts, cl, b.column("count").to_numpy(zero_copy_only=False)
            )
            comp = (
                b.column("comp_sums").combine_chunks()
                if isinstance(b.column("comp_sums"), pa.ChunkedArray)
                else b.column("comp_sums")
            )
            flat = comp.flatten().to_numpy(zero_copy_only=False)
            np.add.at(sums, cl, flat.reshape(len(cl), d))
        nonempty = counts > 0
        cent = np.where(
            nonempty[:, None],
            np.floor_divide(sums, np.maximum(counts, 1)[:, None]),
            cent,
        )
    return cent


def kmeans_embeddings(
    ds,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency=(1, 8),
):
    """Distributed Lloyd's k-means over an embedding column; returns the
    final assignment Dataset ``(vec_id, cluster, dist2_q)`` — centroid
    training (kmeans_centroids) plus one labeling pass."""
    import ray

    cent = kmeans_centroids(
        ds, k=k, iters=iters, id_col=id_col, col=col, concurrency=concurrency
    )
    return ds.map_batches(
        _KMeansFinal,
        fn_constructor_kwargs={"cent_ref": ray.put(cent)},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _SemdedupGroup:
    """Within one k-means cluster: drop every vector that has a smaller-id
    neighbor with cosine >= threshold (SemDedup keep-min-id rule).

    Exactness contract with the SQL oracle: cosine is the int64 dot of the
    quantized vectors divided by float64 sqrt-norms — every float op is a
    single correctly-rounded IEEE step, so numpy and DuckDB produce the
    same bits.  O(n_c^2) per cluster: SemDedup's own assumption is that k
    is sized so clusters stay small (paper uses k ~ sqrt(N))."""

    def __init__(self, threshold: float):
        self.t = threshold

    def __call__(self, group: pa.Table) -> pa.Table:
        q = _quantize_matrix(group)
        n = len(q)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        q, ids = q[order], ids[order]
        dots = q @ q.T
        norms = np.sqrt(np.einsum("ij,ij->i", q, q).astype(np.float64))
        cos = dots.astype(np.float64) / (norms[:, None] * norms[None, :])
        dup = np.tril(cos >= self.t, k=-1).any(axis=1)
        keep = np.flatnonzero(~dup)
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "cluster": group.column("cluster").take(
                    pa.array(order[keep])
                ),
            }
        )


def semdedup(
    ds,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency=(1, 8),
):
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering + within-cluster cosine pruning; keeps the smallest
    id of every near-duplicate pair.  Returns the kept ``(vec_id,
    cluster)`` Dataset.

    Scale shape: the pairwise step is confined to clusters (ONE groupby
    exchange of narrow id+vector rows); cluster size is controlled by k,
    so no stage ever sees the corpus-wide pair matrix."""
    import ray

    cent = kmeans_centroids(
        ds, k=k, iters=iters, id_col=id_col, col=col, concurrency=concurrency
    )

    class _Label:
        def __init__(self):
            self.cent = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = _quantize_matrix(batch)
            _, a = _kmeans_assign(q, self.cent)
            return pa.table(
                {
                    "vec_id": batch.column(id_col),
                    "cluster": pa.array(a.astype(np.int32), pa.int32()),
                    col: batch.column(col),
                }
            )

    cref = ray.put(cent)
    labeled = ds.map_batches(
        _Label, batch_format="pyarrow", concurrency=concurrency
    )
    pruner = _SemdedupGroup(threshold)

    def prune_group(group: pa.Table) -> pa.Table:
        return pruner(group)

    return labeled.groupby("cluster").map_groups(
        prune_group, batch_format="pyarrow"
    )


def gram_matrix(ds, col: str = "embedding") -> pa.Table:
    """Distributed Gram matrix of the corpus embedding matrix X:
    ``G = Xᵀ X`` over micro-unit-quantized components
    (``floor(x*1e6+0.5)``, the k-means discipline above), returned as the
    upper triangle ``(i, j, gram)`` with 0-based dims and exact int64
    sums — the covariance / PCA building block (mean-center or normalize
    downstream; G is the only pass over the data either needs).

    Scale shape: each batch contributes ONE d×d int64 partial
    (``Qᵀ @ Q`` — an integer matmul, d² ints regardless of batch rows),
    so the reduce is O(batches × d²) and raw vectors never shuffle.  The
    driver accumulates the tiny partials in exact Python big-ints and
    raises if the total leaves int64 rather than wrapping silently (the
    graph.py int64-budget precedent).  ``batch_size`` is pinned to 4096
    so a per-batch partial stays far inside int64
    (|q| ~ 1e6 → products ~ 1e12 → ≤ 4e15 per cell per batch)."""
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty block: contribute no partial row
            return pa.table(
                {"partial": pa.array([], pa.list_(pa.int64()))}
            )
        q = _quantize_matrix(batch, col)
        g = (q.T @ q).reshape(-1)
        return pa.table(
            {"partial": pa.array([g.tolist()], pa.list_(pa.int64()))}
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    ).take_all()
    empty = pa.table({
        "i": pa.array([], pa.int64()),
        "j": pa.array([], pa.int64()),
        "gram": pa.array([], pa.int64()),
    })
    if not rows:
        return empty
    total = [0] * len(rows[0]["partial"])
    for r in rows:
        p = r["partial"]
        for idx in range(len(total)):
            total[idx] += int(p[idx])
    d = int(round(len(total) ** 0.5))
    if d * d != len(total):
        raise ValueError(f"partial length {len(total)} is not square")
    lim = np.iinfo(np.int64).max
    if any(abs(v) > lim for v in total):
        raise OverflowError(
            "gram_matrix total left int64; reduce input magnitude or "
            "accumulate in floats for approximate use"
        )
    iu, ju = np.triu_indices(d)
    flat = np.asarray(total, dtype=np.int64).reshape(d, d)
    return pa.table({
        "i": pa.array(iu.astype(np.int64)),
        "j": pa.array(ju.astype(np.int64)),
        "gram": pa.array(flat[iu, ju]),
    })


def power_iteration(ds, col: str = "embedding", iters: int = 50):
    """Top principal direction of the corpus embedding matrix via power
    iteration on the (distributed, exact) Gram matrix — the PCA / spectral
    building block on top of :func:`gram_matrix`.

    Scale shape: the ONLY pass over the data is gram_matrix's (one d×d
    int64 partial per batch, raw vectors never shuffle, exact big-int
    reduce); the iteration itself runs on the driver over the tiny d×d
    result — d is an embedding width (16–4096), so d² floats is
    kilobytes no matter how many rows X has.  Deterministic: exact
    integer G, fixed v₀ = 1/√d, fixed iteration count, float64
    normalization — bit-identical on every run and cluster size.

    Returns ``(dim, component, eigenvalue)``: the unit top eigenvector
    (sign fixed so its largest-|·|-component is positive, the standard
    sign convention) and the Rayleigh quotient ``vᵀGv`` in micro-unit²
    scale, replicated per row for a flat schema."""
    g = gram_matrix(ds, col=col)
    if g.num_rows == 0:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "component": pa.array([], pa.float64()),
                         "eigenvalue": pa.array([], pa.float64())})
    iu = g.column("i").to_numpy(zero_copy_only=False)
    ju = g.column("j").to_numpy(zero_copy_only=False)
    val = g.column("gram").to_numpy(zero_copy_only=False).astype(np.float64)
    d = int(iu.max()) + 1
    G = np.zeros((d, d), np.float64)
    G[iu, ju] = val
    G[ju, iu] = val
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = G @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:  # X ≡ 0: keep v₀, eigenvalue 0
            break
        v = w / nrm
    top = int(np.argmax(np.abs(v)))
    if v[top] < 0:
        v = -v
    lam = float(v @ (G @ v))
    return pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "component": pa.array(v, pa.float64()),
        "eigenvalue": pa.array(np.full(d, lam), pa.float64()),
    })


def embed_dim_stats(ds, col: str = "embedding"):
    """Per-dimension profile of the embedding matrix: count, mean and
    population variance of every component → ``(dim, n, mean, var)`` —
    the vector-column data-audit (dead dimensions, scale imbalance,
    whitening inputs).

    Exactness: components quantize to integer micro-units (the k-means
    discipline), per-batch partials are exact int64 ``(n, Σq, Σq²)``
    per dimension (|q| ≤ ~1e6 → q² ≤ 1e12, ~9e6 rows/batch inside
    int64; the d-row partial is tiny), and the two float divisions are
    pinned LAST so an oracle reproduces every double bit-for-bit."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "ss": pa.array([], pa.int64())})
        q = _quantize_matrix(batch, col)
        d = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "n": pa.array(np.full(d, q.shape[0], np.int64)),
            "s": pa.array(q.sum(axis=0).astype(np.int64)),
            "ss": pa.array((q * q).sum(axis=0).astype(np.int64)),
        })

    g = (
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=4096)
        .groupby("dim")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
    ).to_pandas().sort_values("dim").reset_index(drop=True)  # d rows
    n = g["n"].to_numpy().astype(np.float64)
    s = g["s"].to_numpy().astype(np.float64)
    ss = g["ss"].to_numpy().astype(np.float64)
    scale = np.float64(1e6)
    mean = s / n / scale
    var = (ss / n - (s / n) * (s / n)) / scale / scale
    return pa.table({
        "dim": pa.array(g["dim"].to_numpy(), pa.int64()),
        "n": pa.array(g["n"].to_numpy(), pa.int64()),
        "mean": pa.array(mean, pa.float64()),
        "var": pa.array(var, pa.float64()),
    })


def norm_hist(emb_ds, emb_col: str = "embedding"):
    """Log₂ histogram of embedding squared L2 norms, computed on the
    EXACT integer lattice: each component quantizes to
    ``floor(x·1e6)`` (the embed_dim_stats discipline), the squared
    norm is an exact int64 sum, and the bucket is its frexp bit
    length → ``(bucket, n_vecs)``.  Norm drift between embedding
    batches is the standard index-health check before ANN ingestion.

    Per-batch fully vectorized (one ragged-to-dense reshape per
    batch); the groupby is ≤ 64 rows."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc
        flat = np.floor(col.flatten().to_numpy(
            zero_copy_only=False).astype(np.float64) * 1e6
        ).astype(np.int64)
        lens = pc.list_value_length(col).fill_null(0).to_numpy(
            zero_copy_only=False)
        doc_idx = np.repeat(np.arange(batch.num_rows), lens)
        sq = np.zeros(batch.num_rows, np.int64)
        np.add.at(sq, doc_idx, flat * flat)
        lg = np.zeros(batch.num_rows, np.int64)
        pos = sq > 0
        lg[pos] = np.frexp(sq[pos].astype(np.float64))[1]
        uniq, cnt = np.unique(lg, return_counts=True)
        return pa.table({
            "bucket": pa.array(uniq, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    out = (
        emb_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_vecs"))
        .to_pandas()  # ≤ 64 rows
    ).sort_values("bucket").reset_index(drop=True)
    return pa.table({
        "bucket": pa.array(out["bucket"].astype(np.int64), pa.int64()),
        "n_vecs": pa.array(out["n_vecs"].astype(np.int64), pa.int64()),
    })


def label_cohesion(emb_ds, emb_col: str = "embedding",
                   label_col: str = "label"):
    """Per-label embedding-space cohesion audit → ``(label, n_vecs,
    mean_intra_dot, mean_inter_dot, margin)``: the mean pairwise dot
    product WITHIN each label vs the mean dot against every OTHER
    label's vectors — the class-separability check run before trusting
    labels (or cluster assignments) for curation decisions.

    NO pairwise pass exists anywhere: on the exact e6 lattice
    (``floor(x·1e6+0.5)``, the embed_dim_stats discipline) the
    sum-of-dots identities
    ``Σ_{i<j∈L} v_i·v_j = (|S_L|² − Σ_{i∈L}|v_i|²)/2`` and
    ``Σ_{i∈L, j∉L} v_i·v_j = S_L·(S_tot − S_L)``
    reduce everything to per-label component sums.  Per-batch partials
    are one row per label (n, per-dim sums, squared-norm sum split
    hi/lo at 2³² so int64 never wraps across batches — the
    token_type_corr discipline); one tiny label groupby; the driver
    combines exact Python ints and emits IEEE-deterministic doubles
    with the same expression tree as the SQL oracle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy(
            zero_copy_only=False)
        if batch.num_rows == 0:
            raise ValueError("empty batch")
        d = int(lens[0])
        if (lens != d).any():
            raise ValueError("ragged embedding lengths")
        q = np.floor(col.flatten().to_numpy(
            zero_copy_only=False).astype(np.float64) * 1e6 + 0.5
        ).astype(np.int64).reshape(batch.num_rows, d)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        ll = len(uniq)
        S = np.zeros((ll, d), np.int64)
        np.add.at(S, inv, q)
        sq_row = (q * q).sum(axis=1)
        sq = np.zeros(ll, np.int64)
        np.add.at(sq, inv, sq_row)
        n = np.bincount(inv, minlength=ll).astype(np.int64)
        cols = {
            "label": pa.array(uniq.astype(np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "sq_hi": pa.array(sq >> 32, pa.int64()),
            "sq_lo": pa.array(sq & 0xFFFFFFFF, pa.int64()),
        }
        for j in range(d):
            cols[f"s_{j}"] = pa.array(S[:, j], pa.int64())
        return pa.table(cols)

    partials = emb_ds.map_batches(partial, batch_format="pyarrow")
    first = partials.take(1)[0]
    dims = sorted(int(k[2:]) for k in first if k.startswith("s_"))
    names = ["n", "sq_hi", "sq_lo"] + [f"s_{j}" for j in dims]
    agg = (
        partials.groupby("label")
        .aggregate(*[Sum(c, alias_name=c) for c in names])
        .to_pandas()  # ≤ |labels| rows
    ).sort_values("label").reset_index(drop=True)
    S_by_label = [
        [int(agg[f"s_{j}"][i]) for j in dims]
        for i in range(len(agg))
    ]
    S_tot = [sum(s[j] for s in S_by_label) for j in range(len(dims))]
    N = int(agg["n"].sum())
    out = {"label": [], "n_vecs": [], "mean_intra_dot": [],
           "mean_inter_dot": [], "margin": []}
    for i in range(len(agg)):
        n = int(agg["n"][i])
        sq = (int(agg["sq_hi"][i]) << 32) + int(agg["sq_lo"][i])
        s = S_by_label[i]
        s2 = sum(v * v for v in s)
        cross = sum(v * (t - v) for v, t in zip(s, S_tot))
        # same expression tree as the SQL oracle:
        # (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) / 1e12
        intra = ((float(s2 - sq) / float(n * (n - 1))) / 1e12) \
            if n > 1 else 0.0
        inter = ((float(cross) / float(n * (N - n))) / 1e12) \
            if 0 < n < N else 0.0
        out["label"].append(int(agg["label"][i]))
        out["n_vecs"].append(n)
        out["mean_intra_dot"].append(intra)
        out["mean_inter_dot"].append(inter)
        out["margin"].append(intra - inter)
    return pa.table({
        "label": pa.array(out["label"], pa.int64()),
        "n_vecs": pa.array(out["n_vecs"], pa.int64()),
        "mean_intra_dot": pa.array(out["mean_intra_dot"], pa.float64()),
        "mean_inter_dot": pa.array(out["mean_inter_dot"], pa.float64()),
        "margin": pa.array(out["margin"], pa.float64()),
    })
