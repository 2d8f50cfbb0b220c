"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at num_cpus=$RAY_GRAFT_CPUS (default 32) and print ONE
JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
     "docs": N, "docs_per_sec": N}

``--scaling``: run the same job in two fresh processes at num_cpus=8 and 32
(the sandbox stand-in for the north rule's N vs 4N clusters) and print both
throughputs + scaling efficiency.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import time


def _sf_name(sf_dir: str) -> str:
    import re

    m = re.search(r"sf([\d.]+)", sf_dir)
    return m.group(1) if m else sf_dir


def _bench_input(sf_dir: str) -> str:
    """Deterministic bench corpus, cached under /tmp (generation excluded
    from timing)."""
    from studiocr_ray.fixtures import bench_pages

    replicas = int(os.environ.get("GRAFT_BENCH_REPLICAS", "240"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|bench-v2|{replicas}".encode()
    ).hexdigest()[:16]
    d = os.path.join("/tmp/studiocr_bench_cache", key, "pages_in")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        bench_pages(sf_dir, d, replicas=replicas)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _host_memcpy_gbps() -> float:
    """Memcpy bandwidth probe: best of three consecutive 200 MB copies.
    The shared VM host intermittently memory-throttles (observed 0.07 GB/s
    vs several GB/s healthy), which inflates the bandwidth-sensitive
    high-cpu legs — recording the probe with every result makes each
    number interpretable.  Best-of-3 because the FIRST copy after an idle
    period systematically under-reads on a healthy host (measured 0.21
    then 3.17/3.31 GB/s back-to-back: cold-core frequency ramp + fresh
    200 MB of first-touch page faults), which round 3-4 misread as
    continuous throttle; max over three copies measures achievable
    bandwidth, not scheduler warm-up."""
    import numpy as np

    best = 0.0
    for _ in range(3):
        a = np.random.rand(200_000_000 // 8)
        t0 = time.perf_counter()
        a.copy()
        best = max(best, 0.2 / (time.perf_counter() - t0))
    return round(best, 2)


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np
    import ray.data as rd

    from studiocr_ray.datapipe.dedup import minhash_dedup_pairs
    from studiocr_ray.datapipe.embed import ann_topk_brute
    from studiocr_ray.datapipe.relational import word_count
    from studiocr_ray.pipelines.extract_pipeline import run_extract
    from studiocr_ray.pipelines.index_pipeline import run_index
    from studiocr_ray.search import search_corpus_indexed

    pages = _bench_input(sf_dir)
    # Warm the OS page cache (untimed) so we measure compute+shuffle, not
    # cold-disk reads.  count() on parquet is metadata-only and touches no
    # data bytes — stream the files for real.
    for name in sorted(os.listdir(pages)):
        if name.endswith(".parquet"):
            with open(os.path.join(pages, name), "rb") as f:
                while f.read(1 << 24):
                    pass
    n_input = rd.read_parquet(pages).count()

    out = f"/tmp/studiocr_bench_out/{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    summary = run_extract(pages, out, num_partitions=max(64, num_cpus * 4),
                          resume=False)
    timings["extract"] = time.perf_counter() - t0

    if os.environ.get("GRAFT_BENCH_ONLY") == "extract":
        docs = summary["docs"]
        shutil.rmtree(out, ignore_errors=True)
        return {
            "metric": "end-to-end extraction seconds over the bench pages corpus",
            "value": round(timings["extract"], 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": _sf_name(sf_dir),
            "num_cpus": num_cpus,
            "input_rows": n_input,
            "docs": docs,
            "docs_per_sec": round(docs / timings["extract"], 2),
            "host_memcpy_gbps": _host_memcpy_gbps(),
        }

    t0 = time.perf_counter()
    run_index(out)
    timings["index"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    idx_dir = os.path.join(out, "index")
    for q in ("table hash", "corn", "spark"):
        search_corpus_indexed(idx_dir, q).count()  # consume the lazy result
    timings["search"] = time.perf_counter() - t0

    docs_ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    minhash_dedup_pairs(docs_ds, threshold=0.5, num_perm=64, bands=16)
    timings["minhash_dedup"] = time.perf_counter() - t0

    # exact prefix-filter twin of the minhash stage (same table, same
    # threshold): deterministic recall costs the df pass + exact verify
    from studiocr_ray.datapipe.dedup import set_similarity_join

    t0 = time.perf_counter()
    set_similarity_join(docs_ds, threshold=0.5).count()
    timings["setsim_join"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    word_count(docs_ds).to_pandas()
    timings["word_count"] = time.perf_counter() - t0

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qv = np.array([r["embedding"] for r in emb.take(8)], dtype=np.float64)
    t0 = time.perf_counter()
    ann_topk_brute(emb, qv, k=10)
    timings["ann_topk"] = time.perf_counter() - t0

    # round-3 ops at corpus scale: the 1.2M-doc EXTRACTED corpus (not the
    # 5k-row documents table) so the timings measure real data volume
    import pyarrow as pa

    from studiocr_ray.datapipe.dedup import duplicate_passages
    from studiocr_ray.datapipe.graph import pagerank_int
    from studiocr_ray.datapipe.lm import unigram_logprob
    from studiocr_ray.pipelines.extract_pipeline import docs_dataset

    def as_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("url"),
             "text": batch.column("extracted_text")}
        )

    corpus = lambda: docs_dataset(out).map_batches(  # noqa: E731
        as_docs, batch_format="pyarrow"
    )
    t0 = time.perf_counter()
    duplicate_passages(corpus(), w=16).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["dup_passages"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    unigram_logprob(corpus(), strategy="broadcast").map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["unigram_logprob"] = time.perf_counter() - t0

    # the open-vocabulary shuffle strategy — the 100 TB path (token partials
    # co-partition with counts by term hash; the vocabulary never collects)
    t0 = time.perf_counter()
    unigram_logprob(corpus(), strategy="shuffle").map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["unigram_logprob_shuffle"] = time.perf_counter() - t0

    # published curation rules over the whole corpus: C4 line filter +
    # Gopher doc-quality filter, both stateless vectorized map_batches
    # (a doc never leaves its block) — the cheapest corpus-wide pass in
    # the suite and the one every training-data run repeats most often
    from studiocr_ray.datapipe.curation import (
        c4_line_filter,
        gopher_quality_filter,
    )

    def _count_true(col: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc2

            return pa.table({"n": pa.array(
                [int(pc2.sum(b.column(col)).as_py() or 0)], pa.int64()
            )})

        return f

    t0 = time.perf_counter()
    c4 = corpus().map_batches(c4_line_filter, batch_format="pyarrow") \
        .map_batches(_count_true("keep_doc"), batch_format="pyarrow") \
        .sum("n")
    gopher = corpus().map_batches(
        gopher_quality_filter, batch_format="pyarrow"
    ).map_batches(_count_true("keep"), batch_format="pyarrow").sum("n")
    timings["curation_filters"] = time.perf_counter() - t0
    del c4, gopher

    # global quality tiers: bounded-histogram percentiles over the corpus
    from studiocr_ray.datapipe.lm import quality_tiers

    t0 = time.perf_counter()
    quality_tiers(corpus(), k=4).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["quality_tiers"] = time.perf_counter() - t0

    # deterministic epoch-shuffle rank over the corpus: the histogram
    # broadcast + ONE range-keyed exchange (no global sort); urls hash to
    # int64 surrogate ids first (id_hash64), as a trillion-page run would
    from studiocr_ray.datapipe.sample import shuffle_rank
    from studiocr_ray.functions.arrowutil import id_hash64

    def as_int_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pa.array(
            id_hash64(batch.column("url")).astype(np.int64), pa.int64()
        )})

    t0 = time.perf_counter()
    shuffle_rank(
        docs_dataset(out).map_batches(as_int_ids, batch_format="pyarrow")
    ).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["shuffle_rank"] = time.perf_counter() - t0

    # DSIR importance scoring: two token passes + a broadcast weight
    # vector (the target label is a cheap deterministic url-length split)
    from studiocr_ray.datapipe.dsir import dsir_score

    def with_src(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        ln = pc2.binary_length(
            pc2.cast(b.column("doc_id"), pa.string())
        ).to_numpy(zero_copy_only=False)
        src = np.where(ln % 2 == 0, "web", "books")
        return b.append_column("source", pa.array(src, pa.string()))

    t0 = time.perf_counter()
    dsir_score(
        corpus().map_batches(with_src, batch_format="pyarrow"),
        target_col="source", target_value="web", num_features=4096,
    ).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["dsir_score"] = time.perf_counter() - t0

    # trained NB classifier over the extracted corpus (train + score = two
    # token passes; label is a cheap deterministic split)
    from studiocr_ray.datapipe.classify import nb_quality_score

    def label(b: pa.Table):
        import pyarrow.compute as pc2

        ln = pc2.binary_length(
            pc2.cast(b.column("doc_id"), pa.string())
        ).to_numpy(zero_copy_only=False)
        return ln % 2 == 0

    t0 = time.perf_counter()
    nb_quality_score(corpus(), label).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["nb_quality"] = time.perf_counter() - t0

    # HLL distinct-doc count over the corpus (raw-HLL regime: docs >> 2^p).
    # Column-pruned read: distinct-count needs only the url column.
    from studiocr_ray.datapipe.sketch import hll_distinct
    from studiocr_ray.pipelines.extract_pipeline import read_extracted

    def with_group(b: pa.Table) -> pa.Table:
        return pa.table(
            {"g": pa.array(["all"] * b.num_rows, pa.string()),
             "doc_id": b.column("url")}
        )

    t0 = time.perf_counter()
    hll_distinct(
        read_extracted(out, columns=["url"]).map_batches(
            with_group, batch_format="pyarrow"
        ),
        "g", "doc_id",
    ).materialize()
    timings["hll_distinct"] = time.perf_counter() - t0

    # integer PageRank on a synthetic graph the size of the corpus
    n_nodes = max(summary["docs"], 1)

    def pr_edges(batch: pa.Table) -> pa.Table:
        v = batch.column("id").to_numpy(zero_copy_only=False)
        src = np.repeat(v, 3)
        dst = np.stack(
            [(v * 3 + 1) % n_nodes, (v * 7 + 2) % n_nodes,
             (v + 1) % n_nodes], axis=1
        ).ravel()
        keep = src != dst
        key = np.unique(src[keep] * np.int64(n_nodes) + dst[keep])
        return pa.table(
            {"src": pa.array(key // n_nodes, pa.int64()),
             "dst": pa.array(key % n_nodes, pa.int64())}
        )

    ids = rd.range(n_nodes)
    t0 = time.perf_counter()
    pagerank_int(
        ids.map_batches(pr_edges, batch_format="pyarrow"),
        ids.map_batches(
            lambda b: pa.table({"v": b.column("id")}),
            batch_format="pyarrow",
        ),
        iters=5,
        num_buckets=max(64, num_cpus * 2),
    ).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["pagerank_5it"] = time.perf_counter() - t0

    # k-core peeling on the same synthetic graph (4 rounds = 8 alternating
    # co-partitioned half-rounds in one lineage)
    from studiocr_ray.datapipe.graph import kcore

    t0 = time.perf_counter()
    kcore(
        ids.map_batches(pr_edges, batch_format="pyarrow"),
        k=5, rounds=4, num_buckets=max(64, num_cpus * 2),
    ).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["kcore_4r"] = time.perf_counter() - t0

    # exact heavy hitters over the corpus text (candidate pass + broadcast
    # recount; raw tokens never shuffle)
    from studiocr_ray.datapipe.sketch import heavy_hitters

    t0 = time.perf_counter()
    heavy_hitters(
        read_extracted(out, columns=["extracted_text"]).rename_columns(
            {"extracted_text": "text"}
        ),
        k=50,
    ).materialize()
    timings["heavy_hitters"] = time.perf_counter() - t0

    # CDC merge at corpus scale: a derived changelog (1/5 updates, 1/11
    # deletes) applied onto the 1.2M-doc extracted corpus — times the one
    # key-hash exchange of the snapshot-maintenance path
    from studiocr_ray.datapipe.cdc import apply_changes

    def mk_changes(b: pa.Table) -> pa.Table:
        import zlib

        ids = b.column("doc_id").to_pylist()
        h = np.array([zlib.crc32(u.encode()) for u in ids], np.uint32)
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        outs = []
        u = h % 5 == 0
        if u.any():
            sel = pa.array(np.flatnonzero(u))
            import pyarrow.compute as pc2

            outs.append(pa.table({
                "doc_id": pa.array([ids[i] for i in np.flatnonzero(u)]),
                "text": pc2.binary_join_element_wise(
                    txt.take(sel), " [v2]", ""),
                "op": pa.array(np.full(int(u.sum()), "U"), pa.string()),
                "seq": pa.array(np.full(int(u.sum()), 1, np.int64)),
            }))
        d = (h % 5 != 0) & (h % 11 == 0)
        if d.any():
            nd = int(d.sum())
            outs.append(pa.table({
                "doc_id": pa.array([ids[i] for i in np.flatnonzero(d)]),
                "text": pa.nulls(nd, pa.string()),
                "op": pa.array(np.full(nd, "D"), pa.string()),
                "seq": pa.array(np.full(nd, 1, np.int64)),
            }))
        if not outs:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "text": pa.array([], pa.string()),
                             "op": pa.array([], pa.string()),
                             "seq": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    t0 = time.perf_counter()
    apply_changes(
        corpus(),
        corpus().map_batches(mk_changes, batch_format="pyarrow"),
        "doc_id", ["text"],
    ).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["cdc_merge"] = time.perf_counter() - t0

    # Stupid-Backoff scoring at corpus scale: the pruned-bigram count
    # exchange + broadcast scorer over 1.2M docs (the round-5 LM stage)
    from studiocr_ray.datapipe.lm import sbo_logprob

    t0 = time.perf_counter()
    sbo_logprob(corpus()).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["sbo_logprob"] = time.perf_counter() - t0

    # SMB storage join at corpus scale: the write-time shuffle (both
    # sides bucketed by url hash) then the exchange-FREE per-bucket join
    from studiocr_ray.datapipe.join import bucket_write, smb_join

    smb_root = os.path.join(os.path.dirname(out), "smb_bench")
    shutil.rmtree(smb_root, ignore_errors=True)

    def as_dim(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_chars": pc2.utf8_length(b.column("text")),
        })

    t0 = time.perf_counter()
    bucket_write(corpus(), os.path.join(smb_root, "fact"), on="doc_id",
                 num_buckets=64, cols=[])
    bucket_write(corpus().map_batches(as_dim, batch_format="pyarrow"),
                 os.path.join(smb_root, "dim"), on="doc_id",
                 num_buckets=64)
    smb_join(os.path.join(smb_root, "fact"),
             os.path.join(smb_root, "dim"), on="doc_id",
             num_buckets=64).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow",
    ).sum("n")
    timings["smb_join"] = time.perf_counter() - t0
    shutil.rmtree(smb_root, ignore_errors=True)

    # hapax attribution at corpus scale: the term-hash bucketed
    # (term, source, tf) cell exchange over 1.2M docs (16 synthetic
    # sources so the per-source rollup has real groups)
    from studiocr_ray.datapipe.text import hapax_stats

    from studiocr_ray.functions.arrowutil import string_buckets

    _SRC16 = pa.array([f"s{i}" for i in range(16)], pa.string())

    def with_source(b: pa.Table) -> pa.Table:
        sb = string_buckets(b.column("doc_id"), 16)
        return b.append_column(
            "source", _SRC16.take(pa.array(sb.astype("int64"))))

    t0 = time.perf_counter()
    hapax_stats(
        corpus().map_batches(with_source, batch_format="pyarrow")
    ).to_pandas()
    timings["hapax_stats"] = time.perf_counter() - t0

    # exact Kendall tau-b per nation over the sf TPC-H tables:
    # contingency-cell partials + one custkey exchange + 2-D prefix sums
    from studiocr_ray.datapipe.relational import kendall_by_nation

    t0 = time.perf_counter()
    kendall_by_nation(
        rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_custkey"]),
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                        columns=["c_custkey"]),
        sf_dir,
    )
    timings["kendall_nation"] = time.perf_counter() - t0

    docs = summary["docs"]
    shutil.rmtree(out, ignore_errors=True)
    return {
        "metric": "end-to-end extraction seconds (read→dedup→extract→write, "
        "byte-identical text) over the bench pages corpus",
        "value": round(timings["extract"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": _sf_name(sf_dir),
        "num_cpus": num_cpus,
        "input_rows": n_input,
        "docs": docs,
        "docs_per_sec": round(docs / timings["extract"], 2),
        "host_memcpy_gbps": _host_memcpy_gbps(),
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Two fresh processes on the same input → throughput at both levels +
    scaling efficiency (the sandbox evidence for the N vs 4N criterion).
    Runs the headline extraction pipeline only, so both legs measure the
    same job the criterion names."""
    results = {}
    # 4.8M rows (replicas=960): per-run constants (actor startup, read
    # ramp — ~4s) must be a small fraction of the 32-cpu leg or they are
    # measured as "inefficiency" the 100 TB regime doesn't have.  Round 1
    # used 1.2M (staging-write wall, removed by round-2 layout-page
    # virtualization), rounds 2–4 used 2.4M; a round-5 healthy-host A/B
    # measured 0.70–0.79 at 2.4M vs 0.863 at 4.8M with identical code —
    # the gap is the constant term, so the criterion runs at 4.8M where
    # the 32-cpu leg is ~100 s and constants are <4%.
    replicas = os.environ.get("GRAFT_BENCH_REPLICAS", "960")
    probes = {}
    for n in (lo, hi):
        # bracketing probes: a leg only counts as healthy-host evidence if
        # the bandwidth probe reads healthy immediately BEFORE and AFTER it
        probes[f"probe_before_{n}"] = _host_memcpy_gbps()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=sf_dir,
                   GRAFT_BENCH_ONLY="extract", GRAFT_BENCH_REPLICAS=replicas)
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
        probes[f"probe_after_{n}"] = _host_memcpy_gbps()
    tp_lo = results[lo]["docs_per_sec"]
    tp_hi = results[hi]["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": f"scaling efficiency docs/sec {lo}→{hi} cpus (N vs 4N stand-in)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf_name(sf_dir),
        f"sec_{lo}": results[lo]["value"],
        f"sec_{hi}": results[hi]["value"],
        f"docs_per_sec_{lo}": tp_lo,
        f"docs_per_sec_{hi}": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "host_memcpy_gbps": _host_memcpy_gbps(),
        **probes,
        "queries": {
            f"extract_{lo}cpu": results[lo]["queries"]["extract"],
            f"extract_{hi}cpu": results[hi]["queries"]["extract"],
        },
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        # optional "--scaling LO HI" (default 8 32); env override for harnesses
        # that can't pass argv (e.g. GRAFT_SCALE_LO=4 GRAFT_SCALE_HI=16).
        lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
        hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
        i = sys.argv.index("--scaling")
        if len(sys.argv) > i + 2 and sys.argv[i + 1].isdigit() and sys.argv[i + 2].isdigit():
            lo, hi = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        print(json.dumps(run_scaling(sf_dir, lo, hi)))
        return
    res = run_bench(sf_dir, num_cpus)
    import ray

    ray.shutdown()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
