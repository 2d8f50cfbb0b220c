"""Corpus-quality signal operators: repetition statistics and benchmark
contamination checks.

These extend the engine's text-analysis family (``datapipe/text.py``) with
the two signal classes a web-scale training-data pipeline filters on that
the reference's per-page statistics (/root/reference/StudiOCR/OcrPageData.py)
do not cover:

* **Repetition** (Rae et al., "Scaling Language Models: Methods, Analysis &
  Insights from Training Gopher", 2021, §A1.1): documents dominated by a
  single repeated token / 2-gram / 3-gram are boilerplate or spam; the
  fraction of the document occupied by its most frequent n-gram is the
  classic filter signal.
* **Benchmark contamination** (Brown et al., "Language Models are Few-Shot
  Learners", 2020, §4): training documents sharing word n-grams with an
  evaluation benchmark must be flagged/dropped.  The benchmark side is
  genuinely small (an eval set, not a corpus) so it is broadcast via
  ``ray.put`` once and probed per batch — never a shuffle join.

Both are stateless ``map_batches`` transforms over ``documents``-shaped
batches; nothing here shuffles.  Tokenization is the engine's standard
lowered-whitespace split (``_flat_tokens``), the one construction already
proven bit-exact against the DuckDB ``regexp_split_to_array`` oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _dict_encode, _flat_tokens


def _dense(keys: np.ndarray) -> tuple[np.ndarray, int]:
    """Dense re-encode of an int64 key array → (codes, num_distinct).
    Hierarchical n-gram keys are built pair-at-a-time through this so no
    composite key ever exceeds ``num_distinct_prefix * vocab`` — int64-safe
    at any corpus vocabulary."""
    uniq, inv = np.unique(keys, return_inverse=True)
    return inv, len(uniq)


def _top_count_per_doc(
    doc_idx: np.ndarray, codes: np.ndarray, ncodes: int, n_docs: int
) -> np.ndarray:
    """max over occurrences-per-(doc, code) for each doc, vectorized:
    one np.unique over the composite key, one np.maximum.at scatter."""
    out = np.zeros(n_docs, np.int64)
    if len(codes) == 0:
        return out
    key = doc_idx.astype(np.int64) * ncodes + codes
    uniq, counts = np.unique(key, return_counts=True)
    np.maximum.at(out, uniq // ncodes, counts)
    return out


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style per-doc repetition signals over lowered whitespace
    tokens: ``top_token_frac`` / ``top_bigram_frac`` / ``top_trigram_frac``
    = occurrences of the most frequent n-gram divided by the number of
    n-gram positions (0.0 when the doc has no such positions).

    Fully vectorized: one token flatten, one dictionary encode, then one
    ``np.unique`` + scatter-max per n — no per-row Python.  Fractions are a
    single integer/integer double division, so the DuckDB oracle reproduces
    them bit-exactly."""
    n_docs = batch.num_rows
    flat, doc_idx = _flat_tokens(batch, text_col)
    n_tokens = np.zeros(n_docs, np.int64)
    if len(flat):
        np.add.at(n_tokens, doc_idx, 1)
        d = _dict_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ndict = len(d.dictionary)
        top1 = _top_count_per_doc(doc_idx, codes, ndict, n_docs)
        # adjacent positions within the same doc form the 2-gram stream
        adj = doc_idx[:-1] == doc_idx[1:] if len(codes) > 1 else np.zeros(0, bool)
        pair_codes, npair = _dense(codes[:-1][adj] * ndict + codes[1:][adj])
        top2 = _top_count_per_doc(doc_idx[:-1][adj], pair_codes, npair, n_docs)
        # trigram = (bigram at i, token at i+2); key stays int64-safe because
        # the bigram side was densified first
        if len(codes) > 2:
            adj3 = doc_idx[:-2] == doc_idx[2:]
            pc_full = np.full(len(codes) - 1, -1, np.int64)
            pc_full[adj] = pair_codes
            tri_keys = pc_full[:-1][adj3] * ndict + codes[2:][adj3]
            tri_codes, ntri = _dense(tri_keys)
            top3 = _top_count_per_doc(doc_idx[:-2][adj3], tri_codes, ntri, n_docs)
        else:
            top3 = np.zeros(n_docs, np.int64)
    else:
        top1 = top2 = top3 = np.zeros(n_docs, np.int64)

    def frac(top: np.ndarray, denom: np.ndarray) -> pa.Array:
        d = denom.astype(np.float64)
        return pa.array(
            np.divide(top, d, out=np.zeros(n_docs, np.float64), where=d > 0),
            pa.float64(),
        )

    n_bi = np.maximum(n_tokens - 1, 0)
    n_tri = np.maximum(n_tokens - 2, 0)
    cols: dict[str, object] = {}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    cols.update(
        n_tokens=pa.array(n_tokens, pa.int64()),
        top_token_frac=frac(top1, n_tokens),
        top_bigram_frac=frac(top2, n_bi),
        top_trigram_frac=frac(top3, n_tri),
    )
    return pa.table(cols)


def _ngram_strings(
    flat: pa.Array, doc_idx: np.ndarray, n: int
) -> tuple[pa.Array, np.ndarray]:
    """Space-joined word ``n``-grams over the flattened token stream,
    restricted to windows that stay inside one doc.  Returns (ngrams,
    doc_idx_of_each_ngram).  Join-by-space is injective for whitespace-split
    tokens, so string equality == token-tuple equality."""
    L = len(flat)
    if L < n:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    inside = doc_idx[: L - n + 1] == doc_idx[n - 1 :]
    keep = np.flatnonzero(inside)
    shifted = [flat.slice(k, L - n + 1).take(pa.array(keep)) for k in range(n)]
    grams = pc.binary_join_element_wise(*shifted, " ")
    return grams, doc_idx[keep]


def benchmark_ngrams(texts, n: int = 3) -> pa.Array:
    """Distinct lowered word n-grams of the benchmark texts (driver-side by
    design: an eval benchmark is KBs–MBs, the small broadcast side of the
    contamination probe)."""
    tbl = pa.table({"text": pa.array(list(texts), pa.string())})
    flat, doc_idx = _flat_tokens(tbl, "text")
    grams, _ = _ngram_strings(flat, doc_idx, n)
    return pc.unique(grams)


class ContaminationCheck:
    """Actor-pool stage flagging docs whose word n-grams overlap a broadcast
    benchmark n-gram set.

    ``__init__`` resolves the ``ray.put`` handle once per actor; ``__call__``
    builds each batch's n-grams vectorized and probes membership with one
    ``pc.is_in``.  Output: (doc_id, n_ngrams, n_overlap, contaminated) where
    ``n_ngrams``/``n_overlap`` count DISTINCT n-grams (total / present in
    the benchmark)."""

    def __init__(self, bench_ref, n: int = 3, text_col: str = "text"):
        import ray

        self.bench = (
            ray.get(bench_ref) if not isinstance(bench_ref, pa.Array) else bench_ref
        )
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        flat, doc_idx = _flat_tokens(batch, self.text_col)
        grams, gdoc = _ngram_strings(flat, doc_idx, self.n)
        n_ngrams = np.zeros(n_docs, np.int64)
        n_overlap = np.zeros(n_docs, np.int64)
        if len(grams):
            d = _dict_encode(grams)
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            key = gdoc * len(d.dictionary) + codes
            uniq = np.unique(key)
            udoc = uniq // len(d.dictionary)
            np.add.at(n_ngrams, udoc, 1)
            member = pc.is_in(
                d.dictionary.take(pa.array(uniq % len(d.dictionary))),
                value_set=self.bench,
            ).to_numpy(zero_copy_only=False)
            np.add.at(n_overlap, udoc[member], 1)
        cols: dict[str, object] = {}
        if "doc_id" in batch.column_names:
            cols["doc_id"] = batch.column("doc_id")
        cols.update(
            n_ngrams=pa.array(n_ngrams, pa.int64()),
            n_overlap=pa.array(n_overlap, pa.int64()),
            contaminated=pa.array(n_overlap > 0, pa.bool_()),
        )
        return pa.table(cols)


def contamination_check(ds, benchmark_texts, n: int = 3, concurrency: int = 4):
    """documents Dataset → (doc_id, n_ngrams, n_overlap, contaminated).

    The benchmark n-gram set is built once on the driver (small by nature),
    ``ray.put`` once, and probed inside every batch — the broadcast-lookup
    join shape, no shuffle."""
    import ray

    bench_ref = ray.put(benchmark_ngrams(benchmark_texts, n))
    return ds.map_batches(
        ContaminationCheck,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def decontaminate(ds, benchmark_texts, n: int = 3, max_overlap: int = 0):
    """Drop documents sharing more than ``max_overlap`` distinct word
    n-grams with the benchmark (the GPT-3 §4 decontamination step applied,
    rather than just measured, cf. :func:`contamination_check`).

    Same scale shape as the check: the benchmark n-gram set is broadcast
    once via ``ray.put`` and probed per batch — computing the per-doc
    overlap count and filtering in ONE pass, no shuffle, documents never
    leave their block."""
    import ray

    bench_ref = ray.put(benchmark_ngrams(benchmark_texts, n))

    class Filter(ContaminationCheck):
        def __call__(self, batch: pa.Table) -> pa.Table:
            counts = super().__call__(batch)  # row-aligned with batch
            keep = pc.less_equal(counts.column("n_overlap"), max_overlap)
            return batch.filter(keep)

    return ds.map_batches(
        Filter,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
