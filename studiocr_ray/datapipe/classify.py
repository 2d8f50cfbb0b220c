"""Trained corpus quality classifier: Naive-Bayes token log-odds.

The fastText-style quality-filter shape used by GPT-3 / CCNet-descended
curation (Brown et al. 2020 §A; Wenzek et al. 2020): TRAIN a token model
from a labeled subset of the corpus itself, then SCORE every document and
keep the high scorers.  Here the model is multinomial Naive Bayes with
add-one smoothing over lowered whitespace tokens — linear in token
log-odds, which is exactly what a trained fastText classifier reduces to
at inference.

Exact-parity design (the ``unigram_logprob`` pattern, lm.py): per-token
class log-counts quantize to int64 micro-nats ``floor(ln(c+1) * 1e6)``
(``math.log`` ≡ DuckDB ``ln`` bit-for-bit), so a document's score
``score_u = Σ_tok (lp_pos_u − lp_neg_u)`` aggregates as integers; the one
float column is a single identically-shaped expression over those ints on
both sides:

    mean_score = score_u / n_tokens / 1e6 − (ln(Npos+V) − ln(Nneg+V))

which is the true per-token NB log-odds mean (the smoothing denominators
fold into the per-token constant).

Scale shape: ONE pass builds the per-class token counts (vectorized
dictionary+bincount partials → one vocabulary-bounded groupby — the
word_count shape, relational.py:56-80), the count table broadcasts once
via ``ray.put``, and scoring is a stateless actor-pool ``map_batches``.
For open vocabularies where the count table outgrows a worker heap, the
co-partitioned strategy of ``lm.unigram_logprob(strategy="shuffle")`` is
the drop-in upgrade (token partials meet counts by term-hash bucket).

No counterpart in the reference (its quality signal is per-page OCR
confidence, /root/reference/StudiOCR/OcrEngine.py:146-160); this is the
model-scoring extension SURVEY §2.10 calls for.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray

from .lm import _log_micronats
from .relational import _dict_encode, _flat_tokens

_SCALE = 1_000_000.0


def class_token_counts(ds, text_col: str = "text", label_expr=None):
    """Per-term per-class counts → Dataset ``(term, c_pos, c_neg)``.

    ``label_expr(batch) -> np.ndarray[bool]`` marks positive rows.  One
    vectorized partial per batch (composite term×class bincount); the
    merge buckets by term hash (cf. relational.word_count) — never a
    raw ``groupby("term")`` string-key sort shuffle over the open
    vocabulary."""
    from ..functions.arrowutil import string_buckets

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table(
                {"wb": pa.array([], pa.int32()),
                 "term": pa.array([], pa.string()),
                 "c_pos": pa.array([], pa.int64()),
                 "c_neg": pa.array([], pa.int64())}
            )
        pos = np.asarray(label_expr(batch), dtype=bool)
        d = _dict_encode(flat)
        ndict = len(d.dictionary)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_pos = pos[doc_idx]
        cp = np.bincount(codes[tok_pos], minlength=ndict)
        cn = np.bincount(codes[~tok_pos], minlength=ndict)
        return pa.table(
            {
                "wb": pa.array(string_buckets(d.dictionary, 64), pa.int32()),
                "term": d.dictionary,
                "c_pos": pa.array(cp, pa.int64()),
                "c_neg": pa.array(cn, pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("term"))
        idx = d.indices.to_numpy(zero_copy_only=False)
        nd = len(d.dictionary)
        cp = np.bincount(
            idx,
            weights=group.column("c_pos").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        cn = np.bincount(
            idx,
            weights=group.column("c_neg").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        return pa.table(
            {"term": d.dictionary,
             "c_pos": pa.array(cp, pa.int64()),
             "c_neg": pa.array(cn, pa.int64())}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "wb"
    ).map_groups(merge, batch_format="pyarrow")


class _NBScorer:
    """Actor-pool scoring stage: resolves the broadcast weight table once
    per actor into a term→weight dict; per batch only the batch's DISTINCT
    terms hit the dict."""

    def __init__(self, weights_ref, const: float):
        tbl = ray.get(weights_ref) if not isinstance(weights_ref, pa.Table) else weights_ref
        self.w = dict(
            zip(tbl.column("term").to_pylist(),
                tbl.column("w_u").to_numpy(zero_copy_only=False).tolist())
        )
        self.const = const

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        flat, doc_idx = _flat_tokens(batch, "text")
        if len(flat) == 0:
            zeros = np.zeros(n, np.int64)
            return self._result(ids, zeros, zeros)
        d = _dict_encode(flat)
        dict_w = np.array(
            [self.w[t] for t in d.dictionary.to_pylist()], dtype=np.int64
        )
        tok_w = dict_w[d.indices.to_numpy(zero_copy_only=False)]
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        score_u = np.bincount(doc_idx, weights=tok_w, minlength=n).astype(np.int64)
        return self._result(ids, n_tok, score_u)

    def _result(self, ids, n_tok, score_u) -> pa.Table:
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = (score_u.astype(np.float64) / n_tok.astype(np.float64)
                    / _SCALE - self.const)
        mean = np.where(n_tok > 0, mean, 0.0)
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": pa.array(n_tok, pa.int64()),
                "score_u": pa.array(score_u, pa.int64()),
                "mean_score": pa.array(mean, pa.float64()),
                "pred_pos": pa.array((mean > 0.0).astype(np.int64), pa.int64()),
            }
        )


def nb_quality_score(
    ds,
    label_expr,
    text_col: str = "text",
    concurrency=(1, 8),
):
    """Train-and-score Naive-Bayes quality classifier →
    ``(doc_id, n_tokens, score_u, mean_score, pred_pos)``.

    ``label_expr(batch) -> bool ndarray`` labels the training rows
    (positive class).  The model trains on ``ds`` itself and scores every
    row of ``ds`` — the self-trained corpus-filter loop.  ``score_u`` is
    the exact integer Σ(lp_pos_u − lp_neg_u) over the document's tokens;
    ``mean_score`` > 0 ⇔ the smoothed NB posterior favors the positive
    class under equal priors."""
    counts = class_token_counts(ds, text_col=text_col, label_expr=label_expr)
    parts = [b for b in counts.iter_batches(batch_format="pyarrow")]
    tbl = (
        pa.concat_tables(parts)
        if parts
        else pa.table({"term": pa.array([], pa.string()),
                       "c_pos": pa.array([], pa.int64()),
                       "c_neg": pa.array([], pa.int64())})
    )
    cp = tbl.column("c_pos").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = tbl.column("c_neg").to_numpy(zero_copy_only=False).astype(np.int64)
    w_u = _log_micronats(cp + 1) - _log_micronats(cn + 1)
    vocab = len(cp)
    n_pos, n_neg = int(cp.sum()), int(cn.sum())
    const = (math.log(float(n_pos + vocab)) - math.log(float(n_neg + vocab))
             if vocab else 0.0)
    weights = pa.table(
        {"term": tbl.column("term"), "w_u": pa.array(w_u, pa.int64())}
    )
    ref = ray.put(weights)
    return ds.map_batches(
        _NBScorer,
        fn_constructor_args=(ref, const),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


_CAL_OFF = 100_000_000  # 100 nats in micro-nats: > any per-token |weight|
_CAL_STEP = 10_000      # 0.01-nat reliability bins


class _NBCalibrator:
    """Scoring + label pass emitting per-batch reliability-bin partials:
    bin = ((score_u + OFF·n_tok) // n_tok) // STEP on integers shifted
    non-negative, so numpy floor division and SQL's truncating ``//``
    agree (DuckDB truncates toward zero on negatives)."""

    def __init__(self, weights_ref, label_expr):
        tbl = ray.get(weights_ref) \
            if not isinstance(weights_ref, pa.Table) else weights_ref
        self.w = dict(
            zip(tbl.column("term").to_pylist(),
                tbl.column("w_u").to_numpy(zero_copy_only=False).tolist())
        )
        self.label_expr = label_expr

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, doc_idx = _flat_tokens(batch, "text")
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64()),
                          "pos_part": pa.array([], pa.int64())})
        if len(flat) == 0:
            return empty
        d = _dict_encode(flat)
        dict_w = np.array(
            [self.w[t] for t in d.dictionary.to_pylist()], dtype=np.int64
        )
        tok_w = dict_w[d.indices.to_numpy(zero_copy_only=False)]
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        score_u = np.bincount(doc_idx, weights=tok_w,
                              minlength=n).astype(np.int64)
        pos = np.asarray(self.label_expr(batch), dtype=bool)
        keep = n_tok > 0  # token-free docs have no score: excluded
        if not keep.any():
            return empty
        m = (score_u[keep] + _CAL_OFF * n_tok[keep]) // n_tok[keep]
        b = m // _CAL_STEP
        uniq, inv = np.unique(b, return_inverse=True)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(cnt, inv, 1)
        np_pos = np.zeros(len(uniq), np.int64)
        np.add.at(np_pos, inv, pos[keep].astype(np.int64))
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "n_part": pa.array(cnt, pa.int64()),
                         "pos_part": pa.array(np_pos, pa.int64())})


def nb_calibration(ds, label_expr, text_col: str = "text",
                   concurrency=(1, 8)):
    """Reliability diagram for the self-trained NB quality classifier →
    ``(bucket_lo_unats, n_docs, n_pos, pos_rate)``: docs binned by their
    integer mean per-token log-odds score in fixed 0.01-nat bins, with the
    observed positive-label rate per bin — the calibration audit run
    before trusting classifier scores as sampling weights (well
    calibrated ⇔ rate rises monotonically and crosses ½ near score 0).

    Same training pass as :func:`nb_quality_score` (weights broadcast
    once); the scoring pass folds each batch to ≤ |bins| partial rows,
    so the final groupby is tiny.  Everything through the bin id is
    int64-exact (scores shifted non-negative so floor and truncating
    division agree — see :class:`_NBCalibrator`); ``pos_rate`` is one
    deterministic double division, so the SQL oracle hash-matches.
    Token-free docs carry no score and are excluded (documented)."""
    from ray.data.aggregate import Sum

    counts = class_token_counts(ds, text_col=text_col,
                                label_expr=label_expr)
    parts = [b for b in counts.iter_batches(batch_format="pyarrow")]
    tbl = (
        pa.concat_tables(parts)
        if parts
        else pa.table({"term": pa.array([], pa.string()),
                       "c_pos": pa.array([], pa.int64()),
                       "c_neg": pa.array([], pa.int64())})
    )
    cp = tbl.column("c_pos").to_numpy(zero_copy_only=False).astype(
        np.int64)
    cn = tbl.column("c_neg").to_numpy(zero_copy_only=False).astype(
        np.int64)
    w_u = _log_micronats(cp + 1) - _log_micronats(cn + 1)
    weights = pa.table(
        {"term": tbl.column("term"), "w_u": pa.array(w_u, pa.int64())}
    )
    ref = ray.put(weights)
    out = (
        ds.map_batches(
            _NBCalibrator,
            fn_constructor_args=(ref, label_expr),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby("bucket")
        .aggregate(Sum("n_part", alias_name="n_docs"),
                   Sum("pos_part", alias_name="n_pos"))
        .to_pandas()  # ≤ |0.01-nat bins| rows
    ).sort_values("bucket").reset_index(drop=True)
    b = out["bucket"].astype(np.int64).to_numpy()
    nd = out["n_docs"].astype(np.int64).to_numpy()
    npos = out["n_pos"].astype(np.int64).to_numpy()
    return pa.table({
        "bucket_lo_unats": pa.array(b * _CAL_STEP - _CAL_OFF,
                                    pa.int64()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_pos": pa.array(npos, pa.int64()),
        "pos_rate": pa.array(npos.astype(np.float64)
                             / nd.astype(np.float64), pa.float64()),
    })
