"""DSIR-style data selection: hashed-feature importance scoring.

Data Selection via Importance Resampling (Xie et al. 2023, public): score
every raw document by the log-ratio of its likelihood under a TARGET
distribution (the data you want more of — e.g. one language or source)
versus the RAW corpus distribution, both estimated over hashed n-gram
features.  High-scoring documents "look like" the target; selection is a
threshold/top-fraction over the score.

Scale shape (the reason hashed features win at 100 TB): the feature space
is a FIXED size ``num_features`` (2^10..2^20), so both distributions are
bounded histograms — per-batch bincount partials, one tiny groupby, and a
weight vector of ``num_features`` int64s broadcast to the scoring pass.
No vocabulary ever collects, no all-to-all moves token rows; two streaming
passes over the corpus total.

Exact-parity design (same trick as lm.unigram_logprob): per-feature
weights are int64 micro-nats ``floor(ln(tgt_c+1)*1e6) − floor(ln(raw_c+1)
*1e6)`` (+1 = add-one smoothing over the feature space), summed exactly;
the one float column ``mean_logratio`` subtracts the normalization
constant ``ln(tgt_total + F) − ln(raw_total + F)`` in one mirrored
expression.  The token→feature hash is ``_stable64`` (first 8 md5 bytes),
which DuckDB reproduces in pure SQL — the whole operator is
oracle-checkable.

Reference scope note: the reference app (whimbree/StudiOCR) has no
corpus-curation surface; this operator extends the engine's
training-data-pipeline family (SURVEY.md "beyond the reference" scope).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from .dedup import _stable64
from .relational import _dict_encode, _flat_tokens

_SCALE = 1_000_000.0


def _feature_ids(flat, num_features: int) -> np.ndarray:
    """stable64(token) % num_features per token, hashed once per DISTINCT
    token in the batch (dictionary encode first)."""
    d = _dict_encode(flat)
    feats = np.fromiter(
        (_stable64(t) % num_features for t in d.dictionary.to_pylist()),
        dtype=np.int64,
        count=len(d.dictionary),
    )
    return feats[d.indices.to_numpy(zero_copy_only=False)]


def dsir_score(
    ds,
    target_col: str = "lang",
    target_value: str = "en",
    num_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
):
    """Per-document DSIR importance score under ``target = rows where
    target_col == target_value`` → ``(doc_id, n_tokens, logratio_u,
    mean_logratio)``.

    ``logratio_u`` = Σ_tokens w[feat(token)] with w[f] = floor(ln(tgt_c+1)
    *1e6) − floor(ln(raw_c+1)*1e6) (int64 micro-nats, exact);
    ``mean_logratio`` = logratio_u / n_tokens / 1e6 − (ln(tgt_total+F) −
    ln(raw_total+F)) — the mean per-token log importance ratio in nats
    (positive ⇒ more target-like than the average raw token).  Selection
    is a caller-side filter (``mean_logratio > τ`` or top-fraction via
    lm.quality_tiers semantics)."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table(
                {"feat": pa.array([], pa.int64()),
                 "raw_c": pa.array([], pa.int64()),
                 "tgt_c": pa.array([], pa.int64())}
            )
        f = _feature_ids(flat, num_features)
        raw = np.bincount(f, minlength=num_features)
        is_tgt = pc.equal(
            batch.column(target_col), pa.scalar(target_value)
        ).fill_null(False).to_numpy(zero_copy_only=False)
        tgt = np.bincount(f[is_tgt[doc_idx]], minlength=num_features)
        nz = np.flatnonzero(raw)
        return pa.table(
            {"feat": pa.array(nz, pa.int64()),
             "raw_c": pa.array(raw[nz].astype(np.int64), pa.int64()),
             "tgt_c": pa.array(tgt[nz].astype(np.int64), pa.int64())}
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("feat")
        .aggregate(Sum("raw_c", alias_name="raw_c"),
                   Sum("tgt_c", alias_name="tgt_c"))
        .to_pandas()  # bounded: ≤ num_features rows
    )
    raw_vec = np.zeros(num_features, np.int64)
    tgt_vec = np.zeros(num_features, np.int64)
    if len(hist):
        raw_vec[hist["feat"].to_numpy()] = hist["raw_c"].to_numpy()
        tgt_vec[hist["feat"].to_numpy()] = hist["tgt_c"].to_numpy()
    raw_total = int(raw_vec.sum())
    tgt_total = int(tgt_vec.sum())
    # weights once, on the driver: num_features ints (math.log per distinct
    # count value, mirrored by the oracle's floor(ln(c+1)*1e6))
    def _lg(v: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(v, return_inverse=True)
        lp = np.array(
            [math.floor(math.log(float(c + 1)) * _SCALE) for c in uniq],
            dtype=np.int64,
        )
        return lp[inv]

    w = _lg(tgt_vec) - _lg(raw_vec)
    norm = (math.log(float(tgt_total + num_features))
            - math.log(float(raw_total + num_features)))
    w_ref = ray.put(w)

    class Scorer:
        def __init__(self):
            self.w = ray.get(w_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            n = batch.num_rows
            flat, doc_idx = _flat_tokens(batch, text_col)
            if len(flat) == 0:
                zeros = np.zeros(n, np.int64)
                return _out(ids, zeros, zeros, norm)
            f = _feature_ids(flat, num_features)
            tok_w = self.w[f]
            n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
            lr = np.bincount(doc_idx, weights=tok_w, minlength=n).astype(
                np.int64
            )
            return _out(ids, n_tok, lr, norm)

    return ds.map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency
    )


def _out(ids, n_tok, lr_u, norm: float) -> pa.Table:
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = lr_u.astype(np.float64) / n_tok.astype(np.float64) / _SCALE - norm
    return pa.table(
        {
            "doc_id": ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "logratio_u": pa.array(lr_u, pa.int64()),
            "mean_logratio": pa.array(
                np.where(n_tok > 0, mean, 0.0), pa.float64()
            ),
        }
    )
