"""Corpus-language-model scoring: per-document unigram log-probability.

The classic corpus-curation quality signal (a cheap stand-in for the
KenLM-perplexity filters of CCNet/RefinedWeb): score each document by the
mean log-probability of its tokens under the corpus's OWN unigram
distribution.  Rare-token-heavy documents (boilerplate, gibberish, OCR
noise) score low and can be filtered.

Exact-parity design: per-token log-counts are quantized to int64
micro-nats ``floor(ln(cnt) * 1e6)`` so every aggregation is integer math
— bit-exact against a DuckDB oracle (DuckDB's ``ln`` is libm ``log``,
identical to ``math.log``; numpy's SIMD ``np.log`` is NOT, so logs are
taken with ``math.log`` once per DISTINCT corpus count, never per token).
The one float column (``mean_logprob``) is a single identically-shaped
expression over those ints on both sides.

Two interchangeable distribution strategies, same output bit-for-bit:

- ``broadcast`` (default): the vocabulary-bounded (term, cnt) table is
  collected once and ``ray.put`` — each scoring task reads the shared
  object, never re-ships it per batch.  Right whenever the vocabulary
  fits a worker heap (true for natural-language corpora after token
  normalization; ~10-100M terms).
- ``shuffle``: never collects the vocabulary — (doc_id, term, tf) token
  partials co-partition with the (term, cnt) table by term-hash bucket,
  scores merge per bucket via a sorted ``searchsorted`` join, and a
  second small groupby re-assembles per-document sums.  The 100 TB path
  for open-vocabulary corpora (urls / code / typos make distinct-term
  counts corpus-scale).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from .relational import _dict_encode, _flat_tokens, word_count

_SCALE = 1_000_000.0


def _log_micronats(counts: np.ndarray) -> np.ndarray:
    """floor(ln(cnt) * 1e6) per count, int64 — ``math.log`` per DISTINCT
    count value (bounded by the number of distinct frequencies, tiny), then
    a vectorized gather."""
    uniq, inv = np.unique(counts, return_inverse=True)
    lp = np.array(
        [math.floor(math.log(float(c)) * _SCALE) for c in uniq],
        dtype=np.int64,
    )
    return lp[inv]


def _mean_expr(lp_u: np.ndarray, n_tok: np.ndarray, total: int) -> np.ndarray:
    """``CAST(lp AS DOUBLE) / n_tokens / 1e6 - ln(total)`` — mirrored
    exactly by the SQL oracle (same op sequence ⇒ same IEEE doubles);
    0.0 for empty documents."""
    ln_n = math.log(float(total)) if total > 0 else 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = lp_u.astype(np.float64) / n_tok.astype(np.float64) / _SCALE - ln_n
    return np.where(n_tok > 0, mean, 0.0)


def _result_table(ids, n_tok, lp_u, total: int) -> pa.Table:
    return pa.table(
        {
            "doc_id": ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "logprob_u": pa.array(lp_u, pa.int64()),
            "mean_logprob": pa.array(
                _mean_expr(np.asarray(lp_u), np.asarray(n_tok), total),
                pa.float64(),
            ),
        }
    )


class _BroadcastScorer:
    """Actor-pool scoring stage: resolves the shared vocabulary object ONCE
    in ``__init__`` and builds a term→micro-nat dict; per batch, only the
    batch's DISTINCT terms hit the dict (dictionary encode first)."""

    def __init__(self, counts_ref, total: int):
        tbl = ray.get(counts_ref) if not isinstance(counts_ref, pa.Table) else counts_ref
        terms = tbl.column("term").to_pylist()
        lp = _log_micronats(
            tbl.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        self.lp = dict(zip(terms, lp.tolist()))
        self.total = total

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        flat, doc_idx = _flat_tokens(batch, "text")
        if len(flat) == 0:
            zeros = np.zeros(n, np.int64)
            return _result_table(ids, zeros, zeros, self.total)
        d = _dict_encode(flat)
        # one dict lookup per DISTINCT term in the batch
        dict_lp = np.array(
            [self.lp[t] for t in d.dictionary.to_pylist()], dtype=np.int64
        )
        tok_lp = dict_lp[d.indices.to_numpy(zero_copy_only=False)]
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        lp_u = np.bincount(doc_idx, weights=tok_lp, minlength=n).astype(np.int64)
        return _result_table(ids, n_tok, lp_u, self.total)


def _token_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """(doc_id, term, tf) rows — one per distinct (doc, term), the same
    composite-key np.unique partial as term_doc_freq.  doc_id keeps its
    input type (int surrogate keys and url strings both work)."""
    id_type = batch.schema.field("doc_id").type
    flat, doc_idx = _flat_tokens(batch, text_col)
    if len(flat) == 0:
        return pa.table(
            {"doc_id": pa.array([], id_type),
             "term": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
    d = _dict_encode(flat)
    ndict = len(d.dictionary)
    key = doc_idx.astype(np.int64) * ndict + d.indices.to_numpy(
        zero_copy_only=False
    )
    uniq, counts = np.unique(key, return_counts=True)
    ids = batch.column("doc_id")
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            "doc_id": ids.take(pa.array(uniq // ndict)),
            "term": d.dictionary.take(pa.array(uniq % ndict)),
            "tf": pa.array(counts, pa.int64()),
        }
    )


def _bucket_merge(group: pa.Table) -> pa.Table:
    """Within one term-hash bucket: join token rows (role=0) to count rows
    (role=1) by term via ONE sort + searchsorted — no per-term Python."""
    toks = group.filter(pc.equal(group.column("role"), 0))
    cnts = group.filter(pc.equal(group.column("role"), 1))
    if toks.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "lp_part": pa.array([], pa.int64()),
             "n_part": pa.array([], pa.int64())}
        )
    cnts = cnts.sort_by("term")
    lp = _log_micronats(
        cnts.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    cterm = cnts.column("term")
    if isinstance(cterm, pa.ChunkedArray):
        cterm = cterm.combine_chunks()
    idx = pc.index_in(toks.column("term"), value_set=cterm)
    pos = idx.to_numpy(zero_copy_only=False)  # counts cover every token term
    tf = toks.column("tf").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": toks.column("doc_id"),
            "lp_part": pa.array(lp[pos] * tf, pa.int64()),
            "n_part": pa.array(tf, pa.int64()),
        }
    )


def unigram_logprob(
    ds,
    text_col: str = "text",
    strategy: str = "broadcast",
    num_buckets: int = 64,
    concurrency=(1, 8),
):
    """Per-document unigram log-probability under the corpus's own token
    distribution → ``(doc_id, n_tokens, logprob_u, mean_logprob)``.

    ``logprob_u`` = Σ_tokens floor(ln(corpus_cnt) * 1e6) (int64 micro-nats,
    exact); ``mean_logprob`` = logprob_u / n_tokens / 1e6 − ln(total_tokens)
    (mean per-token log-prob in nats).  See module docstring for the
    broadcast-vs-shuffle scale trade."""
    counts = word_count(ds, text_col=text_col)
    if strategy == "broadcast":
        parts = [b for b in counts.iter_batches(batch_format="pyarrow")]
        tbl = (
            pa.concat_tables(parts)
            if parts
            else pa.table({"term": pa.array([], pa.string()),
                           "cnt": pa.array([], pa.int64())})
        )
        total = int(pc.sum(tbl.column("cnt")).as_py() or 0)
        ref = ray.put(tbl)
        return ds.map_batches(
            _BroadcastScorer,
            fn_constructor_args=(ref, total),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    if strategy != "shuffle":
        raise ValueError(f"unknown strategy: {strategy!r}")

    total = int(
        sum(
            b.column("cnt").to_numpy(zero_copy_only=False).sum()
            for b in counts.iter_batches(batch_format="pyarrow")
            if b.num_rows
        )
    )

    def add_bucket(batch: pa.Table, role: int) -> pa.Table:
        from ..functions.arrowutil import string_buckets

        wb = string_buckets(batch.column("term"), num_buckets)
        out = batch.append_column("wb", pa.array(wb, pa.int32()))
        return out.append_column(
            "role", pa.array(np.full(batch.num_rows, role, np.int8))
        )

    from .dedup import _id_type_of

    id_type = _id_type_of(ds, "doc_id")
    tok_rows = ds.map_batches(
        _token_partials, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow",
    ).map_batches(add_bucket, fn_kwargs={"role": 0}, batch_format="pyarrow")
    cnt_rows = counts.map_batches(
        lambda b: b.append_column(
            "doc_id", pa.nulls(b.num_rows, id_type)
        ).append_column("tf", pa.array(np.zeros(b.num_rows, np.int64))),
        batch_format="pyarrow",
    ).map_batches(add_bucket, fn_kwargs={"role": 1}, batch_format="pyarrow")
    cols = ["doc_id", "term", "tf", "cnt", "wb", "role"]
    tok_rows = tok_rows.map_batches(
        lambda b: b.append_column(
            "cnt", pa.array(np.zeros(b.num_rows, np.int64))
        ).select(cols),
        batch_format="pyarrow",
    )
    cnt_rows = cnt_rows.map_batches(
        lambda b: b.select(cols), batch_format="pyarrow"
    )
    merged = tok_rows.union(cnt_rows).groupby("wb").map_groups(
        _bucket_merge, batch_format="pyarrow"
    )

    # per-doc sums via the bucketed pattern: groupby over num_buckets int
    # groups + one dictionary-encode/bincount per group — NOT
    # groupby("doc_id"), whose sort-based shuffle over millions of
    # distinct string keys measured ~30× the whole broadcast path
    def add_ib(batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import id_buckets

        ib = id_buckets(batch.column("doc_id"), num_buckets)
        return batch.append_column("ib", pa.array(ib, pa.int32()))

    def sum_group(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("doc_id"))
        idx = d.indices.to_numpy(zero_copy_only=False)
        nd = len(d.dictionary)
        lp = np.bincount(
            idx,
            weights=group.column("lp_part").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        nt = np.bincount(
            idx,
            weights=group.column("n_part").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        return _result_table(d.dictionary, nt, lp, total)

    scored = merged.map_batches(
        add_ib, batch_format="pyarrow"
    ).groupby("ib").map_groups(sum_group, batch_format="pyarrow")

    # documents with zero tokens never produced a partial — re-attach them
    def zero_rows(batch: pa.Table) -> pa.Table:
        _, doc_idx = _flat_tokens(batch, text_col)
        has = np.zeros(batch.num_rows, bool)
        has[np.unique(doc_idx)] = True
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keep = np.flatnonzero(~has)
        zeros = np.zeros(len(keep), np.int64)
        return _result_table(ids.take(pa.array(keep)), zeros, zeros, total)

    empties = ds.map_batches(zero_rows, batch_format="pyarrow")
    return scored.union(empties)


def _flat_bigrams(batch: pa.Table, text_col: str):
    """Adjacent within-document token pairs of a batch, vectorized:
    returns ``(pair_codes, t1_codes, doc_index, pair_dict, tok_dict)`` where
    ``pair_dict[pair_codes[i]]`` is the i-th bigram as a space-joined
    string and ``tok_dict[t1_codes[i]]`` its left (context) token.  One
    dictionary encode + one np.unique per batch — no per-pair Python."""
    flat, doc_idx = _flat_tokens(batch, text_col)
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.int64), pa.array([], pa.string()),
             pa.array([], pa.string()))
    if len(flat) < 2:
        return empty
    d = _dict_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    same = doc_idx[1:] == doc_idx[:-1]
    if not same.any():
        return empty
    left = codes[:-1][same]
    right = codes[1:][same]
    dix = doc_idx[1:][same].astype(np.int64)
    ndict = len(d.dictionary)
    key = left * ndict + right
    uk, pair_codes = np.unique(key, return_inverse=True)
    pair_dict = pc.binary_join_element_wise(
        d.dictionary.take(pa.array(uk // ndict)),
        d.dictionary.take(pa.array(uk % ndict)),
        " ",
    )
    return pair_codes, left, dix, pair_dict, d.dictionary


def bigram_logprob(
    ds,
    text_col: str = "text",
    strategy: str = "broadcast",
    num_buckets: int = 64,
    concurrency=(1, 8),
):
    """Per-document bigram LM score: mean conditional log-probability
    ``ln p(t_i | t_{i-1}) = ln c(t_{i-1}, t_i) − ln c(t_{i-1})`` under the
    corpus's own MLE bigram model → ``(doc_id, n_pairs, logprob_u,
    mean_logprob)``.  A sharper fluency signal than unigram_logprob
    (repetitive/gibberish text has common tokens in UNcommon orders); same
    int64 micro-nat exactness (per-pair term = floor(ln c_bi·1e6) −
    floor(ln c_uni·1e6); the context denominator is the token's FULL
    corpus unigram count, a documented MLE simplification that keeps the
    oracle a plain two-join SQL).  Documents with < 2 tokens score
    (0, 0, 0.0).

    ``broadcast`` collects the (bigram, cnt) table — right while distinct
    bigrams fit a worker (~5× unigram vocabulary on natural text).
    ``shuffle`` is the open-vocabulary 100 TB path: TWO bucket-merge
    exchanges (pair partials join bigram counts; context partials join
    unigram counts, negated) reusing unigram_logprob's `_bucket_merge`,
    then one per-doc sum — the vocabulary never collects."""
    uni = word_count(ds, text_col=text_col)

    def bigram_count_partial(batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import string_buckets

        pair_codes, _, _, pair_dict, _ = _flat_bigrams(batch, text_col)
        if len(pair_codes) == 0:
            return pa.table({"cb": pa.array([], pa.int32()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        cnts = np.bincount(pair_codes, minlength=len(pair_dict))
        return pa.table(
            {"cb": pa.array(string_buckets(pair_dict, 64), pa.int32()),
             "term": pair_dict, "cnt": pa.array(cnts.astype(np.int64))}
        )

    def bigram_count_merge(group: pa.Table) -> pa.Table:
        # bigram vocabulary is ~quadratic in the unigram one — merge by
        # hash bucket, never groupby("term") (the measured 33× string-key
        # sort-shuffle anti-pattern)
        d = _dict_encode(group.column("term"))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("cnt").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        ).astype(np.int64)
        return pa.table(
            {"term": d.dictionary, "cnt": pa.array(cnt, pa.int64())}
        )

    bi = ds.map_batches(
        bigram_count_partial, batch_format="pyarrow"
    ).groupby("cb").map_groups(bigram_count_merge, batch_format="pyarrow")

    if strategy == "broadcast":
        def collect(counts) -> pa.Table:
            parts = [b for b in counts.iter_batches(batch_format="pyarrow")]
            return (
                pa.concat_tables(parts)
                if parts
                else pa.table({"term": pa.array([], pa.string()),
                               "cnt": pa.array([], pa.int64())})
            )

        bi_ref = ray.put(collect(bi))
        uni_ref = ray.put(collect(uni))

        class Scorer:
            def __init__(self):
                def as_lp(tbl: pa.Table) -> dict:
                    lp = _log_micronats(
                        tbl.column("cnt").to_numpy(
                            zero_copy_only=False
                        ).astype(np.int64)
                    )
                    return dict(zip(tbl.column("term").to_pylist(),
                                    lp.tolist()))

                self.bi = as_lp(ray.get(bi_ref))
                self.uni = as_lp(ray.get(uni_ref))

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id")
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                n = batch.num_rows
                pair_codes, t1, dix, pair_dict, tok_dict = _flat_bigrams(
                    batch, text_col
                )
                if len(pair_codes) == 0:
                    zeros = np.zeros(n, np.int64)
                    return _pair_result(ids, zeros, zeros)
                # one dict lookup per DISTINCT bigram / context token
                bi_lp = np.array(
                    [self.bi[t] for t in pair_dict.to_pylist()], np.int64
                )[pair_codes]
                uni_lp = np.array(
                    [self.uni[t] for t in tok_dict.to_pylist()], np.int64
                )[t1]
                n_pairs = np.bincount(dix, minlength=n).astype(np.int64)
                lp = np.bincount(
                    dix, weights=bi_lp - uni_lp, minlength=n
                ).astype(np.int64)
                return _pair_result(ids, n_pairs, lp)

        return ds.map_batches(
            Scorer, batch_format="pyarrow", concurrency=concurrency
        )
    if strategy != "shuffle":
        raise ValueError(f"unknown strategy: {strategy!r}")

    def pair_partials(batch: pa.Table) -> pa.Table:
        """(doc_id, term=bigram, tf) rows; doc_id keeps its input type."""
        pair_codes, _, dix, pair_dict, _ = _flat_bigrams(batch, text_col)
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(pair_codes) == 0:
            return pa.table(
                {"doc_id": pa.array([], batch.schema.field("doc_id").type),
                 "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64())}
            )
        key = dix * len(pair_dict) + pair_codes
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_id": ids.take(pa.array(uniq // len(pair_dict))),
                "term": pair_dict.take(pa.array(uniq % len(pair_dict))),
                "tf": pa.array(counts, pa.int64()),
            }
        )

    def ctx_partials(batch: pa.Table) -> pa.Table:
        """(doc_id, term=context token, tf=times it opens a pair) rows."""
        _, t1, dix, _, tok_dict = _flat_bigrams(batch, text_col)
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(t1) == 0:
            return pa.table(
                {"doc_id": pa.array([], batch.schema.field("doc_id").type),
                 "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64())}
            )
        key = dix * len(tok_dict) + t1
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_id": ids.take(pa.array(uniq // len(tok_dict))),
                "term": tok_dict.take(pa.array(uniq % len(tok_dict))),
                "tf": pa.array(counts, pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table, role: int) -> pa.Table:
        from ..functions.arrowutil import string_buckets

        wb = string_buckets(batch.column("term"), num_buckets)
        out = batch.append_column("wb", pa.array(wb, pa.int32()))
        return out.append_column(
            "role", pa.array(np.full(batch.num_rows, role, np.int8))
        )

    cols = ["doc_id", "term", "tf", "cnt", "wb", "role"]

    def tok_stream(partial_fn):
        return ds.map_batches(partial_fn, batch_format="pyarrow").map_batches(
            add_bucket, fn_kwargs={"role": 0}, batch_format="pyarrow"
        ).map_batches(
            lambda b: b.append_column(
                "cnt", pa.array(np.zeros(b.num_rows, np.int64))
            ).select(cols),
            batch_format="pyarrow",
        )

    from .dedup import _id_type_of

    id_type = _id_type_of(ds, "doc_id")

    def cnt_stream(counts):
        return counts.map_batches(
            lambda b: b.append_column(
                "doc_id", pa.nulls(b.num_rows, id_type)
            ).append_column("tf", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow",
        ).map_batches(
            add_bucket, fn_kwargs={"role": 1}, batch_format="pyarrow"
        ).map_batches(lambda b: b.select(cols), batch_format="pyarrow")

    def negate(batch: pa.Table) -> pa.Table:
        lp = batch.column("lp_part").to_numpy(zero_copy_only=False)
        np_ = batch.column("n_part").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lp_part": pa.array(-lp, pa.int64()),
                # pairs are counted once, on the bigram side
                "n_part": pa.array(np.zeros_like(np_), pa.int64()),
            }
        )

    merged_bi = tok_stream(pair_partials).union(cnt_stream(bi)).groupby(
        "wb"
    ).map_groups(_bucket_merge, batch_format="pyarrow")
    merged_uni = tok_stream(ctx_partials).union(cnt_stream(uni)).groupby(
        "wb"
    ).map_groups(_bucket_merge, batch_format="pyarrow").map_batches(
        negate, batch_format="pyarrow"
    )

    # bucketed per-doc sum (see unigram_logprob: groupby("doc_id") over
    # millions of distinct string keys is a global sort; num_buckets int
    # groups + a bincount per group is the scale shape)
    def add_ib(batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import id_buckets

        ib = id_buckets(batch.column("doc_id"), num_buckets)
        return batch.append_column("ib", pa.array(ib, pa.int32()))

    def sum_group(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("doc_id"))
        idx = d.indices.to_numpy(zero_copy_only=False)
        nd = len(d.dictionary)
        lp = np.bincount(
            idx,
            weights=group.column("lp_part").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        npair = np.bincount(
            idx,
            weights=group.column("n_part").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        return _pair_result(d.dictionary, npair, lp)

    scored = merged_bi.union(merged_uni).map_batches(
        add_ib, batch_format="pyarrow"
    ).groupby("ib").map_groups(sum_group, batch_format="pyarrow")

    def zero_rows(batch: pa.Table) -> pa.Table:
        _, _, dix, _, _ = _flat_bigrams(batch, text_col)
        has = np.zeros(batch.num_rows, bool)
        if len(dix):
            has[np.unique(dix)] = True
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keep = np.flatnonzero(~has)
        zeros = np.zeros(len(keep), np.int64)
        return _pair_result(ids.take(pa.array(keep)), zeros, zeros)

    empties = ds.map_batches(zero_rows, batch_format="pyarrow")
    return scored.union(empties)


def _pair_result(ids, n_pairs, lp_u) -> pa.Table:
    n_pairs = np.asarray(n_pairs)
    lp_u = np.asarray(lp_u)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = lp_u.astype(np.float64) / n_pairs.astype(np.float64) / _SCALE
    return pa.table(
        {
            "doc_id": ids,
            "n_pairs": pa.array(n_pairs.astype(np.int64), pa.int64()),
            "logprob_u": pa.array(lp_u.astype(np.int64), pa.int64()),
            "mean_logprob": pa.array(
                np.where(n_pairs > 0, mean, 0.0), pa.float64()
            ),
        }
    )


def quality_tiers(ds, k: int = 4, text_col: str = "text"):
    """Bucket every document into k global quality tiers by its unigram-LM
    score — the distribution-aware curation step (keep the top tier, mix
    tiers at different rates) — WITHOUT a global sort →
    ``(doc_id, score_m, tier)``.

    ``score_m = logprob_u // (n_tokens * 1000)`` (integer milli-nats per
    token, 0 for empty docs): integer floor-division keeps it exact AND
    bounds its distinct values (~tens of thousands), so the tier
    boundaries come from a bounded histogram (np.unique partials + one
    small groupby + a driver cumsum) — the token_length_percentiles shape,
    never an all-to-all sort.  Boundaries use quantile_disc semantics
    (value at 1-based rank ceil(q·N)); ``tier = Σ_i [score_m > b_i]`` with
    b_i at i/k — identical expressions on the oracle side."""
    import math

    from ray.data.aggregate import Sum

    scored = unigram_logprob(ds, text_col=text_col,
                             strategy="broadcast").materialize()

    def add_score(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        lp = batch.column("logprob_u").to_numpy(zero_copy_only=False)
        score = np.where(n > 0, lp // np.maximum(n, 1) // 1000, 0)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "score_m": pa.array(score.astype(np.int64), pa.int64())}
        )

    with_score = scored.map_batches(add_score, batch_format="pyarrow")

    def hist_partial(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            batch.column("score_m").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {"score_m": pa.array(vals, pa.int64()),
             "cnt": pa.array(cnts, pa.int64())}
        )

    hist = (
        with_score.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("score_m")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: one row per distinct milli-nat score
        .sort_values("score_m")
    )
    cum = hist["cnt"].cumsum().to_numpy()
    vals = hist["score_m"].to_numpy()
    n_total = int(cum[-1]) if len(cum) else 0
    bounds = []
    for i in range(1, k):
        r = max(1, math.ceil(i / k * n_total))
        bounds.append(int(vals[np.searchsorted(cum, r)]) if n_total else 0)
    b = np.array(bounds, np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        s = batch.column("score_m").to_numpy(zero_copy_only=False)
        tier = (s[:, None] > b[None, :]).sum(axis=1).astype(np.int64)
        return batch.append_column("tier", pa.array(tier, pa.int64()))

    return with_score.map_batches(tag, batch_format="pyarrow")


def sbo_logprob(ds, text_col: str = "text", min_bigram: int = 2,
                concurrency=(1, 8)):
    """Stupid-Backoff bigram scoring (Brants et al., "Large Language
    Models in Machine Translation", EMNLP 2007 §4): per adjacent pair,
    ``ln c(t1,t2) − ln c(t1)`` when the bigram survived count pruning
    (``c ≥ min_bigram``), else the discounted unigram fallback
    ``ln 0.4 + ln c(t2) − ln N`` → ``(doc_id, n_pairs, n_backoff,
    logprob_u, mean_logprob)``.  Unlike :func:`bigram_logprob` (pure
    MLE, every in-corpus pair is "seen"), the pruned model actually
    exercises the backoff path — singleton bigrams, the bulk of the
    Zipf tail, score by their unigram evidence instead of a memorized
    count of 1.

    Same int64 micro-nat exactness as the rest of the module (every
    term is a ``floor(ln(·)·1e6)`` integer, including the ln 0.4
    discount, so document sums are order-free).  Broadcast strategy:
    the PRUNED bigram table (≥ min_bigram, a small fraction of the full
    pair vocabulary) and the unigram table ship via ``ray.put`` once
    and live in actor state; the open-vocabulary twin would reuse
    bigram_logprob's two bucket-merge exchanges with a COALESCE merge."""
    import math

    from .relational import word_count

    uni = word_count(ds, text_col=text_col)

    def bigram_count_partial(batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import string_buckets

        pair_codes, _, _, pair_dict, _ = _flat_bigrams(batch, text_col)
        if len(pair_codes) == 0:
            return pa.table({"cb": pa.array([], pa.int32()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        cnts = np.bincount(pair_codes, minlength=len(pair_dict))
        return pa.table(
            {"cb": pa.array(string_buckets(pair_dict, 64), pa.int32()),
             "term": pair_dict, "cnt": pa.array(cnts.astype(np.int64))}
        )

    def bigram_count_merge(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("term"))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("cnt").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        ).astype(np.int64)
        t = pa.table({"term": d.dictionary, "cnt": pa.array(cnt, pa.int64())})
        return t.filter(pa.array(cnt >= min_bigram))  # prune singletons

    bi = ds.map_batches(
        bigram_count_partial, batch_format="pyarrow"
    ).groupby("cb").map_groups(bigram_count_merge, batch_format="pyarrow")

    def collect(counts) -> pa.Table:
        parts = [b for b in counts.iter_batches(batch_format="pyarrow")]
        return (
            pa.concat_tables(parts)
            if parts
            else pa.table({"term": pa.array([], pa.string()),
                           "cnt": pa.array([], pa.int64())})
        )

    bi_ref = ray.put(collect(bi))
    uni_ref = ray.put(collect(uni))
    alpha_u = math.floor(math.log(0.4) * _SCALE)

    class Scorer:
        def __init__(self):
            def as_lp(tbl: pa.Table) -> dict:
                lp = _log_micronats(
                    tbl.column("cnt").to_numpy(
                        zero_copy_only=False).astype(np.int64))
                return dict(zip(tbl.column("term").to_pylist(),
                                lp.tolist()))

            bi_tbl = ray.get(bi_ref)
            uni_tbl = ray.get(uni_ref)
            self.bi = as_lp(bi_tbl)
            self.uni = as_lp(uni_tbl)
            total = int(uni_tbl.column("cnt").to_numpy(
                zero_copy_only=False).sum()) if uni_tbl.num_rows else 0
            self.n_lp = (math.floor(math.log(total) * _SCALE)
                         if total else 0)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            n = batch.num_rows
            flat, doc_idx = _flat_tokens(batch, text_col)
            zeros = np.zeros(n, np.int64)
            if len(flat) < 2:
                return _sbo_result(ids, zeros, zeros, zeros)
            d = _dict_encode(flat)
            codes = d.indices.to_numpy(zero_copy_only=False).astype(
                np.int64)
            same = doc_idx[1:] == doc_idx[:-1]
            if not same.any():
                return _sbo_result(ids, zeros, zeros, zeros)
            left = codes[:-1][same]
            right = codes[1:][same]
            dix = doc_idx[1:][same].astype(np.int64)
            ndict = len(d.dictionary)
            uk, pair_codes = np.unique(left * ndict + right,
                                       return_inverse=True)
            pair_dict = pc.binary_join_element_wise(
                d.dictionary.take(pa.array(uk // ndict)),
                d.dictionary.take(pa.array(uk % ndict)), " ")
            # one probe per DISTINCT bigram / token (vocab-bounded)
            bi_lp = np.array(
                [self.bi.get(t, _MISS) for t in pair_dict.to_pylist()],
                np.int64)[pair_codes]
            uni_lp_tok = np.array(
                [self.uni[t] for t in d.dictionary.to_pylist()], np.int64)
            seen = bi_lp != _MISS
            lp = np.where(
                seen,
                bi_lp - uni_lp_tok[left],
                alpha_u + uni_lp_tok[right] - self.n_lp,
            )
            n_pairs = np.bincount(dix, minlength=n).astype(np.int64)
            n_back = np.bincount(
                dix, weights=~seen, minlength=n).astype(np.int64)
            lp_sum = np.bincount(dix, weights=lp, minlength=n).astype(
                np.int64)
            return _sbo_result(ids, n_pairs, n_back, lp_sum)

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          concurrency=concurrency)


_MISS = np.iinfo(np.int64).min


def _sbo_result(ids, n_pairs, n_back, lp_u) -> pa.Table:
    n_pairs = np.asarray(n_pairs)
    lp_u = np.asarray(lp_u)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = lp_u.astype(np.float64) / n_pairs.astype(np.float64) / _SCALE
    return pa.table({
        "doc_id": ids,
        "n_pairs": pa.array(n_pairs.astype(np.int64), pa.int64()),
        "n_backoff": pa.array(np.asarray(n_back).astype(np.int64),
                              pa.int64()),
        "logprob_u": pa.array(lp_u.astype(np.int64), pa.int64()),
        "mean_logprob": pa.array(
            np.where(n_pairs > 0, mean, 0.0), pa.float64()),
    })
