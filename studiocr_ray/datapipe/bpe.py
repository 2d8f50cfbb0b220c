"""BPE tokenizer training + corpus encoding.

Byte-pair-encoding subword training (Sennrich et al. 2016, public method)
the way production tokenizer trainers actually run it at corpus scale:
the corpus is reduced ONCE to its word-frequency table (distributed,
vocabulary-bounded — ``relational.word_count``), and the merge loop runs
over that table on the driver (cost ∝ vocabulary, not corpus bytes; this
is the same shape HuggingFace tokenizers / SentencePiece use).  Encoding
is then a streaming ``map_batches`` with the learned merges broadcast —
each DISTINCT word in a batch is segmented once (dictionary encode), so
hot words cost one segmentation per batch, not one per occurrence.

Determinism: merge ties (equal pair frequency) break lexicographically on
the pair, so the merge list is a pure function of the corpus.

Scale notes: the driver-side table is the DISTINCT-word table (10-100M
rows on natural language after lowering); ``min_freq`` prunes the long
tail (hapaxes cannot win a merge against real pairs until very late and
dominate open vocabularies — urls, typos).  The merges list itself is
tiny (``num_merges`` rows) and broadcasts once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .relational import _dict_encode, _flat_tokens, word_count

_EOW = "</w>"


def _pair_counts(vocab: dict[tuple, int]) -> dict[tuple, int]:
    counts: dict[tuple, int] = {}
    for sym, freq in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    ds,
    num_merges: int = 200,
    text_col: str = "text",
    min_freq: int = 1,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges from the corpus → table
    ``(rank, left, right)`` in merge order.  Words are lowered whitespace
    tokens with an end-of-word marker; the highest-frequency adjacent
    symbol pair merges each round (lexicographic tie-break)."""
    wc = word_count(ds, text_col=text_col).to_pandas()
    if min_freq > 1:
        wc = wc[wc["cnt"] >= min_freq]
    vocab: dict[tuple, int] = {}
    for term, cnt in zip(wc["term"], wc["cnt"]):
        sym = tuple(term) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(cnt)
    ranks, lefts, rights = [], [], []
    for rank in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ranks.append(rank)
        lefts.append(best[0])
        rights.append(best[1])
        vocab = {
            _merge_word(sym, best): freq for sym, freq in vocab.items()
        }
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int32()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
        }
    )


def _segment(word: str, merge_rank: dict[tuple, int]) -> list[str]:
    """Greedy lowest-rank-first application of the learned merges to one
    word — the standard BPE encode."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = merge_rank.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class _BpeStats:
    """Actor-pool encoder: merges table resolved once per actor; per
    batch, each DISTINCT word segments once."""

    def __init__(self, merges_ref, text_col: str):
        import ray

        t = ray.get(merges_ref)
        self.rank = {
            (l, r): int(k)
            for k, l, r in zip(
                t.column("rank").to_pylist(),
                t.column("left").to_pylist(),
                t.column("right").to_pylist(),
            )
        }
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        flat, doc_idx = _flat_tokens(batch, self.text_col)
        if len(flat) == 0:
            zeros = np.zeros(n, np.int64)
            return pa.table(
                {"doc_id": ids,
                 "n_words": pa.array(zeros, pa.int64()),
                 "n_bpe_tokens": pa.array(zeros, pa.int64())}
            )
        d = _dict_encode(flat)
        per_word = np.fromiter(
            (len(_segment(w, self.rank)) for w in d.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(d.dictionary),
        )
        tok_per = per_word[d.indices.to_numpy(zero_copy_only=False)]
        n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
        n_bpe = np.bincount(doc_idx, weights=tok_per, minlength=n).astype(
            np.int64
        )
        return pa.table(
            {"doc_id": ids,
             "n_words": pa.array(n_words, pa.int64()),
             "n_bpe_tokens": pa.array(n_bpe, pa.int64())}
        )


def bpe_token_stats(
    ds, merges: pa.Table, text_col: str = "text", concurrency=(1, 8)
):
    """Per-document token counts under a learned BPE vocabulary →
    ``(doc_id, n_words, n_bpe_tokens)`` — the real-tokenizer upgrade of
    ``text.token_stats`` (training-budget accounting wants the count the
    actual tokenizer will produce, not the whitespace proxy)."""
    import ray

    mref = ray.put(merges)
    return ds.map_batches(
        _BpeStats,
        fn_constructor_kwargs={"merges_ref": mref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
