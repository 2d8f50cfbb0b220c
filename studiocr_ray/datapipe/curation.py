"""Published web-corpus curation filters: C4 line rules and Gopher
document-quality rules.

Two of the most-cited curation operators in LLM-corpus construction that
the engine's signal family (``signals.repetition_stats``,
``text.quality_score``) did not yet expose as *filters*:

* **C4 line filter** (Raffel et al., "Exploring the Limits of Transfer
  Learning with a Unified Text-to-Text Transformer", 2020, §2.2): keep
  only lines that end in a terminal punctuation mark and have at least
  five words, drop lines mentioning javascript, and drop whole pages that
  are left with fewer than three lines or contain ``lorem ipsum`` / ``{``.
* **Gopher quality filter** (Rae et al., "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", 2021, §A1.1): keep
  documents whose word count, mean word length, symbol-to-word ratio,
  bullet/ellipsis line fractions, alphabetic-word fraction and stopword
  presence all fall inside the published bounds.

Both are stateless per-document ``map_batches`` transforms — no shuffle,
no cross-document state; a document never leaves its block, so the stages
stream at any corpus size.  All rule arithmetic is integer counts and one
final int/int double division per ratio, reproduced bit-exactly by the
DuckDB oracles in ``__ray_entry__``.

The reference's analogue is its non-space token filter and per-page
statistics (/root/reference/StudiOCR/OcrEngine.py:131,
/root/reference/StudiOCR/OcrPageData.py:31-33) — per-unit keep/drop
decisions from cheap text signals; these operators are that idea at the
line and document granularity the published web pipelines use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: Gopher §A1.1 uses the eight most common English function words; the
#: operator takes the set as a parameter so corpora with a different
#: function-word profile (or synthetic fixtures) can instantiate it.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _doc_lines(text: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Newline-split of each doc → (flat line array, int64 offsets)."""
    parts = pc.split_pattern(text, "\n")
    off = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return parts.values, off


def _per_doc_sum(mask: np.ndarray, off: np.ndarray) -> np.ndarray:
    cs = np.zeros(len(mask) + 1, np.int64)
    np.cumsum(mask, out=cs[1:])
    return cs[off[1:]] - cs[off[:-1]]


def c4_line_filter(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 3,
    line_drop_substr: str = "javascript",
    doc_drop_substrs: tuple[str, ...] = ("lorem ipsum", "{"),
) -> pa.Table:
    """C4 §2.2 line/page cleaning → ``(doc_id, text_clean, n_lines,
    n_lines_kept, keep_doc)``.

    A line survives iff it ends in terminal punctuation (``.!?"``), has at
    least ``min_words`` whitespace words, and does not mention
    ``line_drop_substr`` (case-insensitive).  ``text_clean`` is the
    surviving lines re-joined with newlines in original order.
    ``keep_doc`` additionally requires ≥ ``min_kept_lines`` surviving
    lines and no ``doc_drop_substrs`` hit (case-insensitive) anywhere in
    the raw page.

    Vectorized: one newline split, three Arrow kernels over the flat line
    array, one cumsum per doc-level count, one list rebuild + binary_join
    for the cleaned text — no per-row Python."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat, off = _doc_lines(text)
    terminal = pc.match_substring_regex(flat, r'[.!?"]$')
    long_enough = pc.greater_equal(
        pc.count_substring_regex(flat, r"\S+"), min_words
    )
    clean = pc.invert(
        pc.match_substring(pc.utf8_lower(flat), line_drop_substr)
    )
    keep = pc.and_(pc.and_(terminal, long_enough), clean)
    keep_np = keep.to_numpy(zero_copy_only=False)

    kept_per_doc = _per_doc_sum(keep_np, off)
    n_lines = off[1:] - off[:-1]
    new_off = np.zeros(len(off), np.int64)
    np.cumsum(kept_per_doc, out=new_off[1:])
    kept_lines = pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()), flat.filter(keep)
    )
    text_clean = pc.binary_join(kept_lines, "\n")

    lowered = pc.utf8_lower(text)
    doc_ok = pa.array(np.ones(batch.num_rows, bool))
    for s in doc_drop_substrs:
        doc_ok = pc.and_(doc_ok, pc.invert(pc.match_substring(lowered, s)))
    keep_doc = pc.and_(
        pa.array(kept_per_doc >= min_kept_lines), doc_ok
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "text_clean": text_clean,
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_lines_kept": pa.array(kept_per_doc, pa.int64()),
            "keep_doc": keep_doc,
        }
    )


def gopher_quality_filter(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = 2,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
) -> pa.Table:
    """Gopher §A1.1 document-quality rules → per-doc signal columns plus
    the combined ``keep`` verdict.

    Signals (all integer counts divided once into doubles, so the DuckDB
    oracle reproduces them bit-exactly): word count, mean word length,
    ``#``/``…`` symbol-to-word ratio, fraction of lines starting with a
    bullet (``- `` / ``• ``), fraction of lines ending in ``…``, fraction
    of words containing an ASCII letter, and the number of DISTINCT
    ``stopwords`` present.  ``keep`` ANDs the published bounds
    (parameterized with Gopher's defaults)."""
    n_docs = batch.num_rows
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    words = pc.utf8_split_whitespace(text)
    flat_w = words.values
    woff = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.greater(pc.utf8_length(flat_w), 0).to_numpy(
        zero_copy_only=False
    )
    n_words = _per_doc_sum(nonempty, woff)

    wlen = pc.utf8_length(flat_w).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    sum_len = _per_doc_sum(wlen * nonempty, woff)
    nw = n_words.astype(np.float64)
    mean_word_len = np.divide(
        sum_len, nw, out=np.zeros(n_docs, np.float64), where=nw > 0
    )

    n_sym = (
        pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
        + pc.count_substring(text, "…").to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    symbol_ratio = np.divide(
        n_sym, nw, out=np.zeros(n_docs, np.float64), where=nw > 0
    )

    alpha = pc.match_substring_regex(flat_w, "[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha_w = _per_doc_sum(alpha & nonempty, woff)
    alpha_frac = np.divide(
        n_alpha_w, nw, out=np.zeros(n_docs, np.float64), where=nw > 0
    )

    # distinct stopword hits: index_in against the (tiny) stopword list,
    # then one np.unique over (doc, code) composite keys
    sw = pa.array(list(stopwords), pa.string())
    idx = pc.index_in(flat_w, value_set=sw)
    valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    codes = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(
        np.arange(n_docs, dtype=np.int64), woff[1:] - woff[:-1]
    )
    K = len(stopwords)
    comp = doc_idx[valid] * K + codes[valid]
    n_stop_hits = np.zeros(n_docs, np.int64)
    if len(comp):
        u = np.unique(comp)
        np.add.at(n_stop_hits, u // K, 1)

    flat_l, loff = _doc_lines(text)
    n_lines = (loff[1:] - loff[:-1]).astype(np.float64)
    bullet = pc.or_(
        pc.starts_with(flat_l, "- "), pc.starts_with(flat_l, "• ")
    ).to_numpy(zero_copy_only=False)
    ellipsis = pc.ends_with(flat_l, "…").to_numpy(zero_copy_only=False)
    bullet_frac = np.divide(
        _per_doc_sum(bullet, loff), n_lines,
        out=np.zeros(n_docs, np.float64), where=n_lines > 0,
    )
    ellipsis_frac = np.divide(
        _per_doc_sum(ellipsis, loff), n_lines,
        out=np.zeros(n_docs, np.float64), where=n_lines > 0,
    )

    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop_hits >= min_stop_hits)
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
            "alpha_frac": pa.array(alpha_frac, pa.float64()),
            "bullet_frac": pa.array(bullet_frac, pa.float64()),
            "ellipsis_frac": pa.array(ellipsis_frac, pa.float64()),
            "n_stop_hits": pa.array(n_stop_hits, pa.int64()),
            "keep": pa.array(keep),
        }
    )
