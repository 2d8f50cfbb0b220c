"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's per-page text statistics
(/root/reference/StudiOCR/OcrPageData.py — word counts, char histograms) to
the corpus-curation operations a 100 TB web pipeline needs: language ID,
quality scoring, token counting, fingerprinting.  All are stateless
``map_batches`` transforms over the ``documents``-shaped table
``(doc_id, text, lang, source, n_chars)``; none shuffles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Small per-language stopword profiles (public, high-frequency function words).
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and a to in is was he for it with as his on be at by had not are but from or have an they which one you were her all".split()
    ),
    "de": frozenset(
        "der die das und ist ein eine nicht mit von auf für wird sind werden im den dem des zu als auch nach bei um aus".split()
    ),
    "fr": frozenset(
        "le la les et est une un pas avec pour dans sur sont être plus que qui des du au aux ne se ce il elle".split()
    ),
    "es": frozenset(
        "el la los las y es un una no con para en sobre son ser más que de del al se lo le su por como".split()
    ),
}

STOPWORDS_EN = LANG_PROFILES["en"]

# A BPE-ish token pattern: word pieces, numbers, punctuation runs — the
# classic GPT-2-style pre-tokenizer shape, stdlib-re compatible.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc token statistics: whitespace tokens, distinct tokens,
    BPE-ish tokens, chars.  Whitespace tokenization matches Python
    ``str.split()`` (runs of ``\\S+``)."""
    text = batch.column(text_col)
    n_tokens = pc.count_substring_regex(text, r"\S+")
    n_bpe = pc.count_substring_regex(text, BPE_ISH_PATTERN)
    n_chars = pc.utf8_length(text)
    uniq = pa.array(
        [len(set(t.split())) for t in text.to_pylist()], pa.int64()
    )
    out = batch.select(["doc_id"]) if "doc_id" in batch.column_names else pa.table({})
    return pa.table(
        {
            **{c: out.column(c) for c in out.column_names},
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_unique_tokens": uniq,
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_chars": pc.cast(n_chars, pa.int64()),
        }
    )


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality signals: char-class counts and stopword hits.

    Integer counts only (ratios are left to the consumer) so the results are
    exactly reproducible by the DuckDB oracle."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
    n_punct = pc.cast(
        pc.count_substring_regex(text, r"[!-/:-@\[-`{-~]"), pa.int64()
    )
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_stop = pa.array(
        [sum(1 for w in t.lower().split() if w in STOPWORDS_EN) for t in text.to_pylist()],
        pa.int64(),
    )
    cols = {}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    cols.update(
        n_chars=n_chars, n_alpha=n_alpha, n_digit=n_digit, n_punct=n_punct,
        n_tokens=n_tokens, n_stopwords=n_stop,
    )
    return pa.table(cols)


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scalar quality score in [0,1] from the integer features.

    score = 0.5*alpha_ratio + 0.3*stop_ratio + 0.2*length_ok — a
    Gopher/C4-style heuristic blend; deterministic double arithmetic."""
    f = quality_features(batch, text_col)
    n_chars = f.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = f.column("n_alpha").to_numpy(zero_copy_only=False).astype(np.float64)
    n_tok = f.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    n_stop = f.column("n_stopwords").to_numpy(zero_copy_only=False).astype(np.float64)
    alpha_ratio = np.divide(n_alpha, n_chars, out=np.zeros_like(n_alpha), where=n_chars > 0)
    stop_ratio = np.divide(n_stop, n_tok, out=np.zeros_like(n_stop), where=n_tok > 0)
    length_ok = ((n_tok >= 10) & (n_tok <= 100_000)).astype(np.float64)
    score = 0.5 * alpha_ratio + 0.3 * np.minimum(stop_ratio * 3.0, 1.0) + 0.2 * length_ok
    cols = {}
    if "doc_id" in f.column_names:
        cols["doc_id"] = f.column("doc_id")
    cols["quality_score"] = pa.array(score, pa.float64())
    return pa.table(cols)


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """N-gram/stopword-heuristic language ID: the language whose function-word
    profile covers the largest fraction of the doc's tokens; 'und'
    (undetermined) when nothing matches.  Deterministic tie-break by
    language code."""
    preds = []
    for t in batch.column(text_col).to_pylist():
        toks = t.lower().split()
        if not toks:
            preds.append("und")
            continue
        scores = {
            lang: sum(1 for w in toks if w in prof)
            for lang, prof in LANG_PROFILES.items()
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        preds.append(best if scores[best] > 0 else "und")
    cols = {}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    cols["pred_lang"] = pa.array(preds, pa.string())
    return pa.table(cols)


def md5_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact content fingerprint: md5 hex digest (DuckDB ``md5()`` parity)."""
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    cols = {}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    cols["fingerprint"] = pa.array(fps, pa.string())
    return pa.table(cols)


def rolling_fingerprint(
    batch: pa.Table, text_col: str = "text", window: int = 8, keep: int = 4
) -> pa.Table:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    char ``window``-grams, keep the ``keep`` smallest hashes (hex-joined).
    Robust to local edits — two docs sharing most content share most of the
    fingerprint. (Schleimer et al., "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD 2003.)"""
    B, M = np.uint64(1000003), np.uint64(0xFFFFFFFFFFFFFFFF)
    fps = []
    for t in batch.column(text_col).to_pylist():
        data = t.encode("utf-8")
        if len(data) < window:
            h = hashlib.md5(data).hexdigest()[:16]
            fps.append(h)
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        n = len(arr) - window + 1
        # vectorized polynomial hash of each window
        hashes = np.zeros(n, dtype=np.uint64)
        for k in range(window):
            hashes = (hashes * B + arr[k : k + n]) & M
        smallest = np.sort(hashes)[:keep]
        fps.append("".join(f"{int(h):016x}" for h in smallest))
    cols = {}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    cols["fingerprint"] = pa.array(fps, pa.string())
    return pa.table(cols)


# Control characters to strip during normalization: C0 controls except
# tab/newline (which are whitespace, handled by the \s+ collapse) plus DEL.
_CTRL_PATTERN = r"[\x00-\x08\x0b-\x1f\x7f]"


def normalize_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text normalization (the C4-style cleanup pass): Unicode
    NFC, control characters stripped, whitespace runs collapsed to single
    spaces, ends trimmed.  DuckDB reproduces it bit-exact
    (``nfc_normalize`` + two ``regexp_replace`` + ``trim``).

    NFC is the one step Arrow can't do here: this pyarrow build's
    ``utf8_normalize`` leaves combining sequences UNcomposed (verified:
    NFC('e'+U+0301) keeps two codepoints), so rows are split by a
    vectorized ``string_is_ascii`` mask and only the non-ASCII minority
    (rare in web text) goes through ``unicodedata.normalize``; everything
    else — ctrl strip, whitespace collapse, trim — is Arrow kernels over
    the whole column.

    Run AFTER line-granular ops (``datapipe/lines.py``) — the whitespace
    collapse erases newline structure by design (one doc, one line).
    Returns all columns with ``text_col`` replaced and ``n_chars_norm``
    appended."""
    import unicodedata

    import numpy as np
    import pyarrow.compute as pc

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    non_ascii = np.flatnonzero(
        pc.invert(pc.string_is_ascii(text)).to_numpy(zero_copy_only=False)
    )
    t = text
    if non_ascii.size:
        sub = pc.take(text, pa.array(non_ascii)).to_pylist()
        norm = [unicodedata.normalize("NFC", s) for s in sub]
        if norm != sub:  # rebuild only when NFC actually changed something
            vals = text.to_numpy(zero_copy_only=False)
            vals[non_ascii] = norm
            t = pa.array(vals, pa.string())
    t = pc.replace_substring_regex(t, _CTRL_PATTERN, "")
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    out = batch.set_column(batch.column_names.index(text_col), text_col, t)
    return out.append_column(
        "n_chars_norm", pc.cast(pc.utf8_length(t), pa.int64())
    )


def compression_stats(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> pa.Table:
    """Per-document zlib compression ratio → ``(doc_id, n_bytes,
    n_compressed, compression_ratio)`` — the classic repetition /
    boilerplate / gibberish signal (highly repetitive text compresses far
    below natural language; random noise barely compresses).  Used as a
    drop filter alongside the Gopher repetition rules.

    Per-row ``zlib.compress`` is one C call per document (the bytes must
    be scanned in full by definition of the signal); the utf-8 bytes come
    straight off the Arrow value buffer via memoryview slices — no
    intermediate str/bytes objects.  Deterministic (zlib level fixed), so
    exact per-row parity is pytest-asserted; no SQL oracle (DuckDB has no
    deflate)."""
    import zlib

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    if n == 0 or text.null_count:
        if text.null_count:
            raise ValueError("compression_stats requires non-null text")
    if n == 0:
        return pa.table(
            {"doc_id": batch.column(id_col),
             "n_bytes": pa.array([], pa.int64()),
             "n_compressed": pa.array([], pa.int64()),
             "compression_ratio": pa.array([], pa.float64())}
        )
    width = np.int64 if pa.types.is_large_string(text.type) else np.int32
    off = np.frombuffer(text.buffers()[1], width, count=text.offset + n + 1)
    o = text.offset
    mv = memoryview(text.buffers()[2])
    comp = zlib.compress
    nb = (off[o + 1:o + n + 1] - off[o:o + n]).astype(np.int64)
    nc = np.fromiter(
        (len(comp(mv[off[o + i]:off[o + i + 1]], level)) for i in range(n)),
        dtype=np.int64,
        count=n,
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = nc.astype(np.float64) / nb.astype(np.float64)
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "n_bytes": pa.array(nb, pa.int64()),
            "n_compressed": pa.array(nc, pa.int64()),
            "compression_ratio": pa.array(
                np.where(nb > 0, ratio, 0.0), pa.float64()
            ),
        }
    )


def readability_scores(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Flesch-reading-ease-style readability per document →
    ``(doc_id, n_sentences, n_words, n_syllable_groups, flesch)``.

    The classic formula (Flesch 1948, public domain) over cheap proxies:
    sentences = maximal ``[.!?]+`` runs (min 1), words = whitespace
    tokens (min 1), syllables = maximal ``[aeiouy]+`` runs in the lowered
    text (the standard vowel-group approximation; min 1).  All three are
    single Arrow regex-count kernels — no per-row Python — and the float
    score is one fixed expression over the integer counts, so an oracle
    computing the same expression matches bit-for-bit."""
    import pyarrow.compute as pc

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    low = pc.utf8_lower(text)
    sent = pc.max_element_wise(
        pc.count_substring_regex(text, r"[.!?]+"), 1
    ).cast(pa.int64())
    words = pc.max_element_wise(
        pc.count_substring_regex(text, r"\S+"), 1
    ).cast(pa.int64())
    syl = pc.max_element_wise(
        pc.count_substring_regex(low, r"[aeiouy]+"), 1
    ).cast(pa.int64())
    w = words.to_numpy(zero_copy_only=False).astype(np.float64)
    s = sent.to_numpy(zero_copy_only=False).astype(np.float64)
    y = syl.to_numpy(zero_copy_only=False).astype(np.float64)
    flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "n_sentences": sent,
            "n_words": words,
            "n_syllable_groups": syl,
            "flesch": pa.array(flesch, pa.float64()),
        }
    )


def sentence_stats(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Per-document sentence segmentation statistics →
    ``(doc_id, n_sentences, sum_sentence_chars, mean_sentence_len_u,
    max_sentence_len)``.

    Sentences are the ``[.!?]+``-delimited segments whose ``\\ \\t\\n\\r``
    -trimmed form is non-empty; lengths are unicode character counts of
    the trimmed segment.  The mean ships as the fixed-point integer
    ``sum*10^6 // n`` (0 when a doc has no sentence) so a SQL oracle
    matches bit-for-bit.  The segmentation is one Arrow
    ``split_pattern_regex`` + trim + length over the FLATTENED list (no
    per-row Python); per-doc aggregation is ``np.add.reduceat`` /
    ``np.maximum.reduceat`` over the list offsets.  Extends the
    reference's per-page text stats (StudiOCR/OcrPageData.py) to
    sentence granularity."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    parts = pc.split_pattern_regex(text, pattern=r"[.!?]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lens = pc.list_value_length(parts).fill_null(0) \
        .to_numpy(zero_copy_only=False)
    flat = parts.flatten()
    trimmed = pc.utf8_trim(flat, characters=" \t\n\r")
    seg_len = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nonempty = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(batch.num_rows), lens)
    n_docs = batch.num_rows
    n_sent = np.bincount(doc_of[nonempty], minlength=n_docs) \
        .astype(np.int64)
    sum_chars = np.bincount(doc_of[nonempty],
                            weights=seg_len[nonempty],
                            minlength=n_docs).astype(np.int64)
    max_len = np.zeros(n_docs, np.int64)
    if nonempty.any():
        np.maximum.at(max_len, doc_of[nonempty], seg_len[nonempty])
    mean_u = np.where(n_sent > 0,
                      sum_chars * np.int64(1_000_000)
                      // np.maximum(n_sent, 1),
                      0).astype(np.int64)
    return pa.table({
        "doc_id": batch.column(id_col),
        "n_sentences": pa.array(n_sent, pa.int64()),
        "sum_sentence_chars": pa.array(sum_chars, pa.int64()),
        "mean_sentence_len_u": pa.array(mean_u, pa.int64()),
        "max_sentence_len": pa.array(max_len, pa.int64()),
    })


def char_entropy(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Per-document Shannon character entropy as an exact scaled integer →
    ``(doc_id, n_chars, ent_u, entropy)`` where

        ent_u = Σ_chars k · (floor(ln(L)·10⁶) − floor(ln(k)·10⁶))

    (k = count of the character in the doc, L = doc codepoint length) and
    ``entropy = ent_u / L / 10⁶`` ≈ H in nats.  The floor-scaled-log
    quantization is the repo's standard bit-exactness trick
    (cf. unigram LM scoring in lm.py): every term is an int64, so the
    result is independent of summation order and a SQL oracle reproduces
    it exactly.  Low entropy flags template/repetition pages; a classic
    cheap quality signal (e.g. Rae et al., Gopher, arXiv:2112.11446 §A1.1
    uses character-level repetition cousins).

    Shuffle-free and fully vectorized: the batch's characters are read
    straight from the Arrow data buffer (ONE utf-8 decode + utf-32
    re-encode for the whole batch — no per-row Python), per-(doc, char)
    counts come from one ``np.unique`` over ``doc_idx·2²¹ + codepoint``
    composite keys (codepoints < 0x110000 < 2²¹), and the per-doc fold is
    ``np.add.at``.  No counterpart in the reference (its char stats are
    per-page Counters, /root/reference/StudiOCR/OcrPageData.py:43)."""
    arr = batch.column(text_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = batch.num_rows
    lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    obuf = arr.buffers()[1]
    offs = (np.frombuffer(obuf, dtype=width)
            [arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
            if obuf is not None else np.zeros(1, np.int64))
    raw = arr.buffers()[2]
    s = (raw[int(offs[0]):int(offs[-1])].to_pybytes().decode("utf-8")
         if raw is not None and len(offs) > 1 else "")
    cp = np.frombuffer(s.encode("utf-32-le"), np.uint32).astype(np.int64)
    ent_u = np.zeros(n, np.int64)
    if len(cp):
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        uk, cnts = np.unique(doc_idx * (np.int64(1) << 21) + cp,
                             return_counts=True)
        kdoc = (uk >> 21).astype(np.int64)
        cnts = cnts.astype(np.int64)

        def flog(x: np.ndarray) -> np.ndarray:
            return np.floor(np.log(x.astype(np.float64)) * 1e6) \
                .astype(np.int64)

        np.add.at(ent_u, kdoc, cnts * (flog(lens[kdoc]) - flog(cnts)))
    entropy = np.where(lens > 0,
                       ent_u.astype(np.float64) / np.maximum(lens, 1)
                       / 1e6, 0.0)
    return pa.table({
        "doc_id": batch.column(id_col),
        "n_chars": pa.array(lens, pa.int64()),
        "ent_u": pa.array(ent_u, pa.int64()),
        "entropy": pa.array(entropy, pa.float64()),
    })


def concordance(batch: pa.Table, term: str = "table", width: int = 3,
                id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """KWIC (keyword-in-context) windows: one row per occurrence of
    ``term`` (lowered whole-token match) → ``(doc_id, pos, before,
    after)`` with the ±``width`` surrounding tokens joined by spaces,
    clipped at document bounds — the corpus-QA concordance view.

    Shuffle-free and fully vectorized: the batch tokenizes once
    (relational._flat_tokens), match positions fall out of one
    ``pc.equal`` mask, and both context windows are gathered with a
    single take over the flat token array (ListArray offsets + one
    ``pc.binary_join`` per side).  No Python loop touches a token."""
    from .relational import _flat_tokens

    empty = pa.table(
        {
            "doc_id": pa.array([], batch.column(id_col).type),
            "pos": pa.array([], pa.int64()),
            "before": pa.array([], pa.string()),
            "after": pa.array([], pa.string()),
        }
    )
    flat, doc_idx = _flat_tokens(batch, text_col)
    n = len(flat)
    if n == 0:
        return empty
    is_start = np.ones(n, bool)
    is_start[1:] = doc_idx[1:] != doc_idx[:-1]
    starts_idx = np.flatnonzero(is_start)
    run_len = np.diff(np.concatenate((starts_idx, [n])))
    doc_start = np.repeat(starts_idx, run_len)
    doc_len = np.repeat(run_len, run_len)
    pos = np.arange(n, dtype=np.int64) - doc_start
    midx = np.flatnonzero(
        pc.equal(flat, term.lower()).to_numpy(zero_copy_only=False)
    )
    if len(midx) == 0:
        return empty

    def side(lo: np.ndarray, hi: np.ndarray) -> pa.Array:
        """space-joined tokens[lo:hi) per match, one gather + one join."""
        cnt = hi - lo
        offs = np.concatenate(([0], np.cumsum(cnt))).astype(np.int64)
        take = (np.arange(int(offs[-1]), dtype=np.int64)
                - np.repeat(offs[:-1], cnt) + np.repeat(lo, cnt))
        lst = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()).cast(pa.int32()),
            flat.take(pa.array(take)),
        )
        return pc.binary_join(lst, " ")

    lo_b = np.maximum(midx - width, doc_start[midx])
    before = side(lo_b, midx)
    hi_a = np.minimum(midx + 1 + width, doc_start[midx] + doc_len[midx])
    after = side(midx + 1, hi_a)
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            "doc_id": ids.take(pa.array(doc_idx[midx])),
            "pos": pa.array(pos[midx], pa.int64()),
            "before": before,
            "after": after,
        }
    )


def trigram_profile(ds, k: int = 10, text_col: str = "text",
                    lang_col: str = "lang"):
    """Per-language character-trigram profile: the k most frequent
    3-character windows of each language's corpus → ``(lang, tri, n)``
    (ties broken trigram-ascending) — the classic n-gram language-ID
    training table (the profile :func:`lang_id`'s stopword heuristic
    stands in for; extends the reference's per-page char histogram,
    /root/reference/StudiOCR/OcrPageData.py, from unigrams to trigrams).

    Scale shape: each batch emits a ``(lang, tri, n)`` partial bounded
    by its own distinct-trigram count (≤ rows·chars but in practice
    ≪ the 2²⁴ byte-trigram space), then ONE vocabulary-bounded
    ``groupby(lang, tri)`` sum and a driver top-k over the aggregate
    (the :func:`~.relational.topk_terms` discipline — the aggregate is
    profile-sized, not corpus-sized).

    Vectorized path: ASCII rows (the overwhelming web-text majority —
    checked per row with ``pc.string_is_ascii``) count BYTE windows via
    one ``np.unique`` over packed uint32 codes, zero per-row Python;
    non-ASCII rows fall back to per-row codepoint windows so the result
    is always CHARACTER trigrams (the :func:`normalize_text` minority-
    fallback discipline, keeping parity with SQL ``substr`` semantics).
    """
    from ray.data.aggregate import Sum

    empty = pa.table({lang_col: pa.array([], pa.string()),
                      "tri": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lang = batch.column(lang_col)
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        ld = lang.dictionary_encode()
        lcodes = ld.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ldict = ld.dictionary

        is_ascii = pc.string_is_ascii(text).to_numpy(zero_copy_only=False)
        keys_parts, cnts_parts = [], []

        a_idx = np.flatnonzero(is_ascii)
        if a_idx.size:
            a = text.take(pa.array(a_idx))  # compacted → offset-0 buffers
            bufs = a.buffers()
            offs = np.frombuffer(bufs[1], np.int32)[
                a.offset:a.offset + len(a) + 1].astype(np.int64)
            data = np.frombuffer(bufs[2], np.uint8)[offs[0]:offs[-1]]
            offs = offs - offs[0]
            lens = offs[1:] - offs[:-1]
            m = np.maximum(lens - 2, 0)
            total = int(m.sum())
            if total:
                rep = np.repeat(np.arange(a_idx.size), m)
                base = np.repeat(offs[:-1], m)
                krow = np.arange(total) - np.repeat(np.cumsum(m) - m, m)
                p = base + krow
                tri = (data[p].astype(np.int64) << 16) \
                    | (data[p + 1].astype(np.int64) << 8) \
                    | data[p + 2].astype(np.int64)
                key = lcodes[a_idx][rep] * (1 << 24) + tri
                kk, cc = np.unique(key, return_counts=True)
                keys_parts.append(kk)
                cnts_parts.append(cc)

        # rare non-ASCII minority: per-row codepoint windows (character
        # semantics — byte windows would split multibyte sequences)
        na_idx = np.flatnonzero(~is_ascii)
        na_rows: dict[tuple[int, str], int] = {}
        if na_idx.size:
            subs = text.take(pa.array(na_idx)).to_pylist()
            for lc, s in zip(lcodes[na_idx], subs):
                for i in range(len(s) - 2):
                    kq = (int(lc), s[i:i + 3])
                    na_rows[kq] = na_rows.get(kq, 0) + 1

        if not keys_parts and not na_rows:
            return empty

        out_lang, out_tri, out_n = [], [], []
        if keys_parts:
            kk = np.concatenate(keys_parts)
            cc = np.concatenate(cnts_parts)
            lrows = (kk >> 24).astype(np.int64)
            tcodes = kk & ((1 << 24) - 1)
            m3 = np.empty((len(tcodes), 3), np.uint8)
            m3[:, 0] = tcodes >> 16
            m3[:, 1] = (tcodes >> 8) & 255
            m3[:, 2] = tcodes & 255
            tri_arr = pa.Array.from_buffers(
                pa.binary(3), len(tcodes), [None, pa.py_buffer(m3.tobytes())]
            ).cast(pa.string())
            out_lang.append(ldict.take(pa.array(lrows)))
            out_tri.append(tri_arr)
            out_n.append(pa.array(cc.astype(np.int64), pa.int64()))
        if na_rows:
            ks = sorted(na_rows)
            out_lang.append(ldict.take(pa.array([kq[0] for kq in ks])))
            out_tri.append(pa.array([kq[1] for kq in ks], pa.string()))
            out_n.append(pa.array([na_rows[kq] for kq in ks], pa.int64()))
        return pa.table({
            lang_col: pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in out_lang]),
            "tri": pa.concat_arrays(out_tri),
            "n": pa.concat_arrays(out_n),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([lang_col, "tri"])
        .aggregate(Sum("n", alias_name="n"))
    )
    t = agg.to_pandas()
    t = t.sort_values([lang_col, "n", "tri"],
                      ascending=[True, False, True], kind="mergesort")
    t = t.groupby(lang_col, sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(t[[lang_col, "tri", "n"]])


def lang_confusion(ds, text_col: str = "text", lang_col: str = "lang"):
    """Language-ID confusion matrix: declared ``lang`` × predicted
    :func:`lang_id` label, counted → ``(lang, pred_lang, n)`` — the
    classifier-audit crosstab that says where the heuristic disagrees
    with the metadata (mislabeled sources surface as off-diagonal mass).

    Shape: per-batch ``(lang, pred, n)`` partials (prediction + one
    composite-code ``np.unique``), then a langs²-bounded keyed sum —
    the :func:`~.relational.chi_square_table` counting shape with a
    model in the loop."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        pred = lang_id(batch, text_col).column("pred_lang")
        if isinstance(pred, pa.ChunkedArray):
            pred = pred.combine_chunks()
        true = batch.column(lang_col)
        if isinstance(true, pa.ChunkedArray):
            true = true.combine_chunks()
        td = true.dictionary_encode()
        pd_ = pred.dictionary_encode()
        ti = td.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pi = pd_.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kk = len(pd_.dictionary)
        vals, cnts = np.unique(ti * kk + pi, return_counts=True)
        return pa.table({
            lang_col: td.dictionary.take(pa.array(vals // kk)),
            "pred_lang": pd_.dictionary.take(pa.array(vals % kk)),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([lang_col, "pred_lang"])
        .aggregate(Sum("n", alias_name="n"))
    )


def source_scorecard(ds, text_col: str = "text",
                     source_col: str = "source"):
    """Per-source corpus scorecard: document count, total/mean length
    and mean quality score → ``(source, n_docs, n_chars, mean_chars,
    mean_quality)`` — the one-page "which feeds are worth crawling"
    rollup composing :func:`quality_score` with the per-source partial
    discipline.

    Exactness: per-doc quality scores quantize to ``floor(q·1e6)``
    integers BEFORE summing (float Σ would be order-sensitive across
    batch splits); per-batch partials are ``(source, n, Σchars, Σq_u)``
    int64 rows, one source-keyed sum, two pinned double divisions on
    the tiny final table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        sd = src.dictionary_encode()
        si = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(sd.dictionary)
        q = quality_score(batch, text_col).column(
            "quality_score").to_numpy(zero_copy_only=False)
        q_u = np.floor(q * 1e6).astype(np.int64)
        chars = pc.utf8_length(batch.column(text_col)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            source_col: sd.dictionary,
            "n_docs": pa.array(np.bincount(si, minlength=k).astype(
                np.int64), pa.int64()),
            "n_chars": pa.array(np.bincount(
                si, weights=chars, minlength=k).astype(np.int64),
                pa.int64()),
            "q_u": pa.array(np.bincount(
                si, weights=q_u, minlength=k).astype(np.int64),
                pa.int64()),
        })

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(source_col)
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_chars", alias_name="n_chars"),
                   Sum("q_u", alias_name="q_u"))
    ).to_pandas().sort_values(source_col).reset_index(drop=True)
    n = g["n_docs"].to_numpy().astype(np.float64)
    return pa.table({
        source_col: pa.array(g[source_col], pa.string()),
        "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
        "n_chars": pa.array(g["n_chars"].to_numpy(), pa.int64()),
        "mean_chars": pa.array(
            g["n_chars"].to_numpy().astype(np.float64) / n, pa.float64()),
        "mean_quality": pa.array(
            g["q_u"].to_numpy().astype(np.float64) / n / np.float64(1e6),
            pa.float64()),
    })


def hapax_stats(ds, text_col: str = "text", source_col: str = "source",
                num_buckets: int = 64):
    """Corpus-hapax attribution per source → ``(source, n_hapax,
    n_distinct_terms, n_tokens, hapax_share)``: how many of the CORPUS's
    hapax legomena (terms whose total corpus frequency is exactly 1)
    each source contributes, against the source's own distinct-term and
    token totals.  A source whose hapax share spikes is emitting noise
    (OCR garbage, random ids); one whose share collapses is template
    spam — the classic Zipf-tail curation screen
    (complements ``zipf_stats`` / ``vocab_growth``).

    Scale shape: per-batch ``(term, source, tf)`` partials (one
    composite np.unique per batch) bucket by a term hash, so a term's
    WHOLE corpus history lands in one bucket — hapax verdicts are local
    to the bucket scan (one string sort + run reduceat, no per-term
    Python).  Bucket outputs are ≤ |sources| rows each; the final
    groupby is |sources| rows.  Raw tokens never shuffle — only
    distinct (term, source) cells."""
    from ray.data.aggregate import Sum

    from ..functions.arrowutil import string_buckets
    from .relational import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if len(flat) == 0:
            return pa.table({
                "tb": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64())})
        td = flat.dictionary_encode()
        sd = src.dictionary_encode()
        tcodes = td.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        scodes = sd.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[doc_idx]
        nterm = len(td.dictionary)
        key = scodes * nterm + tcodes
        uniq, counts = np.unique(key, return_counts=True)
        terms = td.dictionary.take(pa.array(uniq % nterm))
        return pa.table({
            "tb": pa.array(string_buckets(terms, num_buckets),
                           pa.int32()),
            "term": terms,
            "source": sd.dictionary.take(pa.array(uniq // nterm)),
            "tf": pa.array(counts.astype(np.int64), pa.int64())})

    def bucket_scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "hapax_part": pa.array([], pa.int64()),
                "distinct_part": pa.array([], pa.int64()),
                "tok_part": pa.array([], pa.int64())})
        t = group.sort_by([("term", "ascending"),
                           ("source", "ascending")])
        terms = t.column("term")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        from ..functions.arrowutil import first_of_run_mask

        new_term = first_of_run_mask([terms])
        starts = np.flatnonzero(new_term)
        totals = np.add.reduceat(tf, starts)
        run_len = np.diff(np.append(starts, len(tf)))
        # a corpus-hapax term has total tf 1 ⇒ exactly one partial row
        hapax_rows = starts[(totals == 1) & (run_len == 1)]
        sd = src.dictionary_encode()
        scodes = sd.indices.to_numpy(zero_copy_only=False)
        ns = len(sd.dictionary)
        hapax = np.bincount(scodes[hapax_rows],
                            minlength=ns).astype(np.int64)
        # distinct (source, term) cells: collapse same-pair rows from
        # different batches
        new_pair = first_of_run_mask([terms, src])
        distinct = np.bincount(scodes[new_pair],
                               minlength=ns).astype(np.int64)
        toks = np.zeros(ns, np.int64)
        np.add.at(toks, scodes, tf)
        return pa.table({
            "source": sd.dictionary,
            "hapax_part": pa.array(hapax, pa.int64()),
            "distinct_part": pa.array(distinct, pa.int64()),
            "tok_part": pa.array(toks, pa.int64())})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(bucket_scan, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("hapax_part", alias_name="n_hapax"),
                   Sum("distinct_part", alias_name="n_distinct_terms"),
                   Sum("tok_part", alias_name="n_tokens"))
        .to_pandas()  # |sources| rows
    ).sort_values("source").reset_index(drop=True)
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n_hapax": pa.array(out["n_hapax"].astype(np.int64),
                            pa.int64()),
        "n_distinct_terms": pa.array(
            out["n_distinct_terms"].astype(np.int64), pa.int64()),
        "n_tokens": pa.array(out["n_tokens"].astype(np.int64),
                             pa.int64()),
        "hapax_share": pa.array(
            out["n_hapax"].astype(np.float64).to_numpy()
            / out["n_distinct_terms"].astype(np.float64).to_numpy(),
            pa.float64()),
    })


def simpson_diversity(ds, text_col: str = "text",
                      source_col: str = "source",
                      num_buckets: int = 64):
    """Per-source Simpson token-concentration index → ``(source,
    n_tokens, repeat_pairs, simpson, inv_simpson)``: the probability two
    random tokens drawn from the source (without replacement) are the
    SAME type, ``λ = Σ_t c_t(c_t−1) / (N(N−1))``, plus the effective
    vocabulary size ``1/λ``.  The evenness complement of
    :func:`hapax_stats`' richness screen — template spam drives λ up,
    random noise drives it to ~1/V — and log-free, so unlike Shannon
    entropy it is exactly reproducible in SQL.

    Scale shape: the :func:`hapax_stats` layout — per-batch
    ``(term, source, tf)`` cells bucket by term hash so a (term, source)
    pair's partials meet in one bucket scan (sort + reduceat); the
    pair-count contribution ``Σ c(c−1)`` leaves each bucket split hi/lo
    at 2³² (c ~ 10⁹ for a stopword at 100 TB squares past int64).
    Final groupby is |sources| rows; only distinct cells ever shuffle."""
    from ray.data.aggregate import Sum

    from ..functions.arrowutil import first_of_run_mask, string_buckets
    from .relational import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if len(flat) == 0:
            return pa.table({
                "tb": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64())})
        td = flat.dictionary_encode()
        sd = src.dictionary_encode()
        tcodes = td.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        scodes = sd.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[doc_idx]
        nterm = len(td.dictionary)
        key = scodes * nterm + tcodes
        uniq, counts = np.unique(key, return_counts=True)
        terms = td.dictionary.take(pa.array(uniq % nterm))
        return pa.table({
            "tb": pa.array(string_buckets(terms, num_buckets),
                           pa.int32()),
            "term": terms,
            "source": sd.dictionary.take(pa.array(uniq // nterm)),
            "tf": pa.array(counts.astype(np.int64), pa.int64())})

    def bucket_scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "tok_part": pa.array([], pa.int64()),
                "rp_hi": pa.array([], pa.int64()),
                "rp_lo": pa.array([], pa.int64())})
        t = group.sort_by([("term", "ascending"),
                           ("source", "ascending")])
        terms = t.column("term")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        new_pair = first_of_run_mask([terms, src])
        starts = np.flatnonzero(new_pair)
        c = np.add.reduceat(tf, starts)  # cell totals across batches
        rp = c * (c - 1)
        sd = src.dictionary_encode()
        scodes = sd.indices.to_numpy(zero_copy_only=False)
        ns = len(sd.dictionary)
        toks = np.zeros(ns, np.int64)
        np.add.at(toks, scodes, tf)
        rps = np.zeros(ns, np.int64)
        np.add.at(rps, scodes[starts], rp)
        return pa.table({
            "source": sd.dictionary,
            "tok_part": pa.array(toks, pa.int64()),
            "rp_hi": pa.array(rps >> 32, pa.int64()),
            "rp_lo": pa.array(rps & 0xFFFFFFFF, pa.int64())})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(bucket_scan, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("tok_part", alias_name="n_tokens"),
                   Sum("rp_hi", alias_name="rp_hi"),
                   Sum("rp_lo", alias_name="rp_lo"))
        .to_pandas()  # |sources| rows
    ).sort_values("source").reset_index(drop=True)
    srcs, ntoks, rps, simps, invs = [], [], [], [], []
    for i in range(len(out)):
        n = int(out["n_tokens"][i])
        rp = (int(out["rp_hi"][i]) << 32) + int(out["rp_lo"][i])
        # same expression tree as the SQL oracle
        lam = (float(rp) / float(n * (n - 1))) if n > 1 else 0.0
        srcs.append(out["source"][i])
        ntoks.append(n)
        rps.append(rp)
        simps.append(lam)
        invs.append(1.0 / lam if lam > 0.0 else 0.0)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_tokens": pa.array(ntoks, pa.int64()),
        "repeat_pairs": pa.array(rps, pa.int64()),
        "simpson": pa.array(simps, pa.float64()),
        "inv_simpson": pa.array(invs, pa.float64()),
    })


def length_emd(ds, value_col: str = "n_chars",
               source_col: str = "source"):
    """Per-source distribution drift as the exact 1-D Wasserstein-1
    (earth-mover) distance between the source's ``value_col``
    distribution and the WHOLE corpus's → ``(source, n_docs, emd)``.
    The magnitude complement of the sup-norm KS screen (`ks_values`):
    W₁ says HOW MUCH length mass a source would have to move to look
    like the corpus — the drift number a mixing policy can threshold.

    Everything is integer-exact until one final division:
    ``W₁ = Σ_i |cumS_i·N − cumG_i·n_s| · (v_{i+1} − v_i)  / (n_s·N)``
    over the merged distinct values v — the numerator sums exact Python
    ints driver-side (no float addition order anywhere), and the SQL
    oracle computes the identical HUGEINT sum.  Scale shape: one
    bounded ``(source, value)`` cell groupby (distinct lengths ×
    sources, NOT rows); the driver scan is over cells only."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sd = src.dictionary_encode()
        scodes = sd.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        key = scodes * (1 << 40) + v  # lengths < 2^40 by contract
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "source": sd.dictionary.take(pa.array(uniq >> 40)),
            "v": pa.array(uniq & ((1 << 40) - 1), pa.int64()),
            "c_part": pa.array(cnt.astype(np.int64), pa.int64())})

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("c_part", alias_name="c"))
        .to_pandas()  # |sources| × |distinct values| cells
    )
    vals = np.sort(cells["v"].unique())
    gaps = np.diff(vals)
    n_total = int(cells["c"].sum())
    cum_g = np.zeros(len(vals), dtype=object)
    g_of = {int(v): i for i, v in enumerate(vals)}
    gcounts = np.zeros(len(vals), np.int64)
    for v, c in cells.groupby("v")["c"].sum().items():
        gcounts[g_of[int(v)]] = int(c)
    acc = 0
    for i in range(len(vals)):
        acc += int(gcounts[i])
        cum_g[i] = acc
    out = {"source": [], "n_docs": [], "emd": []}
    for s, sub in cells.groupby("source"):
        scounts = np.zeros(len(vals), np.int64)
        for v, c in zip(sub["v"], sub["c"]):
            scounts[g_of[int(v)]] = int(c)
        n_s = int(scounts.sum())
        num = 0
        cum_s = 0
        cg = 0
        for i in range(len(vals) - 1):
            cum_s += int(scounts[i])
            cg = int(cum_g[i])
            num += abs(cum_s * n_total - cg * n_s) * int(gaps[i])
        emd = (float(num) / float(n_s) / float(n_total)) \
            if n_s and n_total else 0.0
        out["source"].append(s)
        out["n_docs"].append(n_s)
        out["emd"].append(emd)
    order = np.argsort(np.asarray(out["source"], dtype=object))
    return pa.table({
        "source": pa.array([out["source"][i] for i in order],
                           pa.string()),
        "n_docs": pa.array([out["n_docs"][i] for i in order],
                           pa.int64()),
        "emd": pa.array([out["emd"][i] for i in order], pa.float64()),
    })


def vocab_overlap(ds, text_col: str = "text",
                  source_col: str = "source",
                  num_buckets: int = 64):
    """Pairwise source VOCABULARY similarity → ``(source_a, source_b,
    n_common_terms, n_union_terms, jaccard)`` for every unordered source
    pair: the Jaccard of the two sources' distinct-term sets — sources
    sharing template/domain vocabulary cluster together before any
    embedding exists (the cheap source-similarity matrix next to
    `dup_source_matrix`'s doc-level one).

    Scale shape: a term's source set folds to ONE uint64 bitmask inside
    its term-hash bucket (≤ 64 sources by contract — raise, don't
    truncate), and the bucket emits a |S|×|S| integer co-occurrence
    matrix (tiny) built by one vectorized outer-AND over the masks —
    terms never leave their bucket and the final groupby sums
    |S|² cells.  All counts exact ints; jaccard is one double division
    mirroring the oracle."""
    from ray.data.aggregate import Sum

    from ..functions.arrowutil import string_buckets
    from .relational import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if len(flat) == 0:
            return pa.table({
                "tb": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "source": pa.array([], pa.string())})
        td = flat.dictionary_encode()
        sd = src.dictionary_encode()
        tcodes = td.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        scodes = sd.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[doc_idx]
        key = np.unique(scodes * len(td.dictionary) + tcodes)
        terms = td.dictionary.take(pa.array(key % len(td.dictionary)))
        return pa.table({
            "tb": pa.array(string_buckets(terms, num_buckets),
                           pa.int32()),
            "term": terms,
            "source": sd.dictionary.take(
                pa.array(key // len(td.dictionary)))})

    def bucket_matrix(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "sa": pa.array([], pa.string()),
                "sb": pa.array([], pa.string()),
                "common_part": pa.array([], pa.int64())})
        td = group.column("term")
        if isinstance(td, pa.ChunkedArray):
            td = td.combine_chunks()
        sd = group.column("source")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        tdd = td.dictionary_encode()
        sdd = sd.dictionary_encode()
        ns = len(sdd.dictionary)
        if ns > 64:
            raise ValueError(
                f"vocab_overlap's bitmask path supports <= 64 sources, "
                f"got {ns}; widen to multi-word masks")
        tc = tdd.indices.to_numpy(zero_copy_only=False)
        sc = sdd.indices.to_numpy(zero_copy_only=False)
        masks = np.zeros(len(tdd.dictionary), np.uint64)
        np.bitwise_or.at(masks, tc,
                         np.uint64(1) << sc.astype(np.uint64))
        # |S|×|S| co-occurrence: bit i AND bit j over all term masks
        bits = ((masks[:, None] >> np.arange(ns, dtype=np.uint64))
                & np.uint64(1)).astype(np.int64)  # (terms, ns)
        co = bits.T @ bits  # (ns, ns) exact int64
        ia, ib = np.triu_indices(ns)
        vals = co[ia, ib]
        nz = vals > 0  # zero partials carry no information (and a
        # globally-zero pair is absent on the oracle side too)
        ia, ib, vals = ia[nz], ib[nz], vals[nz]
        names = sdd.dictionary.to_pylist()
        return pa.table({
            "sa": pa.array([names[i] for i in ia], pa.string()),
            "sb": pa.array([names[j] for j in ib], pa.string()),
            "common_part": pa.array(vals, pa.int64())})

    def canon(batch: pa.Table) -> pa.Table:
        """order each pair (min, max) so cross-bucket cells merge."""
        import pyarrow.compute as pc

        a, b = batch.column("sa"), batch.column("sb")
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        return pa.table({"sa": lo, "sb": hi,
                         "common_part": batch.column("common_part")})

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(bucket_matrix, batch_format="pyarrow")
        .map_batches(canon, batch_format="pyarrow")
        .groupby(["sa", "sb"])
        .aggregate(Sum("common_part", alias_name="n_common"))
        .to_pandas()  # ≤ |S|² rows
    )
    size_of = {r["sa"]: int(r["n_common"]) for _, r in cells.iterrows()
               if r["sa"] == r["sb"]}
    sub = cells[cells["sa"] != cells["sb"]].sort_values(
        ["sa", "sb"]).reset_index(drop=True)
    common = sub["n_common"].astype(np.int64).to_numpy()
    na = np.array([size_of[s] for s in sub["sa"]], np.int64)
    nb = np.array([size_of[s] for s in sub["sb"]], np.int64)
    union = na + nb - common
    return pa.table({
        "source_a": pa.array(sub["sa"], pa.string()),
        "source_b": pa.array(sub["sb"], pa.string()),
        "n_common_terms": pa.array(common, pa.int64()),
        "n_union_terms": pa.array(union, pa.int64()),
        "jaccard": pa.array(
            common.astype(np.float64) / union.astype(np.float64),
            pa.float64()),
    })
