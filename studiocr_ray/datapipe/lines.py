"""Corpus-level line deduplication (CCNet / RefinedWeb-style).

Web corpora repeat whole lines across documents — navigation chrome,
cookie banners, boilerplate footers — far more often than they repeat whole
documents.  The classic curation step (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", 2020; Penedo et
al., "The RefinedWeb Dataset for Falcon LLM", 2023 §3.3) counts every line
across the corpus and strips the lines that occur more than *k* times.

Shape at scale
--------------
Two passes over the corpus, ONE vocabulary-bounded shuffle, zero per-row
Python:

1. **Count** — per-batch partial counts keyed by the line string
   (``pc.value_counts``), then ONE line-hash-bucketed merge (64 int
   groups, dictionary-encode + bincount per group — the word_count/term_df
   shape, relational.py) that moves counts, not occurrences.  Only lines with
   global count > *k* survive the filter, and that set is small by
   construction (it is the boilerplate vocabulary, not the corpus), so it
   is collected and broadcast once via ``ray.put``.
2. **Drop** — a stateless ``map_batches`` pass re-derives each document's
   lines, marks frequent ones with one hashed ``pc.index_in`` probe against
   the broadcast set, and reassembles the surviving lines in order with a
   vectorized list rebuild + ``pc.binary_join`` — no shuffle at all: a
   document never leaves its block.

If a pathological corpus ever produced a frequent-line set too large to
broadcast, the drop pass degrades to the engine's co-partitioned join shape
(bucket lines and the frequent set by ``string_buckets``, cf.
``dedup.copartition_verify``); with the default ``max_count`` the broadcast
side is bounded by distinct-lines-repeated-k-times, which CCNet-scale runs
measure in GB, not TB.

The reference's analogue is keep-first page dedup
(/root/reference/StudiOCR/db.py:49-57 unique OcrDocument names); this
module generalizes it to sub-document granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _line_parts(batch: pa.Table, text_col: str, words_per_line: int | None):
    """Vectorized split of each document into its dedup units.

    With ``words_per_line=None`` (the web-corpus default) a unit is a
    literal ``'\\n'``-delimited line with empty lines dropped.  With an
    integer *w* the document is reflowed into fixed-width *w*-token lines
    (ASCII-whitespace tokens, empties dropped) — the mode for corpora whose
    text carries no newlines, bit-compatible with the DuckDB oracle's
    ``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')``.

    Returns ``(line_str, n_lines_per_doc)`` where ``line_str`` is a flat
    string array of every document's lines in order (documents contiguous).
    """
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if words_per_line is None:
        parts = pc.split_pattern(text, "\n")
        flat = parts.values
        nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        off = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(nonempty, out=cs[1:])
        nl = cs[off[1:]] - cs[off[:-1]]
        return flat.filter(pa.array(nonempty)), nl
    w = words_per_line
    tokens = pc.utf8_split_whitespace(text)
    flat = tokens.values
    # leading/trailing whitespace yields empty tokens — drop them while
    # keeping per-doc counts consistent (one cumsum, no per-row Python)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False
    )
    tok_off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    cs = np.zeros(len(flat) + 1, np.int64)
    np.cumsum(nonempty, out=cs[1:])
    cnt = cs[tok_off[1:]] - cs[tok_off[:-1]]  # nonempty tokens per doc
    flat_kept = flat.filter(pa.array(nonempty))

    nl = -(-cnt // w)  # ceil-div: lines per doc
    total = int(nl.sum())
    doc_start = np.cumsum(cnt) - cnt
    line_local = (
        np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(nl) - nl, nl)
    )
    starts = np.repeat(doc_start, nl) + line_local * w
    # offsets share boundaries doc-to-doc (token runs are contiguous), so
    # the line list is one ListArray over the kept-token values
    offsets = np.append(starts, cs[-1])
    lines_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), flat_kept
    )
    line_str = pc.binary_join(lines_list, " ")
    return line_str, nl


def frequent_lines(
    ds, text_col: str = "text", words_per_line: int | None = None,
    max_count: int = 2,
) -> pa.Table:
    """Lines occurring more than ``max_count`` times corpus-wide →
    ``(line, cnt)``.  One vocabulary-bounded shuffle (see module doc)."""

    from ..functions.arrowutil import string_buckets

    def partial(batch: pa.Table) -> pa.Table:
        line_str, _ = _line_parts(batch, text_col, words_per_line)
        if len(line_str) == 0:
            return pa.table({"lb": pa.array([], pa.int32()),
                             "line": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(line_str)
        vals = vc.field("values")
        return pa.table(
            {"lb": pa.array(string_buckets(vals, 64), pa.int32()),
             "line": vals,
             "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        # distinct-line cardinality is corpus-scale, so the merge buckets
        # by line hash (one dictionary-encode/bincount per group) — a raw
        # groupby("line") sort shuffle is the measured 33× string-key
        # anti-pattern (cf. word_count)
        import numpy as np

        from .relational import _dict_encode

        d = _dict_encode(group.column("line"))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("cnt").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        ).astype(np.int64)
        keep = cnt > max_count
        return pa.table(
            {"line": d.dictionary.filter(pa.array(keep)),
             "cnt": pa.array(cnt[keep], pa.int64())}
        )

    frequent = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lb")
        .map_groups(merge, batch_format="pyarrow")
    )
    parts = [
        b for b in frequent.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not parts:
        return pa.table({"line": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return pa.concat_tables(parts).combine_chunks()


class _DropFrequentLines:
    """Actor-pool drop pass: resolves the broadcast frequent-line set once
    per actor in ``__init__`` (never re-shipped per batch)."""

    def __init__(self, freq_ref, text_col: str, words_per_line: int,
                 id_col: str):
        freq = freq_ref if isinstance(freq_ref, pa.Array) else ray.get(freq_ref)
        self.freq = freq
        self.text_col = text_col
        self.w = words_per_line
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        line_str, nl = _line_parts(batch, self.text_col, self.w)
        if len(self.freq):
            keep = pc.is_null(pc.index_in(line_str, value_set=self.freq))
            keep_np = keep.to_numpy(zero_copy_only=False)
        else:
            keep_np = np.ones(len(line_str), dtype=bool)
        # per-doc kept counts → offsets over the surviving lines, then one
        # element-wise join rebuilds each document's text in line order
        line_end = np.cumsum(nl)
        cs = np.zeros(len(line_str) + 1, np.int64)
        np.cumsum(keep_np, out=cs[1:])
        kept_per_doc = cs[line_end] - cs[line_end - nl]
        offsets = np.zeros(len(nl) + 1, np.int64)
        np.cumsum(kept_per_doc, out=offsets[1:])
        kept_lines = line_str.filter(pa.array(keep_np))
        doc_lines = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_lines
        )
        text = pc.binary_join(doc_lines, "\n")
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "text": text,
                "n_lines_kept": pa.array(kept_per_doc, pa.int64()),
            }
        )


def line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int | None = None,
    max_count: int = 2,
    concurrency=(1, 8),
):
    """Strip corpus-frequent lines from every document (module doc for the
    two-pass shape).  ``ds`` is consumed twice — pass a materialized dataset
    when the input is itself an expensive lineage.  Returns a Dataset of
    ``(id_col, text, n_lines_kept)`` with surviving lines joined by
    ``'\\n'`` in original order."""
    freq = frequent_lines(
        ds, text_col=text_col, words_per_line=words_per_line,
        max_count=max_count,
    )
    freq_ref = ray.put(freq.column("line").combine_chunks())
    return ds.map_batches(
        _DropFrequentLines,
        fn_constructor_args=(freq_ref, text_col, words_per_line, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def dedup_lines_within_doc(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int | None = None,
):
    """Keep only the FIRST occurrence of each distinct line WITHIN every
    document → ``(id_col, text, n_lines_kept)`` — the intra-document half
    of repetition trimming (Gopher/Rae et al. 2021 repetition filters
    measure it; this op removes it).  Complements :func:`line_dedup`,
    which strips corpus-frequent lines across documents.

    Shuffle-free: a document's lines never leave its batch, so the pass is
    one stateless ``map_batches`` — a pure function of the row, identical
    at any cluster shape.  Vectorized: one dictionary encode per batch +
    one ``np.unique`` over composite (doc, line) keys finds every first
    occurrence; the survivors rebuild with the same list-offset join as
    the corpus-level drop pass."""

    def drop_dups(batch: pa.Table) -> pa.Table:
        line_str, nl = _line_parts(batch, text_col, words_per_line)
        d = pc.dictionary_encode(line_str)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ndict = max(len(d.dictionary), 1)
        doc_idx = np.repeat(np.arange(len(nl)), nl)
        key = doc_idx * ndict + codes
        _, first_pos = np.unique(key, return_index=True)
        keep_np = np.zeros(len(codes), dtype=bool)
        keep_np[first_pos] = True
        line_end = np.cumsum(nl)
        cs = np.zeros(len(codes) + 1, np.int64)
        np.cumsum(keep_np, out=cs[1:])
        kept_per_doc = cs[line_end] - cs[line_end - nl]
        offsets = np.zeros(len(nl) + 1, np.int64)
        np.cumsum(kept_per_doc, out=offsets[1:])
        doc_lines = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), line_str.filter(pa.array(keep_np))
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text": pc.binary_join(doc_lines, "\n"),
                "n_lines_kept": pa.array(kept_per_doc, pa.int64()),
            }
        )

    return ds.map_batches(drop_dups, batch_format="pyarrow")
