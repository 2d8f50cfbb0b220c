"""GPT-style sequence packing: global token offsets for concat-and-chunk.

Training pipelines concatenate the curated corpus in a deterministic order
(separator-joined) and slice it into fixed-length sequences (Brown et al.,
"Language Models are Few-Shot Learners", 2020 §2.1 — documents are packed
into 2048-token contexts; the T5/GPT "concat then chunk" recipe).  The
distributed problem is the *global prefix sum*: every document needs the
total token count of all documents before it, an inherently sequential
quantity, computed here without ever sequencing the corpus through one
process:

1. **Bucket partials** — each doc belongs to range bucket
   ``doc_id // bucket_width``; a stateless ``map_batches`` pass emits
   per-batch ``(bucket, tok_sum)`` partials (vectorized regex token count +
   ``np.bincount``), and one small ``groupby(bucket).sum`` reduces them.
2. **Driver scan** — the bucket totals (corpus_size / bucket_width rows —
   at 10^12 docs with bucket_width=2^20 that is ~10^6 rows of 16 B) are
   cumsum-scanned on the driver and broadcast once via ``ray.put``.
3. **Bucket fill-in** — ``groupby(bucket).map_groups`` brings each range
   bucket's docs together (the ONE all-to-all, balanced by construction
   when doc_ids are dense), sorts by doc_id, and adds the bucket's base
   offset to a local vectorized cumsum.

Output per doc: ``(doc_id, n_tokens, start_token, seq_first, seq_last)``
where ``seq_first/seq_last`` are the first/last ``seq_len``-token training
sequences the document's tokens land in (a zero-token document "lands" at
its start offset).  Token counts are whitespace-run counts — the engine's
standard, bit-compatible with the DuckDB
``len(list_filter(regexp_split_to_array(...)))`` oracle.

The reference's analogue is page-number assignment within a document
(/root/reference/StudiOCR/OcrEngine.py:108-110 sequential page offsets);
this operator is that idea at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum


def _tok_counts(text) -> np.ndarray:
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return (
        pc.count_substring_regex(text, r"\S+")
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )


def pack_sequences(
    ds,
    seq_len: int = 2048,
    bucket_width: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Global concat-and-chunk offsets in ``id_col`` order (module doc).

    ``ds`` is consumed twice (partials + fill-in); pass a materialized
    dataset when the input is an expensive lineage."""

    def partial(batch: pa.Table) -> pa.Table:
        did = batch.column(id_col)
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        did = did.to_numpy(zero_copy_only=False).astype(np.int64)
        toks = _tok_counts(batch.column(text_col))
        buckets = did // bucket_width
        uniq, inv = np.unique(buckets, return_inverse=True)
        sums = np.bincount(inv, weights=toks, minlength=len(uniq))
        return pa.table(
            {
                "bucket": pa.array(uniq, pa.int64()),
                "tok_sum": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("tok_sum", alias_name="tok_sum"))
        .to_pandas()
        .sort_values("bucket")
    )
    base = {
        int(b): int(o)
        for b, o in zip(
            totals["bucket"],
            np.cumsum(totals["tok_sum"].to_numpy()) -
            totals["tok_sum"].to_numpy(),
        )
    }
    base_ref = ray.put(base)

    def add_bucket(batch: pa.Table) -> pa.Table:
        did = batch.column(id_col)
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        # numpy floor division, matching partial() exactly — Arrow's divide
        # truncates toward zero, which would split a negative-id bucket
        # across two groups and corrupt the fill-in offsets
        b = did.to_numpy(zero_copy_only=False).astype(np.int64) // bucket_width
        return batch.select([id_col, text_col]).append_column(
            "bucket", pa.array(b, pa.int64())
        )

    def fill_in(group: pa.Table) -> pa.Table:
        offsets = ray.get(base_ref)  # plasma-cached per node after first get
        did = group.column(id_col).combine_chunks()
        dnp = did.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(dnp, kind="stable")
        toks = _tok_counts(group.column(text_col))[order]
        bucket = int(dnp[order[0]] // bucket_width)
        start = offsets[bucket] + np.cumsum(toks) - toks
        seq_first = start // seq_len
        seq_last = (start + np.maximum(toks, 1) - 1) // seq_len
        return pa.table(
            {
                id_col: did.take(pa.array(order)),
                "n_tokens": pa.array(toks, pa.int64()),
                "start_token": pa.array(start, pa.int64()),
                "seq_first": pa.array(seq_first, pa.int64()),
                "seq_last": pa.array(seq_last, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fill_in, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Overlapping token chunking (RAG / context-window slicing)
# ---------------------------------------------------------------------------


def chunk_documents(
    ds,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Slice every document into ``chunk_tokens``-token chunks with
    ``overlap`` tokens of context carried between consecutive chunks —
    the retrieval/embedding chunker.  → ``(id, chunk_id, chunk_text,
    n_tokens)``; chunk starts step by ``chunk_tokens − overlap``; the final
    chunk may be short; empty documents emit nothing.

    Scale shape: stateless ``map_batches`` — chunks stay in the task that
    read the document, no shuffle, no per-row Python: ONE Arrow whitespace
    split per batch, chunk gather indices built with numpy repeats, chunk
    text re-joined with ``pc.binary_join`` over a rebuilt ListArray."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .relational import _flat_tokens

        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table(
            {id_col: pa.array([], ids.type),
             "chunk_id": pa.array([], pa.int64()),
             "chunk_text": pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64())}
        )
        flat, doc_idx = _flat_tokens(batch, text_col)
        if len(flat) == 0:
            return empty
        counts = np.bincount(doc_idx, minlength=batch.num_rows)
        # chunks per doc: ceil((n - overlap) / step) for n > 0 — equivalently
        # the number of starts {0, step, 2*step, ...} strictly below n that
        # begin a non-fully-overlapped chunk
        m = np.where(counts > 0, (np.maximum(counts - overlap, 1) + step - 1) // step, 0)
        total = int(m.sum())
        if total == 0:
            return empty
        doc_of_chunk = np.repeat(np.arange(batch.num_rows), m)
        cum_m = np.concatenate(([0], np.cumsum(m)))[:-1]
        chunk_no = np.arange(total) - cum_m[doc_of_chunk]
        starts_in_doc = chunk_no * step
        doc_offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        chunk_len = np.minimum(
            counts[doc_of_chunk] - starts_in_doc, chunk_tokens
        )
        # gather indices: for chunk c, tokens [start, start+len)
        tok_total = int(chunk_len.sum())
        chunk_off = np.concatenate(([0], np.cumsum(chunk_len)))
        within = np.arange(tok_total) - np.repeat(chunk_off[:-1], chunk_len)
        gather = (
            doc_offsets[doc_of_chunk].repeat(chunk_len)
            + starts_in_doc.repeat(chunk_len)
            + within
        )
        toks = flat.take(pa.array(gather))
        lst = pa.ListArray.from_arrays(
            pa.array(chunk_off, pa.int32()), toks
        )
        text = pc.binary_join(lst, " ")
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_of_chunk)),
                "chunk_id": pa.array(chunk_no, pa.int64()),
                "chunk_text": text,
                "n_tokens": pa.array(chunk_len, pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")
