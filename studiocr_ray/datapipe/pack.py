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


def export_token_shards(
    ds,
    out_path: str,
    num_shards: int = 16,
    vocab_size: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Distributed packed-token export → Megatron-style binary shards:
    ``shard-<i>.bin`` (one little-endian uint32 token-id stream, docs
    concatenated in doc-id order) + ``shard-<i>.idx`` (int64 doc ids and
    end offsets, binary-searchable) — the sink a training loader mmaps.
    Returns the shard manifest table ``(shard, docs, tokens)``.

    Token ids are ``splitmix64(md5-free whitespace-token hash) %
    vocab_size`` — the engine's deterministic stand-in for a learned BPE
    (the documented swap point: substitute the real tokenizer inside
    ``encode``; shard layout, index format and resume story are
    unchanged).  Shards are ``id_hash % num_shards``, so each doc lands
    in exactly one shard, each shard writes in ONE task (sorted by doc
    id — deterministic bytes, safely re-runnable: a crashed run
    rewrites the same file), and a loader can consume shards
    independently.  One doc-id-keyed exchange of (id, token-ids) rows;
    at 100 TB raise ``num_shards`` so one shard's tokens fit a task."""
    import os

    from ..functions.arrowutil import id_buckets, id_hash64

    os.makedirs(out_path, exist_ok=True)
    out_abs = os.path.abspath(out_path)

    def encode(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(texts)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False)
        flat = toks.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(batch.num_rows), lens)
        flat = flat.filter(pa.array(nonempty))
        doc_idx = doc_idx[nonempty]
        ids64 = id_hash64(flat)
        tok_ids = (ids64 % np.uint64(vocab_size)).astype(np.uint32)
        counts = np.bincount(doc_idx,
                             minlength=batch.num_rows).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(tok_ids, pa.uint32()))
        dids = batch.column(id_col)
        return pa.table({
            "shard": pa.array(id_buckets(dids, num_shards), pa.int32()),
            "doc_id": dids,
            "tok": lst})

    def write_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "docs": pa.array([], pa.int64()),
                             "tokens": pa.array([], pa.int64())})
        sid = int(group.column("shard")[0].as_py())
        t = group.sort_by([("doc_id", "ascending")])
        toks = t.column("tok").combine_chunks()
        stream = toks.flatten().to_numpy(zero_copy_only=False).astype(
            "<u4")
        lens = pc.list_value_length(toks).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ends = np.cumsum(lens)
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype("<i8")
        with open(os.path.join(out_abs, f"shard-{sid}.bin"), "wb") as f:
            f.write(stream.tobytes())
        with open(os.path.join(out_abs, f"shard-{sid}.idx"), "wb") as f:
            f.write(np.int64(len(ids)).tobytes())
            f.write(ids.tobytes())
            f.write(ends.astype("<i8").tobytes())
        return pa.table({
            "shard": pa.array([sid], pa.int32()),
            "docs": pa.array([len(ids)], pa.int64()),
            "tokens": pa.array([int(ends[-1]) if len(ends) else 0],
                               pa.int64())})

    out = (
        ds.map_batches(encode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()  # ≤ num_shards rows
    ).sort_values("shard").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def read_token_shard(out_path: str, shard: int):
    """Read one exported shard back → (doc_ids int64[], ends int64[],
    stream uint32[]): doc i's tokens are ``stream[ends[i-1]:ends[i]]``."""
    import os

    with open(os.path.join(out_path, f"shard-{shard}.idx"), "rb") as f:
        buf = f.read()
    n = int(np.frombuffer(buf, "<i8", count=1)[0])
    ids = np.frombuffer(buf, "<i8", count=n, offset=8)
    ends = np.frombuffer(buf, "<i8", count=n, offset=8 + 8 * n)
    stream = np.fromfile(os.path.join(out_path, f"shard-{shard}.bin"),
                         dtype="<u4")
    return ids, ends, stream
