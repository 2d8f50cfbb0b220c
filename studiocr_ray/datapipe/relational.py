"""Relational / aggregate operators used by the driver-facing queries.

Every groupby here follows the partial-aggregation pattern: combine inside
``map_batches`` first (one row per key per batch), then a small
``groupby().aggregate()`` over partials — never a raw-row shuffle
(ray_guide 'Aggregation at scale').  Small join sides are broadcast via
``ray.put`` and looked up per batch — no shuffle join.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Sum


def _flat_tokens(batch: pa.Table, text_col: str):
    """Lowered whitespace tokens of every row, flattened + doc-aligned:
    returns (token_array, doc_index_array) with empty tokens removed —
    the same token multiset as per-row ``text.lower().split()``, computed
    with Arrow kernels (``utf8_split_whitespace`` emits '' at string
    boundaries; the filter restores str.split semantics)."""
    import pyarrow.compute as pc

    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    doc_idx = np.repeat(np.arange(batch.num_rows), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        keep = np.flatnonzero(nonempty)
        flat = flat.take(pa.array(keep))
        doc_idx = doc_idx[nonempty]
    return flat, doc_idx


def _dict_encode(arr):
    """dictionary_encode normalized to a flat DictionaryArray (pyarrow
    returns ChunkedArray for chunked input)."""
    import pyarrow.compute as pc

    d = pc.dictionary_encode(arr)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
        if isinstance(d, pa.ChunkedArray):
            d = d.chunk(0)
    return d


def word_count(ds, text_col: str = "text"):
    """Corpus term frequencies over lowered whitespace tokens → (term, cnt).

    Vectorized partial: split + dictionary-encode + bincount per batch (the
    ``pc.split_pattern`` + dictionary pattern proven in the index pipeline,
    index_pipeline.py:113-243) — output is vocabulary-bounded, so the
    exchange moves one row per distinct term per batch.  The merge groups
    by a term-hash BUCKET (int32, bounded group count) with one
    dictionary-encode/bincount per group — never ``groupby("term")``,
    whose sort-based shuffle over an open vocabulary's millions of
    distinct string keys is the anti-pattern measured at 33× in
    lm.unigram_logprob's history."""
    from ..functions.arrowutil import string_buckets

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table({"wb": pa.array([], pa.int32()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        d = _dict_encode(flat)
        counts = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table(
            {"wb": pa.array(string_buckets(d.dictionary, 64), pa.int32()),
             "term": d.dictionary, "cnt": pa.array(counts, pa.int64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("term"))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("cnt").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        ).astype(np.int64)
        return pa.table(
            {"term": d.dictionary, "cnt": pa.array(cnt, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("wb").map_groups(merge, batch_format="pyarrow")


def term_doc_freq(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Term document-frequency + total frequency → (term, df, tf).

    (term, doc) partials are exact because one document is one row (never
    split across batches); each batch pre-aggregates to one (term, df, tf)
    row per distinct term, so the exchange is vocabulary-bounded per
    batch, and the merge is bucketed by term hash (see word_count — no
    string-key sort shuffle)."""
    from ..functions.arrowutil import string_buckets

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table(
                {"wb": pa.array([], pa.int32()),
                 "term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int64())}
            )
        d = _dict_encode(flat)
        ndict = len(d.dictionary)
        tcodes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = doc_idx.astype(np.int64) * ndict + tcodes
        uniq, counts = np.unique(key, return_counts=True)
        tc = (uniq % ndict).astype(np.int64)
        df = np.bincount(tc, minlength=ndict).astype(np.int64)
        tf = np.bincount(tc, weights=counts, minlength=ndict).astype(
            np.int64
        )
        return pa.table(
            {
                "wb": pa.array(string_buckets(d.dictionary, 64), pa.int32()),
                "term": d.dictionary,
                "df": pa.array(df, pa.int64()),
                "tf": pa.array(tf, pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("term"))
        idx = d.indices.to_numpy(zero_copy_only=False)
        nd = len(d.dictionary)
        df = np.bincount(
            idx, weights=group.column("df").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        tf = np.bincount(
            idx, weights=group.column("tf").to_numpy(zero_copy_only=False),
            minlength=nd,
        ).astype(np.int64)
        return pa.table(
            {"term": d.dictionary,
             "df": pa.array(df, pa.int64()),
             "tf": pa.array(tf, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("wb").map_groups(merge, batch_format="pyarrow")


def char_histogram(ds, text_col: str = "text"):
    """Corpus printable-ASCII histogram → (code, cnt), codes 32..126.

    The corpus-level analogue of the reference's per-page
    ``char_histogram()`` (/root/reference/StudiOCR/OcrPageData.py:84-91).
    Byte-level bincount is exact for ASCII codes because UTF-8 continuation
    bytes are ≥ 0x80."""

    def partial(batch: pa.Table) -> pa.Table:
        # one bincount over the column's utf-8 value buffer — string arrays
        # store all values contiguously, so offsets[0]:offsets[-1] IS the
        # batch's byte stream (drop_null first rebuilds a compact buffer)
        arr = batch.column(text_col).combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        if len(arr):
            width = (np.int64 if pa.types.is_large_string(arr.type)
                     else np.int32)
            off = np.frombuffer(arr.buffers()[1], width,
                                count=arr.offset + len(arr) + 1)
            lo, hi = off[arr.offset], off[arr.offset + len(arr)]
            data = np.frombuffer(arr.buffers()[2], np.uint8)[lo:hi]
            acc = np.bincount(data, minlength=256)[:128].astype(np.int64)
        else:
            acc = np.zeros(128, dtype=np.int64)
        codes = np.arange(32, 127)
        return pa.table(
            {
                "code": pa.array(codes.astype(np.int32)),
                "cnt": pa.array(acc[32:127]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("code").aggregate(Sum("cnt", alias_name="cnt"))
    import pyarrow.compute as pc

    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = t.set_column(t.schema.get_field_index("code"),
                     "code", pc.cast(t.column("code"), pa.int32()))
    return t.filter(pc.greater(t.column("cnt"), 0))


def search_docs_substring(ds, words: list[str], text_col: str = "text",
                          id_col: str = "doc_id"):
    """ANY-word case-insensitive substring match over documents → doc_ids.
    Token-level and doc-level contains are equivalent for whitespace-free
    query words (a match cannot span a whitespace boundary)."""
    import pyarrow.compute as pc

    lw = [w.lower() for w in words]

    def f(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column(text_col))
        mask = None
        for w in lw:
            m = pc.match_substring(low, w)
            mask = m if mask is None else pc.or_(mask, m)
        return batch.filter(mask).select([id_col])

    return ds.map_batches(f, batch_format="pyarrow")


def search_docs_fuzzy(ds, word: str, tol: int = 1, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Fuzzy search: docs with a token within edit distance ≤ tol of the
    query word (≤3-char tokens exact — the zero_one_loss rule).

    The levenshtein predicate is inherently per-value, so it is evaluated
    once per DISTINCT token of the batch (Arrow whitespace split → flatten →
    dictionary encode); everything else — tokenization, the token→row
    scatter, the per-row any() — is Arrow/numpy.  Arrow's split emits ''
    tokens at leading/trailing whitespace; they are harmless (a ≤3-char
    token must match exactly, and the query word is non-empty)."""
    import numpy as np

    import pyarrow.compute as pc

    from ..functions.textfns import fuzzy_match

    w = word.lower()

    def f(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(pc.utf8_lower(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        d = pc.dictionary_encode(toks.flatten())
        vocab = d.dictionary.to_pylist()
        hit = np.fromiter((fuzzy_match(t, w, tol) for t in vocab),
                          dtype=bool, count=len(vocab))
        tok_hit = hit[d.indices.to_numpy(zero_copy_only=False)]
        # rebase offsets to 0: a sliced ListArray keeps its parent's raw
        # offsets (offsets[0] != 0) while flatten() returns only the
        # slice's values, so indexing the cumsum with raw offsets would
        # silently misalign (ADVICE r4)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        cs = np.concatenate([[0], np.cumsum(tok_hit, dtype=np.int64)])
        row_hit = (cs[offs[1:]] - cs[offs[:-1]]) > 0
        return batch.select([id_col]).filter(pa.array(row_hit))

    return ds.map_batches(f, batch_format="pyarrow")


def conf_bucket_counts(ds, text_col: str = "text"):
    """Confidence-bucket counts over synthetic per-token confidences
    conf = 40 + (codepoint of first char) % 60 — exercises the reference's
    highlight bucketing (/root/reference/StudiOCR/DocWindow.py:221-227) at
    corpus scale with a SQL-reproducible confidence."""
    from ..functions.textfns import conf_bucket

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # tokens are NOT lowered here (the reference confidence keys off the
        # original first character) — split only, then count per DISTINCT
        # token and fold the tiny distinct set through conf_bucket
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(texts)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "cnt": pa.array([], pa.int64())})
        d = _dict_encode(flat)
        counts = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        bucket_of = np.fromiter(
            (conf_bucket(40 + (ord(t[0]) % 60))
             for t in d.dictionary.to_pylist()),
            dtype=np.int64, count=len(d.dictionary),
        )
        # bucket ids may include -1 sentinel-free small ints; shift-safe sum
        lo = int(bucket_of.min())
        agg = np.bincount(bucket_of - lo, weights=counts).astype(np.int64)
        buckets = np.flatnonzero(agg) + lo
        return pa.table(
            {
                "bucket": pa.array(buckets.astype(np.int32), pa.int32()),
                "cnt": pa.array(agg[buckets - lo], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
    import pyarrow.compute as pc

    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.schema.get_field_index("bucket"),
                        "bucket", pc.cast(t.column("bucket"), pa.int32()))


def pricing_summary(ds):
    """TPC-H-Q1-style grouped aggregate over lineitem with per-batch partial
    aggregation (exact: quantities are integral doubles, counts are ints)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_orderkey", "count")]
        )
        names = ["sum_qty" if n == "l_quantity_sum"
                 else "n_items" if n == "l_orderkey_count" else n
                 for n in g.column_names]
        return g.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"), Sum("n_items", alias_name="n_items")
    )
    return out


def orders_by_priority(ds):
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_orderpriority").aggregate([("o_orderkey", "count")])
        return g.rename_columns(
            ["n_orders" if n == "o_orderkey_count" else n for n in g.column_names]
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "o_orderpriority"
    ).aggregate(Sum("n_orders", alias_name="n_orders"))


def orders_per_nation(orders_ds, sf_dir: str):
    """orders ⋈ customer ⋈ nation → per-nation order counts.

    Customer is NOT a broadcastable dimension at TPC-H scale (1.5M rows/sf),
    so no Python dict of the customer table ships anywhere: the broadcast
    side is a dense int8 nationkey-per-custkey numpy array (1 byte per
    customer — broadcastable ~two orders of magnitude longer than an object
    dict), looked up per batch as one fancy-index + bincount.  Nation names
    (25 rows, the genuine small side) are applied to the 25-row aggregate at
    the end."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    nk = cust.column("c_nationkey").to_numpy(zero_copy_only=False)
    n_nations = int(nk.max()) + 1
    assert n_nations <= 127, "int8 nationkey array"
    nation_of = np.full(int(ck.max()) + 1, -1, np.int8)
    nation_of[ck] = nk.astype(np.int8)
    ref = ray.put(nation_of)

    class J:
        def __init__(self):
            self.nation_of = ray.get(ref)  # zero-copy from object store

        def __call__(self, batch: pa.Table) -> pa.Table:
            cks = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            nks = self.nation_of[cks]
            counts = np.bincount(nks, minlength=n_nations)
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "n_nationkey": pa.array(nz.astype(np.int32), pa.int32()),
                    "n_orders": pa.array(counts[nz], pa.int64()),
                }
            )

    partials = orders_ds.map_batches(J, batch_format="pyarrow", concurrency=(1, 4))
    agg = partials.groupby("n_nationkey").aggregate(
        Sum("n_orders", alias_name="n_orders")
    )
    name_of = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))

    def add_name(batch: pa.Table) -> pa.Table:
        names = [name_of[int(k)] for k in batch.column("n_nationkey").to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "n_orders": batch.column("n_orders"),
            }
        )

    return agg.map_batches(add_name, batch_format="pyarrow")


def events_daily(ds):
    """Per (user_id, day): event count + distinct event types. Two-stage
    partial aggregation (tumbling daily window over event time)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.append_column(
            "day", pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        )
        g = batch.group_by(["user_id", "day", "event_type"]).aggregate(
            [("event_id", "count")]
        )
        return g.rename_columns(
            ["n" if n == "event_id_count" else n for n in g.column_names]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    per_type = partials.groupby(["user_id", "day", "event_type"]).aggregate(
        Sum("n", alias_name="n")
    )
    return per_type.groupby(["user_id", "day"]).aggregate(
        Count("event_type", alias_name="n_event_types"),
        Sum("n", alias_name="n_events"),
    )


def topk_terms(ds, k: int = 20, text_col: str = "text"):
    """Top-k most frequent lowered terms (cnt desc, term asc tiebreak) —
    the streaming top-k-frequent-terms query shape; exact here via the
    word_count partial+final aggregation, then a tiny driver-side top-k
    (the aggregate output is vocabulary-sized, not corpus-sized)."""
    import pyarrow.compute as pc

    t = word_count(ds, text_col=text_col).to_pandas()
    t = t.sort_values(["cnt", "term"], ascending=[False, True], kind="mergesort")
    return pa.Table.from_pandas(t.head(k).reset_index(drop=True))


def sessionize(ds, gap_seconds: int = 1800, num_buckets: int | None = None):
    """Gap-based session windows over the events table: per user, events
    sorted by (ts, event_id) belong to one session until a gap >
    ``gap_seconds`` opens a new one. Returns (event_id, user_id,
    session_idx) — session_idx is 0-based per user.

    The streaming-window analogue the reference lacks (SURVEY.md §2.10): the
    exchange is a user-hash bucket groupby (B groups, vectorized numpy inside
    — user-count-independent Python overhead, same bucketing pattern as the
    index merge); event-time ordering is restored per bucket, so late
    arrivals are handled by the sort, not a watermark."""

    import numpy as np

    if num_buckets is None:
        import os as _os

        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", _os.cpu_count() or 8)) \
            if _ray.is_initialized() else (_os.cpu_count() or 8)
        num_buckets = max(16, ncpu * 2)

    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import id_buckets

        b = id_buckets(batch.column("user_id"), num_buckets)
        return batch.select(["event_id", "user_id", "ts"]).append_column(
            "bucket", pa.array(b, pa.int32())
        )

    def bucket_sessions(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid = group.column("user_id").combine_chunks()
        d = pc.dictionary_encode(uid)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, codes))
        codes_s, ts_s = codes[order], ts[order]
        user_change = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        gap_us = gap_seconds * 1_000_000
        gap_break = np.concatenate(([False], (ts_s[1:] - ts_s[:-1]) > gap_us))
        new_session = user_change | gap_break
        # session ordinal within user: cumsum of new_session minus the
        # cumulative count at each user's first row
        cum = np.cumsum(new_session)
        first_of_user = np.where(user_change)[0]
        base = np.zeros(len(cum), dtype=np.int64)
        base[first_of_user] = cum[first_of_user]
        base = np.maximum.accumulate(base)
        session_idx = cum - base
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": uid.take(pa.array(order)),
                "session_idx": pa.array(session_idx, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_sessions, batch_format="pyarrow")
    )


def asof_match_events(
    ds,
    left_type: str = "purchase",
    right_type: str = "click",
    num_buckets: int | None = None,
):
    """Per-user AS-OF JOIN inside the events table: each LEFT-type event is
    matched to the user's latest RIGHT-type event with ``ts_right <=
    ts_left`` (ties: greatest right ``event_id``); unmatched lefts keep
    nulls.  The windowed-join shape Ray Data lacks, composed as
    filter+user-hash bucket → ``groupby(bucket)`` → ONE vectorized merge per
    bucket:

    * both sides sort together by (user, ts, side: right-first, event_id);
    * "latest right so far" is a single ``np.maximum.accumulate`` over right
      positions, invalidated across user boundaries by comparing with the
      user run start — no per-user Python loop;

    Partitioning assumption (same as sessionize): a user's rows co-locate in
    one bucket, so buckets are independent and the exchange moves only
    (event_id, user_id, ts, side) rows.

    Returns (event_id, user_id, matched_event_id: nullable int64,
    lag_us: nullable int64)."""

    import pyarrow.compute as pc

    if num_buckets is None:
        import os as _os

        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", _os.cpu_count() or 8)) \
            if _ray.is_initialized() else (_os.cpu_count() or 8)
        num_buckets = max(16, ncpu * 2)

    def add_bucket(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        t = batch.filter(keep)
        side = pc.cast(
            pc.equal(t.column("event_type"), left_type), pa.int8()
        )  # 1 = left, 0 = right
        from ..functions.arrowutil import id_buckets

        b = id_buckets(t.column("user_id"), num_buckets)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "side": side,
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def bucket_asof(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks()
        d = pc.dictionary_encode(uid)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        # (user, ts, right-before-left, event_id): at equal ts the right row
        # sorts first (eligible, ts<=), rights at equal ts keep max event_id
        # last so the accumulate picks it
        order = np.lexsort((eid, side, ts, codes))
        codes_s, ts_s, eid_s, side_s = (
            codes[order], ts[order], eid[order], side[order]
        )
        n = len(order)
        pos = np.where(side_s == 0, np.arange(n), -1)
        last_right = np.maximum.accumulate(pos)
        user_change = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        run_start = np.zeros(n, dtype=np.int64)
        run_start[user_change] = np.flatnonzero(user_change)
        run_start = np.maximum.accumulate(run_start)
        is_left = side_s == 1
        valid = is_left & (last_right >= run_start)
        safe = np.clip(last_right, 0, None)
        matched = np.where(valid, eid_s[safe], 0)
        lag = np.where(valid, ts_s - ts_s[safe], 0)
        li = np.flatnonzero(is_left)
        null_mask = ~valid[li]
        return pa.table(
            {
                "event_id": pa.array(eid_s[li]),
                "user_id": uid.take(pa.array(order[li])),
                "matched_event_id": pa.array(
                    matched[li], pa.int64(), mask=null_mask
                ),
                "lag_us": pa.array(lag[li], pa.int64(), mask=null_mask),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_asof, batch_format="pyarrow")
    )


def hopping_counts(
    ds, window_minutes: int = 60, slide_minutes: int = 15
):
    """Hopping-window event counts per user: every event lands in
    ``window/slide`` overlapping epoch-aligned windows; returns
    (user_id, window_start_us, n_events).

    The explode is pure numpy (np.repeat over nw = window//slide window
    starts per event) with PER-BATCH partial aggregation, so the final
    groupby moves one row per (user, window) per batch — never one row per
    (event, window)."""
    assert window_minutes % slide_minutes == 0, "window must be a multiple of slide"
    win_us = window_minutes * 60_000_000
    slide_us = slide_minutes * 60_000_000
    nw = window_minutes // slide_minutes

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        base = (ts // slide_us) * slide_us
        starts = (
            base[:, None] - np.arange(nw, dtype=np.int64)[None, :] * slide_us
        ).reshape(-1)
        users = np.repeat(uid, nw)
        g = pa.table(
            {"user_id": pa.array(users), "window_start_us": pa.array(starts)}
        ).group_by(["user_id", "window_start_us"]).aggregate([([], "count_all")])
        return g.rename_columns(
            ["n_events" if c == "count_all" else c for c in g.column_names]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_start_us"])
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


def range_count_events(
    ds,
    left_type: str = "purchase",
    right_type: str = "click",
    lookback_minutes: int = 10,
    num_buckets: int | None = None,
):
    """Per-user RANGE JOIN (aggregated): for each LEFT-type event, count the
    user's RIGHT-type events in the half-open interval
    ``(ts_left - lookback, ts_left]``.

    Vectorized per user-hash bucket with ONE composite-key searchsorted pair
    per side — no per-user Python loop: right rows sort by
    ``user_rank * SPAN + (ts - ts_min)`` where SPAN exceeds the bucket's
    time span + lookback, so a left's two probes (at ts and ts - lookback)
    can never collide with a neighboring user's key range.  Partitioning
    assumptions: a user's rows co-locate in one bucket (user-hash exchange),
    and per bucket ``distinct_users × (time_span + lookback)`` µs fits int64
    (≈ 10^5 users × decades — holds when bucket count scales with the
    cluster).

    Returns (event_id, user_id, n_recent)."""

    import pyarrow.compute as pc

    lookback_us = lookback_minutes * 60_000_000
    if num_buckets is None:
        import os as _os

        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", _os.cpu_count() or 8)) \
            if _ray.is_initialized() else (_os.cpu_count() or 8)
        num_buckets = max(16, ncpu * 2)

    def add_bucket(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        t = batch.filter(keep)
        side = pc.cast(pc.equal(t.column("event_type"), left_type), pa.int8())
        from ..functions.arrowutil import id_buckets

        b = id_buckets(t.column("user_id"), num_buckets)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "side": side,
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def bucket_range_count(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks()
        d = pc.dictionary_encode(uid)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        is_left = side == 1
        ts0 = int(ts.min()) if len(ts) else 0
        span = (int(ts.max()) - ts0 if len(ts) else 0) + lookback_us + 2
        r_keys = np.sort(codes[~is_left] * span + (ts[~is_left] - ts0))
        l_codes, l_ts, l_eid = codes[is_left], ts[is_left], eid[is_left]
        hi = np.searchsorted(r_keys, l_codes * span + (l_ts - ts0), side="right")
        lo = np.searchsorted(
            r_keys, l_codes * span + (l_ts - lookback_us - ts0), side="right"
        )
        return pa.table(
            {
                "event_id": pa.array(l_eid),
                "user_id": uid.filter(pa.array(is_left)),
                "n_recent": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_range_count, batch_format="pyarrow")
    )


def tfidf_topk(ds, k: int = 5, text_col: str = "text", id_col: str = "doc_id",
               n_docs: int | None = None):
    """Per-doc top-k terms by tf-idf → (doc_id, term, tf, df, score, rank).

    Two streaming passes over the corpus, no corpus-scale shuffle:

    1. document frequencies via :func:`term_doc_freq` (vocab-bounded
       aggregate), collected and broadcast via ``ray.put`` — the classic
       small-side lookup, same shape as a dimension-table join;
    2. per-batch (doc, term, tf) partials (exact: one doc is one row, never
       split across batches), df lookup per DISTINCT term per batch, then a
       vectorized lexsort top-k per doc.

    score = tf * (N / df) — the log-free tf-idf variant, chosen because
    every operation (int→double cast, one division, one multiply) is
    IEEE-exact and therefore bit-reproducible by the SQL oracle;
    ``ln`` implementations are not guaranteed to round identically across
    engines.  Ties break by term ascending (total order, deterministic)."""
    import pyarrow.compute as pc

    import ray

    if n_docs is None:
        # metadata-only for parquet-backed inputs; for an expensive lineage
        # this is a THIRD full consumption of ds (count + df pass + topk
        # pass) — pass n_docs explicitly or a materialized dataset
        n_docs = ds.count()
    df_tbl = pa.Table.from_pandas(
        term_doc_freq(ds, text_col=text_col, id_col=id_col).to_pandas(),
        preserve_index=False,
    )
    df_map_ref = ray.put(
        dict(zip(df_tbl.column("term").to_pylist(),
                 df_tbl.column("df").to_pylist()))
    )
    n_total = float(n_docs)

    def per_doc_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        flat, doc_idx = _flat_tokens(batch, text_col)
        empty = pa.table(
            {"doc_id": pa.array([], batch.column(id_col).type),
             "term": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64()),
             "df": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64()),
             "rank": pa.array([], pa.int64())}
        )
        if len(flat) == 0:
            return empty
        df_map = _ray.get(df_map_ref)
        d = _dict_encode(flat)
        ndict = len(d.dictionary)
        key = doc_idx.astype(np.int64) * ndict + d.indices.to_numpy(
            zero_copy_only=False
        )
        uniq, tf = np.unique(key, return_counts=True)
        u_doc = uniq // ndict
        u_code = uniq % ndict
        # df per DISTINCT term of this batch only
        dict_terms = d.dictionary.to_pylist()
        df_by_code = np.array([df_map[t] for t in dict_terms], np.int64)
        df = df_by_code[u_code]
        score = tf.astype(np.float64) * (n_total / df.astype(np.float64))
        # lexical rank of each dictionary code for the term-asc tie-break
        lex = np.empty(ndict, np.int64)
        lex[np.argsort(np.array(dict_terms, dtype=object))] = np.arange(ndict)
        order = np.lexsort((lex[u_code], -score, u_doc))
        sd = u_doc[order]
        first = np.ones(len(sd), bool)
        first[1:] = sd[1:] != sd[:-1]
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(sd)))
        rank = np.arange(len(sd)) - np.repeat(starts, runs) + 1
        keep = order[rank <= k]
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": ids.take(pa.array(u_doc[keep])),
                "term": d.dictionary.take(pa.array(u_code[keep])),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(df[keep], pa.int64()),
                "score": pa.array(score[keep], pa.float64()),
                "rank": pa.array(rank[rank <= k], pa.int64()),
            }
        )

    return ds.map_batches(per_doc_topk, batch_format="pyarrow")


def bm25_topk(ds, terms: list[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """BM25 ranked retrieval for one fixed query → (doc_id, score, rank),
    the scan-scoring twin of the inverted-index search (the corpus-level
    analogue of the reference's ranked result list,
    /root/reference/StudiOCR/MainWindow.py:221-256, which orders matched
    documents for display).

    Two streaming passes, nothing corpus-scale ever reaches the driver:

    1. corpus stats — each batch emits ONE tiny row (n_docs, sum_dl, one
       df column per query term, tokens restricted via ``pc.is_in``
       before counting); ``Dataset.sum`` folds them, so exactly
       ``len(terms) + 2`` numbers cross to the driver;
    2. scoring scan — tf per query term per doc via one masked
       ``bincount`` each, contributions added in FIXED ``terms`` order,
       per-batch top-k by (-score, doc_id), then a driver merge of the
       (batches × k)-row partials (same shape as
       :func:`..embed.ann_topk_brute`).

    idf is the log-free Robertson–Spärck–Jones weight
    ``(N - df + 0.5) / (df + 0.5)`` — like :func:`tfidf_topk`'s log-free
    score, chosen because subtract/add/divide on exact integer-valued
    doubles are IEEE-exact, so the SQL oracle reproduces every score
    bit-for-bit (``ln`` rounding is not guaranteed identical across
    engines).  All parenthesization below mirrors the oracle's expression
    tree verbatim; keep them in lockstep."""
    import heapq

    import pyarrow.compute as pc

    terms = list(terms)
    term_set = pa.array(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        cols = {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "sum_dl": pa.array([len(flat)], pa.int64()),
        }
        hit = pc.is_in(flat, value_set=term_set).to_numpy(
            zero_copy_only=False
        )
        hflat, hdoc = (flat.take(pa.array(np.flatnonzero(hit))),
                       doc_idx[hit])
        for j, t in enumerate(terms):
            m = pc.equal(hflat, t).to_numpy(zero_copy_only=False)
            cols[f"df_{j}"] = pa.array(
                [int(np.unique(hdoc[m]).size)], pa.int64()
            )
        return pa.table(cols)

    sums = ds.map_batches(stats_partial, batch_format="pyarrow").sum(
        ["n_docs", "sum_dl"] + [f"df_{j}" for j in range(len(terms))]
    )
    # Dataset.sum returns None on an empty dataset; a token-free corpus
    # has sum_dl = 0 so avgdl would be 0/0 (ADVICE r4) — both mean "no
    # scorable docs": return the empty result cleanly.
    if sums is None or not int(sums["sum(n_docs)"]) \
            or not int(sums["sum(sum_dl)"]):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int32())})
    n_f = float(sums["sum(n_docs)"])
    avgdl = float(sums["sum(sum_dl)"]) / n_f
    # ((n - df) + 0.5) / (df + 0.5) — same tree as the SQL oracle
    idf = [((n_f - float(sums[f"sum(df_{j})"])) + 0.5)
           / (float(sums[f"sum(df_{j})"]) + 0.5) for j in range(len(terms))]
    k1p1 = k1 + 1.0

    def score_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
        if batch.num_rows == 0:
            return empty
        flat, doc_idx = _flat_tokens(batch, text_col)
        n = batch.num_rows
        dl = np.bincount(doc_idx, minlength=n).astype(np.float64)
        # tf + (k1 * ((1 - b) + ((b * dl) / avgdl))) — oracle tree
        denom_tail = k1 * ((1.0 - b) + ((b * dl) / avgdl))
        score = np.zeros(n, np.float64)
        any_tf = np.zeros(n, bool)
        for j, t in enumerate(terms):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_idx[m], minlength=n).astype(np.float64)
            any_tf |= tf > 0
            # (idf * (tf * (k1+1))) / (tf + denom_tail) — oracle tree
            score = score + (idf[j] * (tf * k1p1)) / (tf + denom_tail)
        keep = np.flatnonzero(any_tf)
        if keep.size == 0:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[keep]
        sc = score[keep]
        if keep.size > k:  # per-batch top-k by (-score, doc_id)
            order = np.lexsort((ids, -sc))[:k]
            ids, sc = ids[order], sc[order]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "score": pa.array(sc, pa.float64())}
        )

    partials = ds.map_batches(
        score_partial, batch_format="pyarrow"
    ).take_all()
    best = heapq.nsmallest(
        k, ((-r["score"], r["doc_id"]) for r in partials)
    )
    return pa.table(
        {
            "doc_id": pa.array([d for _, d in best], pa.int64()),
            "score": pa.array([-s for s, _ in best], pa.float64()),
            "rank": pa.array(range(1, len(best) + 1), pa.int32()),
        }
    )


def source_stats(ds, text_col: str = "text", strat_col: str = "source"):
    """Per-source corpus rollup → (source, n_docs, n_tokens, n_chars,
    mean_tokens) — the "how much of each source do I have, how long is it"
    curation dashboard query.

    Integer partials per batch (one row per source per batch), one
    source-count-bounded groupby, then a single exact double division for
    the mean — no float summation anywhere, so the oracle match is exact."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column(strat_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = _dict_encode(src)
        idx = d.indices.to_numpy(zero_copy_only=False)
        nsrc = len(d.dictionary)
        toks = pc.count_substring_regex(
            batch.column(text_col), r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        chars = pc.utf8_length(batch.column(text_col)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "source": d.dictionary,
                "n_docs": pa.array(np.bincount(idx, minlength=nsrc), pa.int64()),
                "n_tokens": pa.array(
                    np.bincount(idx, weights=toks, minlength=nsrc).astype(np.int64),
                    pa.int64(),
                ),
                "n_chars": pa.array(
                    np.bincount(idx, weights=chars, minlength=nsrc).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )

    def add_mean(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(
            "mean_tokens",
            pa.array(np.divide(nt, nd, out=np.zeros_like(nt), where=nd > 0),
                     pa.float64()),
        )

    return agg.map_batches(add_mean, batch_format="pyarrow")


def token_length_percentiles(
    ds, ps: tuple = (25, 50, 75, 95, 99), text_col: str = "text"
):
    """EXACT percentiles of the per-doc token-count distribution —
    ``(p, n_tokens)`` — computed as a bounded histogram, never a global
    sort.

    Scale shape: a full-sort percentile is an all-to-all; but token counts
    are small ints (distinct values ≤ max doc length, ~10^5 even for book
    corpora), so the histogram ``(n_tokens, cnt)`` after per-batch
    ``np.unique`` partials + one vocabulary-bounded groupby is tiny.  The
    driver-side cumsum runs over that bounded table only — same contract as
    ``word_count``'s vocabulary bound.

    Percentile-disc semantics (match DuckDB ``percentile_disc``): the
    value at 1-based rank ``ceil(p/100 * N)`` of the sorted counts."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ntok = (
            pc.count_substring_regex(batch.column(text_col), r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        vals, cnts = np.unique(ntok, return_counts=True)
        return pa.table(
            {"n_tokens": pa.array(vals, pa.int64()),
             "cnt": pa.array(cnts, pa.int64())}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: one row per distinct token count
        .sort_values("n_tokens")
    )
    cum = hist["cnt"].cumsum().to_numpy()
    vals = hist["n_tokens"].to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for p in ps:
        k = max(1, math.ceil(p / 100.0 * n))
        out.append(int(vals[np.searchsorted(cum, k)]) if n else None)
    return pa.table(
        {"p": pa.array(list(ps), pa.int64()),
         "n_tokens": pa.array(out, pa.int64())}
    )


# The one JSON field the events fixture carries; a real pipeline would take
# a field list.  Extraction is pc.extract_regex — VECTORIZED, no per-row
# json.loads — valid because the field is a flat scalar (the pattern
# anchors on the quoted key, tolerating whitespace).
_PROPS_K_RE = r'"k"\s*:\s*(?P<k>-?\d+)'


def json_field_stats(ds, props_col: str = "props", key_col: str = "event_type"):
    """Per-``event_type`` stats of the integer JSON property ``k`` inside
    the ``props`` string column → ``(event_type, n, sum_k, mean_k)``.

    The parse is an Arrow regex kernel per batch (zero Python rows); the
    rollup pre-aggregates per batch before one key-bounded groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(props_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        k = pc.cast(
            pc.struct_field(pc.extract_regex(col, _PROPS_K_RE), "k"),
            pa.int64(),
        )
        key = batch.column(key_col)
        d = _dict_encode(key)
        idx = d.indices.to_numpy(zero_copy_only=False)
        kv = k.fill_null(0).to_numpy(zero_copy_only=False)
        present = pc.is_valid(k).to_numpy(zero_copy_only=False).astype(np.int64)
        nkey = len(d.dictionary)
        return pa.table(
            {
                key_col: d.dictionary,
                "n": pa.array(np.bincount(idx, weights=present,
                                          minlength=nkey).astype(np.int64)),
                "sum_k": pa.array(np.bincount(idx, weights=kv * present,
                                              minlength=nkey).astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
    )

    def add_mean(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("sum_k").to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(
            "mean_k",
            pa.array(np.divide(s, n, out=np.zeros_like(s), where=n > 0),
                     pa.float64()),
        )

    return agg.map_batches(add_mean, batch_format="pyarrow")


def bigram_counts(ds, text_col: str = "text"):
    """Corpus bigram frequencies over lowered whitespace tokens →
    (bigram, cnt), bigram = "tokᵢ tokᵢ₊₁" within one document.

    Vectorized: one Arrow split per batch, adjacency by doc-index equality,
    pair strings via ``binary_join_element_wise`` (no per-row Python),
    dictionary-encode + bincount partial — the exchange is
    bigram-vocabulary-bounded per batch, never one row per token.  The
    merge buckets by bigram hash (see word_count): the bigram vocabulary
    grows ~quadratically with the unigram one, so a raw
    ``groupby("bigram")`` sort shuffle is the measured 33× string-key
    anti-pattern at open vocabulary."""
    from ..functions.arrowutil import string_buckets

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, doc_idx = _flat_tokens(batch, text_col)
        empty = pa.table({"wb": pa.array([], pa.int32()),
                          "bigram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        adj = doc_idx[:-1] == doc_idx[1:]
        if not adj.any():
            return empty
        pairs = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        ).filter(pa.array(adj))
        d = _dict_encode(pairs)
        counts = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table(
            {"wb": pa.array(string_buckets(d.dictionary, 64), pa.int32()),
             "bigram": d.dictionary, "cnt": pa.array(counts, pa.int64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("bigram"))
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("cnt").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        ).astype(np.int64)
        return pa.table(
            {"bigram": d.dictionary, "cnt": pa.array(cnt, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("wb").map_groups(merge, batch_format="pyarrow")


def topk_bigrams(ds, k: int = 20, text_col: str = "text"):
    """Top-k bigrams (cnt desc, bigram asc tiebreak) — same
    vocabulary-bounded driver top-k as :func:`topk_terms`."""
    t = bigram_counts(ds, text_col=text_col).to_pandas()
    t = t.sort_values(["cnt", "bigram"], ascending=[False, True],
                      kind="mergesort")
    return pa.Table.from_pandas(t.head(k).reset_index(drop=True))


def top_revenue_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
    num_buckets: int = 32,
):
    """TPC-H-Q3-style: top-k unshipped orders of one market segment by
    revenue → ``(l_orderkey, o_orderdate, o_orderpriority, revenue_e4,
    revenue)``.

    Revenue is summed in integer 1e-4 units
    (``floor(price·100+0.5) · floor((1−disc)·100+0.5)``) so the aggregate
    is exact — float revenue sums are addition-order-dependent and would
    never hash-match an oracle; the double ``revenue`` column is one final
    expression over the exact int.

    Scale shape (customer is NOT broadcastable at TPC-H scale, cf.
    orders_per_nation): (1) orders semi-join the segment's custkeys by
    custkey-hash co-partition; (2) lineitem pre-aggregates revenue per
    orderkey per batch (integer partials), then joins the surviving orders
    by orderkey-hash co-partition; (3) per-bucket top-k then a tiny driver
    merge of B·k rows."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.arrowutil import id_buckets
    from .dedup import _flat_arr

    cut = np.datetime64(cutoff)

    def cust_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("c_mktsegment"), segment))
        n = t.num_rows
        return pa.table(
            {
                "kb": pa.array(
                    id_buckets(t.column("c_custkey"), num_buckets), pa.int32()
                ),
                "role": pa.array(np.ones(n, np.int8)),
                "custkey": t.column("c_custkey"),
                "orderkey": pa.array(np.zeros(n, np.int64)),
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(n, pa.string()),
            }
        )

    custkeys = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_rows, batch_format="pyarrow")

    def order_rows(b: pa.Table) -> pa.Table:
        dates = b.column("o_orderdate")
        if isinstance(dates, pa.ChunkedArray):
            dates = dates.combine_chunks()
        keep = pc.less(dates, pa.scalar(cut.astype("datetime64[us]")))
        t = b.filter(keep)
        return pa.table(
            {
                "kb": pa.array(
                    id_buckets(t.column("o_custkey"), num_buckets), pa.int32()
                ),
                "role": pa.array(np.zeros(t.num_rows, np.int8)),
                "custkey": t.column("o_custkey"),
                "orderkey": t.column("o_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pyarrow")

    def semi_join(group: pa.Table) -> pa.Table:
        o = group.filter(pc.equal(group.column("role"), 0))
        c = group.filter(pc.equal(group.column("role"), 1))
        idx = pc.index_in(
            _flat_arr(o.column("custkey")),
            value_set=_flat_arr(c.column("custkey")),
        )
        keep = pc.is_valid(idx)
        t = o.filter(keep)
        return pa.table(
            {
                "ob": pa.array(
                    id_buckets(t.column("orderkey"), num_buckets), pa.int32()
                ),
                "role": pa.array(np.zeros(t.num_rows, np.int8)),
                "orderkey": t.column("orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
                "rev": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    qualified = (
        orders.union(custkeys).groupby("kb").map_groups(
            semi_join, batch_format="pyarrow"
        )
    )

    def rev_partial(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate")
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        t = b.filter(pc.greater(ship, pa.scalar(cut.astype("datetime64[us]"))))
        keys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = (
            np.floor(price * 100.0 + 0.5).astype(np.int64)
            * np.floor((1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        )
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=rev).astype(np.int64)
        # exactness: per-batch revenues stay far below 2^53 (bincount
        # weights are float64), and the cross-batch reduce below is int64
        return pa.table(
            {
                "ob": pa.array(
                    id_buckets(pa.array(uniq, pa.int64()), num_buckets),
                    pa.int32(),
                ),
                "role": pa.array(np.ones(len(uniq), np.int8)),
                "orderkey": pa.array(uniq, pa.int64()),
                "o_orderdate": pa.nulls(len(uniq), pa.timestamp("us")),
                "o_orderpriority": pa.nulls(len(uniq), pa.string()),
                "rev": pa.array(sums, pa.int64()),
            }
        )

    revs = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(rev_partial, batch_format="pyarrow")

    def join_topk(group: pa.Table) -> pa.Table:
        from ..functions.arrowutil import first_of_run_mask

        o = group.filter(pc.equal(group.column("role"), 0))
        r = group.filter(pc.equal(group.column("role"), 1))
        if o.num_rows == 0 or r.num_rows == 0:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "o_orderdate": pa.array([], pa.timestamp("us")),
                 "o_orderpriority": pa.array([], pa.string()),
                 "revenue_e4": pa.array([], pa.int64())}
            )
        r = r.sort_by([("orderkey", "ascending")])
        rk = _flat_arr(r.column("orderkey"))
        first = first_of_run_mask([rk])
        sums = np.add.reduceat(
            r.column("rev").to_numpy(zero_copy_only=False),
            np.flatnonzero(first),
        )
        rkeys = rk.filter(pa.array(first))
        idx = pc.index_in(_flat_arr(o.column("orderkey")), value_set=rkeys)
        pos = idx.to_numpy(zero_copy_only=False)
        valid = ~pc.is_null(idx).to_numpy(zero_copy_only=False)
        o = o.filter(pa.array(valid))
        rev = sums[pos[valid].astype(np.int64)]
        order = np.lexsort(
            (o.column("orderkey").to_numpy(zero_copy_only=False), -rev)
        )[:k]
        t = o.take(pa.array(order))
        return pa.table(
            {
                "l_orderkey": t.column("orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
                "revenue_e4": pa.array(rev[order], pa.int64()),
            }
        )

    parts = [
        b
        for b in qualified.union(revs).groupby("ob").map_groups(
            join_topk, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "o_orderpriority": pa.array([], pa.string()),
             "revenue_e4": pa.array([], pa.int64()),
             "revenue": pa.array([], pa.float64())}
        )
    allp = pa.concat_tables(parts)
    rev = allp.column("revenue_e4").to_numpy(zero_copy_only=False)
    keys = allp.column("l_orderkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((keys, -rev))[:k]
    t = allp.take(pa.array(order))
    return t.append_column(
        "revenue",
        pa.array(
            t.column("revenue_e4").to_numpy(zero_copy_only=False)
            .astype(np.float64) / 10000.0,
            pa.float64(),
        ),
    )


def window_events(ds, num_buckets: int = 64):
    """Per-user window functions over the events table — the classic
    ``OVER (PARTITION BY user_id ORDER BY ts, event_id)`` family the
    reference has no analogue for (SURVEY.md §2.10 streaming/window gap):
    per event, ``rn`` = 1-based row number, ``prev_gap_us`` = microseconds
    since the user's previous event (-1 for the first), ``cum_cents`` =
    running sum of ``floor(value*100)`` as int64 (integer cents so the
    running sum is associativity-independent and bit-exact vs any SQL
    engine's window-frame accumulation order — a float running sum is not).

    Distribution shape: one user-hash bucket exchange (B groups, same
    pattern as ``sessionize``); inside each group one lexsort + numpy
    prefix kernels — no per-row Python, no global sort.  At 100 TB the
    exchange moves only (event_id, user_id, ts, cents) narrow rows and
    each user's history lands on one task; skewed users bound a task at
    one user's rows, not the corpus.
    """
    from ..functions.arrowutil import id_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pa.array(
            np.floor(
                batch.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "cents": cents,
                "bucket": pa.array(
                    id_buckets(batch.column("user_id"), num_buckets),
                    pa.int32(),
                ),
            }
        )

    def bucket_windows(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks()
        d = _dict_encode(uid)
        codes = d.indices.to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, codes))
        codes_s, ts_s, cents_s = codes[order], ts[order], cents[order]
        n = len(order)
        user_change = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        # index of each user's first row, forward-filled (robust to any
        # sign of cents, unlike a cumsum-monotonicity trick)
        first_idx = np.maximum.accumulate(
            np.where(user_change, np.arange(n), 0)
        )
        rn = np.arange(n) - first_idx + 1
        prev_gap = np.empty(n, np.int64)
        prev_gap[0] = -1
        prev_gap[1:] = ts_s[1:] - ts_s[:-1]
        prev_gap[user_change] = -1
        cum = np.cumsum(cents_s)
        cum_base = cum[first_idx] - cents_s[first_idx]
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": uid.take(pa.array(order)),
                "rn": pa.array(rn, pa.int64()),
                "prev_gap_us": pa.array(prev_gap, pa.int64()),
                "cum_cents": pa.array(cum - cum_base, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_windows, batch_format="pyarrow")
    )


def moving_avg_events(ds, k: int = 7, num_buckets: int = 64):
    """Per-user rolling mean over the last ``k`` events — the bounded-frame
    member of the window family (``AVG(...) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``)
    → ``(event_id, user_id, wsum_cents, wn, mov_avg)``.

    Exactness: the frame sum is integer cents via a segmented
    cumulative-sum difference (window sums are associativity-independent),
    ``mov_avg`` is the single double division ``wsum/wn`` — the one IEEE
    op SQL performs on the same exact integers.  Distribution shape:
    identical to :func:`window_events` (one user-hash bucket exchange,
    lexsort + numpy prefix kernels per bucket, no global sort; a skewed
    user bounds one task at its own rows)."""
    from ..functions.arrowutil import id_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                batch.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "cents": cents,
                "bucket": pa.array(
                    id_buckets(batch.column("user_id"), num_buckets),
                    pa.int32(),
                ),
            }
        )

    def bucket_roll(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks()
        d = _dict_encode(uid)
        codes = d.indices.to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, codes))
        codes_s, cents_s = codes[order], cents[order]
        n = len(order)
        user_change = np.concatenate(
            ([True], codes_s[1:] != codes_s[:-1])
        ) if n else np.array([], bool)
        first_idx = np.maximum.accumulate(
            np.where(user_change, np.arange(n), 0)
        )
        idx = np.arange(n)
        start = np.maximum(first_idx, idx - k + 1)
        cs = np.cumsum(cents_s)
        prev = start - 1
        wsum = cs - np.where(prev >= 0, cs[np.maximum(prev, 0)], 0)
        wn = idx - start + 1
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": uid.take(pa.array(order)),
                "wsum_cents": pa.array(wsum, pa.int64()),
                "wn": pa.array(wn.astype(np.int64), pa.int64()),
                "mov_avg": pa.array(
                    wsum.astype(np.float64) / wn, pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_roll, batch_format="pyarrow")
    )


def revenue_by_nation(
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1995-01-01",
    date_to: str = "1996-01-01",
    num_buckets: int = 32,
):
    """TPC-H-Q5-style: per-nation revenue from local commerce (customer and
    supplier in the same nation, nation in ``region``, one order-date year)
    → ``(n_name, revenue_e4, revenue)``.

    The six-table join decomposes by side size: region/nation (≤25 rows)
    resolve on the driver; supplier and customer nationkeys broadcast as
    dense int8 arrays (1 byte per key — the orders_per_nation pattern, good
    to ~10^9 keys); the genuinely large ⨝ large step — lineitem ⨝ orders —
    goes through the generic ``hash_join`` after BOTH sides pre-filter to
    the region and lineitem pre-aggregates ``(orderkey, supp_nation)``
    integer revenue partials per batch, so the exchange carries only
    region-local narrow rows.  Revenue is summed in integer 1e-4 units
    (cf. top_revenue_orders) — exact under any accumulation order.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .join import hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = {
        int(k)
        for k, n in zip(reg.column("r_regionkey").to_pylist(),
                        reg.column("r_name").to_pylist())
        if n == region
    }
    nk_all = nation.column("n_nationkey").to_numpy(zero_copy_only=False)
    n_nations = int(nk_all.max()) + 1
    asia = np.zeros(n_nations, bool)
    for k, rk in zip(nk_all,
                     nation.column("n_regionkey").to_numpy(zero_copy_only=False)):
        asia[int(k)] = int(rk) in rkeys
    name_of = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))

    def nk_array(path: str, key: str, nk: str) -> np.ndarray:
        t = pq.read_table(path, columns=[key, nk])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        vals = t.column(nk).to_numpy(zero_copy_only=False)
        arr = np.full(int(keys.max()) + 1, -1, np.int8)
        arr[keys] = vals.astype(np.int8)
        return arr

    cust_ref = ray.put(nk_array(f"{sf_dir}/customer.parquet",
                                "c_custkey", "c_nationkey"))
    supp_ref = ray.put(nk_array(f"{sf_dir}/supplier.parquet",
                                "s_suppkey", "s_nationkey"))
    lo = np.datetime64(date_from).astype("datetime64[us]")
    hi = np.datetime64(date_to).astype("datetime64[us]")

    class OrderRows:
        def __init__(self):
            self.nation_of = ray.get(cust_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            d = b.column("o_orderdate")
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                           pc.less(d, pa.scalar(hi)))
            t = b.filter(keep)
            nks = self.nation_of[
                t.column("o_custkey").to_numpy(zero_copy_only=False)
            ]
            local = asia[nks] & (nks >= 0)
            t = t.filter(pa.array(local))
            return pa.table(
                {
                    "orderkey": t.column("o_orderkey"),
                    "cnk": pa.array(nks[local], pa.int8()),
                }
            )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(OrderRows, batch_format="pyarrow", concurrency=(1, 8))

    class ItemRows:
        def __init__(self):
            self.nation_of = ray.get(supp_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            nks = self.nation_of[
                b.column("l_suppkey").to_numpy(zero_copy_only=False)
            ]
            local = asia[nks] & (nks >= 0)
            t = b.filter(pa.array(local))
            price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = t.column("l_discount").to_numpy(zero_copy_only=False)
            rev = (
                np.floor(price * 100.0 + 0.5).astype(np.int64)
                * np.floor((1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            )
            part = pa.table(
                {
                    "orderkey": t.column("l_orderkey"),
                    "snk": pa.array(nks[local], pa.int8()),
                    "rev_e4": pa.array(rev, pa.int64()),
                }
            ).group_by(["orderkey", "snk"]).aggregate([("rev_e4", "sum")])
            return part.rename_columns(["orderkey", "snk", "rev_e4"])

    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(ItemRows, batch_format="pyarrow", concurrency=(1, 8))

    joined = hash_join(items, orders, on="orderkey",
                       num_buckets=num_buckets)

    def partial(b: pa.Table) -> pa.Table:
        snk = b.column("snk").to_numpy(zero_copy_only=False)
        cnk = b.column("cnk").to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(snk == cnk))
        p = pa.table(
            {
                "n_nationkey": t.column("snk").cast(pa.int32()),
                "revenue_e4": t.column("rev_e4"),
            }
        ).group_by("n_nationkey").aggregate([("revenue_e4", "sum")])
        return p.rename_columns(["n_nationkey", "revenue_e4"])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_nationkey").aggregate(Sum("revenue_e4",
                                              alias_name="revenue_e4"))

    def add_name(b: pa.Table) -> pa.Table:
        names = [name_of[int(k)]
                 for k in b.column("n_nationkey").to_pylist()]
        e4 = b.column("revenue_e4").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_e4": b.column("revenue_e4"),
                "revenue": pa.array(e4.astype(np.float64) / 10000.0,
                                    pa.float64()),
            }
        )

    return agg.map_batches(add_name, batch_format="pyarrow")


def orders_rollup(ds):
    """ROLLUP(o_orderstatus, o_orderpriority) over orders → order counts
    and integer-cent totalprice sums at three grouping levels: leaf
    (status, priority), per status, and grand total — rolled-up columns
    carry the sentinel ``'ALL'`` (no real status/priority collides).

    Scale shape: the leaf key space is bounded (|status| × |priority| ≈ 15)
    so each batch pre-aggregates to ≤15 narrow rows, one tiny groupby
    merges them, and the rollup levels are derived from the leaf aggregate
    itself (bounded rows — never a second pass over the data).  Sums are
    integer cents, exact under any accumulation order."""

    def partial(b: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                b.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64),
            pa.int64(),
        )
        t = pa.table(
            {
                "o_orderstatus": b.column("o_orderstatus"),
                "o_orderpriority": b.column("o_orderpriority"),
                "cents": cents,
            }
        ).group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return t.rename_columns(
            ["o_orderstatus", "o_orderpriority", "total_cents", "n_orders"]
        )

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )

    def rollup(b: pa.Table) -> pa.Table:
        # bounded input (leaf key space); emits all three grouping levels
        status = b.column("o_orderstatus").to_pylist()
        prio = b.column("o_orderpriority").to_pylist()
        cents = b.column("total_cents").to_numpy(zero_copy_only=False)
        n = b.column("n_orders").to_numpy(zero_copy_only=False)
        rows_s, rows_p, rows_c, rows_n = list(status), list(prio), \
            list(cents), list(n)
        by_status: dict[str, list[int]] = {}
        for i, s in enumerate(status):
            by_status.setdefault(s, []).append(i)
        for s, idx in sorted(by_status.items()):
            rows_s.append(s)
            rows_p.append("ALL")
            rows_c.append(int(cents[idx].sum()))
            rows_n.append(int(n[idx].sum()))
        rows_s.append("ALL")
        rows_p.append("ALL")
        rows_c.append(int(cents.sum()))
        rows_n.append(int(n.sum()))
        return pa.table(
            {
                "o_orderstatus": pa.array(rows_s, pa.string()),
                "o_orderpriority": pa.array(rows_p, pa.string()),
                "total_cents": pa.array(rows_c, pa.int64()),
                "n_orders": pa.array(rows_n, pa.int64()),
            }
        )

    return leaf.repartition(1).map_batches(
        rollup, batch_format="pyarrow", batch_size=None
    )


def topn_events_per_user(ds, n: int = 3, num_buckets: int = 64):
    """Per-user top-n events by ``(value DESC, event_id ASC)`` with their
    1-based rank — the ``QUALIFY ROW_NUMBER() <= n`` shape.

    Scale shape: each batch first keeps only its own per-user top-n (a
    combiner — correct because the global top-n under a total order is a
    subset of every superset's top-n), so the user-hash exchange carries
    ≤ n rows per (user, batch); the per-bucket pass re-ranks and filters
    with one lexsort, no per-row Python."""
    from ..functions.arrowutil import id_buckets

    def rank_filter(t: pa.Table, with_bucket: bool) -> pa.Table:
        uid = t.column("user_id").combine_chunks()
        d = _dict_encode(uid)
        codes = d.indices.to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, codes))
        codes_s = codes[order]
        user_change = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        m = len(order)
        first_idx = np.maximum.accumulate(
            np.where(user_change, np.arange(m), 0)
        )
        rk = np.arange(m) - first_idx + 1
        keep = rk <= n
        sel = order[keep]
        cols = {
            "event_id": pa.array(eid[sel]),
            "user_id": uid.take(pa.array(sel)),
            "value": pa.array(val[sel], pa.float64()),
            "rk": pa.array(rk[keep], pa.int64()),
        }
        if with_bucket:
            cols["bucket"] = pa.array(
                id_buckets(cols["user_id"], num_buckets), pa.int32()
            )
        return pa.table(cols)

    def combine(batch: pa.Table) -> pa.Table:
        return rank_filter(batch, with_bucket=True)

    def final(group: pa.Table) -> pa.Table:
        return rank_filter(group, with_bucket=False)

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_value_percentiles(
    ds, ps: tuple = (25, 50, 75, 95, 99),
    group_col: str = "event_type", value_col: str = "value",
):
    """EXACT per-group percentiles of a 2-decimal money column →
    ``(group, p, cents, value)`` — percentile-disc semantics (the value at
    1-based rank ``ceil(p/100·N)`` within the group), computed from a
    bounded ``(group, cents)`` histogram, never a global sort (the grouped
    twin of ``token_length_percentiles``; for unbounded float columns use
    ``sketch.sampled_percentiles``).

    The histogram bound is |groups| × |distinct cents| — for bounded-range
    money values a few-hundred-k narrow rows regardless of corpus size."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                batch.column(value_col).to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64),
            pa.int64(),
        )
        t = pa.table(
            {group_col: batch.column(group_col), "cents": cents}
        ).group_by([group_col, "cents"]).aggregate([("cents", "count")])
        return t.rename_columns([group_col, "cents", "cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: |groups| × |distinct cents|
        .sort_values([group_col, "cents"])
    )
    out_g, out_p, out_c = [], [], []
    for g, sub in hist.groupby(group_col, sort=True):
        cum = sub["cnt"].cumsum().to_numpy()
        vals = sub["cents"].to_numpy()
        n = int(cum[-1])
        for p in ps:
            k = max(1, math.ceil(p / 100.0 * n))
            out_g.append(g)
            out_p.append(p)
            out_c.append(int(vals[np.searchsorted(cum, k)]))
    return pa.table(
        {
            group_col: pa.array(out_g, pa.string()),
            "p": pa.array(out_p, pa.int64()),
            "cents": pa.array(out_c, pa.int64()),
            "value": pa.array(
                np.asarray(out_c, np.float64) / 100.0, pa.float64()
            ),
        }
    )


def robust_stats_by_group(
    ds, group_col: str = "event_type", value_col: str = "value",
):
    """EXACT per-group median + MAD (median absolute deviation) of a
    2-decimal money column → ``(group, n, med_cents, mad_cents, median,
    mad)`` — the robust-statistics outlier screen (median ± k·MAD), both
    with percentile-disc semantics (value at 1-based rank ``ceil(N/2)``).

    ONE distributed pass: the same bounded ``(group, cents)`` histogram as
    :func:`grouped_value_percentiles`; the deviation distribution is then a
    RELABELING of that histogram (each distinct cents value maps to
    ``|cents - median|`` carrying its count), so MAD needs no second pass
    over the data — the driver re-sorts the bounded histogram, never the
    corpus."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                batch.column(value_col).to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64),
            pa.int64(),
        )
        t = pa.table(
            {group_col: batch.column(group_col), "cents": cents}
        ).group_by([group_col, "cents"]).aggregate([("cents", "count")])
        return t.rename_columns([group_col, "cents", "cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: |groups| × |distinct cents|
        .sort_values([group_col, "cents"])
    )
    out = {k: [] for k in ("g", "n", "med", "mad")}
    for g, sub in hist.groupby(group_col, sort=True):
        vals = sub["cents"].to_numpy()
        cnt = sub["cnt"].to_numpy()
        cum = cnt.cumsum()
        n = int(cum[-1])
        k = max(1, math.ceil(0.5 * n))
        med = int(vals[np.searchsorted(cum, k)])
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        cumd = cnt[order].cumsum()
        mad = int(dev[order][np.searchsorted(cumd, k)])
        out["g"].append(g)
        out["n"].append(n)
        out["med"].append(med)
        out["mad"].append(mad)
    return pa.table(
        {
            group_col: pa.array(out["g"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "med_cents": pa.array(out["med"], pa.int64()),
            "mad_cents": pa.array(out["mad"], pa.int64()),
            "median": pa.array(
                np.asarray(out["med"], np.float64) / 100.0, pa.float64()
            ),
            "mad": pa.array(
                np.asarray(out["mad"], np.float64) / 100.0, pa.float64()
            ),
        }
    )


def funnel_counts(
    ds,
    first_type: str = "view",
    then_type: str = "purchase",
    within_minutes: int = 60,
    num_buckets: int = 64,
):
    """Two-step funnel over the events table → one row
    ``(n_users, n_entered, n_converted)``: of the users who ever emitted
    ``first_type``, how many emitted ``then_type`` within
    ``within_minutes`` AFTER (strictly later than) some ``first_type``
    event — the product-analytics conversion query.

    Scale shape: the user-hash bucket exchange ships only
    ``(user_id, ts, is_first)`` narrow rows for the two event types; per
    bucket one lexsort + a vectorized sorted-window probe
    (``searchsorted`` of each step-2 event into its user's step-1 times)
    decides conversion; per-bucket partial counts (3 ints) merge in a
    tiny final task."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import id_buckets

    gap_us = within_minutes * 60 * 1_000_000

    def narrow(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, first_type), pc.equal(et, then_type))
        t = batch.filter(keep)
        is_first = pc.equal(t.column("event_type"), first_type)
        return pa.table(
            {
                "bucket": pa.array(
                    id_buckets(t.column("user_id"), num_buckets), pa.int32()
                ),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "is_first": is_first,
            }
        )

    def all_users(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column("user_id").combine_chunks())
        return pa.table(
            {"bucket": pa.array(id_buckets(u, num_buckets), pa.int32()),
             "user_id": u}
        )

    def _count_lt(u_f, t_f, u_q, t_q):
        """Vectorized per-user rank: for each query (u_q, t_q), the number
        of firsts of the same user with time STRICTLY below t_q — the
        merge-rank trick (one lexsort over firsts+queries), no per-user
        Python loop."""
        nf, nq = len(u_f), len(u_q)
        u = np.concatenate([u_f, u_q])
        t = np.concatenate([t_f, t_q])
        is_q = np.concatenate(
            [np.zeros(nf, np.int8), np.ones(nq, np.int8)]
        )
        # per user, by time; at equal time queries sort BEFORE firsts so
        # the prefix count excludes ties (strict <)
        order = np.lexsort((-is_q, t, u))
        u_s, q_s = u[order], is_q[order]
        cum_f = np.cumsum(q_s == 0)
        user_change = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        first_idx = np.maximum.accumulate(
            np.where(user_change, np.arange(len(u_s)), 0)
        )
        base = cum_f[first_idx] - (q_s[first_idx] == 0)
        cnt_incl = cum_f - base  # firsts ≤ position, within user
        # at a query position the inclusive count == strict-below count
        out = np.empty(nq, np.int64)
        out[np.maximum(order - nf, 0)[q_s == 1]] = cnt_incl[q_s == 1]
        return out

    def bucket_funnel(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks()
        d = _dict_encode(uid)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        isf = group.column("is_first").to_numpy(zero_copy_only=False)
        u_f, t_f = codes[isf], ts[isf]
        u_q, t_q = codes[~isf], ts[~isf]
        nd = len(d.dictionary)
        entered = np.bincount(u_f, minlength=nd) > 0
        hi = _count_lt(u_f, t_f, u_q, t_q)
        lo = _count_lt(u_f, t_f, u_q, t_q - gap_us)
        conv_q = hi > lo  # ≥1 first inside [t-gap, t)
        converted = np.bincount(
            u_q[conv_q], minlength=nd
        ) > 0
        return pa.table(
            {
                "n_users": pa.array([nd], pa.int64()),
                "n_entered": pa.array([int(entered.sum())], pa.int64()),
                "n_converted": pa.array([int(converted.sum())], pa.int64()),
            }
        )

    rows = ds.map_batches(narrow, batch_format="pyarrow")
    users = ds.map_batches(all_users, batch_format="pyarrow")
    # users with NEITHER step still count in n_users: union distinct users
    # per bucket via the funnel group's dictionary…  the narrow rows only
    # carry step users, so n_users comes from the users stream instead
    per_bucket = rows.groupby("bucket").map_groups(
        bucket_funnel, batch_format="pyarrow"
    ).to_pandas()

    def user_partial(group: pa.Table) -> pa.Table:
        u = pc.unique(group.column("user_id").combine_chunks())
        return pa.table({"n": pa.array([len(u)], pa.int64())})

    n_users = int(
        users.groupby("bucket").map_groups(
            user_partial, batch_format="pyarrow"
        ).to_pandas()["n"].sum()
    )
    return pa.table(
        {
            "n_users": pa.array([n_users], pa.int64()),
            "n_entered": pa.array(
                [int(per_bucket["n_entered"].sum())], pa.int64()
            ),
            "n_converted": pa.array(
                [int(per_bucket["n_converted"].sum())], pa.int64()
            ),
        }
    )


def retention_cohorts(
    ds,
    cohort_type: str = "signup",
    horizons: tuple = (1, 7),
    num_buckets: int = 64,
):
    """Cohort retention over the events table → per cohort day (the day of
    a user's FIRST ``cohort_type`` event, as days-since-epoch):
    ``(cohort_day, n_cohort, n_d{h}...)`` where ``n_d{h}`` counts cohort
    users with ANY event exactly ``h`` days after their cohort day.

    Scale shape: the user-hash bucket exchange carries deduped
    ``(user, day, is_cohort)`` rows (per-batch distinct combiner); per
    bucket the cohort day is a sorted-run min and each horizon probe is
    one ``searchsorted`` on the (user, day) composite — no per-user
    Python; per-bucket partials are one row per cohort day and merge in a
    small day-keyed groupby."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import id_buckets

    def narrow(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor(
                pc.divide(
                    pc.cast(batch.column("ts").cast(pa.int64()), pa.float64()),
                    86_400_000_000.0,
                )
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": day,
                "is_cohort": pc.cast(
                    pc.equal(batch.column("event_type"), cohort_type),
                    pa.int8(),
                ),
            }
        ).group_by(["user_id", "day"]).aggregate([("is_cohort", "max")])
        t = t.rename_columns(["user_id", "day", "is_cohort"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    def bucket_cohorts(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks()
        d = _dict_encode(uid)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        day = group.column("day").to_numpy(zero_copy_only=False)
        isc = group.column("is_cohort").to_numpy(zero_copy_only=False) > 0
        nd = len(d.dictionary)
        # cohort day = min day with a cohort event, per user
        cohort = np.full(nd, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cohort, codes[isc], day[isc])
        in_cohort = cohort != np.iinfo(np.int64).max
        # composite sorted key over the (user, day) rows; span covers the
        # largest horizon so a probe can never alias into the next user's
        # key range
        span = (int(day.max() - day.min()) + max(horizons) + 2) \
            if len(day) else 1
        base_day = int(day.min()) if len(day) else 0
        key_s = np.sort(codes * span + (day - base_day))
        users = np.flatnonzero(in_cohort)
        tbl = {"cohort_day": cohort[users],
               "n_cohort": np.ones(len(users), np.int64)}
        for h in horizons:
            probe = users * span + (cohort[users] + h - base_day)
            idx = np.searchsorted(key_s, probe, side="left")
            hit = (idx < len(key_s)) & (key_s[np.minimum(idx, len(key_s) - 1)]
                                        == probe)
            tbl[f"n_d{h}"] = hit.astype(np.int64)
        p = pa.table({k: pa.array(v) for k, v in tbl.items()})
        aggs = [("n_cohort", "sum")] + [(f"n_d{h}", "sum") for h in horizons]
        g = p.group_by("cohort_day").aggregate(aggs)
        return g.rename_columns(
            ["cohort_day", "n_cohort"] + [f"n_d{h}" for h in horizons]
        )

    partials = (
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_cohorts, batch_format="pyarrow")
    )
    from ray.data.aggregate import Sum as _Sum

    aggs = [_Sum("n_cohort", alias_name="n_cohort")] + [
        _Sum(f"n_d{h}", alias_name=f"n_d{h}") for h in horizons
    ]
    return partials.groupby("cohort_day").aggregate(*aggs)


def zipf_stats(ds, text_col: str = "text"):
    """Corpus token-distribution skew report → one row
    ``(n_tokens, n_distinct, top1_cnt, sum_c_lnc_u, entropy_nats)``.

    ``sum_c_lnc_u = Σ c·⌊ln(c)·10⁶⌋`` over term counts (integer
    micro-nats — the unigram_logprob idiom, exact under any accumulation
    order) gives corpus unigram entropy ``H = ln(N) − Σc·ln(c)/N`` as one
    final float expression; heavy-hitter share is ``top1_cnt/n_tokens``.
    Built on :func:`word_count`, so the only exchange is the bucketed
    vocabulary merge; the skew report itself reduces the vocab table."""
    t = word_count(ds, text_col=text_col).to_pandas()  # vocab-bounded
    if len(t) == 0:
        return pa.table(
            {"n_tokens": pa.array([0], pa.int64()),
             "n_distinct": pa.array([0], pa.int64()),
             "top1_cnt": pa.array([0], pa.int64()),
             "sum_c_lnc_u": pa.array([0], pa.int64()),
             "entropy_nats": pa.array([0.0], pa.float64())}
        )
    c = t["cnt"].to_numpy()
    n = int(c.sum())
    lnc_u = np.floor(np.log(c.astype(np.float64)) * 1_000_000.0).astype(
        np.int64
    )
    s = int((c * lnc_u).sum())
    entropy = float(np.log(float(n)) - (s / 1_000_000.0) / n)
    return pa.table(
        {"n_tokens": pa.array([n], pa.int64()),
         "n_distinct": pa.array([len(c)], pa.int64()),
         "top1_cnt": pa.array([int(c.max())], pa.int64()),
         "sum_c_lnc_u": pa.array([s], pa.int64()),
         "entropy_nats": pa.array([entropy], pa.float64())}
    )


def distinct_users_per_type(ds, num_buckets: int = 64):
    """EXACT distinct users per event_type → ``(event_type, n_users)`` —
    the exact twin of the HLL estimate (``sketch.hll_distinct``): per
    batch the DISTINCT (event_type, user) pairs (combiner), one
    user-hash-bucketed exchange of those narrow pairs, per-bucket global
    dedup + per-type count, then a tiny type-keyed sum.  Raw rows never
    shuffle; the exchange is bounded by distinct pairs per batch."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import first_of_run_mask, id_buckets

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["event_type", "user_id"]) \
            .group_by(["event_type", "user_id"]).aggregate([])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    def dedup_count(group: pa.Table) -> pa.Table:
        t = group.sort_by([("event_type", "ascending"),
                           ("user_id", "ascending")])
        first = first_of_run_mask(
            [t.column("event_type"), t.column("user_id")]
        )
        t = t.filter(pa.array(first))
        g = t.select(["event_type"]).append_column(
            "n", pa.array(np.ones(t.num_rows, np.int64))
        ).group_by("event_type").aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "n_users"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_count, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def value_outliers(ds, group_col: str = "event_type",
                   value_col: str = "value", id_col: str = "event_id"):
    """Tukey-fence outlier flags per group → ``(event_id, event_type,
    cents, is_outlier)`` where a row is an outlier iff
    ``value > Q3 + 1.5·IQR`` of its group (percentile-disc quartiles).

    Two-pass broadcast shape: pass 1 reduces the corpus to the bounded
    per-group cents histogram (:func:`grouped_value_percentiles`); the
    per-group fence broadcasts as a tiny dict; pass 2 is a stateless
    flag ``map_batches``.  The comparison is all-integer
    (``2·cents > 2·Q3 + 3·(Q3−Q1)``), so no float boundary can flip a
    flag vs the SQL oracle."""
    q = grouped_value_percentiles(
        ds, ps=(25, 75), group_col=group_col, value_col=value_col
    ).to_pandas()
    fence2x: dict[str, int] = {}
    for g, sub in q.groupby(group_col):
        s = sub.set_index("p")["cents"]
        q1, q3 = int(s[25]), int(s[75])
        fence2x[g] = 2 * q3 + 3 * (q3 - q1)

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        d = _dict_encode(batch.column(group_col))
        fences = np.array(
            [fence2x[w] for w in d.dictionary.to_pylist()], np.int64
        )
        thr = fences[d.indices.to_numpy(zero_copy_only=False)]
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "cents": pa.array(cents, pa.int64()),
                "is_outlier": pa.array(2 * cents > thr, pa.bool_()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def hour_series(ds):
    """Gap-filled per-hour event counts → ``(hour_us, n_events)`` for
    EVERY hour between the corpus's first and last event (zero rows for
    empty hours) — the dense-time-series resample shape.

    Partial hour counts per batch (bounded by hours-per-batch), one
    hour-keyed merge (bounded by the corpus time span), then the gap
    fill is a driver-side arange over that bounded span — the corpus is
    never re-scanned."""
    step = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hour = (ts // step) * step
        vals, cnts = np.unique(hour, return_counts=True)
        return pa.table(
            {"hour_us": pa.array(vals, pa.int64()),
             "n_events": pa.array(cnts.astype(np.int64), pa.int64())}
        )

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour_us")
        .aggregate(Sum("n_events", alias_name="n_events"))
        .to_pandas()  # bounded: one row per non-empty hour in the span
        .sort_values("hour_us")
    )
    if len(t) == 0:
        return pa.table({"hour_us": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    lo, hi = int(t["hour_us"].iloc[0]), int(t["hour_us"].iloc[-1])
    dense = np.arange(lo, hi + 1, step, dtype=np.int64)
    counts = np.zeros(len(dense), np.int64)
    idx = (t["hour_us"].to_numpy() - lo) // step
    counts[idx] = t["n_events"].to_numpy()
    return pa.table(
        {"hour_us": pa.array(dense, pa.int64()),
         "n_events": pa.array(counts, pa.int64())}
    )


def pivot_events(ds, types=("click", "error", "purchase", "signup",
                            "view")):
    """Crosstab / pivot: one row per day with a count COLUMN per event
    type → ``(day, click, error, purchase, signup, view)`` — the
    wide-format rollup every dashboard export wants.  ``types`` is the
    fixed output column set (a pivot's schema must be declared up
    front; unseen types count as 0, unexpected ones raise rather than
    silently vanish).

    Shape: per-batch partial counts of (day, type) — bounded by
    days×types per batch — one day+type-keyed merge of those partials,
    then the pivot itself is a per-day ``map_groups`` over the bounded
    merged table.  Raw events never shuffle."""
    import pyarrow.compute as pc

    types = tuple(types)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "day", pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        )
        g = batch.select(["day", "event_type"]) \
            .group_by(["day", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "event_type", "n"])

    def pivot(group: pa.Table) -> pa.Table:
        day = group.column("day")[0].as_py()
        seen = dict(zip(group.column("event_type").to_pylist(),
                        group.column("n").to_pylist()))
        unexpected = set(seen) - set(types)
        if unexpected:
            raise ValueError(
                f"pivot_events saw event types {sorted(unexpected)} not in "
                f"the declared pivot columns {types}"
            )
        cols = {"day": pa.array([day], pa.string())}
        for t in types:
            cols[t] = pa.array([seen.get(t, 0)], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("day")
        .map_groups(pivot, batch_format="pyarrow")
    )


def grouped_mode(ds, group_col: str, value_col: str,
                 num_buckets: int = 64):
    """Per-group modal value → ``(group_col, mode, n)`` where ``mode``
    is the group's most frequent ``value_col`` (count desc, value asc
    tiebreak) and ``n`` its count.

    Shape: per-batch partial counts of (group, value) pairs, ONE
    group-hash-bucketed exchange of those narrow ``(g, v, n)`` partials
    (co-partitioning every pair of a group into one bucket), then per
    bucket an exact pair merge + one sort + first-of-run argmax.  Raw
    rows never shuffle; the exchange is bounded by distinct (group,
    value) pairs per batch, and a group's mode needs no second pass."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import (first_of_run_mask, id_buckets,
                                       string_buckets)

    def buckets(col):
        if pa.types.is_integer(col.type):
            return id_buckets(col, num_buckets)
        return string_buckets(col, num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]) \
            .group_by([group_col, value_col]).aggregate([([], "count_all")])
        g = g.rename_columns([group_col, value_col, "n"])
        return g.append_column(
            "bucket", pa.array(buckets(g.column(group_col)), pa.int32())
        )

    def argmax(group: pa.Table) -> pa.Table:
        g = group.select([group_col, value_col, "n"]) \
            .group_by([group_col, value_col]).aggregate([("n", "sum")]) \
            .rename_columns([group_col, value_col, "n"])
        t = g.sort_by([(group_col, "ascending"), ("n", "descending"),
                       (value_col, "ascending")])
        first = first_of_run_mask([t.column(group_col)])
        t = t.filter(pa.array(first))
        return t.rename_columns([group_col, "mode", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(argmax, batch_format="pyarrow")
    )


def global_rank_bins(ds, value_col: str = "value",
                     id_col: str = "event_id", bins: int = 10,
                     num_buckets: int = 64):
    """EXACT global rank + equi-depth ``ntile`` bin per row →
    ``(id, cents, rank, bin)`` ordered by ``(cents, id)`` — SQL
    ``row_number()/ntile(B) OVER (ORDER BY cents, id)`` semantics
    WITHOUT a global sort.

    Two passes: (1) the bounded cents histogram (value-DOMAIN-bounded,
    same contract as :func:`grouped_value_percentiles`) merges once and
    its cumulative counts broadcast as the per-cents global offset;
    (2) rows exchange ONCE keyed by cents-hash bucket, each equal-cents
    run sorts by id locally, and ``rank = offset[cents] + run_index``.
    The ntile bin is the exact SQL formula (first ``n % B`` bins get
    one extra row) applied to the integer rank."""
    import ray

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        vals, cnts = np.unique(cents, return_counts=True)
        return pa.table({"cents": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded by the cents domain
        .sort_values("cents").reset_index(drop=True)
    )
    total = int(hist["n"].sum())
    offs = np.concatenate(([0], np.cumsum(hist["n"].to_numpy())[:-1]))
    offset_ref = ray.put(dict(zip(hist["cents"].astype(int), offs.astype(int))))
    size, rem = total // bins, total % bins

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        t = pa.table({id_col: batch.column(id_col),
                      "cents": pa.array(cents, pa.int64())})
        return t.append_column(
            "bucket",
            pa.array(((cents.view(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15))
                      >> np.uint64(32)).astype(np.uint64)
                     % np.uint64(num_buckets), pa.int32()),
        )

    # the closure carries only the ObjectRef; the dict resolves from the
    # object store once per worker process (cached in the cell), not in
    # the task spec
    _cache: list = []

    def rank_group(group: pa.Table) -> pa.Table:
        if not _cache:
            import ray as _ray

            _cache.append(offset_ref if isinstance(offset_ref, dict)
                          else _ray.get(offset_ref))
        offset = _cache[0]
        t = group.sort_by([("cents", "ascending"),
                           (id_col, "ascending")])
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        n = len(cents)
        if n == 0:
            return pa.table({id_col: t.column(id_col),
                             "cents": t.column("cents"),
                             "rank": pa.array([], pa.int64()),
                             "bin": pa.array([], pa.int64())})
        change = np.concatenate(([True], cents[1:] != cents[:-1]))
        run_start = np.maximum.accumulate(
            np.where(change, np.arange(n), 0)
        )
        local = np.arange(n) - run_start
        base = np.array([offset[c] for c in cents[change]], np.int64)
        rank = np.repeat(base, np.diff(
            np.concatenate((np.flatnonzero(change), [n]))
        )) + local + 1
        if size == 0:
            b = rank
        else:
            head = rem * (size + 1)
            b = np.where(
                rank <= head,
                (rank - 1) // (size + 1) + 1,
                rem + (rank - 1 - head) // size + 1,
            )
        return pa.table({id_col: t.column(id_col),
                         "cents": t.column("cents"),
                         "rank": pa.array(rank, pa.int64()),
                         "bin": pa.array(b.astype(np.int64),
                                         pa.int64())})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pyarrow")
    )


def transition_counts(ds, num_buckets: int = 64):
    """Per-user event-type transition (Markov) counts →
    ``(from_type, to_type, n)`` over each user's ``(ts, event_id)``-
    ordered stream — the session-flow / next-event model input.

    Shape: ONE user-hash-bucketed exchange of narrow ``(user, ts, id,
    type)`` rows (a user's whole stream lands in one bucket), per bucket
    one sort + a shifted-compare adjacency mask + a bounded
    (from, to, n) partial, then a tiny type-pair-keyed sum.  No per-user
    Python; the final aggregate is bounded by #types²."""
    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    def partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        d = _dict_encode(t.column("event_type"))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(d.dictionary)
        pair = codes[:-1] * k + codes[1:]
        vals, cnts = np.unique(pair[same], return_counts=True)
        dic = d.dictionary
        return pa.table({
            "from_type": dic.take(pa.array(vals // k)),
            "to_type": dic.take(pa.array(vals % k)),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def rolling_active_users(ds, window_days: int = 7,
                         num_buckets: int = 64):
    """Trailing-window distinct active users per day →
    ``(day, n_active)`` where ``n_active`` counts users with ≥1 event in
    ``(day - window + 1 .. day)`` — the rolling-DAU/WAU analytics shape,
    for every day that has at least one event.

    EXACT without re-scanning per window: each batch's DISTINCT
    (day, user) pairs expand to their ``window_days`` target days (narrow
    int rows), ONE pair-hash-bucketed exchange dedups pairs globally and
    emits per-day partial counts, a tiny day-keyed sum finishes, and the
    bounded real-day set filters out the expansion's overhang."""
    from ..functions.arrowutil import pair_buckets

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = ts // 86_400_000_000
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        pairs = np.unique(
            np.stack([day, uid], axis=1), axis=0
        )
        d = np.repeat(pairs[:, 0], window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(pairs)
        )
        u = np.repeat(pairs[:, 1], window_days)
        t = pa.table({"day": pa.array(d, pa.int64()),
                      "user_id": pa.array(u, pa.int64())})
        return t.append_column(
            "bucket",
            pa.array(pair_buckets(t.column("day"), t.column("user_id"),
                                  num_buckets), pa.int32()),
        )

    def dedup_count(group: pa.Table) -> pa.Table:
        from ..functions.arrowutil import first_of_run_mask

        t = group.sort_by([("day", "ascending"),
                           ("user_id", "ascending")])
        first = first_of_run_mask([t.column("day"), t.column("user_id")])
        t = t.filter(pa.array(first))
        vals, cnts = np.unique(
            t.column("day").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"day": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    def day_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        vals = np.unique(ts // 86_400_000_000)
        return pa.table({"day": pa.array(vals, pa.int64())})

    real_days = set(
        ds.map_batches(day_partial, batch_format="pyarrow")
        .to_pandas()["day"].unique().tolist()  # bounded by the time span
    )

    counts = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_count, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n_active"))
    )

    def keep_real(batch: pa.Table) -> pa.Table:
        day = batch.column("day").to_numpy(zero_copy_only=False)
        mask = np.fromiter((d in real_days for d in day), bool,
                           count=len(day))
        return batch.filter(pa.array(mask))

    return counts.map_batches(keep_real, batch_format="pyarrow")


def session_stats(ds, gap_seconds: int = 1800,
                  num_buckets: int | None = None):
    """Per-session aggregates over the gap-based windows of
    :func:`sessionize` → ``(user_id, session_idx, n_events,
    duration_us)`` — one row per session, duration integer-exact.

    Same single user-hash exchange as sessionize; the per-bucket pass
    finds session boundaries with the identical shifted-compare mask and
    folds each run with ``reduceat`` — sessions never cross buckets, so
    no second pass."""

    if num_buckets is None:
        import os as _os

        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", _os.cpu_count() or 8)) \
            if _ray.is_initialized() else (_os.cpu_count() or 8)
        num_buckets = max(16, ncpu * 2)

    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import id_buckets

        b = id_buckets(batch.column("user_id"), num_buckets)
        return batch.select(["event_id", "user_id", "ts"]).append_column(
            "bucket", pa.array(b, pa.int32())
        )

    def bucket_stats(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks()
        d = _dict_encode(uid)
        codes = d.indices.to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, codes))
        codes_s, ts_s = codes[order], ts[order]
        n = len(order)
        user_change = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        gap_us = gap_seconds * 1_000_000
        gap_break = np.concatenate(
            ([False], (ts_s[1:] - ts_s[:-1]) > gap_us)
        )
        new_session = user_change | gap_break
        cum = np.cumsum(new_session)
        first_of_user = np.where(user_change)[0]
        base = np.zeros(n, dtype=np.int64)
        base[first_of_user] = cum[first_of_user]
        base = np.maximum.accumulate(base)
        session_idx = cum - base
        starts = np.flatnonzero(new_session)
        ends = np.concatenate((starts[1:], [n])) - 1
        return pa.table(
            {
                "user_id": d.dictionary.take(pa.array(codes_s[starts])),
                "session_idx": pa.array(session_idx[starts], pa.int64()),
                "n_events": pa.array(
                    (ends - starts + 1).astype(np.int64), pa.int64()
                ),
                "duration_us": pa.array(
                    ts_s[ends] - ts_s[starts], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pyarrow")
    )


def corr_by_nation(lineitem_ds, sf_dir: str):
    """Per-supplier-nation Pearson correlation + OLS regression of
    ``l_extendedprice`` (cents) on ``l_quantity`` → one row per nation
    ``(n_name, n_rows, corr, slope, intercept)`` — matching SQL
    ``corr()`` / ``regr_slope()`` / ``regr_intercept()`` bit-for-bit.

    Exactness contract: every moment is an INTEGER (quantities are
    integral in TPC-H; prices quantize to cents with the shared
    ``floor(x*100+0.5)`` rule), so the distributed sum order cannot
    perturb the result.  The one moment that can exceed 2^53 per batch —
    Σ cents² — is carried as a per-row hi/lo 32-bit split (two int64
    partial columns, recombined as a Python int on the 25-row final), so
    ``np.bincount``'s float64 accumulator stays exact and the merge never
    overflows int64.  The final doubles are computed from the exact
    integer moments with the same expression tree the oracle SQL uses,
    so IEEE rounding is identical on both sides.

    Scale shape: supplier→nation is a dense int8 array broadcast once
    (1 byte per supplier, the orders_per_nation pattern); partials are
    ≤25 rows per batch; ONE tiny groupby merges them.  No row-level
    shuffle, no driver loop.  At extreme scale (≥10^11 rows) the sxy
    moment approaches int64 range — split it hi/lo the same way."""
    import pyarrow.parquet as pq
    import ray

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False)
    nk = supp.column("s_nationkey").to_numpy(zero_copy_only=False)
    n_nations = int(nk.max()) + 1
    assert n_nations <= 127, "int8 nationkey array"
    nation_of = np.full(int(sk.max()) + 1, -1, np.int8)
    nation_of[sk] = nk.astype(np.int8)
    ref = ray.put(nation_of)

    class Moments:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sks = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            # fail loudly on a suppkey with no supplier row (beyond the
            # array or hitting the -1 sentinel) instead of surfacing a
            # bincount Value/IndexError deep in a worker (ADVICE r4;
            # mirrors id_hash64's fail-loudly precedent)
            bad = (sks < 0) | (sks >= len(self.nation_of))
            if bad.any() or (self.nation_of[sks] < 0).any():
                unknown = sks[bad] if bad.any() else \
                    sks[self.nation_of[sks] < 0]
                raise ValueError(
                    "corr_by_nation: lineitem l_suppkey has no supplier "
                    f"row (e.g. {int(unknown[0])}); supplier.parquet is "
                    "not a superset of lineitem suppliers")
            nks = self.nation_of[sks].astype(np.int64)
            q = np.floor(
                batch.column("l_quantity").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            c = np.floor(
                batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64)
            cc = c * c
            cc_hi, cc_lo = cc >> np.int64(32), cc & np.int64(0xFFFFFFFF)
            m = n_nations
            out = {
                "n_nationkey": None,
                "n_rows": np.bincount(nks, minlength=m),
                "sx": np.bincount(nks, weights=q, minlength=m),
                "sy": np.bincount(nks, weights=c, minlength=m),
                "sxx": np.bincount(nks, weights=q * q, minlength=m),
                "sxy": np.bincount(nks, weights=q * c, minlength=m),
                "syy_hi": np.bincount(nks, weights=cc_hi, minlength=m),
                "syy_lo": np.bincount(nks, weights=cc_lo, minlength=m),
            }
            nz = np.flatnonzero(out["n_rows"])
            cols = {"n_nationkey": pa.array(nz.astype(np.int32), pa.int32())}
            for k, v in out.items():
                if k != "n_nationkey":
                    cols[k] = pa.array(v[nz].astype(np.int64), pa.int64())
            return pa.table(cols)

    partials = lineitem_ds.map_batches(
        Moments, batch_format="pyarrow", concurrency=(1, 4)
    )
    agg = partials.groupby("n_nationkey").aggregate(
        *[Sum(k, alias_name=k)
          for k in ("n_rows", "sx", "sy", "sxx", "sxy", "syy_hi", "syy_lo")]
    )
    name_of = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))

    def finalize(batch: pa.Table) -> pa.Table:
        import math

        rows = batch.to_pylist()
        out = {"n_name": [], "n_rows": [], "corr": [], "slope": [],
               "intercept": []}
        for r in rows:  # ≤25 rows total by construction
            n = int(r["n_rows"])
            sx, sy = int(r["sx"]), int(r["sy"])
            sxx, sxy = int(r["sxx"]), int(r["sxy"])
            syy = (int(r["syy_hi"]) << 32) + int(r["syy_lo"])
            cov_n = n * sxy - sx * sy          # exact Python ints
            varx_n = n * sxx - sx * sx
            vary_n = n * syy - sy * sy
            corr = (float(cov_n)
                    / math.sqrt(float(varx_n) * float(vary_n))
                    if varx_n > 0 and vary_n > 0 else None)
            slope = (float(cov_n) / float(varx_n)
                     if varx_n > 0 else None)
            intercept = ((float(sy) - slope * float(sx)) / float(n)
                         if slope is not None else None)
            out["n_name"].append(name_of[int(r["n_nationkey"])])
            out["n_rows"].append(n)
            out["corr"].append(corr)
            out["slope"].append(slope)
            out["intercept"].append(intercept)
        return pa.table({
            "n_name": pa.array(out["n_name"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "corr": pa.array(out["corr"], pa.float64()),
            "slope": pa.array(out["slope"], pa.float64()),
            "intercept": pa.array(out["intercept"], pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def pmi_topk(ds, k: int = 50, min_count: int = 5, text_col: str = "text"):
    """Top-k collocations by pointwise mutual information →
    ``(bigram, cnt, pmi_u)`` with ``pmi_u = floor(ln(c_xy·N /
    (c_x·c_y)) · 10^6)`` — classic phrase mining (Church & Hanks 1990)
    for tokenizer-vocabulary and phrase-list prep over a corpus.

    Exactness: every count is an exact int64; the score applies ONE
    float expression tree — ``(c_xy·N) / (c_x·c_y)`` with each operand
    cast to double first, then ``ln``, ``·1e6``, ``floor`` — written
    identically in the SQL oracle, so the libm-identical doubles
    fixed-point-quantize to the same int on both sides (the
    ``weighted_sample`` precedent).

    Scale shape: bigram counts come from :func:`bigram_counts` (term-hash
    bucketed merge, bigram-vocabulary-bounded rows); unigram counts ride
    in as ONE broadcast table (``ray.put`` once, ``pc.index_in`` per
    batch — the vocabulary-bounded contract shared with
    ``tfidf_topk``; at open vocabulary co-partition the attach by word
    hash instead, the ``lm.unigram_logprob(strategy="shuffle")``
    pattern).  Scoring is a per-batch top-k combiner (≤k rows out per
    batch) + one bounded driver merge — the bigram table never sorts."""
    import ray

    bg = bigram_counts(ds, text_col=text_col)
    wc = word_count(ds, text_col=text_col).to_pandas()  # vocab-bounded
    n_tokens = float(wc["cnt"].sum())
    vocab_ref = ray.put(
        (pa.array(wc["term"], pa.string()),
         wc["cnt"].to_numpy().astype(np.int64))
    )
    _cache: list = []

    def combiner(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not _cache:
            import ray as _ray

            _cache.append(_ray.get(vocab_ref))
        words, ucnt = _cache[0]
        cxy = batch.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = cxy >= min_count
        empty = pa.table({"bigram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64()),
                          "pmi_u": pa.array([], pa.int64())})
        if not keep.any():
            return empty
        t = batch.filter(pa.array(keep))
        cxy = cxy[keep]
        parts = pc.split_pattern(t.column("bigram"), " ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        w1 = pc.list_element(parts, 0)
        w2 = pc.list_element(parts, 1)
        cx = ucnt[pc.index_in(w1, value_set=words)
                  .to_numpy(zero_copy_only=False)]
        cy = ucnt[pc.index_in(w2, value_set=words)
                  .to_numpy(zero_copy_only=False)]
        ratio = (cxy.astype(np.float64) * n_tokens) \
            / (cx.astype(np.float64) * cy.astype(np.float64))
        pmi = np.floor(np.log(ratio) * 1e6).astype(np.int64)
        bigram = t.column("bigram").to_numpy(zero_copy_only=False)
        order = np.lexsort((bigram, -pmi))[:k]
        return pa.table({
            "bigram": pa.array(bigram[order], pa.string()),
            "cnt": pa.array(cxy[order], pa.int64()),
            "pmi_u": pa.array(pmi[order], pa.int64()),
        })

    top = bg.map_batches(combiner, batch_format="pyarrow") \
        .to_pandas()  # bounded: ≤ k rows per bucket batch
    top = top.sort_values(["pmi_u", "bigram"], ascending=[False, True],
                          kind="mergesort").head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True))


def search_phrase(ds, words: list[str], text_col: str = "text",
                  id_col: str = "doc_id"):
    """Exact PHRASE search: docs whose lowered whitespace-token stream
    contains ``words`` as a CONSECUTIVE run → one ``doc_id`` row per
    matching doc.  The positional upgrade of
    :func:`search_docs_substring` (which cannot distinguish "new york
    city" from "city ... new ... york") and the corpus twin of the
    reference's within-page match walk
    (/root/reference/StudiOCR/DocWindow.py:163-199, which steps matched
    pages in order).

    Shuffle-free and fully vectorized: one Arrow tokenize per batch, one
    boolean equality array per phrase word, and the m-gram match is the
    AND of m shifted slices (same-document guaranteed by comparing the
    doc index at the span's two ends — the repeat-built doc index is
    nondecreasing, so equal ends imply an equal interior).  No positions
    table, no join: O(L·m) bit-ops per batch."""
    import pyarrow.compute as pc

    lw = [w.lower() for w in words]
    m = len(lw)
    if m == 0:
        raise ValueError("search_phrase: empty phrase")

    def f(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        L = len(flat)
        if L < m:
            return batch.select([id_col]).slice(0, 0)
        n = L - m + 1
        valid = pc.equal(flat, lw[0]).to_numpy(
            zero_copy_only=False)[:n].copy()
        for j in range(1, m):
            valid &= pc.equal(flat, lw[j]).to_numpy(
                zero_copy_only=False)[j:j + n]
        valid &= doc_idx[m - 1:] == doc_idx[:n]
        row_hit = np.zeros(batch.num_rows, bool)
        row_hit[np.unique(doc_idx[:n][valid])] = True
        return batch.select([id_col]).filter(pa.array(row_hit))

    return ds.map_batches(f, batch_format="pyarrow")


def cooc_window(ds, window: int = 2, min_count: int = 1,
                text_col: str = "text"):
    """Skip-gram co-occurrence counts → ``(x, y, cnt)``: ordered
    (center, context) token pairs with ``0 < |Δpos| ≤ window`` inside one
    document — the count table behind word2vec/GloVe-style embedding
    statistics (Mikolov et al. 2013; Pennington et al. 2014) and windowed
    collocation mining beyond :func:`pmi_topk`'s adjacent bigrams.

    Vectorized per batch: for each offset d = 1..window the context
    pairs are two shifted Arrow slices masked by doc-index equality
    (both directions), joined into "x y" pair strings with ONE
    ``binary_join_element_wise`` call — no positions table, no self-join.
    Partials dictionary-encode + bincount per batch (pair-vocabulary
    bounded, never one row per pair instance) and merge through the
    pair-hash bucket exchange (:func:`bigram_counts`'s shape — the pair
    vocabulary grows ~quadratically, so a raw string-key groupby is the
    measured 33× anti-pattern).  Tokens cannot contain spaces, so the
    final split back into (x, y) is unambiguous."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import string_buckets

    empty = pa.table({"wb": pa.array([], pa.int32()),
                      "pair": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        L = len(flat)
        xs, ys = [], []
        for d in range(1, window + 1):
            if L <= d:
                break
            same = pa.array(doc_idx[:-d] == doc_idx[d:])
            a = flat.slice(0, L - d).filter(same)
            b = flat.slice(d).filter(same)
            xs += [a, b]
            ys += [b, a]
        if not xs or sum(len(a) for a in xs) == 0:
            return empty
        pairs = pc.binary_join_element_wise(
            pa.concat_arrays(xs), pa.concat_arrays(ys), " ")
        d_ = _dict_encode(pairs)
        counts = np.bincount(
            d_.indices.to_numpy(zero_copy_only=False),
            minlength=len(d_.dictionary))
        return pa.table(
            {"wb": pa.array(string_buckets(d_.dictionary, 64), pa.int32()),
             "pair": d_.dictionary,
             "cnt": pa.array(counts.astype(np.int64), pa.int64())})

    def merge(group: pa.Table) -> pa.Table:
        d_ = _dict_encode(group.column("pair"))
        cnt = np.bincount(
            d_.indices.to_numpy(zero_copy_only=False),
            weights=group.column("cnt").to_numpy(zero_copy_only=False),
            minlength=len(d_.dictionary)).astype(np.int64)
        keep = cnt >= min_count
        pairs = d_.dictionary.filter(pa.array(keep))
        parts = pc.split_pattern(pairs, " ", max_splits=1)
        if isinstance(parts, pa.ChunkedArray):  # pragma: no cover
            parts = parts.combine_chunks()
        flat = parts.flatten()
        return pa.table(
            {"x": flat.take(pa.array(np.arange(0, 2 * len(pairs), 2))),
             "y": flat.take(pa.array(np.arange(1, 2 * len(pairs), 2))),
             "cnt": pa.array(cnt[keep], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("wb").map_groups(merge, batch_format="pyarrow")


def vocab_oov(ds, top_v: int = 20, text_col: str = "text",
              id_col: str = "doc_id"):
    """Vocabulary build + per-doc out-of-vocabulary rate → ``(doc_id,
    n_tokens, n_oov, oov_rate)``.

    The tokenizer-training primitive: pass 1 computes corpus term
    frequencies (``word_count``'s vocabulary-bounded partial + bucketed
    merge — raw tokens never shuffle), keeps the ``top_v`` terms by
    (count desc, term asc — deterministic), and broadcasts that tiny
    vocabulary once via ``ray.put``; pass 2 is a stateless ``map_batches``
    probing each doc's tokens with ONE hashed ``pc.index_in`` against the
    broadcast list.  ``oov_rate`` is a single int/int double division, so
    the DuckDB oracle reproduces it bit-exactly.

    Scale shape: the broadcast side is ``top_v`` strings by construction
    (a tokenizer vocabulary, not the corpus); pass 2 never leaves the
    block.  The same two-pass count→broadcast→probe layout serves real
    BPE/unigram vocabularies at 100 TB — only ``top_v`` grows."""
    import ray

    counts = word_count(ds, text_col=text_col)
    top = counts.sort(["cnt", "term"], descending=[True, False]) \
        .limit(top_v).take_all()
    vocab = pa.array([r["term"] for r in top], pa.string())
    ref = ray.put(vocab)

    class Oov:
        def __init__(self):
            self.vocab = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n_docs = batch.num_rows
            flat, doc_idx = _flat_tokens(batch, text_col)
            n_tokens = np.zeros(n_docs, np.int64)
            n_oov = np.zeros(n_docs, np.int64)
            if len(flat):
                np.add.at(n_tokens, doc_idx, 1)
                oov = pc.is_null(
                    pc.index_in(flat, value_set=self.vocab)
                ).to_numpy(zero_copy_only=False)
                np.add.at(n_oov, doc_idx[oov], 1)
            nt = n_tokens.astype(np.float64)
            rate = np.divide(n_oov, nt, out=np.zeros(n_docs, np.float64),
                             where=nt > 0)
            return pa.table(
                {id_col: batch.column(id_col),
                 "n_tokens": pa.array(n_tokens, pa.int64()),
                 "n_oov": pa.array(n_oov, pa.int64()),
                 "oov_rate": pa.array(rate, pa.float64())}
            )

    return ds.map_batches(Oov, concurrency=(1, 8), batch_format="pyarrow")


def zscore_by_group(ds, group_col: str = "event_type",
                    value_col: str = "value", id_col: str = "event_id"):
    """Within-group standardization → ``(event_id, group, cents, z)``:
    z = (x - mean_g) / stddev_pop_g, the classic feature-normalization /
    outlier-score operator.

    Exactness contract (the corr_by_nation discipline): values quantize
    to integer cents with the shared ``floor(x*100+0.5)`` rule, so the
    distributed moment sums (n, Σc, Σc²) are exact integers and summation
    order cannot perturb them; the final doubles come from the same
    expression tree the oracle SQL uses (mean = s/n; var = ss/n - mean²;
    z = (c - mean)/sqrt(var)), so IEEE rounding matches bit-for-bit.
    Groups whose variance is 0 emit z = 0 rather than ±inf.

    Scale shape: per-batch partial moments (≤ #groups rows per batch),
    ONE tiny groupby merge, a driver collect bounded by the group-key
    cardinality, one ``ray.put`` broadcast, then a stateless probe pass —
    full rows never shuffle."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        c = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        d = _dict_encode(g)
        idx = d.indices.to_numpy(zero_copy_only=False)
        k = len(d.dictionary)
        n = np.bincount(idx, minlength=k).astype(np.int64)
        s = np.bincount(idx, weights=c, minlength=k).astype(np.int64)
        ss = np.bincount(idx, weights=c * c, minlength=k).astype(np.int64)
        return pa.table(
            {group_col: d.dictionary,
             "n": pa.array(n, pa.int64()),
             "s": pa.array(s, pa.int64()),
             "ss": pa.array(ss, pa.int64())}
        )

    moments = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n"), Sum("s"), Sum("ss"))
        .take_all()
    )
    stats = {
        r[group_col]: (int(r["sum(n)"]), int(r["sum(s)"]), int(r["sum(ss)"]))
        for r in moments
    }
    ref = ray.put(stats)

    class Z:
        def __init__(self):
            self.stats = ray.get(ref)
            keys = sorted(self.stats)
            self.keys = pa.array(keys, pa.string())
            # double-cast each exact integer moment BEFORE dividing —
            # SQL computes double(s)/double(n), and Python bigint
            # true-division rounds differently once a moment passes 2^53
            mean = np.array(
                [np.float64(self.stats[k][1]) / np.float64(self.stats[k][0])
                 for k in keys],
                np.float64,
            )
            var = np.array(
                [np.float64(self.stats[k][2]) / np.float64(self.stats[k][0])
                 for k in keys],
                np.float64,
            ) - mean * mean
            self.mean = mean
            self.sd = np.sqrt(np.maximum(var, 0.0))

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            g = batch.column(group_col)
            idx = pc.index_in(g, value_set=self.keys)
            if idx.null_count:
                raise ValueError(
                    f"zscore_by_group: unseen {group_col} value in probe "
                    "pass (moments pass must cover the same dataset)")
            ix = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            c = np.floor(
                batch.column(value_col).to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64)
            sd = self.sd[ix]
            z = np.where(
                sd > 0.0, (c - self.mean[ix]) / np.where(sd > 0, sd, 1.0),
                0.0,
            )
            return pa.table(
                {id_col: batch.column(id_col),
                 group_col: g,
                 "cents": pa.array(c, pa.int64()),
                 "z": pa.array(z, pa.float64())}
            )

    return ds.map_batches(Z, concurrency=(1, 8), batch_format="pyarrow")


def orders_cube(ds):
    """CUBE(o_orderstatus, o_orderpriority) over orders → order counts and
    integer-cent totalprice sums at all FOUR grouping sets: leaf, per
    status, per priority (the set ROLLUP lacks), and grand total —
    rolled-up columns carry the sentinel ``'ALL'``.

    Same scale shape as ``orders_rollup``: per-batch pre-aggregation to a
    bounded leaf (|status| × |priority| ≈ 15 rows), one tiny groupby
    merge, then every grouping set derived from the leaf aggregate itself
    with Arrow ``group_by`` kernels — the raw rows are read exactly once
    no matter how many grouping sets are requested.  Sums are integer
    cents, exact under any accumulation order."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        cents = pa.array(
            np.floor(
                b.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0 + 0.5
            ).astype(np.int64),
            pa.int64(),
        )
        t = pa.table(
            {
                "o_orderstatus": b.column("o_orderstatus"),
                "o_orderpriority": b.column("o_orderpriority"),
                "cents": cents,
            }
        ).group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return t.rename_columns(
            ["o_orderstatus", "o_orderpriority", "total_cents", "n_orders"]
        )

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )

    def cube(b: pa.Table) -> pa.Table:
        # bounded input (the leaf aggregate); Arrow group_by per set
        def agg(keys: list[str]) -> pa.Table:
            if keys:
                g = b.group_by(keys).aggregate(
                    [("total_cents", "sum"), ("n_orders", "sum")]
                )
            else:
                g = pa.table(
                    {
                        "total_cents_sum": pa.array(
                            [pc.sum(b.column("total_cents")).as_py() or 0],
                            pa.int64(),
                        ),
                        "n_orders_sum": pa.array(
                            [pc.sum(b.column("n_orders")).as_py() or 0],
                            pa.int64(),
                        ),
                    }
                )
            n = g.num_rows
            cols = {}
            for c in ("o_orderstatus", "o_orderpriority"):
                cols[c] = (
                    g.column(c) if c in g.column_names
                    else pa.array(["ALL"] * n, pa.string())
                )
            cols["total_cents"] = g.column("total_cents_sum")
            cols["n_orders"] = g.column("n_orders_sum")
            return pa.table(cols)

        sets = [
            b.select(["o_orderstatus", "o_orderpriority",
                      "total_cents", "n_orders"]),
            agg(["o_orderstatus"]),
            agg(["o_orderpriority"]),
            agg([]),
        ]
        return pa.concat_tables(sets)

    return leaf.repartition(1).map_batches(
        cube, batch_format="pyarrow", batch_size=None
    )


def late_events(ds, delay_us: int = 3_600_000_000, num_buckets: int = 64):
    """Watermark-style late-data detection → ``(event_id, user_id, ts_us,
    watermark_us, is_late)``: per user, in ARRIVAL order (``event_id``),
    an event is late iff its timestamp lags the running max event-time
    seen so far by more than ``delay_us`` — the allowed-lateness rule a
    streaming engine applies before dropping/side-outputting a record.

    Scale shape: one user-hash bucketed exchange (B groups), then each
    bucket does ONE vectorized pass: sort by (user, event_id), segmented
    running max via rank-normalized composite keys (seg·(U+1)+rank keeps
    ``np.maximum.accumulate`` monotone across segment resets AND inside
    int64 — ranks, not raw epoch-µs, bound the product), map ranks back
    to timestamps.  No per-user Python, no window-function state."""
    from ..functions.arrowutil import id_buckets

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        ts = b.column("ts")
        if pa.types.is_timestamp(ts.type):
            ts = pc2.cast(ts, pa.int64())
        out = pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts_us": ts,
        })
        return out.append_column(
            "ub", pa.array(id_buckets(out.column("user_id"), num_buckets),
                           pa.int32())
        )

    def mark(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["ub"]).sort_by(
            [("user_id", "ascending"), ("event_id", "ascending")]
        )
        n = g.num_rows
        if n == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "watermark_us": pa.array([], pa.int64()),
                "is_late": pa.array([], pa.bool_()),
            })
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        seg = np.zeros(n, np.int64)
        if n > 1:
            seg[1:] = np.cumsum(users[1:] != users[:-1])
        uniq = np.unique(ts)
        rank = np.searchsorted(uniq, ts).astype(np.int64)
        comp = seg * (len(uniq) + 1) + rank
        runmax = uniq[np.maximum.accumulate(comp) - seg * (len(uniq) + 1)]
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts_us": g.column("ts_us"),
            "watermark_us": pa.array(runmax, pa.int64()),
            "is_late": pa.array(ts < runmax - delay_us),
        })

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "ub"
    ).map_groups(mark, batch_format="pyarrow")


def user_paths(ds, k: int = 20, num_buckets: int = 64):
    """Top-k most common per-user event-type journeys: every user's
    events, ordered by ``(ts, event_id)``, concatenate into one
    ``'>'``-joined path string; return the k most frequent paths as
    ``(path, n_users)`` (ties broken path-ascending) — the funnel-free
    whole-journey analogue of :func:`transition_counts` (which models the
    same streams as order-2 Markov pairs; the reference's closest kin is
    the per-document ordered page traversal,
    /root/reference/StudiOCR/db.py:49-55).

    Shape: ONE user-hash-bucketed exchange of narrow ``(user, ts, id,
    type)`` rows (a user's whole stream lands in one bucket), per bucket
    one sort + a ZERO-COPY ``ListArray`` reassembly over user-run offsets
    + ``pc.binary_join`` (vectorized concat — no per-user Python) + a
    bucket-local path count, then a path-keyed sum.  The sum's output is
    bounded by #distinct journeys, which can approach #users at 100 TB,
    so the top-k never collects it: each output batch emits its own
    k-row partial and the driver merges ``batches × k`` rows (the
    :func:`bm25_topk` / `ann_topk_brute` merge shape)."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    empty = pa.table({"path": pa.array([], pa.string()),
                      "n_users": pa.array([], pa.int64())})

    def partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        offsets = np.concatenate((starts, [n])).astype(np.int32)
        vals = t.column("event_type").combine_chunks()
        if isinstance(vals, pa.ChunkedArray):
            vals = (vals.chunk(0) if vals.num_chunks == 1
                    else pa.concat_arrays(vals.chunks))
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        paths = pc.binary_join(lst, ">")
        d = paths.dictionary_encode()
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table({
            "path": d.dictionary,
            "n_users": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    counted = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def topk_part(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("n_users", "descending"), ("path", "ascending")],
        )
        return batch.take(idx[: min(k, batch.num_rows)])

    t = counted.map_batches(topk_part, batch_format="pyarrow").to_pandas()
    t = t.sort_values(["n_users", "path"], ascending=[False, True],
                      kind="mergesort")
    return pa.Table.from_pandas(
        t.head(k).reset_index(drop=True)[["path", "n_users"]]
    )


def seq3_patterns(ds, num_buckets: int = 64):
    """Per-user consecutive event-type 3-grams → ``(t1, t2, t3, n)`` —
    :func:`transition_counts` lifted from order 2 to order 3 (sequential
    pattern mining over the same ``(ts, event_id)``-ordered streams).

    Same scale shape as the order-2 version: ONE user-hash-bucketed
    exchange, per bucket one sort + a shifted same-user mask over TWO
    steps + a bounded ``(t1, t2, t3, n)`` partial via a base-k packed
    code, then a tiny final sum bounded by #types³ (not corpus size)."""
    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    empty = pa.table({"t1": pa.array([], pa.string()),
                      "t2": pa.array([], pa.string()),
                      "t3": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n < 3:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        ok = same[:-1] & same[1:]  # rows i, i+1, i+2 all one user
        d = _dict_encode(t.column("event_type"))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kk = len(d.dictionary)
        tri = (codes[:-2] * kk + codes[1:-1]) * kk + codes[2:]
        vals, cnts = np.unique(tri[ok], return_counts=True)
        dic = d.dictionary
        return pa.table({
            "t1": dic.take(pa.array(vals // (kk * kk))),
            "t2": dic.take(pa.array((vals // kk) % kk)),
            "t3": dic.take(pa.array(vals % kk)),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
    )


def basket_pairs(ds, num_buckets: int = 64):
    """Market-basket co-occurrence: treating each ``(user, day)`` as a
    basket of DISTINCT event types, count for every unordered type pair
    ``t1 < t2`` how many baskets contain both, plus each type's own
    basket count and the association confidences — the classic
    support/confidence table of association-rule mining.

    Shape: ONE user-hash-bucketed exchange of narrow ``(user, day,
    type)`` rows (a user's baskets all land in one bucket); per bucket
    one sort + first-of-run dedup to distinct basket membership, then a
    fully vectorized within-run pair expansion (repeat/arange over run
    lengths — no per-basket Python) into ``(t1, t2, n)`` partials
    bounded by #types²; final sums are type-vocabulary-sized, and the
    confidence join happens on that tiny table on the driver."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import first_of_run_mask, id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch.column("ts"), unit="day"),
            pa.timestamp("us"),
        )
        t = pa.table({
            "user_id": batch.column("user_id"),
            "day": day,
            "event_type": batch.column("event_type"),
        })
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    pair_empty = pa.table({"t1": pa.array([], pa.string()),
                           "t2": pa.array([], pa.string()),
                           "kind": pa.array([], pa.int32()),
                           "n": pa.array([], pa.int64())})

    def partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("day", "ascending"),
                           ("event_type", "ascending")])
        if t.num_rows == 0:
            return pair_empty
        keep = first_of_run_mask([t.column("user_id"), t.column("day"),
                                  t.column("event_type")])
        t = t.filter(pa.array(keep))
        n = t.num_rows
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        new_basket = np.ones(n, bool)
        new_basket[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        starts = np.flatnonzero(new_basket)
        lens = np.diff(np.concatenate((starts, [n])))
        d = _dict_encode(t.column("event_type"))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kk = len(d.dictionary)

        # per-type basket counts (each row is one distinct membership)
        tv, tc = np.unique(codes, return_counts=True)

        # vectorized i<j pair expansion within each run: element at
        # in-run position p pairs with the (L-1-p) elements after it
        pos_in_run = np.arange(n) - np.repeat(starts, lens)
        reps = np.repeat(lens, lens) - 1 - pos_in_run
        first = np.repeat(codes, reps)
        seq_start = np.arange(n) + 1
        base = np.repeat(seq_start, reps)
        off = np.arange(int(reps.sum())) - np.repeat(
            np.cumsum(reps) - reps, reps)
        second = codes[base + off]
        # membership rows are type-sorted within a basket → first < second
        pv, pcnt = np.unique(first * kk + second, return_counts=True)

        dic = d.dictionary
        return pa.table({
            "t1": pa.concat_arrays([
                dic.take(pa.array(pv // kk)).cast(pa.string()),
                dic.take(pa.array(tv)).cast(pa.string()),
            ]),
            "t2": pa.concat_arrays([
                dic.take(pa.array(pv % kk)).cast(pa.string()),
                dic.take(pa.array(tv)).cast(pa.string()),
            ]),
            "kind": pa.array(
                np.concatenate((np.zeros(len(pv), np.int32),
                                np.ones(len(tv), np.int32))), pa.int32()),
            "n": pa.array(np.concatenate((pcnt, tc)).astype(np.int64),
                          pa.int64()),
        })

    agg = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial, batch_format="pyarrow")
        .groupby(["t1", "t2", "kind"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()  # bounded by #types² + #types

    singles = agg[agg["kind"] == 1].set_index("t1")["n"]
    pairs = agg[agg["kind"] == 0].copy()
    pairs["n_t1"] = pairs["t1"].map(singles).astype(np.int64)
    pairs["n_t2"] = pairs["t2"].map(singles).astype(np.int64)
    pairs["conf_1to2"] = pairs["n"].astype(float) / pairs["n_t1"].astype(float)
    pairs["conf_2to1"] = pairs["n"].astype(float) / pairs["n_t2"].astype(float)
    pairs = pairs.rename(columns={"n": "n_baskets"})
    pairs = pairs.sort_values(["t1", "t2"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        pairs[["t1", "t2", "n_baskets", "n_t1", "n_t2",
               "conf_1to2", "conf_2to1"]]
    )


def chi_square_table(ds, row_col: str = "lang", col_col: str = "source"):
    """Contingency table + chi-square independence contributions for two
    categorical columns → ``(row, col, observed, expected, contrib)``
    (plus every cell's exact integer count) — the data-audit "is lang
    independent of source?" screen over the documents table.

    Shape: per-batch ``(row, col, n)`` partials (dictionary encode +
    bincount, bounded by the category product), ONE vocabulary-sized
    groupby sum, then the marginals and the float math on that tiny
    table driver-side.  Division order is pinned (``(r·c AS DOUBLE)/N``
    then ``(o-e)²/e``) so an oracle reproduces every double bit-for-bit.
    """
    def partial(batch: pa.Table) -> pa.Table:
        r = _dict_encode(batch.column(row_col))
        c = _dict_encode(batch.column(col_col))
        ri = r.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ci = c.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kc = len(c.dictionary)
        vals, cnts = np.unique(ri * kc + ci, return_counts=True)
        return pa.table({
            row_col: r.dictionary.take(pa.array(vals // kc)),
            col_col: c.dictionary.take(pa.array(vals % kc)),
            "observed": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([row_col, col_col])
        .aggregate(Sum("observed", alias_name="observed"))
    ).to_pandas()
    rt = t.groupby(row_col)["observed"].sum()
    ct = t.groupby(col_col)["observed"].sum()
    n = int(t["observed"].sum())
    r_marg = t[row_col].map(rt).astype(np.int64)
    c_marg = t[col_col].map(ct).astype(np.int64)
    expected = (r_marg * c_marg).astype(np.float64) / np.float64(n)
    o = t["observed"].astype(np.float64)
    t["expected"] = expected
    t["contrib"] = (o - expected) * (o - expected) / expected
    t = t.sort_values([row_col, col_col]).reset_index(drop=True)
    return pa.Table.from_pandas(
        t[[row_col, col_col, "observed", "expected", "contrib"]]
    )


def conversion_lag(ds, from_type: str = "signup", to_type: str = "purchase",
                   num_buckets: int = 64):
    """Time-to-conversion: for every user, the lag from their FIRST
    ``from_type`` event to their first ``to_type`` event AT OR AFTER it
    → ``(user_id, from_ts, to_ts, lag_us)``; users who never convert are
    absent — the funnel-latency companion of :func:`funnel_counts`
    (which counts stage reach but not time between stages).

    Shape: the pre-exchange filter keeps only the two event types; ONE
    user-hash-bucketed exchange of ``(user, ts, type)`` rows, per bucket
    one sort + two ``reduceat``-style first-of-run picks and a
    ``searchsorted``-free shifted scan — no per-user Python."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("event_type"),
                     value_set=pa.array([from_type, to_type]))
        t = batch.filter(m).select(["user_id", "ts", "event_type"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "from_ts": pa.array([], pa.int64()),
                      "to_ts": pa.array([], pa.int64()),
                      "lag_us": pa.array([], pa.int64())})

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        n = t.num_rows
        if n == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        is_from = pc.equal(t.column("event_type"), from_type).to_numpy(
            zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        # first from_type position per user (n if none): argmax over the
        # run of the is_from mask, guarded by any()
        has_from = np.add.reduceat(is_from, starts) > 0
        # positions of from events; first per run via minimum.reduceat
        # over position-or-n
        pos = np.where(is_from, np.arange(n), n)
        first_from = np.minimum.reduceat(pos, starts)
        # first to_type at or after first_from: same trick with the
        # condition is_to & (pos >= first_from_of_my_run)
        is_to = ~is_from
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        pos_to = np.where(is_to & (np.arange(n) >= first_from[run_of]),
                          np.arange(n), n)
        first_to = np.minimum.reduceat(pos_to, starts)
        ok = has_from & (first_to < n)
        ff, ft = first_from[ok], first_to[ok]
        return pa.table({
            "user_id": pa.array(uid[starts][ok], pa.int64()),
            "from_ts": pa.array(ts[ff], pa.int64()),
            "to_ts": pa.array(ts[ft], pa.int64()),
            "lag_us": pa.array(ts[ft] - ts[ff], pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(per_bucket, batch_format="pyarrow")


def hopping_distinct_users(ds, window_minutes: int = 60,
                           slide_minutes: int = 15,
                           num_buckets: int = 64):
    """Sliding COUNT DISTINCT: how many distinct users were active in
    each hopping window → ``(window_start_us, n_users)`` — the windowed
    twin of :func:`distinct_users_per_type`, and the audience-size /
    active-user curve every event pipeline wants.

    Exact at scale without shuffling raw events twice: each batch first
    collapses to its own distinct ``(user, window)`` pairs (np.unique on
    packed codes), then ONE user-hash-bucketed exchange — a user's every
    appearance lands in one bucket, so a per-bucket np.unique makes the
    pairs globally distinct — and each bucket emits bounded
    ``(window, n)`` partials for a tiny window-keyed final sum.  Raw
    events never cross the wire; the exchange carries at most one row
    per (user, window) per batch."""
    assert window_minutes % slide_minutes == 0, \
        "window must be a multiple of slide"
    slide_us = slide_minutes * 60_000_000
    nw = window_minutes // slide_minutes

    from ..functions.arrowutil import id_buckets

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        base = (ts // slide_us) * slide_us
        starts = (
            base[:, None]
            - np.arange(nw, dtype=np.int64)[None, :] * slide_us
        ).reshape(-1)
        users = np.repeat(uid, nw)
        # distinct within the batch via one sort over packed pairs
        pairs = np.stack((users, starts), axis=1)
        pairs = np.unique(pairs, axis=0)
        t = pa.table({
            "user_id": pa.array(pairs[:, 0], pa.int64()),
            "window_start_us": pa.array(pairs[:, 1], pa.int64()),
        })
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        w = group.column("window_start_us").to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack((u, w), axis=1), axis=0)
        wins, cnts = np.unique(pairs[:, 1], return_counts=True)
        return pa.table({
            "window_start_us": pa.array(wins, pa.int64()),
            "n_users": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def user_streaks(ds, num_buckets: int = 64):
    """Gaps-and-islands: per user, the longest streak of CONSECUTIVE
    active days, the number of activity islands, and total distinct
    active days → ``(user_id, n_days, n_islands, longest_streak)`` —
    the classic engagement-streak query.

    Shape: ONE user-hash-bucketed exchange of distinct ``(user, day)``
    pairs (batches pre-dedup, so the exchange carries at most one row
    per user-day per batch); per bucket one sort, island boundaries from
    a shifted day-difference compare, and per-user maxima via
    ``np.maximum.reduceat`` — no per-user Python, no window functions."""
    from ..functions.arrowutil import id_buckets

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = ts // day_us
        pairs = np.unique(np.stack((uid, day), axis=1), axis=0)
        t = pa.table({
            "user_id": pa.array(pairs[:, 0], pa.int64()),
            "day": pa.array(pairs[:, 1], pa.int64()),
        })
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_days": pa.array([], pa.int64()),
                      "n_islands": pa.array([], pa.int64()),
                      "longest_streak": pa.array([], pa.int64())})

    def per_bucket(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        d = group.column("day").to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return empty
        pairs = np.unique(np.stack((u, d), axis=1), axis=0)
        u, d = pairs[:, 0], pairs[:, 1]
        n = len(u)
        new_user = np.ones(n, bool)
        new_user[1:] = u[1:] != u[:-1]
        # island starts: new user OR a gap of more than one day
        new_island = new_user.copy()
        new_island[1:] |= d[1:] != d[:-1] + 1
        isl_starts = np.flatnonzero(new_island)
        isl_lens = np.diff(np.concatenate((isl_starts, [n])))
        user_starts = np.flatnonzero(new_user)
        # per-user fold over islands: each island belongs to the user of
        # its first row
        isl_user_idx = np.searchsorted(user_starts, isl_starts, "right") - 1
        isl_run_starts = np.flatnonzero(
            np.concatenate(([True], isl_user_idx[1:] != isl_user_idx[:-1])))
        longest = np.maximum.reduceat(isl_lens, isl_run_starts)
        n_islands = np.diff(
            np.concatenate((isl_run_starts, [len(isl_lens)])))
        n_days = np.diff(np.concatenate((user_starts, [n])))
        return pa.table({
            "user_id": pa.array(u[user_starts], pa.int64()),
            "n_days": pa.array(n_days.astype(np.int64), pa.int64()),
            "n_islands": pa.array(n_islands.astype(np.int64), pa.int64()),
            "longest_streak": pa.array(longest.astype(np.int64),
                                       pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(per_bucket, batch_format="pyarrow")


def twap_by_user_day(ds, num_buckets: int = 64):
    """Time-weighted average value per (user, day): each event's value
    "holds" until the user's next event that day; the last event of the
    day holds to midnight → ``(user_id, day_us, twap)``.  The market-
    data TWAP shape (piecewise-constant integral / elapsed time) over
    the events table.

    Exactness discipline: values quantize to integer cents, durations
    are integer microseconds, the weighted sum is one int64 dot product
    per user-day (cents × µs ≤ ~1e4·8.6e10 ≈ 1e15 per day — inside
    int64), and the single double division is pinned LAST so an oracle
    reproduces it bit-for-bit.  Days with one event degenerate to that
    event's value.  ONE user-hash exchange; per bucket one sort + one
    ``reduceat``."""
    from ..functions.arrowutil import id_buckets

    day_us = 86_400_000_000

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "value"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()),
        )

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "day_us": pa.array([], pa.int64()),
                      "twap": pa.array([], pa.float64())})

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        day = (ts // day_us) * day_us
        last = np.ones(n, bool)
        last[:-1] = (uid[:-1] != uid[1:]) | (day[:-1] != day[1:])
        nxt = np.empty(n, np.int64)
        nxt[:-1] = ts[1:]
        nxt[last] = day[last] + day_us  # holds to midnight
        dur = nxt - ts
        starts = np.flatnonzero(np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (day[1:] != day[:-1]))))
        wsum = np.add.reduceat(cents * dur, starts)
        tsum = np.add.reduceat(dur, starts)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "day_us": pa.array(day[starts], pa.int64()),
            "twap": pa.array(
                wsum.astype(np.float64) / tsum.astype(np.float64)
                / np.float64(100.0),
                pa.float64()),
        })

    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(per_bucket, batch_format="pyarrow")


def cumulative_users(ds, num_buckets: int = 64):
    """Running distinct-user curve: for every active day, how many users
    appeared that day for the FIRST time and how many distinct users the
    corpus has seen up to and including it → ``(day_us, new_users,
    cumulative_users)`` — the growth-accounting twin of
    :func:`rolling_active_users` (which windows activity; this one never
    forgets).

    Shape: per-batch partial argmin (one row per user per batch), ONE
    user-hash bucketed merge to the global first-seen day per user, a
    day-keyed count bounded by #active-days, and the cumulative sum on
    that tiny day table driver-side."""
    from ..functions.arrowutil import id_buckets

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = (ts // day_us) * day_us
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        first = np.ones(len(u), bool)
        first[1:] = u[1:] != u[:-1]
        t = pa.table({"user_id": pa.array(u[first], pa.int64()),
                      "first_day": pa.array(d[first], pa.int64())})
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        day = group.column("first_day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        first = np.ones(len(u), bool)
        if len(u) > 1:
            first[1:] = u[1:] != u[:-1]
        days, cnts = np.unique(d[first], return_counts=True)
        return pa.table({"day_us": pa.array(days, pa.int64()),
                         "new_users": pa.array(cnts.astype(np.int64),
                                               pa.int64())})

    per_day = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .groupby("day_us")
        .aggregate(Sum("new_users", alias_name="new_users"))
    ).to_pandas()  # bounded by #active days
    per_day = per_day.sort_values("day_us").reset_index(drop=True)
    per_day["cumulative_users"] = per_day["new_users"].cumsum()
    return pa.Table.from_pandas(
        per_day[["day_us", "new_users", "cumulative_users"]].astype(
            {"new_users": np.int64, "cumulative_users": np.int64}))


def churned_users(ds, inactive_hours: int = 12, num_buckets: int = 64):
    """Churn screen: users whose LAST event is more than
    ``inactive_hours`` before the corpus's maximum timestamp →
    ``(user_id, last_ts, hours_inactive)`` — the retention ops
    counterpart of :func:`conversion_lag`.

    Shape: per-batch partial argmax (one row per user per batch), ONE
    user-hash bucketed merge to the global last-seen timestamp, then a
    stateless filter against the corpus max (a scalar computed by
    ``Dataset.max`` — one tiny fold, not a sort)."""
    from ..functions.arrowutil import id_buckets

    hour_us = 3_600_000_000
    corpus_max = ds.max("ts")
    if corpus_max is None:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "last_ts": pa.array([], pa.int64()),
                         "hours_inactive": pa.array([], pa.int64())})
    max_us = int(pa.scalar(corpus_max).cast(pa.timestamp("us")).cast(
        pa.int64()).as_py())

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((-ts, uid))
        u, t = uid[order], ts[order]
        first = np.ones(len(u), bool)
        first[1:] = u[1:] != u[:-1]
        out = pa.table({"user_id": pa.array(u[first], pa.int64()),
                        "last_ts": pa.array(t[first], pa.int64())})
        return out.append_column(
            "bucket",
            pa.array(id_buckets(out.column("user_id"), num_buckets),
                     pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("last_ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((-ts, uid))
        u, t = uid[order], ts[order]
        first = np.ones(len(u), bool)
        if len(u) > 1:
            first[1:] = u[1:] != u[:-1]
        u, t = u[first], t[first]
        inactive = (max_us - t) // hour_us
        keep = inactive > inactive_hours
        return pa.table({
            "user_id": pa.array(u[keep], pa.int64()),
            "last_ts": pa.array(t[keep], pa.int64()),
            "hours_inactive": pa.array(inactive[keep].astype(np.int64),
                                       pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(merge, batch_format="pyarrow")


def entry_events(ds, num_buckets: int = 64):
    """First-touch attribution: each user's FIRST event type, counted →
    ``(event_type, n_users, share)`` (share = n_users / total users as
    one pinned double division) — the entry-page analysis over the
    events table.

    Shape: per-batch partial argmin keeps one (user, ts, id, type) row
    per user per batch; ONE user-hash bucketed merge repeats the argmin
    globally; the final count is type-bounded and the share math runs on
    that tiny table driver-side."""
    from ..functions.arrowutil import id_buckets

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type"])
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        first = np.ones(len(uid), bool)
        first[1:] = uid[1:] != uid[:-1]
        t = t.filter(pa.array(first))
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        first = np.ones(len(uid), bool)
        if len(uid) > 1:
            first[1:] = uid[1:] != uid[:-1]
        t = t.filter(pa.array(first))
        d = _dict_encode(t.column("event_type"))
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary))
        return pa.table({
            "event_type": d.dictionary,
            "n_users": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    ).to_pandas()  # bounded by #event types
    total = int(agg["n_users"].sum())
    agg["share"] = agg["n_users"].astype(np.float64) / np.float64(total)
    agg = agg.sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(agg[["event_type", "n_users", "share"]])


def rfm_metrics(ds, num_buckets: int = 64):
    """RFM segmentation inputs per customer: Recency (days between the
    customer's last order and the corpus's newest order), Frequency
    (order count), Monetary (total price in exact integer cents) →
    ``(c_custkey, recency_days, frequency, monetary_cents)`` — the
    classic marketing-segmentation triple.

    Shape: per-batch combinable partials (argmax date, count, cents sum
    per customer in the batch), ONE customer-hash bucketed merge, and a
    scalar ``Dataset.max`` fold for the corpus-max date — never a sort,
    never a driver collect of customers."""
    from ..functions.arrowutil import id_buckets

    day_us = 86_400_000_000
    mx = ds.max("o_orderdate")
    max_us = int(pa.scalar(mx).cast(pa.timestamp("us")).cast(
        pa.int64()).as_py())

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        dt = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        order = np.argsort(ck, kind="stable")
        ck, dt, cents = ck[order], dt[order], cents[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ck[1:] != ck[:-1])))
        t = pa.table({
            "c_custkey": pa.array(ck[starts], pa.int64()),
            "last_us": pa.array(np.maximum.reduceat(dt, starts),
                                pa.int64()),
            "frequency": pa.array(
                np.diff(np.concatenate((starts, [len(ck)]))).astype(
                    np.int64), pa.int64()),
            "monetary_cents": pa.array(np.add.reduceat(cents, starts),
                                       pa.int64()),
        })
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("c_custkey"), num_buckets),
                     pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        ck = group.column("c_custkey").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck = ck[order]
        lu = group.column("last_us").to_numpy(zero_copy_only=False)[order]
        fr = group.column("frequency").to_numpy(zero_copy_only=False)[order]
        mo = group.column("monetary_cents").to_numpy(
            zero_copy_only=False)[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ck[1:] != ck[:-1])))
        last = np.maximum.reduceat(lu, starts)
        return pa.table({
            "c_custkey": pa.array(ck[starts], pa.int64()),
            "recency_days": pa.array((max_us - last) // day_us,
                                     pa.int64()),
            "frequency": pa.array(np.add.reduceat(fr, starts), pa.int64()),
            "monetary_cents": pa.array(np.add.reduceat(mo, starts),
                                       pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(merge, batch_format="pyarrow")


def dup_size_hist(ds, text_col: str = "text", num_buckets: int = 64):
    """Duplicate-family size distribution: group documents by exact
    content (the full 128-bit md5 of the text — the exact-dedup key,
    split into two int64 halves so no truncation ever merges families)
    and histogram the family sizes → ``(cluster_size, n_clusters)`` —
    the one-table answer to "how duplicated is this corpus?", the
    summary the dedup family's per-pair outputs don't give directly.

    Shape: per-batch partial (digest → count) rows, ONE digest-hash
    bucketed merge to exact family sizes (the 16-byte digest, not the
    text, rides the exchange), then a size-keyed count bounded by the
    largest family."""
    import hashlib

    from ..functions.arrowutil import id_buckets

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        d = txt.dictionary_encode()
        # md5 once per DISTINCT text in the batch
        m = len(d.dictionary)
        hi = np.empty(m, np.uint64)
        lo = np.empty(m, np.uint64)
        for i, s in enumerate(d.dictionary.to_pylist()):
            dig = hashlib.md5(s.encode("utf-8")).digest()
            hi[i] = int.from_bytes(dig[:8], "big", signed=False)
            lo[i] = int.from_bytes(dig[8:], "big", signed=False)
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=m)
        t = pa.table({
            "hi": pa.array(hi.view(np.int64), pa.int64()),
            "lo": pa.array(lo.view(np.int64), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("hi"), num_buckets),
                     pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        hi = group.column("hi").to_numpy(zero_copy_only=False)
        lo = group.column("lo").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((lo, hi))
        hi, lo, n = hi[order], lo[order], n[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1]))))
        sizes = np.add.reduceat(n, starts)
        sv, sc = np.unique(sizes, return_counts=True)
        return pa.table({
            "cluster_size": pa.array(sv.astype(np.int64), pa.int64()),
            "n_clusters": pa.array(sc.astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
    )


def length_concentration(ds, pcts=(1, 5, 10, 25, 50),
                         len_col: str = "n_chars"):
    """Corpus length-concentration curve: for each percentile p, the
    length cutoff ``L_p`` (the value at the top-p% boundary of the
    length distribution) and the EXACT share of total characters held
    by documents with ``len ≥ L_p`` → ``(pct, len_cutoff, n_docs,
    chars_share)`` — the "how much of my corpus is a few giant docs"
    audit, tie-inclusive so the answer is deterministic without any
    per-document global ranking.

    Shape: one streaming pass builds a ``(len, n_docs, sum_chars)``
    histogram whose size is bounded by DISTINCT length values (lengths
    are small ints, not doc-cardinality), merged by one tiny keyed sum;
    cutoffs and shares come from a cumsum over that histogram
    driver-side.  The global sort a row-ranked top-p% would need never
    happens."""
    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(len_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        sums = vals * cnts  # every doc of length L contributes L chars
        return pa.table({
            "len": pa.array(vals, pa.int64()),
            "n_docs": pa.array(cnts.astype(np.int64), pa.int64()),
            "sum_chars": pa.array(sums.astype(np.int64), pa.int64()),
        })

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("len")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"))
    ).to_pandas().sort_values("len", ascending=False).reset_index(drop=True)
    n_total = int(hist["n_docs"].sum())
    c_total = int(hist["sum_chars"].sum())
    cum_docs = hist["n_docs"].cumsum().to_numpy()
    cum_chars = hist["sum_chars"].cumsum().to_numpy()
    lens = hist["len"].to_numpy()
    out = {"pct": [], "len_cutoff": [], "n_docs": [], "chars_share": []}
    for p in pcts:
        k = max(1, (n_total * p) // 100)
        i = int(np.searchsorted(cum_docs, k, side="left"))
        out["pct"].append(int(p))
        out["len_cutoff"].append(int(lens[i]))
        out["n_docs"].append(int(cum_docs[i]))
        out["chars_share"].append(float(cum_chars[i]) / float(c_total))
    return pa.table({
        "pct": pa.array(out["pct"], pa.int64()),
        "len_cutoff": pa.array(out["len_cutoff"], pa.int64()),
        "n_docs": pa.array(out["n_docs"], pa.int64()),
        "chars_share": pa.array(out["chars_share"], pa.float64()),
    })


def anomaly_days(ds, k: int = 3):
    """Operational anomaly screen over the event stream: days whose
    event count deviates from the corpus's median daily count by more
    than ``k`` × MAD → ``(day_us, n_events, med, mad, is_anomaly)``
    for every active day — the robust (outlier-immune) twin of a
    z-score alert, built on the :func:`robust_stats_by_group`
    median/MAD discipline.

    Shape: one streaming pass of per-batch ``(day, n)`` partials, one
    day-keyed sum bounded by #active-days, then median/MAD and the flag
    on that tiny table driver-side — integers end to end, so the flag
    is bit-deterministic."""
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = (ts // day_us) * day_us
        vals, cnts = np.unique(day, return_counts=True)
        return pa.table({"day_us": pa.array(vals, pa.int64()),
                         "n_events": pa.array(cnts.astype(np.int64),
                                              pa.int64())})

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day_us")
        .aggregate(Sum("n_events", alias_name="n_events"))
    ).to_pandas().sort_values("day_us").reset_index(drop=True)
    n = t["n_events"].to_numpy()
    # median = lower-median (rank ceil(m/2) of the sorted values), the
    # robust_stats_by_group convention (quantile_disc 0.5)
    s = np.sort(n)
    med = int(s[(len(s) - 1) // 2])
    dev = np.sort(np.abs(n - med))
    mad = int(dev[(len(dev) - 1) // 2])
    t["med"] = np.int64(med)
    t["mad"] = np.int64(mad)
    t["is_anomaly"] = np.abs(t["n_events"].to_numpy() - med) > k * mad
    return pa.Table.from_pandas(
        t[["day_us", "n_events", "med", "mad", "is_anomaly"]])


def type_corr(ds):
    """Pearson correlation between every PAIR of event types' daily
    revenue series → ``(t1, t2, corr)`` for t1 < t2 — "do purchases and
    clicks move together day to day?".  Exactness: the daily series are
    integer cents sums; the pairwise moments (n, Σx, Σy, Σxy, Σx²,
    Σy²) are exact integers double-cast BEFORE the one float expression
    (the :func:`corr_by_nation` discipline), so every corr is
    bit-reproducible.

    Shape: per-batch ``(day, type, cents)`` partials, one (day, type)-
    keyed sum bounded by days × types, then the types²-sized pairwise
    moment fold on that tiny table driver-side."""
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = (ts // day_us) * day_us
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = _dict_encode(batch.column("event_type"))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kk = len(d.dictionary)
        key = day * kk + codes
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=cents, minlength=len(uk)).astype(
            np.int64)
        return pa.table({
            "day_us": pa.array(uk // kk, pa.int64()),
            "event_type": d.dictionary.take(pa.array(uk % kk)),
            "cents": pa.array(sums, pa.int64()),
        })

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day_us", "event_type"])
        .aggregate(Sum("cents", alias_name="cents"))
    ).to_pandas()
    # dense (day × type) matrix; a type with no events on a day is 0
    piv = t.pivot_table(index="day_us", columns="event_type",
                        values="cents", fill_value=0, aggfunc="sum")
    piv = piv.sort_index()
    types = sorted(piv.columns)
    m = len(piv)
    out = {"t1": [], "t2": [], "corr": []}
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            x = piv[types[i]].to_numpy().astype(np.int64)
            y = piv[types[j]].to_numpy().astype(np.int64)
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sxx, syy = int((x * x).sum()), int((y * y).sum())
            cov = float(m) * float(sxy) - float(sx) * float(sy)
            vx = float(m) * float(sxx) - float(sx) * float(sx)
            vy = float(m) * float(syy) - float(sy) * float(sy)
            # math.sqrt, not **0.5: pow(x, .5) is not guaranteed the
            # IEEE sqrt the SQL side uses
            c = (cov / math.sqrt(vx) / math.sqrt(vy)
                 if vx > 0 and vy > 0 else 0.0)
            out["t1"].append(types[i])
            out["t2"].append(types[j])
            out["corr"].append(c)
    return pa.table({"t1": pa.array(out["t1"], pa.string()),
                     "t2": pa.array(out["t2"], pa.string()),
                     "corr": pa.array(out["corr"], pa.float64())})


def dup_rate_by_source(ds, text_col: str = "text",
                       source_col: str = "source", num_buckets: int = 64):
    """Per-source duplication report: document count, distinct-content
    count and the duplicate rate → ``(source, n_docs, n_distinct,
    dup_rate)`` — "which source is feeding me copies?", the provenance
    twin of :func:`dup_size_hist`.

    Shape: per-batch (source, digest → count) partials (full 128-bit
    digests, never the text), ONE digest-hash bucketed merge — a
    content family lives in one bucket, so per-bucket family counting
    is exact — emitting per-bucket per-source (n_docs, n_distinct)
    partials, then a source-keyed sum and one pinned double division."""
    import hashlib

    from ..functions.arrowutil import id_buckets

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        sd = src.dictionary_encode()
        si = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = txt.dictionary_encode()
        m = len(d.dictionary)
        hi = np.empty(m, np.uint64)
        lo = np.empty(m, np.uint64)
        for i, s in enumerate(d.dictionary.to_pylist()):
            dig = hashlib.md5(s.encode("utf-8")).digest()
            hi[i] = int.from_bytes(dig[:8], "big", signed=False)
            lo[i] = int.from_bytes(dig[8:], "big", signed=False)
        ti = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = si * m + ti
        uk, cnts = np.unique(key, return_counts=True)
        t = pa.table({
            source_col: sd.dictionary.take(pa.array(uk // m)),
            "hi": pa.array(hi.view(np.int64)[uk % m], pa.int64()),
            "lo": pa.array(lo.view(np.int64)[uk % m], pa.int64()),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
        })
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("hi"), num_buckets), pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        sd = group.column(source_col)
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        se = sd.dictionary_encode()
        si = se.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hi = group.column("hi").to_numpy(zero_copy_only=False)
        lo = group.column("lo").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((lo, hi, si))
        si, hi, lo, n = si[order], hi[order], lo[order], n[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (si[1:] != si[:-1]) | (hi[1:] != hi[:-1])
             | (lo[1:] != lo[:-1]))))
        fam_src = si[starts]
        fam_docs = np.add.reduceat(n, starts)
        sv = np.unique(fam_src)
        docs = np.zeros(len(sv), np.int64)
        dist = np.zeros(len(sv), np.int64)
        pos = np.searchsorted(sv, fam_src)
        np.add.at(docs, pos, fam_docs)
        np.add.at(dist, pos, 1)
        return pa.table({
            source_col: se.dictionary.take(pa.array(sv)),
            "n_docs": pa.array(docs, pa.int64()),
            "n_distinct": pa.array(dist, pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .groupby(source_col)
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_distinct", alias_name="n_distinct"))
    ).to_pandas()  # bounded by #sources
    agg["dup_rate"] = 1.0 - (agg["n_distinct"].astype(np.float64)
                             / agg["n_docs"].astype(np.float64))
    agg = agg.sort_values(source_col).reset_index(drop=True)
    return pa.Table.from_pandas(
        agg[[source_col, "n_docs", "n_distinct", "dup_rate"]])


def dwell_percentiles(ds, ps=(25, 50, 75, 95), num_buckets: int = 64):
    """EXACT dwell-time percentiles per event type: the minutes until
    the SAME user's next event (any type), attributed to the earlier
    event's type → ``(event_type, p, minutes)`` with percentile-disc
    semantics — "after a click, how long until the user does anything
    again?".  A user's last event has no dwell and is excluded.

    Shape: ONE user-hash-bucketed exchange of narrow ``(user, ts, id,
    type)`` rows; per bucket one sort + a shifted same-user gap compute
    folding straight into ``(type, minutes)`` histogram partials; the
    final histogram is |types| × |distinct minute values| — bounded by
    the corpus time span, not its row count (the
    :func:`grouped_value_percentiles` discipline on a derived column).
    """
    import math

    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()))

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "minutes": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})

    def partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n < 2:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        mins = (ts[1:] - ts[:-1]) // 60_000_000
        d = _dict_encode(t.column("event_type"))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[:-1][same]
        mins = mins[same]
        if len(mins) == 0:
            return empty
        mmax = int(mins.max()) + 1
        vals, cnts = np.unique(codes * mmax + mins, return_counts=True)
        return pa.table({
            "event_type": d.dictionary.take(pa.array(vals // mmax)),
            "minutes": pa.array((vals % mmax).astype(np.int64),
                                pa.int64()),
            "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    hist = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial, batch_format="pyarrow")
        .groupby(["event_type", "minutes"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    ).to_pandas().sort_values(["event_type", "minutes"])
    out_g, out_p, out_m = [], [], []
    for g, sub in hist.groupby("event_type", sort=True):
        cum = sub["cnt"].cumsum().to_numpy()
        vals = sub["minutes"].to_numpy()
        n = int(cum[-1])
        for p in ps:
            k = max(1, math.ceil(p / 100.0 * n))
            out_g.append(g)
            out_p.append(int(p))
            out_m.append(int(vals[np.searchsorted(cum, k)]))
    return pa.table({
        "event_type": pa.array(out_g, pa.string()),
        "p": pa.array(out_p, pa.int64()),
        "minutes": pa.array(out_m, pa.int64()),
    })


def q6_revenue(ds, year: int = 1996, disc_lo: float = 0.02,
               disc_hi: float = 0.08, max_qty: float = 24.0):
    """TPC-H Q6 (forecast revenue change): one filtered aggregate
    ``Σ extendedprice · discount`` over a shipdate year, a discount
    band and a quantity cap → one row ``(revenue, n_items)``.

    The canonical predicate-pushdown aggregate: the filter and the
    per-batch partial run inside ONE stateless map_batches (a single
    int64 per batch reaches the driver), and at the storage level the
    shipdate predicate belongs in the parquet scan (`read_parquet`
    row-group pruning) — this function applies it vectorized so the
    semantics hold on any input.

    Exactness: price → cents and discount → basis points are exact
    2-decimal integers, so each item's contribution ``cents · bp`` is
    an exact int64 (≤ 1e7 · 1e3) and the corpus sum is order-free;
    revenue = the single pinned double division by 100·10000 at the
    end."""
    lo_us = np.datetime64(f"{year}-01-01").astype(
        "datetime64[us]").astype(np.int64)
    hi_us = np.datetime64(f"{year + 1}-01-01").astype(
        "datetime64[us]").astype(np.int64)
    bp_lo = int(round(disc_lo * 10000))
    bp_hi = int(round(disc_hi * 10000))

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        disc_bp = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False)
            * 10000.0 + 0.5).astype(np.int64)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5).astype(np.int64)
        m = ((ship >= lo_us) & (ship < hi_us)
             & (disc_bp >= bp_lo) & (disc_bp <= bp_hi)
             & (qty < max_qty))
        return pa.table({
            "rev_u": pa.array([int((cents[m] * disc_bp[m]).sum())],
                              pa.int64()),
            "n_items": pa.array([int(m.sum())], pa.int64()),
        })

    sums = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["rev_u", "n_items"])
    rev_u = int(sums["sum(rev_u)"])
    return pa.table({
        "revenue": pa.array([float(rev_u) / 1000000.0], pa.float64()),
        "n_items": pa.array([int(sums["sum(n_items)"])], pa.int64()),
    })


def last_touch_attribution(ds, revenue_type: str = "purchase",
                           num_buckets: int = 64):
    """Last-touch revenue attribution: every ``revenue_type`` event's
    value (integer cents) is credited to the user's IMMEDIATELY
    PRECEDING event's type → ``(event_type, attributed_cents,
    n_conversions)`` — the marketing-attribution twin of
    :func:`entry_events` (first-touch).  A purchase with no preceding
    event credits the ``'(none)'`` bucket.

    Shape: ONE user-hash-bucketed exchange of narrow rows, per bucket
    one sort + a shifted same-user mask picking each revenue event's
    predecessor type, a type-bounded ``(type, cents, n)`` partial, one
    tiny keyed sum."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type",
                          "value"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()))

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "attributed_cents": pa.array([], pa.int64()),
                      "n_conversions": pa.array([], pa.int64())})

    def partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        is_rev = pc.equal(t.column("event_type"), revenue_type).to_numpy(
            zero_copy_only=False)
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = _dict_encode(t.column("event_type"))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(d.dictionary)
        # predecessor type code; k = the '(none)' sentinel
        prev = np.full(n, k, np.int64)
        if n > 1:
            same = uid[1:] == uid[:-1]
            prev[1:][same] = codes[:-1][same]
        sel = np.flatnonzero(is_rev)
        if sel.size == 0:
            return empty
        pc_codes = prev[sel]
        csum = np.bincount(pc_codes, weights=cents[sel],
                           minlength=k + 1).astype(np.int64)
        ncnt = np.bincount(pc_codes, minlength=k + 1)
        used = np.flatnonzero(ncnt)
        names = pa.concat_arrays(
            [d.dictionary.cast(pa.string()),
             pa.array(["(none)"], pa.string())])
        return pa.table({
            "event_type": names.take(pa.array(used)),
            "attributed_cents": pa.array(csum[used], pa.int64()),
            "n_conversions": pa.array(ncnt[used].astype(np.int64),
                                      pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("attributed_cents", alias_name="attributed_cents"),
                   Sum("n_conversions", alias_name="n_conversions"))
    )


def q14_promo(lineitem_ds, sf_dir: str, month: str = "1996-09"):
    """TPC-H Q14 (promotion effect): the share of one shipdate month's
    revenue carried by promo-class parts → one row ``(promo_revenue,
    total_revenue, promo_pct, n_promo, n_items)``.

    Part class is the dimension-bitmap broadcast (the corr_by_nation /
    orders_per_nation pattern): ``p_type == 'PROMO'`` packs to ONE BYTE
    per part, shipped once via ``ray.put`` and indexed per batch — the
    lineitem⋈part join never shuffles.  A lineitem partkey outside the
    part table fails loudly (unknown-key precedent, corr_by_nation).

    Exactness: revenue per item is the exact int64
    ``cents · (10000 − bp)`` (≤ ~1e13 per item, so a large batch's sum
    can exceed int64) — each partial therefore carries the per-item
    product split hi/lo 32-bit like corr_by_nation's Σc², recombined as
    a Python int after the merge.  The three output doubles are single
    pinned expressions over the exact integers, matching the oracle's
    expression tree bit-for-bit."""
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    is_promo_rows = pa.compute.equal(part.column("p_type"),
                                     "PROMO").to_numpy(
        zero_copy_only=False)
    promo = np.zeros(int(pk.max()) + 1, np.bool_)
    promo[pk[is_promo_rows]] = True
    known = np.zeros(int(pk.max()) + 1, np.bool_)
    known[pk] = True
    ref = ray.put((promo, known))

    lo_us = np.datetime64(f"{month}-01").astype(
        "datetime64[us]").astype(np.int64)
    mo = np.datetime64(f"{month}-01", "M") + np.timedelta64(1, "M")
    hi_us = mo.astype("datetime64[us]").astype(np.int64)

    class Partial:
        def __init__(self):
            self.promo, self.known = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            m = (ship >= lo_us) & (ship < hi_us)
            pks = batch.column("l_partkey").to_numpy(
                zero_copy_only=False)[m]
            bad = (pks < 0) | (pks >= len(self.known))
            if bad.any() or not self.known[pks].all():
                unknown = pks[bad] if bad.any() else pks[~self.known[pks]]
                raise ValueError(
                    "q14_promo: lineitem l_partkey has no part row "
                    f"(e.g. {int(unknown[0])})")
            cents = np.floor(
                batch.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[m] * 100.0 + 0.5
            ).astype(np.int64)
            bp = np.floor(
                batch.column("l_discount").to_numpy(
                    zero_copy_only=False)[m] * 10000.0 + 0.5
            ).astype(np.int64)
            rev = cents * (np.int64(10000) - bp)
            hi, lo = rev >> np.int64(32), rev & np.int64(0xFFFFFFFF)
            p = self.promo[pks]
            return pa.table({
                "t_hi": pa.array([int(hi.sum())], pa.int64()),
                "t_lo": pa.array([int(lo.sum())], pa.int64()),
                "p_hi": pa.array([int(hi[p].sum())], pa.int64()),
                "p_lo": pa.array([int(lo[p].sum())], pa.int64()),
                "n_promo": pa.array([int(p.sum())], pa.int64()),
                "n_items": pa.array([int(m.sum())], pa.int64()),
            })

    sums = lineitem_ds.map_batches(
        Partial, batch_format="pyarrow", concurrency=(1, 8)
    ).sum(["t_hi", "t_lo", "p_hi", "p_lo", "n_promo", "n_items"])
    total_u = (int(sums["sum(t_hi)"]) << 32) + int(sums["sum(t_lo)"])
    promo_u = (int(sums["sum(p_hi)"]) << 32) + int(sums["sum(p_lo)"])
    return pa.table({
        "promo_revenue": pa.array([float(promo_u) / 1000000.0],
                                  pa.float64()),
        "total_revenue": pa.array([float(total_u) / 1000000.0],
                                  pa.float64()),
        "promo_pct": pa.array(
            [100.0 * float(promo_u) / float(total_u)] if total_u
            else [0.0], pa.float64()),
        "n_promo": pa.array([int(sums["sum(n_promo)"])], pa.int64()),
        "n_items": pa.array([int(sums["sum(n_items)"])], pa.int64()),
    })


def q18_large_orders(lineitem_ds, orders_ds, customer_ds,
                     threshold: int = 250, k: int = 100):
    """TPC-H Q18 (large-volume customers): orders whose TOTAL lineitem
    quantity exceeds ``threshold``, with customer name — top ``k`` by
    ``o_totalprice`` desc (orderkey tiebreak) →
    ``(c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
    total_qty)``.

    Scale shape: (1) lineitem pre-aggregates quantity per orderkey per
    batch (np.unique+bincount partials — quantities are integral in
    TPC-H), ONE small keyed sum merges them; (2) the HAVING filter makes
    the qualifying set tiny (≲1e-2 of orders at threshold 250 — the
    selectivity TPC-H designed Q18 around), so it broadcasts as sorted
    key/total arrays via ``ray.put`` and orders semi-joins it per batch
    with searchsorted — no orders-side shuffle; (3) the surviving orders
    (≤ qualifying count) join customer by custkey-hash co-partition
    (`join.hash_join` — customer is NOT broadcastable at scale).  The
    driver materializes only the qualifying (orderkey, total) pairs and
    the final ≤k rows.

    o_totalprice passes through unmodified from parquet on both engine
    and oracle sides, so the double compares bit-exact."""
    import ray

    from .join import hash_join

    def qty_partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)
            + 0.5).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uniq, pa.int64()),
            "qty_part": pa.array(
                np.bincount(inv, weights=q).astype(np.int64), pa.int64()),
        })

    totals = (
        lineitem_ds.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty_part", alias_name="total_qty"))
        .filter(expr=f"total_qty > {int(threshold)}")
    )
    qual = totals.to_arrow_refs()
    parts = [t for t in ray.get(qual) if t.num_rows]
    if not parts:
        return pa.table({
            "c_name": pa.array([], pa.string()),
            "o_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_totalprice": pa.array([], pa.float64()),
            "total_qty": pa.array([], pa.int64()),
        })
    qt = pa.concat_tables(parts)
    keys = qt.column("l_orderkey").to_numpy(zero_copy_only=False)
    vals = qt.column("total_qty").to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))

    class SemiJoin:
        def __init__(self):
            self.keys, self.vals = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ok)
            pos_c = np.minimum(pos, len(self.keys) - 1)
            hit = self.keys[pos_c] == ok
            t = batch.select(["o_orderkey", "o_custkey", "o_orderdate",
                              "o_totalprice"]).filter(pa.array(hit))
            return t.append_column(
                "total_qty", pa.array(self.vals[pos_c[hit]], pa.int64()))

    qualified = orders_ds.map_batches(SemiJoin, batch_format="pyarrow",
                                      concurrency=(1, 8))
    joined = hash_join(
        qualified, customer_ds, on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "o_orderdate", "o_totalprice",
                   "total_qty"],
        right_cols=["c_name"],
    )
    return joined.sort(["o_totalprice", "o_orderkey"],
                       descending=[True, False]).limit(k)


def fill_forward_events(ds, carry_type: str = "purchase",
                        num_buckets: int = 64):
    """Last-observation-carried-forward (LOCF) imputation over user
    event streams: every event carries the cents value of the user's
    most recent ``carry_type`` event AT OR BEFORE it (its own, when it
    is one) → ``(event_id, carried_cents)`` with NULL before the user's
    first carry event — the gap-filling shape of feature
    backfills/sessionized state.

    Shape: ONE user-hash-bucketed exchange of ``(user_id, ts, event_id,
    is_carry, cents)`` rows; per bucket one sort and a vectorized
    forward-fill (running max of carry positions, reset at user
    boundaries via a parallel running max of segment starts) — no
    per-row Python, no driver materialization."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type",
                          "value"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()))

    def fill(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "carried_cents": pa.array([], pa.int64())})
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        is_c = pc.equal(t.column("event_type"), carry_type).to_numpy(
            zero_copy_only=False)
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        idx = np.arange(n, dtype=np.int64)
        # last carry position ≤ i (global), and each row's segment start
        last_carry = np.maximum.accumulate(np.where(is_c, idx, -1))
        is_start = np.empty(n, np.bool_)
        is_start[0] = True
        is_start[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(np.where(is_start, idx, -1))
        valid = last_carry >= seg_start
        carried = np.where(valid, cents[np.maximum(last_carry, 0)], 0)
        return pa.table({
            "event_id": t.column("event_id"),
            "carried_cents": pa.array(carried, pa.int64(),
                                      mask=~valid),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fill, batch_format="pyarrow")
    )


def burst_users(ds, k: int = 3, window_sec: int = 21600,
                num_buckets: int = 64):
    """Burst / bot-rate detection: per user, the number of events whose
    ``k-1``-back predecessor (same user, (ts, event_id) order) lies
    within ``window_sec`` — i.e. how many length-``k`` event runs fit
    in the window → ``(user_id, n_bursts)`` for users with ≥ 1 burst.
    The rate-limiter / scraper-detection primitive of web-scale event
    logs.

    Shape: one user-hash exchange of ``(user_id, ts_us, event_id)``,
    per bucket one sort + a shifted same-user timestamp diff, per-user
    bincount partial; users never split across buckets so no final
    merge groupby is needed."""
    from ..functions.arrowutil import id_buckets

    win_us = np.int64(int(window_sec) * 1_000_000)
    back = int(k) - 1
    if back < 1:
        raise ValueError("k must be >= 2")

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()))

    def count(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_bursts": pa.array([], pa.int64())})
        if n <= back:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hit = (uid[back:] == uid[:-back]) & \
            (ts[back:] - ts[:-back] <= win_us)
        if not hit.any():
            return empty
        hu = uid[back:][hit]
        uniq, inv = np.unique(hu, return_inverse=True)
        return pa.table({
            "user_id": pa.array(uniq, pa.int64()),
            "n_bursts": pa.array(np.bincount(inv).astype(np.int64),
                                 pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count, batch_format="pyarrow")
    )


def leading_digit_dist(ds, value_col: str = "value",
                       by_col: str = "event_type"):
    """Benford-style leading-digit audit: the distribution of the first
    significant digit of each row's integer cents, per ``by_col`` group
    → ``(event_type, digit, n)`` — the fraud/synthetic-data screen for
    value columns (Benford 1938; Nigrini's forensic-accounting usage).

    Digit extraction is exact: cents = ``floor(value·100)`` (the
    engine-wide cents rule) rendered to a decimal string, first char —
    never ``log10`` (whose float rounding misclassifies powers of ten).
    Rows with cents ≤ 0 are excluded (no leading significant digit).
    Shape: one stateless map_batches partial (≤ groups·9 rows per
    batch), one tiny keyed sum — no row-level shuffle."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        keep = cents > 0
        d = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(pa.array(cents[keep], pa.int64()), pa.string()),
            0, 1), pa.int64()).to_numpy(zero_copy_only=False)
        grp = _dict_encode(batch.column(by_col).filter(pa.array(keep)))
        codes = grp.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        k = len(grp.dictionary)
        cell = codes * 9 + (d - 1)
        cnt = np.bincount(cell, minlength=k * 9)
        used = np.flatnonzero(cnt)
        return pa.table({
            by_col: grp.dictionary.cast(pa.string()).take(
                pa.array(used // 9)),
            "digit": pa.array(used % 9 + 1, pa.int64()),
            "n": pa.array(cnt[used].astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([by_col, "digit"])
        .aggregate(Sum("n", alias_name="n"))
    )


def fold_token_stats(ds, n_folds: int = 20, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Deterministic jackknife folds for corpus statistics: docs are
    assigned to ``doc_id % n_folds`` and each fold reports its doc count,
    total whitespace tokens, and fixed-point mean ``sum·10⁶ // n`` →
    one row per fold.  The spread across folds is the cheap,
    reproducible standard-error estimate for corpus-mean metrics (no
    RNG, no resampling pass — the fold partition IS the bootstrap).

    Shape: per-batch bincount partials (≤ n_folds rows each), one tiny
    keyed sum; token semantics are the engine-wide whitespace-split
    (``_flat_tokens``) so oracles and other token ops agree."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        _, doc_idx = _flat_tokens(batch, text_col)
        tok_per_doc = np.bincount(doc_idx, minlength=len(ids)).astype(
            np.int64)
        fold = (ids % n_folds).astype(np.int64)
        return pa.table({
            "fold": pa.array(np.arange(n_folds, dtype=np.int64)),
            "n_docs": pa.array(
                np.bincount(fold, minlength=n_folds).astype(np.int64),
                pa.int64()),
            "sum_tokens": pa.array(
                np.bincount(fold, weights=tok_per_doc,
                            minlength=n_folds).astype(np.int64),
                pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fold")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_tokens", alias_name="sum_tokens"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_docs").to_numpy(zero_copy_only=False)
        s = batch.column("sum_tokens").to_numpy(zero_copy_only=False)
        nz = n > 0  # folds with no docs mirror SQL GROUP BY (absent)
        mean_u = (s[nz] * 1_000_000) // n[nz]
        return batch.filter(pa.array(nz)).append_column(
            "mean_tokens_u", pa.array(mean_u, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def self_join_size(ds, key_col: str = "user_id", k: int = 5):
    """Join-size / skew estimator: the exact cardinality each key would
    contribute to a self-equi-join on ``key_col`` (``c²`` for a key
    with ``c`` rows) → the top ``k`` keys by blowup, each with its
    parts-per-million share of the total →
    ``(user_id, n_events, pairs, share_ppm)``.

    This is the planner probe run BEFORE a join to decide salting /
    broadcast splits (cf. ``join.skew_join``'s hot-key threshold): a
    key with share_ppm ≫ 1e6/num_buckets will straggle any
    hash-partitioned join.  Computed without materializing a single
    joined row: per-batch key-count partials, one keyed sum, then a
    c² map — the total is carried hi/lo split so Σc² cannot overflow
    int64 (c² itself is bounded by design: a key beyond ~3·10⁹ rows
    overflows int64 pairs and raises rather than wraps)."""

    def partial(batch: pa.Table) -> pa.Table:
        ks = batch.column(key_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ks, return_inverse=True)
        return pa.table({
            key_col: pa.array(uniq, pa.int64()),
            "n_events": pa.array(np.bincount(inv).astype(np.int64),
                                 pa.int64()),
        })

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n_events", alias_name="n_events"))
    )

    def square(batch: pa.Table) -> pa.Table:
        c = batch.column("n_events").to_numpy(zero_copy_only=False)
        if (c > 3_037_000_499).any():  # isqrt(int64 max)
            raise ValueError("self_join_size: a key exceeds int64 pairs")
        p = c * c
        return pa.table({
            key_col: batch.column(key_col),
            "n_events": batch.column("n_events"),
            "pairs": pa.array(p, pa.int64()),
            "hi": pa.array(p >> np.int64(32), pa.int64()),
            "lo": pa.array(p & np.int64(0xFFFFFFFF), pa.int64()),
        })

    squared = counts.map_batches(square, batch_format="pyarrow")
    sums = squared.sum(["hi", "lo"])
    if sums is None:
        return pa.table({key_col: pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "pairs": pa.array([], pa.int64()),
                         "share_ppm": pa.array([], pa.int64())})
    total = (int(sums["sum(hi)"]) << 32) + int(sums["sum(lo)"])
    top = squared.drop_columns(["hi", "lo"]).sort(
        ["pairs", key_col], descending=[True, False]).limit(k)

    def share(batch: pa.Table) -> pa.Table:
        p = batch.column("pairs").to_numpy(zero_copy_only=False)
        ppm = np.array([int(x) * 1_000_000 // total for x in p],
                       np.int64)
        return batch.append_column("share_ppm", pa.array(ppm, pa.int64()))

    return top.map_batches(share, batch_format="pyarrow")


def q3_shipping(lineitem_ds, orders_ds, sf_dir: str,
                segment: str = "BUILDING", date: str = "1996-06-15",
                k: int = 10):
    """TPC-H Q3 (shipping-priority skeleton): top-``k`` unshipped orders
    of one market segment by outstanding revenue →
    ``(o_orderkey, revenue, o_orderdate)``.  (This corpus's orders table
    carries no o_shippriority column, so the output is the Q3 row minus
    that constant-per-order passthrough.)

    Scale shape, per join: customer is the dimension-bitmap broadcast
    (one BYTE of segment-membership per custkey, the orders_per_nation
    pattern) so orders ⋈ customer never shuffles; lineitem ⋈ orders is
    the genuine fact-fact join — lineitem pre-aggregates revenue per
    orderkey per batch (np.unique + bincount partials), ONE small keyed
    sum merges them, and `join.hash_join` co-partitions the two
    orderkey-keyed sides.  The top-k sort runs over the joined
    (already HAVING-thin) qualifying set only.

    Exactness: revenue units = Σ cents·(10000 − bp) are exact int64
    (per-batch bincount sums stay < 2^53 — ≤ 7 items/order · 1e11/item);
    the single double division by 1e6 happens after the global sum, so
    the sort key is bit-identical to the SQL oracle's."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    seg = pc.equal(cust.column("c_mktsegment"), segment).to_numpy(
        zero_copy_only=False)
    in_seg = np.zeros(int(ck.max()) + 1, bool)
    in_seg[ck[seg]] = True
    seg_ref = ray.put(in_seg)
    cut_us = int(np.datetime64(date).astype("datetime64[us]").astype(np.int64))

    class OrderFilter:
        def __init__(self):
            self.in_seg = ray.get(seg_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cks = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            m = (od < cut_us) & self.in_seg[cks]
            return batch.select(["o_orderkey", "o_orderdate"]).filter(
                pa.array(m))

    qual_orders = orders_ds.map_batches(OrderFilter, batch_format="pyarrow",
                                        concurrency=(1, 8))

    def rev_partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        m = ship > cut_us
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[m]
            * 100.0 + 0.5).astype(np.int64)
        bp = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False)[m]
            * 10000.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        rev = np.bincount(inv, weights=(cents * (10000 - bp)).astype(
            np.float64)).astype(np.int64)
        return pa.table({"l_orderkey": pa.array(uniq, pa.int64()),
                         "rev_u": pa.array(rev, pa.int64())})

    rev = (
        lineitem_ds.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_u", alias_name="rev_u"))
    )
    joined = hash_join(rev, qual_orders, on="l_orderkey",
                       right_on="o_orderkey", right_cols=["o_orderdate"])
    top = joined.sort(["rev_u", "l_orderkey"],
                      descending=[True, False]).limit(k)

    def finish(batch: pa.Table) -> pa.Table:
        rev_u = batch.column("rev_u").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": batch.column("l_orderkey"),
            "revenue": pa.array(rev_u.astype(np.float64) / 1e6,
                                pa.float64()),
            "o_orderdate": batch.column("o_orderdate"),
        })

    return top.map_batches(finish, batch_format="pyarrow")


def above_nation_avg(customer_ds):
    """Customers above their own nation's average account balance →
    per-nation ``(c_nationkey, n_customers, n_above, avg_cents)`` — the
    canonical correlated-subquery shape (`x > avg(x) over its group`)
    decorrelated into two streaming passes.

    Pass 1 folds each batch to ≤25 ``(nation, Σcents, n)`` partial rows
    (bincount) and ONE tiny keyed sum produces the per-nation moments,
    which broadcast as two dense arrays via ``ray.put``; pass 2
    re-scans customer and tests ``cents·n > Σcents`` — EXACT integer
    cross-multiplication, no float average ever compared (safe while
    ``max|cents| · n < 2^63``, i.e. nations below ~9e9 customers at
    1e6-cent balances).  ``avg_cents`` is the one double division,
    performed identically on the oracle side."""
    import ray

    def moments(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5).astype(np.int64)
        w = int(nk.max()) + 1 if nk.size else 1
        s = np.bincount(nk, weights=cents.astype(np.float64),
                        minlength=w).astype(np.int64)
        n = np.bincount(nk, minlength=w)
        nz = np.flatnonzero(n)
        return pa.table({
            "nk": pa.array(nz, pa.int64()),
            "s": pa.array(s[nz], pa.int64()),
            "n": pa.array(n[nz].astype(np.int64), pa.int64()),
        })

    agg = (
        customer_ds.map_batches(moments, batch_format="pyarrow")
        .groupby("nk").aggregate(Sum("s", alias_name="s"),
                                 Sum("n", alias_name="n"))
    ).take_all()
    if not agg:
        return pa.table({"c_nationkey": pa.array([], pa.int64()),
                         "n_customers": pa.array([], pa.int64()),
                         "n_above": pa.array([], pa.int64()),
                         "avg_cents": pa.array([], pa.float64())})
    w = max(int(r["nk"]) for r in agg) + 1
    sums = np.zeros(w, np.int64)
    ns = np.zeros(w, np.int64)
    for r in agg:
        sums[int(r["nk"])], ns[int(r["nk"])] = int(r["s"]), int(r["n"])
    ref = ray.put((sums, ns))

    class Above:
        def __init__(self):
            self.sums, self.ns = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            nk = batch.column("c_nationkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            cents = np.floor(
                batch.column("c_acctbal").to_numpy(zero_copy_only=False)
                * 100.0 + 0.5).astype(np.int64)
            above = cents * self.ns[nk] > self.sums[nk]
            cnt = np.bincount(nk[above], minlength=len(self.ns))
            nz = np.flatnonzero(cnt)
            return pa.table({"nk": pa.array(nz, pa.int64()),
                             "a": pa.array(cnt[nz].astype(np.int64),
                                           pa.int64())})

    above = (
        customer_ds.map_batches(Above, batch_format="pyarrow",
                                concurrency=(1, 8))
        .groupby("nk").aggregate(Sum("a", alias_name="a"))
    ).take_all()
    a_of = {int(r["nk"]): int(r["a"]) for r in above}
    nz = np.flatnonzero(ns)
    return pa.table({
        "c_nationkey": pa.array(nz, pa.int64()),
        "n_customers": pa.array(ns[nz], pa.int64()),
        "n_above": pa.array([a_of.get(int(k), 0) for k in nz], pa.int64()),
        "avg_cents": pa.array(sums[nz].astype(np.float64)
                              / ns[nz].astype(np.float64), pa.float64()),
    })


def order_gaps(orders_ds, num_buckets: int = 64):
    """Inter-order gap distribution: whole days between each customer's
    consecutive orders → ``(gap_days, n)`` — the lead/lag
    repeat-behavior histogram (reorder cadence, churn-model feature).

    Shape: ONE custkey-hash exchange of ``(custkey, orderdate,
    orderkey)`` narrow rows; per bucket one sort + a shifted same-key
    mask + integer-floor day division + one bincount partial; one tiny
    keyed sum merges bucket histograms.  Gap = ``(us₂ − us₁) //
    86 400 000 000`` — exact integer floor on both engine and oracle
    sides (timestamps are µs int64s)."""
    from ..functions.arrowutil import id_buckets

    US_PER_DAY = 86_400_000_000

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["o_custkey", "o_orderdate", "o_orderkey"])
        return t.append_column(
            "bucket", pa.array(id_buckets(t.column("o_custkey"),
                                          num_buckets), pa.int32()))

    def partial(group: pa.Table) -> pa.Table:
        t = group.sort_by([("o_custkey", "ascending"),
                           ("o_orderdate", "ascending"),
                           ("o_orderkey", "ascending")])
        if t.num_rows < 2:
            return pa.table({"gap_days": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        same = ck[1:] == ck[:-1]
        gaps = (us[1:] - us[:-1])[same] // US_PER_DAY
        uniq, cnt = np.unique(gaps, return_counts=True)
        return pa.table({"gap_days": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    return (
        orders_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket").map_groups(partial, batch_format="pyarrow")
        .groupby("gap_days").aggregate(Sum("n", alias_name="n"))
    )


def max_concurrency(events_ds, span_sec: int = 300):
    """Peak concurrency: the maximum number of simultaneously-open
    ``[ts, ts+span)`` intervals over the whole event stream → one row
    ``(max_concurrent,)`` — the classic sweep-line / distributed
    prefix-scan (capacity planning over sessions, connections, jobs).

    Shape: each event emits two boundary rows ``(t, ±1)`` (half-open
    intervals: at equal ``t`` the ``−1`` sorts first, so a closing
    interval frees its slot before a new one opens); ONE global
    ``Dataset.sort`` range-partitions the boundaries; each sorted block
    folds to TWO ints — (block Σδ, block max-prefix) plus its first key
    for ordering — and the driver's final scan is over per-block
    partials only (running offset + block max), never rows.  Identical
    to the oracle's ``max(sum(delta) OVER (ORDER BY t, delta ROWS
    UNBOUNDED PRECEDING))``: within an equal-(t,δ) peer group the
    prefix is monotonic, so the max is permutation-invariant."""
    import ray

    span_us = int(span_sec) * 1_000_000

    def boundaries(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = np.concatenate([us, us + span_us])
        d = np.concatenate([np.ones(len(us), np.int64),
                            np.full(len(us), -1, np.int64)])
        return pa.table({"t": pa.array(t, pa.int64()),
                         "delta": pa.array(d, pa.int64())})

    def block_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("delta").to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return pa.table({"first_t": pa.array([], pa.int64()),
                             "first_d": pa.array([], pa.int64()),
                             "bsum": pa.array([], pa.int64()),
                             "bmax": pa.array([], pa.int64())})
        cs = np.cumsum(d)
        return pa.table({
            "first_t": pa.array([int(batch.column("t")[0].as_py())],
                                pa.int64()),
            "first_d": pa.array([int(d[0])], pa.int64()),
            "bsum": pa.array([int(cs[-1])], pa.int64()),
            "bmax": pa.array([int(cs.max())], pa.int64()),
        })

    parts = (
        events_ds.map_batches(boundaries, batch_format="pyarrow")
        .sort(["t", "delta"])
        .map_batches(block_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    parts.sort(key=lambda r: (r["first_t"], r["first_d"]))
    offset, best = 0, 0
    for r in parts:
        best = max(best, offset + int(r["bmax"]))
        offset += int(r["bsum"])
    return pa.table({"max_concurrent": pa.array([best], pa.int64())})


def fk_orphans(lineitem_ds, orders_ds, customer_ds, sf_dir: str):
    """Referential-integrity audit: dangling foreign-key counts across
    the star schema → ``(relation, n_rows, n_orphans)`` — the
    pre-ingest validation sweep every warehouse load runs.

    Two shapes on purpose: true DIMENSION sides (customer→nation,
    lineitem→part/supplier) broadcast a sorted key array once via
    ``ray.put`` and each fact batch tests membership with searchsorted
    (no shuffle — fine to ~1e8-key dimensions); the FACT-FACT edge
    (lineitem→orders) cannot broadcast at scale, so it counts via
    `join.hash_join(how='anti')` on the pre-deduplicated per-batch key
    partials (the exchange carries distinct-per-batch keys + counts,
    not raw lineitems)."""
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    dims = {}
    for tbl, col in (("nation", "n_nationkey"), ("part", "p_partkey"),
                     ("supplier", "s_suppkey")):
        keys = pq.read_table(f"{sf_dir}/{tbl}.parquet", columns=[col]) \
            .column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        dims[tbl] = ray.put(np.sort(keys))

    def member_miss(ds, fk_col, dim_ref):
        class M:
            def __init__(self):
                self.keys = ray.get(dim_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                v = batch.column(fk_col).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                pos = np.searchsorted(self.keys, v)
                pos_c = np.minimum(pos, len(self.keys) - 1)
                miss = self.keys[pos_c] != v
                return pa.table({
                    "n_rows": pa.array([len(v)], pa.int64()),
                    "n_orphans": pa.array([int(miss.sum())], pa.int64()),
                })

        s = ds.map_batches(M, batch_format="pyarrow",
                           concurrency=(1, 4)).sum(["n_rows", "n_orphans"])
        if s is None:
            return 0, 0
        return int(s["sum(n_rows)"]), int(s["sum(n_orphans)"])

    def key_partial(col):
        def f(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            uniq, cnt = np.unique(v, return_counts=True)
            return pa.table({"fk": pa.array(uniq, pa.int64()),
                             "n": pa.array(cnt.astype(np.int64),
                                           pa.int64())})
        return f

    li_keys = (
        lineitem_ds.map_batches(key_partial("l_orderkey"),
                                batch_format="pyarrow")
        .groupby("fk").aggregate(Sum("n", alias_name="n"))
    )
    ord_keys = orders_ds.map_batches(
        lambda b: pa.table({"pk": b.column("o_orderkey")}),
        batch_format="pyarrow")
    dangling = hash_join(li_keys, ord_keys, on="fk", right_on="pk",
                         how="anti")
    miss_sum = dangling.sum("n")
    li_ord_orphans = int(miss_sum) if miss_sum is not None else 0

    rows = []
    n, o = member_miss(customer_ds, "c_nationkey", dims["nation"])
    rows.append(("customer.c_nationkey->nation", n, o))
    n_li, o = member_miss(lineitem_ds, "l_partkey", dims["part"])
    rows.append(("lineitem.l_partkey->part", n_li, o))
    _, o = member_miss(lineitem_ds, "l_suppkey", dims["supplier"])
    rows.append(("lineitem.l_suppkey->supplier", n_li, o))
    rows.append(("lineitem.l_orderkey->orders", n_li, li_ord_orphans))
    return pa.table({
        "relation": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_orphans": pa.array([r[2] for r in rows], pa.int64()),
    })


def vocab_growth(docs_ds, divisors: tuple = (8, 4, 2, 1),
                 text_col: str = "text"):
    """Vocabulary-growth (Heaps-law) checkpoints: the number of DISTINCT
    lowercased whitespace tokens among documents ``doc_id < N/d`` for
    each divisor ``d`` → ``(threshold, n_tokens)`` — the curve that
    tells a corpus builder whether more data still buys vocabulary.

    ONE pass, ONE shuffle regardless of checkpoint count: each batch
    folds to ``(token, min doc_id)`` partials (np.minimum.at over
    dictionary codes), a keyed Min merges them, and each merged block
    bincounts its tokens' first-occurrence ids against ALL thresholds
    at once — the K checkpoints cost K integers per block, not K
    distinct-count jobs."""
    from ray.data.aggregate import Min

    n_docs = docs_ds.count()
    thresholds = sorted({n_docs // d for d in divisors})

    def first_seen(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "first_doc": pa.array([], pa.int64())})
        d = _dict_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.full(len(d.dictionary), np.iinfo(np.int64).max,
                        np.int64)
        np.minimum.at(first, codes, ids[doc_idx])
        return pa.table({"token": d.dictionary.cast(pa.string()),
                         "first_doc": pa.array(first, pa.int64())})

    merged = (
        docs_ds.map_batches(first_seen, batch_format="pyarrow")
        .groupby("token").aggregate(Min("first_doc",
                                        alias_name="first_doc"))
    )

    thr = np.array(thresholds, np.int64)

    def count_below(batch: pa.Table) -> pa.Table:
        fd = batch.column("first_doc").to_numpy(zero_copy_only=False)
        cnt = (fd[None, :] < thr[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({"threshold": pa.array(thr, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    return (
        merged.map_batches(count_below, batch_format="pyarrow")
        .groupby("threshold").aggregate(Sum("n", alias_name="n_tokens"))
    )


def _pareto_filter(keys, cents, date_us):
    """Vectorized 2-D skyline filter (maximize ``cents``, minimize
    ``date_us``): a row survives iff no other row has cents ≥ / date ≤
    with at least one strict.  Equal-(cents, date) duplicates all
    survive.  O(n log n): one lexsort, one running min."""
    order = np.lexsort((date_us, -cents))
    c, t, k = cents[order], date_us[order], keys[order]
    new_grp = np.empty(len(c), bool)
    new_grp[0] = True
    new_grp[1:] = c[1:] != c[:-1]
    grp_id = np.cumsum(new_grp) - 1
    first_idx = np.flatnonzero(new_grp)
    runmin = np.minimum.accumulate(t)
    prev_min = np.where(
        first_idx > 0,
        runmin[np.maximum(first_idx - 1, 0)],
        np.iinfo(np.int64).max,
    )
    grp_min = t[first_idx]  # date-ascending within group → first is min
    keep = (t == grp_min[grp_id]) & (t < prev_min[grp_id])
    return k[keep], c[keep], t[keep]


def skyline_orders(orders_ds):
    """Pareto frontier (skyline) of orders — maximize ``o_totalprice``,
    minimize ``o_orderdate`` ("cheapest-earliest dominance": which
    orders are not beaten on BOTH price and recency?) →
    ``(o_orderkey, price_cents, o_orderdate)``.

    Shape: the classic distributed-skyline two-phase — any globally
    undominated row is undominated within its own block, so
    skyline(corpus) ⊆ ∪ per-block skylines; each block emits only its
    local frontier (expected O(log n) rows on non-adversarial data)
    and the driver refines the merged candidates with the SAME
    vectorized filter.  No shuffle at all — the exchange carries
    frontier candidates, never the fact table."""

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "price_cents": pa.array([], pa.int64()),
                "date_us": pa.array([], pa.int64()),
            })
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        dus = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        k, c, t = _pareto_filter(keys, cents, dus)
        return pa.table({
            "o_orderkey": pa.array(k, pa.int64()),
            "price_cents": pa.array(c, pa.int64()),
            "date_us": pa.array(t, pa.int64()),
        })

    cand = orders_ds.map_batches(
        local, batch_format="pyarrow"
    ).to_pandas()  # bounded: union of per-block frontiers
    if len(cand) == 0:
        return pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "price_cents": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
        })
    k, c, t = _pareto_filter(
        cand["o_orderkey"].to_numpy(np.int64),
        cand["price_cents"].to_numpy(np.int64),
        cand["date_us"].to_numpy(np.int64),
    )
    return pa.table({
        "o_orderkey": pa.array(k, pa.int64()),
        "price_cents": pa.array(c, pa.int64()),
        "o_orderdate": pa.array(t, pa.int64()).cast(pa.timestamp("us")),
    })


def rank_auc(docs_ds, pos_lang: str = "en", text_col: str = "text"):
    """Exact ROC-AUC (Mann-Whitney U with midrank tie handling) of the
    whitespace-token-count score separating ``lang == pos_lang``
    documents from the rest → one row ``(n_pos, n_neg, u2, auc)`` —
    "does length alone already classify English?", the ranking-metric
    primitive every quality-classifier eval needs.

    Shape: per-batch ``(score, is_pos) → count`` partials (score =
    ``pc.count_substring_regex(text, '\\S+')``, the repo-wide
    tokenizer), ONE bounded groupby over the score histogram, then the
    driver computes ``U`` from cumulative-negative counts in exact
    Python ints: ``u2 = Σ_s (2·cneg(<s)·pos(s) + neg(s)·pos(s))`` and
    ``auc = u2 / (2·n_pos·n_neg)`` — midrank ties, one float division,
    no row ever leaves its batch."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        sc = pc.count_substring_regex(
            batch.column(text_col), r"\S+"
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = pc.equal(
            batch.column("lang"), pos_lang
        ).fill_null(False).to_numpy(zero_copy_only=False)
        key = sc * 2 + pos
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "score": pa.array(uk >> 1, pa.int64()),
            "is_pos": pa.array((uk & 1).astype(np.int64), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    hist = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["score", "is_pos"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: distinct scores × 2
        .sort_values(["score", "is_pos"])
    )
    pos_of, neg_of = {}, {}
    for _, r in hist.iterrows():
        (pos_of if int(r["is_pos"]) else neg_of)[int(r["score"])] = int(r["n"])
    scores = sorted(set(pos_of) | set(neg_of))
    u2, cneg = 0, 0
    n_pos, n_neg = sum(pos_of.values()), sum(neg_of.values())
    for s in scores:
        p, g = pos_of.get(s, 0), neg_of.get(s, 0)
        u2 += 2 * cneg * p + g * p
        cneg += g
    auc = float(u2) / float(2 * n_pos * n_neg) if n_pos and n_neg \
        else float("nan")
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "auc": pa.array([auc], pa.float64()),
    })


def ks_values(events_ds, type_a: str = "purchase", type_b: str = "click"):
    """Two-sample Kolmogorov-Smirnov statistic between the ``value``
    distributions of two event types → one row ``(n_a, n_b, d)`` —
    the drift / A-B-divergence test over metric streams.

    Shape: per-batch bounded ``(cents, type) → count`` histograms
    (cents = ``floor(value·100)``, the events-money discipline), one
    small groupby, then the driver scans the merged value grid with
    exact Python-int cross-multiplied CDFs: ``D = max |c_a·n_b −
    c_b·n_a| / (n_a·n_b)`` — no float accumulates, arbitrary-precision
    ints so the numerator cannot overflow at any scale, one final
    division."""

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        side = np.where(et == type_a, 0, np.where(et == type_b, 1, -1))
        keep = side >= 0
        if not keep.any():
            return pa.table({"cents": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        key = cents * 2 + side[keep]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cents": pa.array(uk >> 1, pa.int64()),
            "side": pa.array((uk & 1).astype(np.int64), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    hist = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cents", "side"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: distinct cents × 2
        .sort_values(["cents", "side"])
    )
    a_of, b_of = {}, {}
    for _, r in hist.iterrows():
        (b_of if int(r["side"]) else a_of)[int(r["cents"])] = int(r["n"])
    n_a, n_b = sum(a_of.values()), sum(b_of.values())
    ca = cb = 0
    d_num = 0
    for c in sorted(set(a_of) | set(b_of)):
        ca += a_of.get(c, 0)
        cb += b_of.get(c, 0)
        d_num = max(d_num, abs(ca * n_b - cb * n_a))
    d = float(d_num) / float(n_a * n_b) if n_a and n_b else float("nan")
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "d": pa.array([d], pa.float64()),
    })


def gini_customers(orders_ds):
    """Gini coefficient of per-customer total order spend → one row
    ``(n_customers, total_cents, s1, gini)`` — the revenue-concentration
    audit ("how unequal is spend across the customer base?").

    Shape: ONE partial-aggregated groupby to the per-customer cents
    table, ONE distributed ``Dataset.sort`` on cents, then each sorted
    block folds to four ints — row count, Σcents, and the local
    rank-weighted sum ``Σ i·xᵢ`` split hi/lo so int64 per-block partials
    cannot overflow — and the driver combines blocks in key order with
    arbitrary-precision Python ints (``Σ_global i·x = Σ_local i·x +
    offset·Σx`` per block).  Ties are rank-stable: equal values commute
    under any rank assignment, so the range-partitioned block order is
    the only order that matters.  ``gini = 2·s1/(n·S) − (n+1)/n``,
    computed in exactly that float expression order."""

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        s = np.bincount(inv, weights=cents, minlength=len(uk)).astype(
            np.int64)
        return pa.table({"o_custkey": pa.array(uk, pa.int64()),
                         "cents": pa.array(s, pa.int64())})

    per_cust = (
        orders_ds.map_batches(per_cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def block_partial(batch: pa.Table) -> pa.Table:
        x = batch.column("cents").to_numpy(zero_copy_only=False)
        if len(x) == 0:
            return pa.table({k: pa.array([], pa.int64())
                             for k in ("first", "last", "cnt", "s",
                                       "s1_hi", "s1_lo")})
        i = np.arange(1, len(x) + 1, dtype=np.int64)
        p = i * x  # ≤ block_rows · max_cents; split so sums stay int64
        return pa.table({
            "first": pa.array([int(x[0])], pa.int64()),
            "last": pa.array([int(x[-1])], pa.int64()),
            "cnt": pa.array([len(x)], pa.int64()),
            "s": pa.array([int(x.sum())], pa.int64()),
            "s1_hi": pa.array([int((p >> np.int64(32)).sum())],
                              pa.int64()),
            "s1_lo": pa.array([int((p & np.int64(0xFFFFFFFF)).sum())],
                              pa.int64()),
        })

    parts = (
        per_cust.sort("cents")
        .map_batches(block_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    parts.sort(key=lambda r: (r["first"], r["last"]))
    n = total = s1 = 0
    for r in parts:
        local = (int(r["s1_hi"]) << 32) + int(r["s1_lo"])
        s1 += local + n * int(r["s"])
        n += int(r["cnt"])
        total += int(r["s"])
    if s1 >= 1 << 63:
        raise OverflowError(
            "gini_customers: s1 exceeds int64 output range; widen the "
            "output column before running at this scale")
    gini = (2.0 * float(s1) / float(n * total) - (n + 1.0) / n) \
        if n and total else float("nan")
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "total_cents": pa.array([total], pa.int64()),
        "s1": pa.array([s1], pa.int64()),
        "gini": pa.array([gini], pa.float64()),
    })


def interval_coverage(events_ds, span_sec: int = 300):
    """Total covered time of the UNION of ``[ts, ts+span)`` intervals,
    plus the number of maximal covered runs (islands) → one row
    ``(n_intervals, n_islands, covered_us)`` — "how much wall-clock had
    at least one session open, in how many bursts?".

    Shape: the sweep-line sibling of :func:`max_concurrency`, but the
    covered-time predicate depends on the RUNNING count, which no block
    knows locally — so each sorted block emits a bounded histogram
    keyed by its LOCAL prefix level: (level → Σ internal gap µs) and
    (pre-level → #island-start candidates), plus (first/last key, Σδ).
    The driver folds per-block offsets ``c0``: a gap at local level L is
    covered iff ``c0+L > 0``; an island starts where a ``+1`` lands on
    pre-level ``-c0``; inter-block gaps are covered iff the running
    count is positive.  Boundaries sort ``(t asc, δ DESC)`` so touching
    intervals merge (count never dips to 0 at a shared endpoint),
    matching the oracle's ``s > prev_max`` island semantics."""
    import os

    span_us = int(span_sec) * 1_000_000
    empty = pa.table({
        "bid": pa.array([], pa.int64()),
        "first_t": pa.array([], pa.int64()),
        "first_nd": pa.array([], pa.int64()),
        "last_t": pa.array([], pa.int64()),
        "last_nd": pa.array([], pa.int64()),
        "bsum": pa.array([], pa.int64()),
        "level": pa.array([], pa.int64()),
        "gap_us": pa.array([], pa.int64()),
        "n_starts": pa.array([], pa.int64()),
    })

    def boundaries(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = np.concatenate([us, us + span_us])
        d = np.concatenate([np.ones(len(us), np.int64),
                            np.full(len(us), -1, np.int64)])
        # nd = -δ so an ASCENDING (t, nd) sort puts +1 before −1 at
        # equal t (touching intervals stay one island)
        return pa.table({"t": pa.array(t, pa.int64()),
                         "nd": pa.array(-d, pa.int64())})

    def block_partial(batch: pa.Table) -> pa.Table:
        t = batch.column("t").to_numpy(zero_copy_only=False)
        nd = batch.column("nd").to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return empty
        d = -nd
        p = np.cumsum(d)
        cov_lv, cov_gap = np.array([], np.int64), np.array([], np.int64)
        if len(t) > 1:
            gt = t[1:] - t[:-1]
            lv = p[:-1]
            cov_lv, inv = np.unique(lv, return_inverse=True)
            cov_gap = np.bincount(
                inv, weights=gt, minlength=len(cov_lv)
            ).astype(np.int64)
        pre = p - d
        su, sc = np.unique(pre[d > 0], return_counts=True)
        levels = np.union1d(cov_lv, su)
        gap_of = dict(zip(cov_lv.tolist(), cov_gap.tolist()))
        st_of = dict(zip(su.tolist(), sc.tolist()))
        bid = int.from_bytes(os.urandom(8), "big", signed=True)
        n = len(levels)
        return pa.table({
            "bid": pa.array([bid] * n, pa.int64()),
            "first_t": pa.array([int(t[0])] * n, pa.int64()),
            "first_nd": pa.array([int(nd[0])] * n, pa.int64()),
            "last_t": pa.array([int(t[-1])] * n, pa.int64()),
            "last_nd": pa.array([int(nd[-1])] * n, pa.int64()),
            "bsum": pa.array([int(p[-1])] * n, pa.int64()),
            "level": pa.array(levels, pa.int64()),
            "gap_us": pa.array(
                [gap_of.get(int(l), 0) for l in levels], pa.int64()),
            "n_starts": pa.array(
                [st_of.get(int(l), 0) for l in levels], pa.int64()),
        })

    rows = (
        events_ds.map_batches(boundaries, batch_format="pyarrow")
        .sort(["t", "nd"])
        .map_batches(block_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .to_pandas()  # bounded: Σ per-block distinct prefix levels
    )
    if len(rows) == 0:
        return pa.table({
            "n_intervals": pa.array([0], pa.int64()),
            "n_islands": pa.array([0], pa.int64()),
            "covered_us": pa.array([0], pa.int64()),
        })
    # every +1 boundary lands in exactly one pre-level bucket, so the
    # start-candidate total IS the interval count
    n_intervals = int(rows["n_starts"].sum())
    blocks = {}
    for r in rows.itertuples(index=False):
        blocks.setdefault(
            (int(r.first_t), int(r.first_nd), int(r.last_t),
             int(r.last_nd), int(r.bid)),
            {"bsum": int(r.bsum), "hist": []},
        )["hist"].append((int(r.level), int(r.gap_us), int(r.n_starts)))
    c0 = covered = islands = 0
    prev_last = None
    for key in sorted(blocks):
        b = blocks[key]
        for lv, gap, st in b["hist"]:
            if c0 + lv > 0:
                covered += gap
            if lv == -c0:
                islands += st
        if prev_last is not None and c0 > 0:
            covered += key[0] - prev_last
        c0 += b["bsum"]
        prev_last = key[2]
    return pa.table({
        "n_intervals": pa.array([n_intervals], pa.int64()),
        "n_islands": pa.array([islands], pa.int64()),
        "covered_us": pa.array([covered], pa.int64()),
    })


def key_islands(orders_ds, key_col: str = "o_orderkey"):
    """Gaps-and-islands audit of a (unique) key column → one row
    ``(n_keys, min_key, max_key, n_islands, n_missing)`` — "how sparse
    is the keyspace, in how many contiguous runs?" (TPC-H orderkeys use
    8 of every 32, so this exercises a real gap structure).

    Shape: ONE distributed sort of the bare key column; each sorted
    block folds to five ints (count, first, last, internal island
    breaks ``Σ[diffᵢ>1]``, internal missing ``Σ(diffᵢ−1)``); the driver
    stitches adjacent blocks by comparing boundary keys — per-block
    partials only, never rows."""

    def block_partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("first", "last", "cnt",
                                       "breaks", "missing")})
        dif = np.diff(k)
        return pa.table({
            "first": pa.array([int(k[0])], pa.int64()),
            "last": pa.array([int(k[-1])], pa.int64()),
            "cnt": pa.array([len(k)], pa.int64()),
            "breaks": pa.array([int((dif > 1).sum())], pa.int64()),
            "missing": pa.array([int((dif - 1).sum())], pa.int64()),
        })

    parts = (
        orders_ds.sort(key_col)
        .map_batches(block_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    parts.sort(key=lambda r: (r["first"], r["last"]))
    if not parts:
        return pa.table({c: pa.array([], pa.int64())
                         for c in ("n_keys", "min_key", "max_key",
                                   "n_islands", "n_missing")})
    n = breaks = missing = 0
    prev_last = None
    for r in parts:
        n += int(r["cnt"])
        breaks += int(r["breaks"])
        missing += int(r["missing"])
        if prev_last is not None:
            if int(r["first"]) > prev_last + 1:
                breaks += 1
                missing += int(r["first"]) - prev_last - 1
        prev_last = int(r["last"])
    return pa.table({
        "n_keys": pa.array([n], pa.int64()),
        "min_key": pa.array([int(parts[0]["first"])], pa.int64()),
        "max_key": pa.array([prev_last], pa.int64()),
        "n_islands": pa.array([1 + breaks], pa.int64()),
        "n_missing": pa.array([missing], pa.int64()),
    })


def spearman_nation(customer_ds, orders_ds):
    """Per-nation Spearman rank correlation between a customer's account
    balance and their order COUNT → ``(c_nationkey, n_customers,
    spearman)`` — "does wealth rank-order with activity?", the
    tie-aware monotone-dependence screen.

    Shape: partial-aggregated order counts per custkey, ONE
    ``join.hash_join(how='left')`` onto customer (a missing custkey is
    0 orders), then per-batch JOINT histograms ``(nation, acctbal
    cents, n_orders) → count`` reduced by one bounded groupby — the
    driver never sees customers, only the value-domain-bounded cells.
    Midranks come from the marginal cumsums (2·midrank = 2·cum_before
    + cnt + 1, an exact int); the rank-moment fold is arbitrary-
    precision Python ints and the ONLY float expression is
    ``num / sqrt(den)`` (``math.sqrt`` for SQL parity)."""
    from .join import hash_join

    def order_counts(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(ck, return_counts=True)
        return pa.table({"o_custkey": pa.array(uk, pa.int64()),
                         "n_orders": pa.array(cnt.astype(np.int64),
                                              pa.int64())})

    counts = (
        orders_ds.map_batches(order_counts, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )
    joined = hash_join(
        customer_ds, counts, on="c_custkey", right_on="o_custkey",
        how="left", left_cols=["c_nationkey", "c_acctbal"],
        right_cols=["n_orders"],
    )

    def cells(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        no = batch.column("n_orders").to_numpy(zero_copy_only=False)
        no = np.where(pd.isna(no), 0, no).astype(np.int64)
        df = pd.DataFrame({"c_nationkey": nk.astype(np.int64),
                           "cents": cents, "n_orders": no})
        g = df.groupby(["c_nationkey", "cents", "n_orders"],
                       sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby(["c_nationkey", "cents", "n_orders"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: nations × value-domain cells
    )
    out = {"c_nationkey": [], "n_customers": [], "spearman": []}
    for nk, sub in hist.groupby("c_nationkey", sort=True):
        cnt_of = {}
        for r in sub.itertuples(index=False):
            cnt_of[(int(r.cents), int(r.n_orders))] = int(r.cnt)
        n = sum(cnt_of.values())
        rx2, ry2 = {}, {}
        for axis, rank_of in ((0, rx2), (1, ry2)):
            marg = {}
            for k, c in cnt_of.items():
                marg[k[axis]] = marg.get(k[axis], 0) + c
            cum = 0
            for v in sorted(marg):
                rank_of[v] = 2 * cum + marg[v] + 1
                cum += marg[v]
        sx = sy = sxy = sxx = syy = 0
        for (cv, ov), c in cnt_of.items():
            x, y = rx2[cv], ry2[ov]
            sx += c * x
            sy += c * y
            sxy += c * x * y
            sxx += c * x * x
            syy += c * y * y
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        rho = float(num) / math.sqrt(float(den)) if den > 0 \
            else float("nan")
        out["c_nationkey"].append(int(nk))
        out["n_customers"].append(n)
        out["spearman"].append(rho)
    return pa.table({
        "c_nationkey": pa.array(out["c_nationkey"], pa.int64()),
        "n_customers": pa.array(out["n_customers"], pa.int64()),
        "spearman": pa.array(out["spearman"], pa.float64()),
    })


def q10_returns(lineitem_ds, orders_ds, sf_dir: str, topn: int = 20):
    """Simplified TPC-H Q10: top-``topn`` customers by revenue from
    RETURNED lineitems (``l_returnflag = 'R'``) → ``(c_custkey, c_name,
    n_name, revenue)`` — the canonical fact→fact→dimension join chain.

    Shape: filter + per-batch revenue partials keyed by orderkey
    (exact integer units, the Q3 discipline), ONE orderkey-hash
    co-partition join onto the pruned orders projection, custkey
    partials + ONE small groupby, distributed top-N sort; the two
    dimension attaches (customer name, nation name) happen AFTER the
    top-N cut — ``topn`` point lookups against the customer parquet
    (row-group pruned at scale) and a 25-row nation table, never a
    third exchange."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .join import hash_join

    def rev_partial(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("l_returnflag"), "R")
        t = batch.filter(mask)
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_u": pa.array([], pa.int64())})
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        disc = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False)
            * 10000.0 + 0.5
        ).astype(np.int64)
        rev = cents * (10000 - disc)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=rev, minlength=len(uk)).astype(
            np.int64)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "rev_u": pa.array(s, pa.int64())})

    rev = (
        lineitem_ds.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_u", alias_name="rev_u"))
    )
    joined = hash_join(
        rev, orders_ds, on="l_orderkey", right_on="o_orderkey",
        how="inner", left_cols=["rev_u"], right_cols=["o_custkey"],
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        rv = batch.column("rev_u").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        s = np.bincount(inv, weights=rv, minlength=len(uk)).astype(
            np.int64)
        return pa.table({"o_custkey": pa.array(uk.astype(np.int64),
                                               pa.int64()),
                         "rev_u": pa.array(s, pa.int64())})

    top = (
        joined.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_u", alias_name="rev_u"))
        .sort(["rev_u", "o_custkey"], descending=[True, False])
        .limit(topn)
        .take_all()
    )
    keys = [int(r["o_custkey"]) for r in top]
    import pyarrow.dataset as pads

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name",
                                               "c_nationkey"],
        filters=pads.field("c_custkey").isin(keys),
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(cust.column("c_custkey").to_pylist(),
                       cust.column("c_name").to_pylist()))
    nk_of = dict(zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_nationkey").to_pylist()))
    nname_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                        nat.column("n_name").to_pylist()))
    return pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([name_of[k] for k in keys], pa.string()),
        "n_name": pa.array([nname_of[nk_of[k]] for k in keys],
                           pa.string()),
        "revenue": pa.array(
            [float(int(r["rev_u"])) / 1000000.0 for r in top],
            pa.float64()),
    })


def order_balance_audit(orders_ds, lineitem_ds):
    """Cross-table consistency audit: per-order Σ lineitem gross cents
    vs the order header's ``o_totalprice`` cents → one row
    ``(n_orders, n_wo_lineitems, n_orphan_lineitems, n_match,
    n_mismatch, sum_abs_diff_cents)`` — the reconciliation sweep every
    warehouse load runs between a fact table and its rollup header.

    Shape: lineitem folds to per-orderkey gross-cents partials before
    the exchange; ONE ``join.hash_join(how='full')`` co-partition
    (both sides keyed by orderkey) so missing-either-side rows survive
    with nulls; per-batch integer audit counters; the driver sums one
    row per batch."""
    from .join import hash_join

    def li_partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=cents, minlength=len(uk)).astype(
            np.int64)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "li_cents": pa.array(s, pa.int64())})

    li = (
        lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("li_cents", alias_name="li_cents"))
    )
    full = hash_join(
        orders_ds, li, on="o_orderkey", right_on="l_orderkey",
        how="full", left_cols=["o_totalprice"],
        right_cols=["li_cents"],
    )

    def audit(batch: pa.Table) -> pa.Table:
        op = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        lc = batch.column("li_cents").to_numpy(
            zero_copy_only=False).astype(np.float64)
        has_o = ~pd.isna(op)
        has_l = ~pd.isna(lc)
        oc = np.floor(np.where(has_o, op, 0.0) * 100.0 + 0.5).astype(
            np.int64)
        lci = np.where(has_l, lc, 0.0).astype(np.int64)
        both = has_o & has_l
        diff = np.abs(oc - lci)[both]
        return pa.table({
            "n_orders": pa.array([int(has_o.sum())], pa.int64()),
            "n_wo_lineitems": pa.array([int((has_o & ~has_l).sum())],
                                       pa.int64()),
            "n_orphan_lineitems": pa.array([int((~has_o).sum())],
                                           pa.int64()),
            "n_match": pa.array([int((diff == 0).sum())], pa.int64()),
            "n_mismatch": pa.array([int((diff != 0).sum())],
                                   pa.int64()),
            "sum_abs_diff_cents": pa.array([int(diff.sum())],
                                           pa.int64()),
        })

    sums = full.map_batches(audit, batch_format="pyarrow").to_pandas()
    cols = ["n_orders", "n_wo_lineitems", "n_orphan_lineitems",
            "n_match", "n_mismatch", "sum_abs_diff_cents"]
    return pa.table({c: pa.array([int(sums[c].sum())], pa.int64())
                     for c in cols})


def q13_custdist(orders_ds, sf_dir: str):
    """TPC-H Q13 (customer distribution), adapted to the available
    columns (no ``o_comment`` exclusion filter): orders per customer —
    including zero-order customers — then the distribution
    ``(c_count, custdist)`` sorted by custdist desc, c_count desc.

    Scale shape: the left join never runs as a join.  Orders pre-count
    per custkey per batch (np.unique partials), ONE keyed exchange sums
    them (one row per active customer); the count histogram is again
    partial-aggregated per block before a tiny second groupby (distinct
    count values are bounded by max orders/customer, not by customers).
    The zero-order bucket needs only customer CARDINALITY, which comes
    from parquet row-group metadata — no customer-table scan, no
    customer⨝orders exchange at any scale.  Assumes FK integrity
    (every o_custkey exists in customer — audited by `fk_orphans`)."""
    import pyarrow.parquet as pq

    def count_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table({
            "o_custkey": pa.array(uniq, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    per_cust = (
        orders_ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cnt", alias_name="c_count"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c_count").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.table({
            "c_count": pa.array(uniq, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("n", alias_name="custdist"))
        .to_pandas()  # ≤ max-orders-per-customer rows — tiny
    )
    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    zero = int(n_cust) - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    hist = hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]).reset_index(drop=True)
    return pa.table({
        "c_count": pa.array(hist["c_count"].astype(np.int64), pa.int64()),
        "custdist": pa.array(hist["custdist"].astype(np.int64),
                             pa.int64()),
    })


def q15_top_supplier(lineitem_ds, sf_dir: str,
                     date_from: str = "1996-01-01",
                     date_to: str = "1996-04-01"):
    """TPC-H Q15 (top supplier): per-supplier revenue over one quarter,
    then the supplier(s) achieving the GLOBAL maximum (ties all kept) →
    ``(s_suppkey, s_name, total_revenue_e4, total_revenue)``.

    Scale shape: revenue accumulates as exact integer 1e-4 units per
    suppkey per batch (np.add.at into int64 — order-free), ONE keyed
    exchange sums partials to one row per supplier.  That rollup (key +
    int64, ~1e6 rows even at 100 TB) is materialized ONCE so the global
    max and the equality filter reuse it without recomputing the
    lineitem scan; winner names resolve as driver point lookups against
    the supplier parquet (winners are the argmax set — a handful)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    lo = np.datetime64(date_from, "us").astype("int64")
    hi = np.datetime64(date_to, "us").astype("int64")

    def rev_partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        if not keep.any():
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "rev_part": pa.array([], pa.int64())})
        idx = np.flatnonzero(keep)
        sk = batch.column("l_suppkey").to_numpy(
            zero_copy_only=False)[idx]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[idx]
        disc = batch.column("l_discount").to_numpy(
            zero_copy_only=False)[idx]
        rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100.0 + 0.5).astype(np.int64))
        uniq, inv = np.unique(sk, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({"s_suppkey": pa.array(uniq, pa.int64()),
                         "rev_part": pa.array(acc, pa.int64())})

    totals = (
        lineitem_ds.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("rev_part", alias_name="total_revenue_e4"))
        .materialize()
    )
    mx = totals.max("total_revenue_e4")
    if mx is None:  # empty window
        return pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue_e4": pa.array([], pa.int64()),
            "total_revenue": pa.array([], pa.float64()),
        })
    win = totals.filter(
        expr=f"total_revenue_e4 == {int(mx)}").to_pandas()
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", win["s_suppkey"].tolist())])
    name_of = dict(zip(names.column("s_suppkey").to_pylist(),
                       names.column("s_name").to_pylist()))
    win = win.sort_values("s_suppkey").reset_index(drop=True)
    e4 = win["total_revenue_e4"].astype(np.int64)
    return pa.table({
        "s_suppkey": pa.array(win["s_suppkey"].astype(np.int64),
                              pa.int64()),
        "s_name": pa.array([name_of[int(k)] for k in win["s_suppkey"]],
                           pa.string()),
        "total_revenue_e4": pa.array(e4, pa.int64()),
        "total_revenue": pa.array(e4.to_numpy() / 10000.0, pa.float64()),
    })


def q17_small_qty(lineitem_ds, sf_dir: str, brand: str = "Brand#12"):
    """TPC-H Q17 (small-quantity-order revenue), adapted: for one
    brand's parts, the revenue of lineitems whose quantity is below
    20% of that part's average lineitem quantity → ONE row
    ``(total_cents, avg_yearly)`` with avg_yearly = cents/700.0
    (the /7.0-years convention of Q17).  No container filter —
    ``p_container`` does not exist in this schema.

    The correlated inner aggregate is decorrelated into two lineitem
    passes (the `above_nation_avg` discipline): pass 1 computes per-part
    (Σqty, count) for the brand's parts only; pass 2 re-filters with the
    EXACT integer inequality 5·q·cnt < Σqty (quantities are integral —
    no float avg anywhere) and sums price cents.  The brand's partkey
    set (~1/25 of parts) broadcasts once as sorted arrays via
    ``ray.put`` (~32 MB per 1e8 parts); both passes are per-batch
    vectorized with searchsorted membership — no shuffle at all."""
    import pyarrow.parquet as pq
    import ray

    pk_tbl = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"],
                           filters=[("p_brand", "==", brand)])
    pks = np.sort(pk_tbl.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64))
    pks_ref = ray.put(pks)

    class QtyPartial:
        def __init__(self):
            self.pks = ray.get(pks_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            if len(self.pks) == 0:
                hit = np.zeros(len(pk), np.bool_)
            else:
                pos_c = np.minimum(np.searchsorted(self.pks, pk),
                                   len(self.pks) - 1)
                hit = self.pks[pos_c] == pk
            if not hit.any():
                return pa.table({
                    "l_partkey": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64())})
            pk = pk[hit]
            q = np.floor(batch.column("l_quantity").to_numpy(
                zero_copy_only=False)[hit] + 0.5).astype(np.int64)
            uniq, inv = np.unique(pk, return_inverse=True)
            sq = np.zeros(len(uniq), np.int64)
            np.add.at(sq, inv, q)
            return pa.table({
                "l_partkey": pa.array(uniq, pa.int64()),
                "sum_q": pa.array(sq, pa.int64()),
                "cnt": pa.array(np.bincount(inv).astype(np.int64),
                                pa.int64())})

    stats = (
        lineitem_ds.map_batches(QtyPartial, batch_format="pyarrow",
                                concurrency=(1, 8))
        .groupby("l_partkey")
        .aggregate(Sum("sum_q", alias_name="sum_q"),
                   Sum("cnt", alias_name="cnt"))
        .to_pandas()  # one row per brand part — small by construction
    )
    if len(stats) == 0:
        return pa.table({
            "total_cents": pa.array([0], pa.int64()),
            "avg_yearly": pa.array([0.0], pa.float64()),
        })
    spk = stats["l_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(spk)
    stats_ref = ray.put((spk[order],
                         stats["sum_q"].to_numpy().astype(np.int64)[order],
                         stats["cnt"].to_numpy().astype(np.int64)[order]))

    class SmallQty:
        def __init__(self):
            self.pks, self.sum_q, self.cnt = ray.get(stats_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            if len(self.pks) == 0:
                return pa.table({"cents": pa.array([0], pa.int64())})
            pos_c = np.minimum(np.searchsorted(self.pks, pk),
                               len(self.pks) - 1)
            hit = self.pks[pos_c] == pk
            q = np.floor(batch.column("l_quantity").to_numpy(
                zero_copy_only=False) + 0.5).astype(np.int64)
            small = hit & (5 * q * self.cnt[pos_c]
                           < self.sum_q[pos_c])
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[small]
            cents = int(np.floor(price * 100.0 + 0.5).astype(
                np.int64).sum())
            return pa.table({"cents": pa.array([cents], pa.int64())})

    parts = lineitem_ds.map_batches(
        SmallQty, batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    total = int(parts["cents"].sum())
    return pa.table({
        "total_cents": pa.array([total], pa.int64()),
        "avg_yearly": pa.array([total / 700.0], pa.float64()),
    })


def q4_priority(lineitem_ds, orders_ds,
                date_from: str = "1997-01-01",
                date_to: str = "1997-04-01",
                qty_exists: int = 48):
    """TPC-H Q4 (order-priority checking), adapted: count of orders per
    priority over one quarter having AT LEAST ONE lineitem with
    quantity ≥ ``qty_exists`` → ``(o_orderpriority, order_count)``
    sorted by priority.  The original EXISTS predicate
    (l_commitdate < l_receiptdate) uses columns absent from this
    schema; the big-line predicate keeps Q4's exact shape — a
    distinct-orderkey semi-join followed by a tiny group-count.

    Scale shape: lineitem filters vectorized per batch and emits
    per-batch-deduped orderkeys; orders prune to the quarter AT THE READ
    and semi-join the qualifying keys through `join.hash_join(semi)` —
    one orderkey-hash co-partition exchange, no broadcast assumption
    (the qualifying set is a constant fraction of orders, too large to
    ship to every task at 100 TB).  Priority counts then partial-
    aggregate per batch into a ≤5-row groupby."""
    from .join import hash_join

    lo = np.datetime64(date_from, "us").astype("int64")
    hi = np.datetime64(date_to, "us").astype("int64")

    def big_keys(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        ok = batch.column("l_orderkey").to_numpy(
            zero_copy_only=False)[q >= qty_exists]
        return pa.table({"l_orderkey": pa.array(np.unique(ok),
                                                pa.int64())})

    qual = lineitem_ds.map_batches(big_keys, batch_format="pyarrow")

    def in_window(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        return batch.select(["o_orderkey", "o_orderpriority"]).filter(
            pa.array(keep))

    window = orders_ds.map_batches(in_window, batch_format="pyarrow")
    hits = hash_join(window, qual, on="o_orderkey",
                     right_on="l_orderkey", how="semi",
                     left_cols=["o_orderpriority"])

    def prio_partial(batch: pa.Table) -> pa.Table:
        pr = batch.column("o_orderpriority")
        if isinstance(pr, pa.ChunkedArray):
            pr = pr.combine_chunks()
        uniq, cnt = np.unique(
            pr.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({
            "o_orderpriority": pa.array(uniq.astype(str), pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    out = (
        hits.map_batches(prio_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="order_count"))
        .to_pandas()  # ≤ 5 distinct priorities
    ).sort_values("o_orderpriority").reset_index(drop=True)
    return pa.table({
        "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
        "order_count": pa.array(
            out["order_count"].astype(np.int64), pa.int64()),
    })


def q7_volume(lineitem_ds, orders_ds, sf_dir: str,
              nation_a: str = "NATION_3", nation_b: str = "NATION_7",
              date_from: str = "1995-01-01",
              date_to: str = "1997-01-01"):
    """TPC-H Q7 (volume shipping): revenue between two nations by
    (supplier nation, customer nation, ship year) →
    ``(supp_nation, cust_nation, l_year, revenue_e4, revenue)``.

    Scale shape (the `revenue_by_nation` decomposition): supplier and
    customer nationkeys broadcast once as dense int8 arrays (1 byte per
    key); lineitem pre-filters to the two supplier nations + date window
    and pre-aggregates ``(l_orderkey, supp_is_a, l_year)`` integer
    revenue partials per batch; orders map to ``(o_orderkey, cust nation
    flag)`` keeping only the two customer nations — so the one
    lineitem⨝orders orderkey-hash exchange carries ONLY
    qualifying narrow rows (~(2/25)² of lineitem at uniform nations).
    The final groupby has ≤ 2·years rows.  Revenue sums in exact
    integer 1e-4 units."""
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    key_of = {n: int(k) for k, n in zip(
        nation.column("n_nationkey").to_pylist(),
        nation.column("n_name").to_pylist())}
    if nation_a not in key_of or nation_b not in key_of:
        raise ValueError(f"unknown nation {nation_a!r}/{nation_b!r}")
    ka, kb = key_of[nation_a], key_of[nation_b]

    def dense_nation(path, key_col, nk_col):
        t = pq.read_table(path, columns=[key_col, nk_col])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        nks = t.column(nk_col).to_numpy(zero_copy_only=False)
        arr = np.full(int(keys.max()) + 1, -1, np.int8)
        arr[keys] = nks.astype(np.int8)
        return arr

    supp_ref = ray.put(dense_nation(f"{sf_dir}/supplier.parquet",
                                    "s_suppkey", "s_nationkey"))
    cust_ref = ray.put(dense_nation(f"{sf_dir}/customer.parquet",
                                    "c_custkey", "c_nationkey"))
    lo = np.datetime64(date_from, "us").astype("int64")
    hi = np.datetime64(date_to, "us").astype("int64")

    class LinePartial:
        def __init__(self):
            self.nation_of = ray.get(supp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            sk = batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)
            if (sk < 0).any() or (sk >= len(self.nation_of)).any():
                raise ValueError("unknown supplier key in lineitem")
            nk = self.nation_of[sk]
            keep = ((sd >= lo) & (sd < hi)
                    & ((nk == ka) | (nk == kb)))
            if not keep.any():
                return pa.table({
                    "l_orderkey": pa.array([], pa.int64()),
                    "supp_a": pa.array([], pa.int8()),
                    "l_year": pa.array([], pa.int64()),
                    "rev_part": pa.array([], pa.int64())})
            idx = np.flatnonzero(keep)
            ok = batch.column("l_orderkey").to_numpy(
                zero_copy_only=False)[idx]
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[idx]
            disc = batch.column("l_discount").to_numpy(
                zero_copy_only=False)[idx]
            rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
                   * np.floor((1.0 - disc) * 100.0 + 0.5).astype(
                       np.int64))
            yr = sd[idx].astype("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            sa = (nk[idx] == ka).astype(np.int64)
            # pack (orderkey, supp_a, year) into one partial key:
            # years fit 16 bits, supp flag 1 bit
            packed = (ok << 17) | (sa << 16) | (yr & 0xFFFF)
            uniq, inv = np.unique(packed, return_inverse=True)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, rev)
            return pa.table({
                "l_orderkey": pa.array(uniq >> 17, pa.int64()),
                "supp_a": pa.array(((uniq >> 16) & 1).astype(np.int8),
                                   pa.int8()),
                "l_year": pa.array((uniq & 0xFFFF).astype(np.int64),
                                   pa.int64()),
                "rev_part": pa.array(acc, pa.int64())})

    class OrderSide:
        def __init__(self):
            self.nation_of = ray.get(cust_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck < 0).any() or (ck >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck]
            keep = (nk == ka) | (nk == kb)
            t = batch.select(["o_orderkey"]).filter(pa.array(keep))
            return t.append_column(
                "cust_a", pa.array((nk[keep] == ka).astype(np.int8),
                                   pa.int8()))

    lines = lineitem_ds.map_batches(LinePartial,
                                    batch_format="pyarrow",
                                    concurrency=(1, 8))
    ords = orders_ds.map_batches(OrderSide, batch_format="pyarrow",
                                 concurrency=(1, 8))
    joined = hash_join(lines, ords, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols=["supp_a", "l_year", "rev_part"],
                       right_cols=["cust_a"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        sa = batch.column("supp_a").to_numpy(zero_copy_only=False)
        ca = batch.column("cust_a").to_numpy(zero_copy_only=False)
        keep = sa != ca  # (A,B) or (B,A) only
        if not keep.any():
            return pa.table({
                "supp_a": pa.array([], pa.int8()),
                "l_year": pa.array([], pa.int64()),
                "rev_part": pa.array([], pa.int64())})
        idx = np.flatnonzero(keep)
        yr = batch.column("l_year").to_numpy(zero_copy_only=False)[idx]
        rev = batch.column("rev_part").to_numpy(
            zero_copy_only=False)[idx]
        packed = (sa[idx].astype(np.int64) << 16) | yr
        uniq, inv = np.unique(packed, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({
            "supp_a": pa.array((uniq >> 16).astype(np.int8), pa.int8()),
            "l_year": pa.array(uniq & 0xFFFF, pa.int64()),
            "rev_part": pa.array(acc, pa.int64())})

    out = (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["supp_a", "l_year"])
        .aggregate(Sum("rev_part", alias_name="revenue_e4"))
        .to_pandas()  # ≤ 2·years rows
    )
    sa = out["supp_a"].to_numpy().astype(bool)
    e4 = out["revenue_e4"].astype(np.int64)
    res = pd.DataFrame({
        "supp_nation": np.where(sa, nation_a, nation_b),
        "cust_nation": np.where(sa, nation_b, nation_a),
        "l_year": out["l_year"].astype(np.int64),
        "revenue_e4": e4,
    }).sort_values(["supp_nation", "cust_nation", "l_year"]
                   ).reset_index(drop=True)
    return pa.table({
        "supp_nation": pa.array(res["supp_nation"], pa.string()),
        "cust_nation": pa.array(res["cust_nation"], pa.string()),
        "l_year": pa.array(res["l_year"], pa.int64()),
        "revenue_e4": pa.array(res["revenue_e4"], pa.int64()),
        "revenue": pa.array(res["revenue_e4"].to_numpy() / 10000.0,
                            pa.float64()),
    })


def q11_important_parts(lineitem_ds, sf_dir: str,
                        nation: str = "NATION_7", mult: int = 2):
    """TPC-H Q11 (important stock), adapted to lineitem (no partsupp
    table): per-part shipped value — extendedprice cents from suppliers
    of one nation — keeping parts whose total exceeds ``mult``× the
    MEAN per-part value → ``(l_partkey, value_cents)`` sorted by value
    desc, partkey asc.  (Q11's fixed fraction of the global total is
    scaled by 1/SF in the spec; anchoring to the mean keeps the
    selectivity scale-invariant without an SF parameter.)

    The threshold is evaluated in EXACT integer arithmetic:
    value·n_parts > mult·total, rearranged driver-side to
    value > (mult·total)//n_parts (valid because value is integral).  Scale
    shape: supplier nationkeys broadcast dense int8; per-part cents
    partials (np.add.at) → ONE keyed exchange; the per-part rollup
    (key + int64) is materialized once so the global total and the
    threshold filter reuse it without a second lineitem scan."""
    import pyarrow.parquet as pq
    import ray

    if nation is not None:
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        nat = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
        key_of = {n: int(k) for k, n in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist())}
        if nation not in key_of:
            raise ValueError(f"unknown nation {nation!r}")
        sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False)
        nk = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
        nation_of = np.full(int(sk.max()) + 1, -1, np.int8)
        nation_of[sk] = nk.astype(np.int8)
        ref = ray.put(nation_of)
        want = key_of[nation]
    else:
        ref, want = ray.put(None), None

    class ValuePartial:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)
            if (s < 0).any() or (s >= len(self.nation_of)).any():
                raise ValueError("unknown supplier key in lineitem")
            keep = self.nation_of[s] == want
            if not keep.any():
                return pa.table({
                    "l_partkey": pa.array([], pa.int64()),
                    "cents_part": pa.array([], pa.int64())})
            pk = batch.column("l_partkey").to_numpy(
                zero_copy_only=False)[keep]
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[keep]
            cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
            uniq, inv = np.unique(pk, return_inverse=True)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, cents)
            return pa.table({
                "l_partkey": pa.array(uniq, pa.int64()),
                "cents_part": pa.array(acc, pa.int64())})

    per_part = (
        lineitem_ds.map_batches(ValuePartial, batch_format="pyarrow",
                                concurrency=(1, 8))
        .groupby("l_partkey")
        .aggregate(Sum("cents_part", alias_name="value_cents"))
        .materialize()
    )
    total = per_part.sum("value_cents")
    if total is None:
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value_cents": pa.array([], pa.int64())})
    n_parts = per_part.count()
    thresh = (mult * int(total)) // n_parts
    return (per_part.filter(expr=f"value_cents > {thresh}")
            .sort(["value_cents", "l_partkey"],
                  descending=[True, False]))


def q22_idle_customers(customer_ds, orders_ds, sf_dir: str,
                       cutoff: str = "2000-09-01"):
    """TPC-H Q22 (global sales opportunity), adapted to the available
    columns: customers whose account balance exceeds the average
    POSITIVE balance and who placed NO order on/after ``cutoff``
    (recent-inactivity stand-in for the absent phone-prefix filter),
    rolled up per nation →
    ``(n_name, numcust, totacctbal_cents, totacctbal)``.

    The correlated average decorrelates into one (Σcents, count) pass
    over customer; the selection compares cents·count > Σcents — exact
    integers, no float average anywhere.  The NOT-EXISTS runs as a
    custkey-hash ANTI join (`join.hash_join(anti)`) against recent
    orderers (a constant fraction of customers — NOT broadcastable at
    scale); nation names resolve from the ≤25-row dimension driver-side.
    """
    import pyarrow.parquet as pq

    from .join import hash_join

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        pos = cents[cents > 0]
        return pa.table({
            "sum_cents": pa.array([int(pos.sum())], pa.int64()),
            "n_pos": pa.array([len(pos)], pa.int64())})

    sums = customer_ds.map_batches(
        bal_partial, batch_format="pyarrow").sum(
            ["sum_cents", "n_pos"])
    if sums is None or not int(sums["sum(n_pos)"]):
        sc, npos = 0, 0
    else:
        sc, npos = int(sums["sum(sum_cents)"]), int(sums["sum(n_pos)"])

    def rich(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        keep = (cents * npos) > sc if npos else np.zeros(
            len(cents), np.bool_)
        t = batch.select(["c_custkey", "c_nationkey"]).filter(
            pa.array(keep))
        return t.append_column("bal_cents",
                               pa.array(cents[keep], pa.int64()))

    lo = np.datetime64(cutoff, "us").astype("int64")

    def recent(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ck = batch.column("o_custkey").to_numpy(
            zero_copy_only=False)[od >= lo]
        return pa.table({"o_custkey": pa.array(np.unique(ck),
                                               pa.int64())})

    sel = customer_ds.map_batches(rich, batch_format="pyarrow")
    rec = orders_ds.map_batches(recent, batch_format="pyarrow")
    idle = hash_join(sel, rec, on="c_custkey", right_on="o_custkey",
                     how="anti",
                     left_cols=["c_nationkey", "bal_cents"])

    def nation_partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        bal = batch.column("bal_cents").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(nk, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, bal)
        return pa.table({
            "c_nationkey": pa.array(uniq, pa.int64()),
            "numcust": pa.array(np.bincount(inv).astype(np.int64),
                                pa.int64()),
            "bal": pa.array(acc, pa.int64())})

    out = (
        idle.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("numcust", alias_name="numcust"),
                   Sum("bal", alias_name="totacctbal_cents"))
        .to_pandas()  # ≤ 25 nations
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    out["n_name"] = [name_of[int(k)] for k in out["c_nationkey"]]
    out = out.sort_values("n_name").reset_index(drop=True)
    cents = out["totacctbal_cents"].astype(np.int64)
    return pa.table({
        "n_name": pa.array(out["n_name"], pa.string()),
        "numcust": pa.array(out["numcust"].astype(np.int64),
                            pa.int64()),
        "totacctbal_cents": pa.array(cents, pa.int64()),
        "totacctbal": pa.array(cents.to_numpy() / 100.0, pa.float64()),
    })


def q2_min_cost(lineitem_ds, supplier_ds, sf_dir: str,
                ptype: str = "STANDARD", max_size: int = 15):
    """TPC-H Q2 (minimum-cost supplier), adapted to lineitem as the
    supply relation (no partsupp table, so "cost" is the minimum
    OBSERVED extendedprice): for each part of one type with
    p_size ≤ ``max_size``, the supplier that shipped it cheapest —
    ties broken to the smallest suppkey →
    ``(p_partkey, min_price_cents, s_suppkey, s_name)`` sorted by
    partkey.

    Distributed argmin: each batch emits ONE candidate row per local
    partkey (lexsort by cents, then suppkey — the global tie-break is
    associative over batch winners), one partkey-hash groupby picks the
    global winner per part with the same lexsort.  The filtered partkey
    set broadcasts as a sorted array (a ~1/(6·~3) slice of parts);
    winner names attach through `join.hash_join` — supplier is NOT
    broadcastable at scale."""
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    pk_tbl = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filters=[("p_type", "==", ptype), ("p_size", "<=", max_size)])
    pks = np.sort(pk_tbl.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64))
    pks_ref = ray.put(pks)

    class Candidates:
        def __init__(self):
            self.pks = ray.get(pks_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            if len(self.pks) == 0:
                hit = np.zeros(len(pk), np.bool_)
            else:
                pos = np.minimum(np.searchsorted(self.pks, pk),
                                 len(self.pks) - 1)
                hit = self.pks[pos] == pk
            if not hit.any():
                return pa.table({
                    "l_partkey": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "l_suppkey": pa.array([], pa.int64())})
            idx = np.flatnonzero(hit)
            pk = pk[idx]
            cents = np.floor(batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[idx] * 100.0 + 0.5).astype(
                    np.int64)
            sk = batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)[idx]
            order = np.lexsort((sk, cents, pk))
            pk, cents, sk = pk[order], cents[order], sk[order]
            first = np.empty(len(pk), np.bool_)
            first[0] = True
            first[1:] = pk[1:] != pk[:-1]
            return pa.table({
                "l_partkey": pa.array(pk[first], pa.int64()),
                "cents": pa.array(cents[first], pa.int64()),
                "l_suppkey": pa.array(sk[first], pa.int64())})

    def pick(group: pa.Table) -> pa.Table:
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        sk = group.column("l_suppkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, cents, pk))
        pk, cents, sk = pk[order], cents[order], sk[order]
        first = np.empty(len(pk), np.bool_)
        if len(pk):
            first[0] = True
            first[1:] = pk[1:] != pk[:-1]
        return pa.table({
            "p_partkey": pa.array(pk[first], pa.int64()),
            "min_price_cents": pa.array(cents[first], pa.int64()),
            "s_suppkey": pa.array(sk[first], pa.int64())})

    winners = (
        lineitem_ds.map_batches(Candidates, batch_format="pyarrow",
                                concurrency=(1, 8))
        .groupby("l_partkey")
        .map_groups(pick, batch_format="pyarrow")
    )
    named = hash_join(winners, supplier_ds, on="s_suppkey",
                      left_cols=["p_partkey", "min_price_cents"],
                      right_cols=["s_name"])
    return named.sort("p_partkey").select_columns(
        ["p_partkey", "min_price_cents", "s_suppkey", "s_name"])


def q16_supplier_cnt(lineitem_ds, sf_dir: str,
                     exclude_brand: str = "Brand#5"):
    """TPC-H Q16 (part/supplier relationship), adapted to lineitem as
    the supply relation (no partsupp) and without the supplier-
    complaint exclusion (no s_comment column): distinct suppliers that
    shipped each (brand, type, size) excluding one brand →
    ``(p_brand, p_type, p_size, supplier_cnt)`` sorted by count desc,
    then brand/type/size.

    Scale shape: THREE cheap exchanges, each over already-deduped
    partials — (1) distinct (partkey, suppkey) pairs (per-batch unique
    first, so the exchange carries ≤ one row per pair per batch);
    (2) pairs ⨝ part attributes by partkey hash (`join.hash_join` —
    the part table is NOT broadcast); (3) distinct
    (brand, type, size, suppkey) then a ≤|brands·types·sizes|-row
    count.  No step ships raw lineitem rows."""
    import ray.data as rd

    from .join import hash_join

    def pair_partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        arr = np.stack([pk, sk], axis=1)
        uniq = np.unique(arr, axis=0)
        return pa.table({
            "l_partkey": pa.array(uniq[:, 0], pa.int64()),
            "l_suppkey": pa.array(uniq[:, 1], pa.int64())})

    pairs = (
        lineitem_ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    part_ds = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    attributed = hash_join(
        pairs, part_ds, on="l_partkey", right_on="p_partkey",
        left_cols=["l_suppkey"],
        right_cols=["p_brand", "p_type", "p_size"])

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.not_equal(batch.column("p_brand"),
                                         exclude_brand))

    distinct = (
        attributed.map_batches(keep, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )

    def cnt_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("_n", "count")])
        return t.rename_columns(
            ["n_part" if c == "_n_count" else c
             for c in t.column_names])

    out = (
        distinct.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("n_part", alias_name="supplier_cnt"))
        .to_pandas()  # ≤ brands·types·sizes rows
    ).sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                  ascending=[False, True, True, True]
                  ).reset_index(drop=True)
    return pa.table({
        "p_brand": pa.array(out["p_brand"], pa.string()),
        "p_type": pa.array(out["p_type"], pa.string()),
        "p_size": pa.array(out["p_size"].astype(np.int32), pa.int32()),
        "supplier_cnt": pa.array(out["supplier_cnt"].astype(np.int64),
                                 pa.int64()),
    })


def q19_disjunct_revenue(lineitem_ds, sf_dir: str,
                         conds: tuple = (("Brand#12", 1, 11, 1, 5),
                                         ("Brand#23", 10, 20, 1, 10),
                                         ("Brand#15", 20, 30, 1, 15))):
    """TPC-H Q19 (discounted revenue, disjunctive predicates), adapted
    to the available part columns (no container/shipmode): revenue of
    lineitems matching ANY of three (brand, quantity range, size range)
    conjunctions → ONE row ``(revenue_e4, revenue)``.

    Each ``conds`` entry is (brand, qty_lo, qty_hi, size_lo, size_hi),
    all bounds inclusive.  Part attributes broadcast ONCE as dense
    per-partkey int8 arrays (brand code + size — 2 bytes/part, the
    corr_by_nation dimension-bitmap discipline); the whole disjunction
    evaluates vectorized per batch; exact integer 1e-4 revenue."""
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    brands = sorted(set(part.column("p_brand").to_pylist()))
    bcode = {b: i for i, b in enumerate(brands)}
    bc = np.array([bcode[b] for b in part.column("p_brand").to_pylist()],
                  np.int8)
    sz = part.column("p_size").to_numpy(zero_copy_only=False).astype(
        np.int8)
    brand_of = np.full(int(pk.max()) + 1, -1, np.int8)
    size_of = np.zeros(int(pk.max()) + 1, np.int8)
    brand_of[pk] = bc
    size_of[pk] = sz
    want = [(bcode.get(b, -2), qlo, qhi, slo, shi)
            for b, qlo, qhi, slo, shi in conds]
    ref = ray.put((brand_of, size_of))

    class Rev:
        def __init__(self):
            self.brand_of, self.size_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lpk = batch.column("l_partkey").to_numpy(
                zero_copy_only=False)
            if (lpk < 0).any() or (lpk >= len(self.brand_of)).any():
                raise ValueError("lineitem l_partkey has no part row")
            b = self.brand_of[lpk]
            s = self.size_of[lpk]
            q = np.floor(batch.column("l_quantity").to_numpy(
                zero_copy_only=False) + 0.5).astype(np.int64)
            keep = np.zeros(len(lpk), np.bool_)
            for code, qlo, qhi, slo, shi in want:
                keep |= ((b == code) & (q >= qlo) & (q <= qhi)
                         & (s >= slo) & (s <= shi))
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[keep]
            disc = batch.column("l_discount").to_numpy(
                zero_copy_only=False)[keep]
            rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
                   * np.floor((1.0 - disc) * 100.0 + 0.5).astype(
                       np.int64))
            return pa.table({"rev": pa.array([int(rev.sum())],
                                             pa.int64())})

    parts = lineitem_ds.map_batches(Rev, batch_format="pyarrow",
                                    concurrency=(1, 8)).to_pandas()
    total = int(parts["rev"].sum())
    return pa.table({
        "revenue_e4": pa.array([total], pa.int64()),
        "revenue": pa.array([total / 10000.0], pa.float64()),
    })


def q20_excess_suppliers(lineitem_ds, sf_dir: str,
                         nation: str | None = None,
                         share_num: int = 1, share_den: int = 5):
    """TPC-H Q20 (potential part promotion), adapted to lineitem as the
    supply relation: suppliers — optionally restricted to one nation —
    that shipped MORE THAN ``share_num/share_den`` (default 20%) of the
    total shipped quantity of at least one part →
    ``(s_suppkey, s_name)`` sorted by suppkey.  The concentration
    test replaces the original availqty > half-of-shipped predicate
    (no partsupp table); the exactness is integral quantities and the
    cross-multiplied inequality den·sq > num·total.

    Scale shape: per-(partkey, suppkey) quantity partials → ONE
    pair-keyed exchange; per-part totals derive from THAT rollup (a
    second tiny groupby over one-row-per-pair data, not a second
    lineitem scan); totals re-join the pair rollup partkey-hash
    co-partitioned.  The winner set (≤ suppliers) resolves names via
    driver point lookups."""
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    if nation is not None:
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        nat = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
        key_of = {n: int(k) for k, n in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist())}
        if nation not in key_of:
            raise ValueError(f"unknown nation {nation!r}")
        sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False)
        nk = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
        nation_of = np.full(int(sk.max()) + 1, -1, np.int8)
        nation_of[sk] = nk.astype(np.int8)
        ref = ray.put(nation_of)
        want = key_of[nation]
    else:
        ref, want = ray.put(None), None

    def qty_partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk_ = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        q = np.floor(batch.column("l_quantity").to_numpy(
            zero_copy_only=False) + 0.5).astype(np.int64)
        arr = np.stack([pk, sk_], axis=1)
        uniq, inv = np.unique(arr, axis=0, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, q)
        return pa.table({
            "l_partkey": pa.array(uniq[:, 0], pa.int64()),
            "l_suppkey": pa.array(uniq[:, 1], pa.int64()),
            "sq": pa.array(acc, pa.int64())})

    pair_qty = (
        lineitem_ds.map_batches(qty_partial, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Sum("sq", alias_name="sq"))
        .materialize()  # one row per (part, supplier) pair
    )

    def tot_partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sq = batch.column("sq").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(pk, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, sq)
        return pa.table({"l_partkey": pa.array(uniq, pa.int64()),
                         "tq": pa.array(acc, pa.int64())})

    totals = (
        pair_qty.map_batches(tot_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("tq", alias_name="tq"))
    )
    joined = hash_join(pair_qty, totals, on="l_partkey",
                       left_cols=["l_suppkey", "sq"],
                       right_cols=["tq"])

    class Winners:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sk_ = batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)
            sq = batch.column("sq").to_numpy(zero_copy_only=False)
            tq = batch.column("tq").to_numpy(zero_copy_only=False)
            keep = share_den * sq > share_num * tq
            if self.nation_of is not None:
                ok = (sk_ >= 0) & (sk_ < len(self.nation_of))
                keep &= ok & (self.nation_of[np.minimum(
                    sk_, len(self.nation_of) - 1)] == want)
            return pa.table({
                "s_suppkey": pa.array(np.unique(sk_[keep]), pa.int64())})

    win = (
        joined.map_batches(Winners, batch_format="pyarrow",
                           concurrency=(1, 8))
        .groupby("s_suppkey")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    if len(win) == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string())})
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", win["s_suppkey"].tolist())]
    ) if len(win) else None
    name_of = (dict(zip(names.column("s_suppkey").to_pylist(),
                        names.column("s_name").to_pylist()))
               if names is not None else {})
    win = win.sort_values("s_suppkey").reset_index(drop=True)
    return pa.table({
        "s_suppkey": pa.array(win["s_suppkey"].astype(np.int64),
                              pa.int64()),
        "s_name": pa.array([name_of[int(k)] for k in win["s_suppkey"]],
                           pa.string()),
    })


def q8_market_share(lineitem_ds, orders_ds, sf_dir: str,
                    region: str = "ASIA", ptype: str = "STANDARD",
                    supp_nation: str = "NATION_3",
                    date_from: str = "1995-01-01",
                    date_to: str = "1997-01-01"):
    """TPC-H Q8 (national market share), adapted to the available part
    columns (type filter instead of the three-level p_type hierarchy):
    among sales of one part TYPE to customers of one REGION over two
    years, the revenue share supplied by ``supp_nation``, per order
    year → ``(o_year, nation_rev_e4, total_rev_e4, mkt_share)``.

    Scale shape: part type codes and supplier nations broadcast as
    dense per-key int8 arrays (1 byte per part / supplier — the
    corr_by_nation dimension discipline); lineitem pre-filters to the
    type and pre-aggregates (orderkey → rev_all, rev_nation) exact-
    integer partials; orders pre-filter to the window AND the region's
    customers (customer nationkey dense int8 + a ≤25-entry region map)
    before the single orderkey-hash exchange.  The share divides two
    exact int64 sums — bit-reproducible."""
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    types = sorted(set(part.column("p_type").to_pylist()))
    tcode = {t: i for i, t in enumerate(types)}
    if ptype not in tcode:
        raise ValueError(f"unknown part type {ptype!r}")
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    type_of = np.full(int(pk.max()) + 1, -1, np.int8)
    type_of[pk] = np.array(
        [tcode[t] for t in part.column("p_type").to_pylist()], np.int8)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name",
                                 "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = {int(k) for k, n in zip(
        reg.column("r_regionkey").to_pylist(),
        reg.column("r_name").to_pylist()) if n == region}
    if not rkeys:
        raise ValueError(f"unknown region {region!r}")
    nkey_of = {n: int(k) for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}
    if supp_nation not in nkey_of:
        raise ValueError(f"unknown nation {supp_nation!r}")
    region_nations = {
        int(k) for k, r in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_regionkey").to_pylist())
        if int(r) in rkeys}
    want_sn = nkey_of[supp_nation]

    def dense(path, key_col, nk_col):
        t = pq.read_table(path, columns=[key_col, nk_col])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        nks = t.column(nk_col).to_numpy(zero_copy_only=False)
        arr = np.full(int(keys.max()) + 1, -1, np.int8)
        arr[keys] = nks.astype(np.int8)
        return arr

    refs = ray.put((type_of,
                    dense(f"{sf_dir}/supplier.parquet", "s_suppkey",
                          "s_nationkey"),
                    dense(f"{sf_dir}/customer.parquet", "c_custkey",
                          "c_nationkey")))
    tc = tcode[ptype]
    lo = np.datetime64(date_from, "us").astype("int64")
    hi = np.datetime64(date_to, "us").astype("int64")
    in_region = np.zeros(26, np.bool_)
    for k in region_nations:
        in_region[k] = True

    class LinePartial:
        def __init__(self):
            self.type_of, self.supp_nat, _ = ray.get(refs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lpk = batch.column("l_partkey").to_numpy(
                zero_copy_only=False)
            if (lpk < 0).any() or (lpk >= len(self.type_of)).any():
                raise ValueError("lineitem l_partkey has no part row")
            keep = self.type_of[lpk] == tc
            if not keep.any():
                return pa.table({
                    "l_orderkey": pa.array([], pa.int64()),
                    "rev_all": pa.array([], pa.int64()),
                    "rev_nat": pa.array([], pa.int64())})
            idx = np.flatnonzero(keep)
            ok = batch.column("l_orderkey").to_numpy(
                zero_copy_only=False)[idx]
            sk = batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)[idx]
            if (sk < 0).any() or (sk >= len(self.supp_nat)).any():
                raise ValueError("unknown supplier key in lineitem")
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[idx]
            disc = batch.column("l_discount").to_numpy(
                zero_copy_only=False)[idx]
            rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
                   * np.floor((1.0 - disc) * 100.0 + 0.5).astype(
                       np.int64))
            is_nat = self.supp_nat[sk] == want_sn
            uniq, inv = np.unique(ok, return_inverse=True)
            rall = np.zeros(len(uniq), np.int64)
            rnat = np.zeros(len(uniq), np.int64)
            np.add.at(rall, inv, rev)
            np.add.at(rnat, inv, np.where(is_nat, rev, 0))
            return pa.table({
                "l_orderkey": pa.array(uniq, pa.int64()),
                "rev_all": pa.array(rall, pa.int64()),
                "rev_nat": pa.array(rnat, pa.int64())})

    class OrderSide:
        def __init__(self):
            _, _, self.cust_nat = ray.get(refs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ck = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck < 0).any() or (ck >= len(self.cust_nat)).any():
                raise ValueError("unknown customer key in orders")
            cn = self.cust_nat[ck]
            keep = ((od >= lo) & (od < hi) & (cn >= 0)
                    & in_region[np.maximum(cn, 0)])
            idx = np.flatnonzero(keep)
            yr = od[idx].astype("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            return pa.table({
                "o_orderkey": pa.array(
                    batch.column("o_orderkey").to_numpy(
                        zero_copy_only=False)[idx], pa.int64()),
                "o_year": pa.array(yr, pa.int64())})

    lines = lineitem_ds.map_batches(LinePartial,
                                    batch_format="pyarrow",
                                    concurrency=(1, 8))
    ords = orders_ds.map_batches(OrderSide, batch_format="pyarrow",
                                 concurrency=(1, 8))
    joined = hash_join(lines, ords, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols=["rev_all", "rev_nat"],
                       right_cols=["o_year"])

    def year_partial(batch: pa.Table) -> pa.Table:
        yr = batch.column("o_year").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(yr, return_inverse=True)
        rall = np.zeros(len(uniq), np.int64)
        rnat = np.zeros(len(uniq), np.int64)
        np.add.at(rall, inv, batch.column("rev_all").to_numpy(
            zero_copy_only=False))
        np.add.at(rnat, inv, batch.column("rev_nat").to_numpy(
            zero_copy_only=False))
        return pa.table({
            "o_year": pa.array(uniq, pa.int64()),
            "rev_all": pa.array(rall, pa.int64()),
            "rev_nat": pa.array(rnat, pa.int64())})

    out = (
        joined.map_batches(year_partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("rev_nat", alias_name="nation_rev_e4"),
                   Sum("rev_all", alias_name="total_rev_e4"))
        .to_pandas()  # ≤ years rows
    ).sort_values("o_year").reset_index(drop=True)
    nat_e4 = out["nation_rev_e4"].astype(np.int64)
    tot_e4 = out["total_rev_e4"].astype(np.int64)
    return pa.table({
        "o_year": pa.array(out["o_year"].astype(np.int64), pa.int64()),
        "nation_rev_e4": pa.array(nat_e4, pa.int64()),
        "total_rev_e4": pa.array(tot_e4, pa.int64()),
        "mkt_share": pa.array(
            nat_e4.to_numpy() / tot_e4.to_numpy().astype(np.float64),
            pa.float64()),
    })


def q9_profit(lineitem_ds, orders_ds, sf_dir: str,
              token: str = "red"):
    """TPC-H Q9 (product-type profit), adapted: cost is
    p_retailprice·quantity (no partsupp.ps_supplycost), parts filtered
    by a p_name substring; profit per (supplier nation, order year) →
    ``(nation, o_year, profit_e4, profit)``.

    profit_e4 = Σ exact-integer (price_e2·disc_e2 − retail_e2·qty·100)
    — order-free int64 arithmetic on both engine and oracle sides.
    Scale shape: the part dimension broadcasts ONCE as a dense
    name-match bitmap + int32 retail cents (5 bytes/part — the
    dimension-broadcast cap documented at `corr_by_nation`); supplier
    nations as dense int8; lineitem pre-aggregates
    (orderkey, nation) → profit partials; the single orderkey-hash
    exchange joins order years; final groupby is ≤ nations·years."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    match = pc.match_substring(part.column("p_name"),
                               token).to_numpy(zero_copy_only=False)
    retail = np.floor(part.column("p_retailprice").to_numpy(
        zero_copy_only=False) * 100.0 + 0.5).astype(np.int32)
    match_of = np.zeros(int(pk.max()) + 1, np.bool_)
    retail_of = np.zeros(int(pk.max()) + 1, np.int32)
    match_of[pk] = match
    retail_of[pk] = retail

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False)
    nation_of = np.full(int(sk.max()) + 1, -1, np.int8)
    nation_of[sk] = sup.column("s_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    refs = ray.put((match_of, retail_of, nation_of))

    class LinePartial:
        def __init__(self):
            self.match_of, self.retail_of, self.nation_of = \
                ray.get(refs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lpk = batch.column("l_partkey").to_numpy(
                zero_copy_only=False)
            if (lpk < 0).any() or (lpk >= len(self.match_of)).any():
                raise ValueError("lineitem l_partkey has no part row")
            keep = self.match_of[lpk]
            if not keep.any():
                return pa.table({
                    "l_orderkey": pa.array([], pa.int64()),
                    "nation": pa.array([], pa.int8()),
                    "profit_part": pa.array([], pa.int64())})
            idx = np.flatnonzero(keep)
            sk_ = batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)[idx]
            if (sk_ < 0).any() or (sk_ >= len(self.nation_of)).any():
                raise ValueError("unknown supplier key in lineitem")
            nk = self.nation_of[sk_]
            ok = batch.column("l_orderkey").to_numpy(
                zero_copy_only=False)[idx]
            q = np.floor(batch.column("l_quantity").to_numpy(
                zero_copy_only=False)[idx] + 0.5).astype(np.int64)
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[idx]
            disc = batch.column("l_discount").to_numpy(
                zero_copy_only=False)[idx]
            rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
                   * np.floor((1.0 - disc) * 100.0 + 0.5).astype(
                       np.int64))
            cost = (self.retail_of[lpk[idx]].astype(np.int64) * q
                    * 100)
            profit = rev - cost
            packed = (ok << 5) | nk.astype(np.int64)  # ≤25 nations
            uniq, inv = np.unique(packed, return_inverse=True)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, profit)
            return pa.table({
                "l_orderkey": pa.array(uniq >> 5, pa.int64()),
                "nation": pa.array((uniq & 31).astype(np.int8),
                                   pa.int8()),
                "profit_part": pa.array(acc, pa.int64())})

    def order_year(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        yr = od.astype("datetime64[us]").astype(
            "datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_year": pa.array(yr, pa.int64())})

    lines = lineitem_ds.map_batches(LinePartial,
                                    batch_format="pyarrow",
                                    concurrency=(1, 8))
    ords = orders_ds.map_batches(order_year, batch_format="pyarrow")
    joined = hash_join(lines, ords, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols=["nation", "profit_part"],
                       right_cols=["o_year"])

    def ny_partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("nation").to_numpy(
            zero_copy_only=False).astype(np.int64)
        yr = batch.column("o_year").to_numpy(zero_copy_only=False)
        packed = (yr << 5) | nk
        uniq, inv = np.unique(packed, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, batch.column("profit_part").to_numpy(
            zero_copy_only=False))
        return pa.table({
            "nation_key": pa.array(uniq & 31, pa.int64()),
            "o_year": pa.array(uniq >> 5, pa.int64()),
            "profit_part": pa.array(acc, pa.int64())})

    out = (
        joined.map_batches(ny_partial, batch_format="pyarrow")
        .groupby(["nation_key", "o_year"])
        .aggregate(Sum("profit_part", alias_name="profit_e4"))
        .to_pandas()  # ≤ nations·years rows
    )
    if len(out) == 0:
        return pa.table({
            "nation": pa.array([], pa.string()),
            "o_year": pa.array([], pa.int64()),
            "profit_e4": pa.array([], pa.int64()),
            "profit": pa.array([], pa.float64()),
        })
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    out["nation"] = [name_of[int(k)] for k in out["nation_key"]]
    out = out.sort_values(["nation", "o_year"]).reset_index(drop=True)
    e4 = out["profit_e4"].astype(np.int64)
    return pa.table({
        "nation": pa.array(out["nation"], pa.string()),
        "o_year": pa.array(out["o_year"].astype(np.int64), pa.int64()),
        "profit_e4": pa.array(e4, pa.int64()),
        "profit": pa.array(e4.to_numpy() / 10000.0, pa.float64()),
    })


def dau_wau(events_ds, window_days: int = 7, num_buckets: int = 64):
    """DAU / trailing-WAU stickiness per day: for every day with ≥1
    event, the count of distinct active users (DAU), the count of
    distinct users active in the trailing ``window_days`` window (WAU),
    and their ratio → ``(day, dau, wau, stickiness)`` with ``day`` as
    integer epoch-days (the `retention` convention).

    The trailing-distinct-count never runs as a per-day distinct: ONE
    user-hash exchange of per-batch-deduped (user, day) pairs; per
    bucket, each user's active-day set becomes a union of coverage
    intervals [d, d+w-1] (vectorized segment merge — gap > w starts a
    new segment) emitted as +1/−1 DIFF rows, plus per-day DAU counts;
    a tiny day-keyed groupby sums partials and the driver prefix-sums
    the ≤(span·days) diff rows — WAU(d) = Σ diffs ≤ d.  No step holds
    more than one bucket's pairs in memory; the driver sees only
    per-day aggregates."""
    from ..functions.arrowutil import id_buckets

    w = int(window_days)

    def pairs(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        day = (batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000).astype(np.int64)
        arr = np.stack([uid, day], axis=1)
        uniq = np.unique(arr, axis=0)
        t = pa.table({"user_id": pa.array(uniq[:, 0], pa.int64()),
                      "day": pa.array(uniq[:, 1], pa.int64())})
        return t.append_column(
            "bucket", pa.array(id_buckets(t.column("user_id"),
                                          num_buckets), pa.int32()))

    def cover(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"),
                           ("day", "ascending")])
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "dau": pa.array([], pa.int64()),
                             "diff": pa.array([], pa.int64())})
        keep = np.empty(n, np.bool_)  # global dedup (bucket owns user)
        keep[0] = True
        keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        uid, day = uid[keep], day[keep]
        n = len(uid)
        new_user = np.empty(n, np.bool_)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(n, np.bool_)
        gap[0] = True
        gap[1:] = (day[1:] - day[:-1]) > w
        seg_start = new_user | gap
        # segment end day = day right before the NEXT start (or last)
        seg_end_idx = np.flatnonzero(seg_start)
        ends = np.append(seg_end_idx[1:] - 1, n - 1)
        rows_day = np.concatenate([day, day[seg_start],
                                   day[ends] + w])
        rows_dau = np.concatenate([np.ones(n, np.int64),
                                   np.zeros(len(seg_end_idx) * 2,
                                            np.int64)])
        rows_diff = np.concatenate([np.zeros(n, np.int64),
                                    np.ones(len(seg_end_idx),
                                            np.int64),
                                    -np.ones(len(seg_end_idx),
                                             np.int64)])
        uniq, inv = np.unique(rows_day, return_inverse=True)
        dau = np.zeros(len(uniq), np.int64)
        dif = np.zeros(len(uniq), np.int64)
        np.add.at(dau, inv, rows_dau)
        np.add.at(dif, inv, rows_diff)
        return pa.table({"day": pa.array(uniq, pa.int64()),
                         "dau": pa.array(dau, pa.int64()),
                         "diff": pa.array(dif, pa.int64())})

    out = (
        events_ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cover, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"),
                   Sum("diff", alias_name="diff"))
        .to_pandas()  # ≤ span-days + w rows
    ).sort_values("day").reset_index(drop=True)
    if len(out) == 0:
        return pa.table({"day": pa.array([], pa.int64()),
                         "dau": pa.array([], pa.int64()),
                         "wau": pa.array([], pa.int64()),
                         "stickiness": pa.array([], pa.float64())})
    wau = out["diff"].astype(np.int64).cumsum()
    keep = out["dau"].to_numpy() > 0
    day = out["day"].to_numpy()[keep]
    dau = out["dau"].to_numpy().astype(np.int64)[keep]
    wau = wau.to_numpy()[keep]
    return pa.table({
        "day": pa.array(day, pa.int64()),
        "dau": pa.array(dau, pa.int64()),
        "wau": pa.array(wau, pa.int64()),
        "stickiness": pa.array(dau / wau.astype(np.float64),
                               pa.float64()),
    })


def cohort_retention(events_ds, num_buckets: int = 64):
    """Weekly cohort-retention triangle: users grouped by their FIRST
    active week (epoch-week), counted at every later active week →
    ``(cohort_week, week_offset, users)`` — the full matrix behind
    `retention`'s fixed d1/d7 probes.

    ONE user-hash exchange of per-batch-deduped (user, week) pairs;
    per bucket the cohort week and offsets derive vectorized from the
    sorted runs (segment-start propagation — no per-user Python); the
    final (cohort, offset) groupby is ≤ weeks² rows."""
    from ..functions.arrowutil import id_buckets

    def pairs(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        wk = (batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // (86_400_000_000 * 7)).astype(
                np.int64)
        arr = np.stack([uid, wk], axis=1)
        uniq = np.unique(arr, axis=0)
        t = pa.table({"user_id": pa.array(uniq[:, 0], pa.int64()),
                      "wk": pa.array(uniq[:, 1], pa.int64())})
        return t.append_column(
            "bucket", pa.array(id_buckets(t.column("user_id"),
                                          num_buckets), pa.int32()))

    def offsets(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"),
                           ("wk", "ascending")])
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        wk = t.column("wk").to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table({
                "cohort_week": pa.array([], pa.int64()),
                "week_offset": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        keep = np.empty(n, np.bool_)
        keep[0] = True
        keep[1:] = (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])
        uid, wk = uid[keep], wk[keep]
        n = len(uid)
        is_start = np.empty(n, np.bool_)
        is_start[0] = True
        is_start[1:] = uid[1:] != uid[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg = np.maximum.accumulate(np.where(is_start, idx, -1))
        cohort = wk[seg]
        off = wk - cohort
        packed = (cohort << 16) | off  # offsets fit 16 bits (weeks)
        uniq, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "cohort_week": pa.array(uniq >> 16, pa.int64()),
            "week_offset": pa.array(uniq & 0xFFFF, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    out = (
        events_ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(offsets, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n", alias_name="users"))
        .to_pandas()  # ≤ weeks² rows
    ).sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    return pa.table({
        "cohort_week": pa.array(out["cohort_week"].astype(np.int64),
                                pa.int64()),
        "week_offset": pa.array(out["week_offset"].astype(np.int64),
                                pa.int64()),
        "users": pa.array(out["users"].astype(np.int64), pa.int64()),
    })


def _rank_desc_bounded(ds, value_col: str, id_col: str,
                       rank_name: str, num_buckets: int = 64):
    """EXACT global dense row_number by (``value_col`` DESC, id ASC)
    over a BOUNDED-domain integer value column → ``(id, rank)`` — the
    `global_rank_bins` two-pass shape (value histogram broadcast +
    one value-keyed exchange), flipped descending."""
    import ray

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64),
                                       pa.int64())})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded by the value domain
        .sort_values("v", ascending=False).reset_index(drop=True)
    )
    offs = np.concatenate(([0], np.cumsum(hist["n"].to_numpy())[:-1]))
    off_ref = ray.put(dict(zip(hist["v"].astype(int),
                               offs.astype(int))))

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({id_col: batch.column(id_col),
                      "v": pa.array(v, pa.int64())})
        return t.append_column(
            "bucket",
            pa.array(((v.view(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15))
                      >> np.uint64(32)).astype(np.uint64)
                     % np.uint64(num_buckets), pa.int32()))

    _cache: list = []

    def rank_group(group: pa.Table) -> pa.Table:
        if not _cache:
            import ray as _ray

            _cache.append(_ray.get(off_ref))
        offset = _cache[0]
        t = group.sort_by([("v", "descending"), (id_col, "ascending")])
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = len(v)
        if n == 0:
            return pa.table({id_col: t.column(id_col),
                             rank_name: pa.array([], pa.int64())})
        change = np.concatenate(([True], v[1:] != v[:-1]))
        run_start = np.maximum.accumulate(
            np.where(change, np.arange(n), 0))
        local = np.arange(n) - run_start
        base = np.zeros(n, np.int64)
        base[change] = np.array([offset[int(c)] for c in v[change]],
                                np.int64)
        base = np.maximum.accumulate(base * change)
        return pa.table({
            id_col: t.column(id_col),
            rank_name: pa.array(base + local + 1, pa.int64())})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pyarrow")
    )


def rrf_fusion(docs_ds, kconst: int = 60, topk: int = 20,
               text_col: str = "text", id_col: str = "doc_id"):
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    of two document rankings — by ``n_chars`` and by distinct-token
    count (both DESC, id tiebreak) → top-``topk``
    ``(doc_id, r1, r2, rrf_num, rrf_den, rrf)``.

    RRF(d) = Σᵢ 1/(k+rᵢ(d)) is kept EXACT as the rational
    num/den = ((k+r1)+(k+r2)) / ((k+r1)·(k+r2)); the float ``rrf``
    derives from those two int64s, so engine and oracle produce the
    identical double.  Both rankings are `_rank_desc_bounded` two-pass
    global row_numbers (no global sort); the fusion is one doc-hash
    join; only the ≤topk result reaches the driver."""
    import pyarrow.compute as pc

    from .join import hash_join

    def metrics(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        codes = (_dict_encode(flat).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
            if len(flat) else np.empty(0, np.int64))
        n_types = np.zeros(batch.num_rows, np.int64)
        if len(codes):
            pairs = np.unique(np.stack(
                [doc_idx.astype(np.int64), codes], axis=1), axis=0)
            np.add.at(n_types, pairs[:, 0], 1)
        return pa.table({
            id_col: batch.column(id_col),
            "n_chars": batch.column("n_chars").cast(pa.int64()),
            "n_types": pa.array(n_types, pa.int64())})

    m = docs_ds.map_batches(metrics,
                            batch_format="pyarrow").materialize()
    r1 = _rank_desc_bounded(m.select_columns([id_col, "n_chars"]),
                            "n_chars", id_col, "r1")
    r2 = _rank_desc_bounded(m.select_columns([id_col, "n_types"]),
                            "n_types", id_col, "r2")
    both = hash_join(r1, r2, on=id_col, left_cols=["r1"],
                     right_cols=["r2"])

    def fuse(batch: pa.Table) -> pa.Table:
        a = batch.column("r1").to_numpy(zero_copy_only=False) + kconst
        b = batch.column("r2").to_numpy(zero_copy_only=False) + kconst
        num = a + b
        den = a * b
        return pa.table({
            id_col: batch.column(id_col),
            "r1": pa.array(a - kconst, pa.int64()),
            "r2": pa.array(b - kconst, pa.int64()),
            "rrf_num": pa.array(num, pa.int64()),
            "rrf_den": pa.array(den, pa.int64()),
            "rrf": pa.array(num / den.astype(np.float64),
                            pa.float64())})

    return (both.map_batches(fuse, batch_format="pyarrow")
            .sort(["rrf", id_col], descending=[True, False])
            .limit(topk))


def yoy_revenue(orders_ds, sf_dir: str):
    """Year-over-year revenue per customer nation: order-header cents
    per (nation, year) with the prior EXISTING year's cents and the
    YoY ratio → ``(n_name, o_year, rev_cents, prev_cents, yoy_ratio)``
    (NULL prev/ratio on each nation's first year — SQL LAG semantics).

    Shape: customer nationkeys broadcast dense int8, per-batch packed
    (nation, year) integer partials, ONE tiny groupby (≤ nations·years
    rows); the lag itself is driver-side arithmetic on that rollup."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    nation_of = np.full(int(ck.max()) + 1, -1, np.int8)
    nation_of[ck] = cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    ref = ray.put(nation_of)

    class Partial:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck_ = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck_ < 0).any() or (ck_ >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck_].astype(np.int64)
            if (nk < 0).any():
                raise ValueError("customer with no nation row")
            od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            yr = od.astype("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            cents = np.floor(batch.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
            packed = (yr << 5) | nk
            uniq, inv = np.unique(packed, return_inverse=True)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, cents)
            return pa.table({
                "nation_key": pa.array(uniq & 31, pa.int64()),
                "o_year": pa.array(uniq >> 5, pa.int64()),
                "cents": pa.array(acc, pa.int64())})

    out = (
        orders_ds.map_batches(Partial, batch_format="pyarrow",
                              concurrency=(1, 8))
        .groupby(["nation_key", "o_year"])
        .aggregate(Sum("cents", alias_name="rev_cents"))
        .to_pandas()  # ≤ nations·years rows
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    out["n_name"] = [name_of[int(k)] for k in out["nation_key"]]
    out = out.sort_values(["n_name", "o_year"]).reset_index(drop=True)
    prev = out.groupby("n_name")["rev_cents"].shift(1)
    ratio = out["rev_cents"] / prev
    return pa.table({
        "n_name": pa.array(out["n_name"], pa.string()),
        "o_year": pa.array(out["o_year"].astype(np.int64), pa.int64()),
        "rev_cents": pa.array(out["rev_cents"].astype(np.int64),
                              pa.int64()),
        "prev_cents": pa.array(prev, pa.float64()),
        "yoy_ratio": pa.array(ratio, pa.float64()),
    })


def bounce_rate(events_ds, gap_seconds: int = 1800,
                num_buckets: int = 64):
    """Per-day session bounce rate: sessions start after a
    >``gap_seconds`` silence (the `sessionize` rule, (ts, event_id)
    tie-break); a bounce is a single-event session; grouped by the
    session's START day →
    ``(day, n_sessions, n_bounces, bounce_rate)``.

    ONE user-hash exchange; per bucket one sort + vectorized boundary
    detection and per-session event counts (run-length math, no
    per-session Python); per-day partials reduce through a tiny
    day-keyed groupby."""
    from ..functions.arrowutil import id_buckets

    gap_us = int(gap_seconds) * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id"])
        return t.append_column(
            "bucket", pa.array(id_buckets(t.column("user_id"),
                                          num_buckets), pa.int32()))

    def sessions(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"),
                           ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        new_s = np.empty(n, np.bool_)
        new_s[0] = True
        new_s[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new_s)
        lens = np.diff(np.append(starts, n))
        day = ts[starts] // 86_400_000_000
        bounce = (lens == 1).astype(np.int64)
        uniq, inv = np.unique(day, return_inverse=True)
        s_cnt = np.bincount(inv).astype(np.int64)
        b_cnt = np.zeros(len(uniq), np.int64)
        np.add.at(b_cnt, inv, bounce)
        return pa.table({"day": pa.array(uniq, pa.int64()),
                         "s": pa.array(s_cnt, pa.int64()),
                         "b": pa.array(b_cnt, pa.int64())})

    out = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("s", alias_name="n_sessions"),
                   Sum("b", alias_name="n_bounces"))
        .to_pandas()  # ≤ span-days rows
    ).sort_values("day").reset_index(drop=True)
    s = out["n_sessions"].astype(np.int64)
    b = out["n_bounces"].astype(np.int64)
    return pa.table({
        "day": pa.array(out["day"].astype(np.int64), pa.int64()),
        "n_sessions": pa.array(s, pa.int64()),
        "n_bounces": pa.array(b, pa.int64()),
        "bounce_rate": pa.array(b.to_numpy()
                                / s.to_numpy().astype(np.float64),
                                pa.float64()),
    })


def interarrival_hist(events_ds, num_buckets: int = 64):
    """Log₂-bucketed inter-arrival-time histogram: per user, the gaps
    (µs) between consecutive events ((ts, event_id) order), bucketed by
    BIT LENGTH — bucket b holds gaps in [2^(b-1), 2^b), bucket 0 holds
    simultaneous events → ``(bucket, n_gaps)``.  The doubling buckets
    are the standard latency/burstiness profile shape.

    Exactness: the bucket is ``frexp``'s exponent (exact for any gap
    < 2^53 µs ≈ 285 years), never ``floor(log2(x))`` — float log₂
    rounds up at just-below-power-of-two values and mis-buckets them.
    ONE user-hash exchange; per bucket one sort + vectorized diffs;
    the final groupby is ≤ 64 rows."""
    from ..functions.arrowutil import id_buckets

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id"])
        return t.append_column(
            "bucket", pa.array(id_buckets(t.column("user_id"),
                                          num_buckets), pa.int32()))

    def gaps(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user_id", "ascending"),
                           ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n < 2:
            return pa.table({"lg": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        g = (ts[1:] - ts[:-1])[same]
        lg = np.zeros(len(g), np.int64)
        pos = g > 0
        lg[pos] = np.frexp(g[pos].astype(np.float64))[1]
        uniq, cnt = np.unique(lg, return_counts=True)
        return pa.table({"lg": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    out = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pyarrow")
        .groupby("lg")
        .aggregate(Sum("n", alias_name="n_gaps"))
        .to_pandas()  # ≤ 64 rows
    ).sort_values("lg").reset_index(drop=True)
    return pa.table({
        "bucket": pa.array(out["lg"].astype(np.int64), pa.int64()),
        "n_gaps": pa.array(out["n_gaps"].astype(np.int64), pa.int64()),
    })


def hhi_nation(orders_ds, sf_dir: str):
    """Herfindahl–Hirschman revenue-concentration index per customer
    nation: HHI = Σ_c (rev_c / rev_nation)² over each nation's
    customers → ``(n_name, n_customers, rev_cents, hhi)``.

    Exactness: HHI = Σrev_c² / (Σrev_c)² — numerator Σcents² splits
    hi/lo 32-bit inside int64 partials (the corr_by_nation Σc²
    discipline: cents² can pass 2^63) and recombines as Python big
    ints driver-side, so the double is a single exact-rational
    division.  Shape: per-(custkey) cents partials → ONE custkey-keyed
    exchange (one row per customer); per-nation squares reduce from
    per-batch partials over that rollup (nation broadcast dense int8);
    only the ≤25-row table reaches the driver."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    nation_of = np.full(int(ck.max()) + 1, -1, np.int8)
    nation_of[ck] = cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    ref = ray.put(nation_of)

    def cust_partial(batch: pa.Table) -> pa.Table:
        ck_ = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.floor(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(ck_, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, cents)
        return pa.table({"o_custkey": pa.array(uniq, pa.int64()),
                         "cents": pa.array(acc, pa.int64())})

    per_cust = (
        orders_ds.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="rev"))
    )

    class NationPartial:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck_ = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck_ < 0).any() or (ck_ >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck_].astype(np.int64)
            if (nk < 0).any():
                raise ValueError("customer with no nation row")
            rev = batch.column("rev").to_numpy(zero_copy_only=False)
            sq_hi, sq_lo = np.divmod(rev * rev, np.int64(2**32))
            # rev_c < 2^31.5 keeps rev² inside int64; the driver
            # recombines hi/lo exactly — same contract as corr_by_nation
            uniq, inv = np.unique(nk, return_inverse=True)
            out = {"nation_key": pa.array(uniq, pa.int64())}
            for name, col in (("n_cust", np.ones(len(rev), np.int64)),
                              ("rev", rev), ("sq_hi", sq_hi),
                              ("sq_lo", sq_lo)):
                acc = np.zeros(len(uniq), np.int64)
                np.add.at(acc, inv, col)
                out[name] = pa.array(acc, pa.int64())
            return pa.table(out)

    out = (
        per_cust.map_batches(NationPartial, batch_format="pyarrow",
                             concurrency=(1, 8))
        .groupby("nation_key")
        .aggregate(Sum("n_cust", alias_name="n_customers"),
                   Sum("rev", alias_name="rev_cents"),
                   Sum("sq_hi", alias_name="sq_hi"),
                   Sum("sq_lo", alias_name="sq_lo"))
        .to_pandas()  # ≤ 25 nations
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    out["n_name"] = [name_of[int(k)] for k in out["nation_key"]]
    out = out.sort_values("n_name").reset_index(drop=True)
    hhi = []
    for _, row in out.iterrows():
        ssq = int(row["sq_hi"]) * (2**32) + int(row["sq_lo"])
        tot = int(row["rev_cents"])
        hhi.append(float(ssq) / float(tot * tot) if tot else 0.0)
    return pa.table({
        "n_name": pa.array(out["n_name"], pa.string()),
        "n_customers": pa.array(out["n_customers"].astype(np.int64),
                                pa.int64()),
        "rev_cents": pa.array(out["rev_cents"].astype(np.int64),
                              pa.int64()),
        "hhi": pa.array(hhi, pa.float64()),
    })


def running_monthly_revenue(orders_ds, sf_dir: str):
    """Cumulative month-by-month revenue per customer nation →
    ``(n_name, month, rev_cents, cum_cents)`` with ``month`` as
    'YYYY-MM' — SQL running-SUM window semantics.

    Shape: dense nation broadcast, packed (nation, month) integer
    partials, ONE tiny groupby (≤ nations·months rows), driver-side
    cumulative sum per nation over that rollup."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    nation_of = np.full(int(ck.max()) + 1, -1, np.int8)
    nation_of[ck] = cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    ref = ray.put(nation_of)

    class Partial:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck_ = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck_ < 0).any() or (ck_ >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck_].astype(np.int64)
            if (nk < 0).any():
                raise ValueError("customer with no nation row")
            od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            mo = od.astype("datetime64[us]").astype(
                "datetime64[M]").astype(np.int64)  # months since 1970
            cents = np.floor(batch.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
            packed = (mo << 5) | nk
            uniq, inv = np.unique(packed, return_inverse=True)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, cents)
            return pa.table({
                "nation_key": pa.array(uniq & 31, pa.int64()),
                "mo": pa.array(uniq >> 5, pa.int64()),
                "cents": pa.array(acc, pa.int64())})

    out = (
        orders_ds.map_batches(Partial, batch_format="pyarrow",
                              concurrency=(1, 8))
        .groupby(["nation_key", "mo"])
        .aggregate(Sum("cents", alias_name="rev_cents"))
        .to_pandas()  # ≤ nations·months rows
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    out["n_name"] = [name_of[int(k)] for k in out["nation_key"]]
    out = out.sort_values(["n_name", "mo"]).reset_index(drop=True)
    out["cum_cents"] = out.groupby("n_name")["rev_cents"].cumsum()
    mo = out["mo"].to_numpy().astype("datetime64[M]")
    return pa.table({
        "n_name": pa.array(out["n_name"], pa.string()),
        "month": pa.array(np.datetime_as_string(mo, unit="M"),
                          pa.string()),
        "rev_cents": pa.array(out["rev_cents"].astype(np.int64),
                              pa.int64()),
        "cum_cents": pa.array(out["cum_cents"].astype(np.int64),
                              pa.int64()),
    })


def median_order_by_nation(orders_ds, sf_dir: str):
    """EXACT per-nation median order value (lower median — the element
    at 0-based index (n−1)//2 of the sorted cents) →
    ``(n_name, n_orders, median_cents)``.

    The median never sorts raw orders: per-batch (nation, cents)
    histogram partials → ONE keyed groupby bounded by the CENTS DOMAIN
    per nation (the `global_rank_bins` bounded-value contract); the
    driver walks each nation's ≤|domain| histogram rows cumulatively
    to the median index.  No full-table sort, no per-order driver
    data."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    nation_of = np.full(int(ck.max()) + 1, -1, np.int8)
    nation_of[ck] = cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    ref = ray.put(nation_of)

    class HistPartial:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck_ = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck_ < 0).any() or (ck_ >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck_].astype(np.int64)
            if (nk < 0).any():
                raise ValueError("customer with no nation row")
            cents = np.floor(batch.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
            packed = (cents << 5) | nk
            uniq, inv = np.unique(packed, return_inverse=True)
            return pa.table({
                "nation_key": pa.array(uniq & 31, pa.int64()),
                "cents": pa.array(uniq >> 5, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64),
                              pa.int64())})

    hist = (
        orders_ds.map_batches(HistPartial, batch_format="pyarrow",
                              concurrency=(1, 8))
        .groupby(["nation_key", "cents"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded by nations × cents domain
    ).sort_values(["nation_key", "cents"]).reset_index(drop=True)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    rows = []
    for nk, grp in hist.groupby("nation_key"):
        n = int(grp["n"].sum())
        target = (n - 1) // 2 + 1  # 1-based count to reach
        cum = grp["n"].cumsum()
        med = int(grp["cents"].to_numpy()[
            np.searchsorted(cum.to_numpy(), target)])
        rows.append((name_of[int(nk)], n, med))
    rows.sort()
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], pa.string()),
        "n_orders": pa.array([r[1] for r in rows], pa.int64()),
        "median_cents": pa.array([r[2] for r in rows], pa.int64()),
    })


def revenue_half_point(orders_ds, sf_dir: str):
    """Revenue-weighted median order value per nation: the smallest
    order cents value where the running revenue (orders sorted by
    value) reaches HALF the nation's total — "half the money is in
    orders of at most X" → ``(n_name, total_cents, half_cents)``.
    The comparison is the exact integer 2·cum ≥ total (no float
    halves).

    Same bounded (nation, cents)-histogram shape as
    `median_order_by_nation`: per-batch packed partials, one keyed
    groupby, driver walks ≤|domain| rows per nation."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    nation_of = np.full(int(ck.max()) + 1, -1, np.int8)
    nation_of[ck] = cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    ref = ray.put(nation_of)

    class HistPartial:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck_ = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck_ < 0).any() or (ck_ >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck_].astype(np.int64)
            if (nk < 0).any():
                raise ValueError("customer with no nation row")
            cents = np.floor(batch.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
            packed = (cents << 5) | nk
            uniq, inv = np.unique(packed, return_inverse=True)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, cents)
            return pa.table({
                "nation_key": pa.array(uniq & 31, pa.int64()),
                "cents": pa.array(uniq >> 5, pa.int64()),
                "w": pa.array(acc, pa.int64())})

    hist = (
        orders_ds.map_batches(HistPartial, batch_format="pyarrow",
                              concurrency=(1, 8))
        .groupby(["nation_key", "cents"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()  # bounded by nations × cents domain
    ).sort_values(["nation_key", "cents"]).reset_index(drop=True)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    rows = []
    for nk, grp in hist.groupby("nation_key"):
        total = int(grp["w"].sum())
        cum = grp["w"].cumsum().to_numpy()
        half = int(grp["cents"].to_numpy()[
            np.flatnonzero(2 * cum >= total)[0]])
        rows.append((name_of[int(nk)], total, half))
    rows.sort()
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], pa.string()),
        "total_cents": pa.array([r[1] for r in rows], pa.int64()),
        "half_cents": pa.array([r[2] for r in rows], pa.int64()),
    })


def unigram_coverage(docs_ds, ks: tuple = (10, 100, 1000),
                     text_col: str = "text"):
    """Vocabulary coverage curve: for each k in ``ks``, the fraction
    of the corpus TOKEN MASS covered by the k most frequent unigrams
    ((count DESC, term ASC) order) →
    ``(k, covered, total_tokens, frac)`` — the tokenizer-budget
    planning curve (how much text a k-entry vocab explains).

    Shape: the `word_count` partial rollup (one keyed exchange), ONE
    distributed sort of the (term, cnt) table cut to max(ks) rows by
    ``limit`` (sort+limit fuse into a per-block top-k + merge — no
    full-table collect), total mass from a one-row-per-batch sum;
    the ≤max(ks) head reaches the driver for the cumulative walk."""
    counts = word_count(docs_ds, text_col=text_col)
    kmax = max(ks)
    head = (counts.sort(["cnt", "term"], descending=[True, False])
            .limit(kmax).to_pandas())
    total = counts.map_batches(
        lambda b: pa.table({"t": pa.array(
            [int(np.sum(b.column("cnt").to_numpy(
                zero_copy_only=False)))], pa.int64())}),
        batch_format="pyarrow").sum("t")
    total = int(total) if total is not None else 0
    cum = head["cnt"].cumsum()
    rows = []
    for k in sorted(ks):
        covered = int(cum.iloc[min(k, len(cum)) - 1]) if len(cum) else 0
        rows.append((int(k), covered, total,
                     covered / total if total else 0.0))
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "covered": pa.array([r[1] for r in rows], pa.int64()),
        "total_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "frac": pa.array([r[3] for r in rows], pa.float64()),
    })


def mad_by_type(events_ds):
    """Robust per-type location/scale: for each event type, the EXACT
    lower-median of value cents and the MAD (lower-median of absolute
    deviations from that median) →
    ``(event_type, n, median_cents, mad_cents)`` — the outlier-robust
    twin of mean/stddev scoring.

    Two bounded-histogram passes (the `median_order_by_nation`
    contract — per-batch (type, cents) partials, one keyed groupby,
    driver walks ≤|domain| rows per type): pass 1 yields each type's
    median, which broadcasts as a tiny dict inside the pass-2 closure;
    pass 2 histograms |cents − med|.  No sort of raw events, nothing
    per-event on the driver."""

    def hist(ds, med: dict | None):
        def partial(batch: pa.Table) -> pa.Table:
            et = batch.column("event_type")
            if isinstance(et, pa.ChunkedArray):
                et = et.combine_chunks()
            ets = et.to_numpy(zero_copy_only=False)
            cents = np.floor(batch.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            if med is not None:
                base = np.array([med[t] for t in ets], np.int64)
                cents = np.abs(cents - base)
            df = pd.DataFrame({"event_type": ets, "cents": cents})
            g = df.groupby(["event_type", "cents"],
                           sort=False).size().reset_index(name="n")
            return pa.table({
                "event_type": pa.array(g["event_type"], pa.string()),
                "cents": pa.array(g["cents"].astype(np.int64),
                                  pa.int64()),
                "n": pa.array(g["n"].astype(np.int64), pa.int64())})

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()  # bounded by types × cents domain
        ).sort_values(["event_type", "cents"]).reset_index(drop=True)

    def medians(h: pd.DataFrame) -> dict:
        out = {}
        for et, grp in h.groupby("event_type"):
            n = int(grp["n"].sum())
            target = (n - 1) // 2 + 1
            cum = grp["n"].cumsum().to_numpy()
            out[et] = (int(grp["cents"].to_numpy()[
                np.searchsorted(cum, target)]), n)
        return out

    h1 = hist(events_ds, None)
    med_n = medians(h1)
    med = {t: m for t, (m, _) in med_n.items()}
    h2 = hist(events_ds, med)
    mad = {t: m for t, (m, _) in medians(h2).items()}
    types = sorted(med_n)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n": pa.array([med_n[t][1] for t in types], pa.int64()),
        "median_cents": pa.array([med_n[t][0] for t in types],
                                 pa.int64()),
        "mad_cents": pa.array([mad[t] for t in types], pa.int64()),
    })


def above_own_avg(orders_ds, sf_dir: str):
    """Customer-level decorrelated comparison: orders STRICTLY above
    their own customer's average order value, rolled up per nation →
    ``(n_name, n_orders, n_above, frac_above)``.

    The correlated subquery (avg over the same customer) decorrelates
    into a per-customer (Σcents, count) rollup; unlike
    `above_nation_avg`'s 25-row broadcast, the rollup here is
    CUSTOMER-scale — never broadcastable — so orders re-join it
    custkey-hash co-partitioned (`join.hash_join`) and the comparison
    runs exact-integer (cents·cnt > Σcents) inside the joined batches.
    Nation names resolve from the ≤25-row dimension driver-side."""
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    def cust_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.floor(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, cents)
        return pa.table({
            "o_custkey": pa.array(uniq, pa.int64()),
            "s": pa.array(acc, pa.int64()),
            "c": pa.array(np.bincount(inv).astype(np.int64),
                          pa.int64())})

    rollup = (
        orders_ds.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("s", alias_name="sum_cents"),
                   Sum("c", alias_name="cnt"))
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "cents": pa.array(cents, pa.int64())})

    joined = hash_join(
        orders_ds.map_batches(order_rows, batch_format="pyarrow"),
        rollup, on="o_custkey",
        left_cols=["cents"], right_cols=["sum_cents", "cnt"])

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    nation_of = np.full(int(ck.max()) + 1, -1, np.int8)
    nation_of[ck] = cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    ref = ray.put(nation_of)

    class NationPartial:
        def __init__(self):
            self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck_ = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            if (ck_ < 0).any() or (ck_ >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck_].astype(np.int64)
            if (nk < 0).any():
                raise ValueError("customer with no nation row")
            cents = batch.column("cents").to_numpy(
                zero_copy_only=False)
            s = batch.column("sum_cents").to_numpy(
                zero_copy_only=False)
            c = batch.column("cnt").to_numpy(zero_copy_only=False)
            above = (cents * c > s).astype(np.int64)
            uniq, inv = np.unique(nk, return_inverse=True)
            n_all = np.bincount(inv).astype(np.int64)
            n_ab = np.zeros(len(uniq), np.int64)
            np.add.at(n_ab, inv, above)
            return pa.table({
                "nation_key": pa.array(uniq, pa.int64()),
                "n_orders": pa.array(n_all, pa.int64()),
                "n_above": pa.array(n_ab, pa.int64())})

    out = (
        joined.map_batches(NationPartial, batch_format="pyarrow",
                           concurrency=(1, 8))
        .groupby("nation_key")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("n_above", alias_name="n_above"))
        .to_pandas()  # ≤ 25 nations
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    out["n_name"] = [name_of[int(k)] for k in out["nation_key"]]
    out = out.sort_values("n_name").reset_index(drop=True)
    return pa.table({
        "n_name": pa.array(out["n_name"], pa.string()),
        "n_orders": pa.array(out["n_orders"].astype(np.int64),
                             pa.int64()),
        "n_above": pa.array(out["n_above"].astype(np.int64),
                            pa.int64()),
        "frac_above": pa.array(
            out["n_above"].to_numpy()
            / out["n_orders"].to_numpy().astype(np.float64),
            pa.float64()),
    })


def token_type_corr(docs_ds, text_col: str = "text"):
    """Exact Pearson correlation and OLS slope between per-document
    token count and distinct-token (type) count → ONE row
    ``(n_docs, sum_tokens, sum_types, corr, slope)`` — the
    lexical-richness curve (Herdan's law) reduced to its second
    moments.

    All five moments are EXACT int64 partial sums; the second moments
    split hi/lo 32-bit inside the partials (the corr_by_nation Σc²
    discipline — Σx² for 10^12 docs overflows raw int64) and recombine
    as Python big ints; corr uses math.sqrt on the exact-rational
    pieces (the type_corr parity rule — ``**0.5`` diverges from SQL
    sqrt in the last bit)."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        x = np.zeros(batch.num_rows, np.int64)  # tokens
        y = np.zeros(batch.num_rows, np.int64)  # types
        if len(flat):
            np.add.at(x, doc_idx, 1)
            codes = _dict_encode(flat).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            pairs = np.unique(np.stack(
                [doc_idx.astype(np.int64), codes], axis=1), axis=0)
            np.add.at(y, pairs[:, 0], 1)
        cols = {"n": np.array([batch.num_rows], np.int64),
                "sx": np.array([int(x.sum())], np.int64),
                "sy": np.array([int(y.sum())], np.int64)}
        for name, v in (("xx", x * x), ("xy", x * y), ("yy", y * y)):
            cols[f"s{name}_hi"] = np.array(
                [int((v >> np.int64(32)).sum())], np.int64)
            cols[f"s{name}_lo"] = np.array(
                [int((v & np.int64(0xFFFFFFFF)).sum())], np.int64)
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    names = ["n", "sx", "sy", "sxx_hi", "sxx_lo", "sxy_hi", "sxy_lo",
             "syy_hi", "syy_lo"]
    sums = docs_ds.map_batches(partial,
                               batch_format="pyarrow").sum(names)
    if sums is None:
        return pa.table({
            "n_docs": pa.array([0], pa.int64()),
            "sum_tokens": pa.array([0], pa.int64()),
            "sum_types": pa.array([0], pa.int64()),
            "corr": pa.array([0.0], pa.float64()),
            "slope": pa.array([0.0], pa.float64())})
    g = {k: int(sums[f"sum({k})"]) for k in names}
    n, sx, sy = g["n"], g["sx"], g["sy"]
    sxx = g["sxx_hi"] * (2**32) + g["sxx_lo"]
    sxy = g["sxy_hi"] * (2**32) + g["sxy_lo"]
    syy = g["syy_hi"] * (2**32) + g["syy_lo"]
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    corr = (float(num) / math.sqrt(float(d1) * float(d2))
            if d1 and d2 else 0.0)
    slope = float(num) / float(d1) if d1 else 0.0
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "sum_tokens": pa.array([sx], pa.int64()),
        "sum_types": pa.array([sy], pa.int64()),
        "corr": pa.array([corr], pa.float64()),
        "slope": pa.array([slope], pa.float64()),
    })


def q5_local_supplier(lineitem_ds, orders_ds, sf_dir: str,
                      region: str = "ASIA",
                      date_from: str = "1996-01-01",
                      date_to: str = "1997-01-01"):
    """TPC-H Q5 (local supplier volume): revenue from lineitems whose
    SUPPLIER and CUSTOMER sit in the same nation of one region, orders
    in a date window → ``(n_name, revenue_e4, revenue)`` sorted by
    revenue desc.  Completes the relational family's TPC-H coverage
    (reference analogue: the doc↔page↔block FK joins,
    /root/reference/StudiOCR/db.py:43-61, at warehouse shape).

    Scale shape (the :func:`q7_volume` decomposition): nation/region are
    driver-read dimension tables; supplier→nation and customer→nation
    broadcast once as dense int8 arrays (1 byte per key); BOTH join
    sides pre-filter to the region's nations, so the single
    orderkey-hash exchange carries only qualifying narrow integer rows
    (~(|region|/25)² of lineitem at uniform nations).  Lineitem
    pre-aggregates exact integer 1e-4 revenue per (orderkey, nation)
    before the exchange; the final groupby has ≤ |nations| rows."""
    import pyarrow.parquet as pq
    import ray

    from .join import hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {n: int(k) for k, n in zip(
        reg.column("r_regionkey").to_pylist(),
        reg.column("r_name").to_pylist())}
    if region not in rkey:
        raise ValueError(f"unknown region {region!r}")
    nk_arr = nation.column("n_nationkey").to_numpy(zero_copy_only=False)
    in_region = np.zeros(int(nk_arr.max()) + 1, bool)
    name_of = {}
    for k, nm, rk in zip(nk_arr.tolist(),
                         nation.column("n_name").to_pylist(),
                         nation.column("n_regionkey").to_pylist()):
        if int(rk) == rkey[region]:
            in_region[k] = True
            name_of[int(k)] = nm

    def dense_nation(path, key_col, nk_col):
        t = pq.read_table(path, columns=[key_col, nk_col])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        nks = t.column(nk_col).to_numpy(zero_copy_only=False)
        arr = np.full(int(keys.max()) + 1, -1, np.int8)
        arr[keys] = nks.astype(np.int8)
        return arr

    supp_ref = ray.put(dense_nation(f"{sf_dir}/supplier.parquet",
                                    "s_suppkey", "s_nationkey"))
    cust_ref = ray.put(dense_nation(f"{sf_dir}/customer.parquet",
                                    "c_custkey", "c_nationkey"))
    region_ref = ray.put(in_region)
    lo = np.datetime64(date_from, "us").astype("int64")
    hi = np.datetime64(date_to, "us").astype("int64")

    class LinePartial:
        def __init__(self):
            self.nation_of = ray.get(supp_ref)
            self.in_region = ray.get(region_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            if (sk < 0).any() or (sk >= len(self.nation_of)).any():
                raise ValueError("unknown supplier key in lineitem")
            nk = self.nation_of[sk]
            keep = (nk >= 0) & self.in_region[np.maximum(nk, 0)]
            if not keep.any():
                return pa.table({
                    "l_orderkey": pa.array([], pa.int64()),
                    "supp_nk": pa.array([], pa.int8()),
                    "rev_part": pa.array([], pa.int64())})
            idx = np.flatnonzero(keep)
            ok = batch.column("l_orderkey").to_numpy(
                zero_copy_only=False)[idx]
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[idx]
            disc = batch.column("l_discount").to_numpy(
                zero_copy_only=False)[idx]
            rev = (np.floor(price * 100.0 + 0.5).astype(np.int64)
                   * np.floor((1.0 - disc) * 100.0 + 0.5).astype(
                       np.int64))
            # nationkeys < 25 fit 5 bits under the orderkey
            packed = (ok << 5) | nk[idx].astype(np.int64)
            uniq, inv = np.unique(packed, return_inverse=True)
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, rev)
            return pa.table({
                "l_orderkey": pa.array(uniq >> 5, pa.int64()),
                "supp_nk": pa.array((uniq & 31).astype(np.int8),
                                    pa.int8()),
                "rev_part": pa.array(acc, pa.int64())})

    class OrderSide:
        def __init__(self):
            self.nation_of = ray.get(cust_ref)
            self.in_region = ray.get(region_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            if (ck < 0).any() or (ck >= len(self.nation_of)).any():
                raise ValueError("unknown customer key in orders")
            nk = self.nation_of[ck]
            keep = ((od >= lo) & (od < hi) & (nk >= 0)
                    & self.in_region[np.maximum(nk, 0)])
            t = batch.select(["o_orderkey"]).filter(pa.array(keep))
            return t.append_column(
                "cust_nk", pa.array(nk[keep], pa.int8()))

    lines = lineitem_ds.map_batches(LinePartial, batch_format="pyarrow",
                                    concurrency=(1, 8))
    ords = orders_ds.map_batches(OrderSide, batch_format="pyarrow",
                                 concurrency=(1, 8))
    joined = hash_join(lines, ords, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols=["supp_nk", "rev_part"],
                       right_cols=["cust_nk"])

    def local_partial(batch: pa.Table) -> pa.Table:
        sn = batch.column("supp_nk").to_numpy(zero_copy_only=False)
        cn = batch.column("cust_nk").to_numpy(zero_copy_only=False)
        keep = sn == cn  # local supplier: same nation as the customer
        if not keep.any():
            return pa.table({"nk": pa.array([], pa.int8()),
                             "rev_part": pa.array([], pa.int64())})
        idx = np.flatnonzero(keep)
        rev = batch.column("rev_part").to_numpy(
            zero_copy_only=False)[idx]
        uniq, inv = np.unique(sn[idx], return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({"nk": pa.array(uniq, pa.int8()),
                         "rev_part": pa.array(acc, pa.int64())})

    out = (
        joined.map_batches(local_partial, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("rev_part", alias_name="revenue_e4"))
        .to_pandas()  # ≤ |nations in region| rows
    )
    res = pd.DataFrame({
        "n_name": [name_of[int(k)] for k in out["nk"]],
        "revenue_e4": out["revenue_e4"].astype(np.int64),
    }).sort_values(["revenue_e4", "n_name"],
                   ascending=[False, True]).reset_index(drop=True)
    return pa.table({
        "n_name": pa.array(res["n_name"], pa.string()),
        "revenue_e4": pa.array(res["revenue_e4"], pa.int64()),
        "revenue": pa.array(res["revenue_e4"].to_numpy() / 1e4,
                            pa.float64()),
    })


def q12_late_lines(lineitem_ds, orders_ds,
                   date_from: str = "1996-01-01",
                   date_to: str = "1997-01-01",
                   late_days: int = 60):
    """TPC-H Q12 adapted (shipmode priority): the synthetic lineitem has
    no ``l_shipmode``/``l_commitdate``/``l_receiptdate``, so the "mode"
    dimension is ``l_linestatus`` and a line is LATE when it shipped
    ``>= late_days`` after its order date — preserving Q12's structure
    (join + conditional priority counts per mode) on the available
    columns → ``(l_linestatus, high_line_count, low_line_count)``.

    Scale shape: orders pre-filter to the date window and ship only
    ``(o_orderkey, odate, is_high)`` narrow rows into ONE orderkey-hash
    exchange against ``(l_orderkey, l_shipdate, status)`` lineitem rows;
    the lateness predicate (needs both sides' dates) applies right after
    the join, then integer count partials per (status, is_high) make the
    final groupby ≤ 4 rows.  Counts are exact integers → hash-exact."""
    import pyarrow.compute as pc

    from .join import hash_join

    lo = np.datetime64(date_from, "us").astype("int64")
    hi = np.datetime64(date_to, "us").astype("int64")
    late_us = int(late_days) * 86_400_000_000

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        t = batch.filter(pa.array(keep))
        odk = od[keep]
        pri = t.column("o_orderpriority")
        is_high = pc.or_(pc.equal(pri, "1-URGENT"),
                         pc.equal(pri, "2-HIGH")).to_numpy(
            zero_copy_only=False).astype(np.int8)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "odate": pa.array(odk, pa.int64()),
            "is_high": pa.array(is_high, pa.int8())})

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64())
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "sd": sd,
            "status": batch.column("l_linestatus")})

    lines = lineitem_ds.map_batches(line_side, batch_format="pyarrow")
    ords = orders_ds.map_batches(order_side, batch_format="pyarrow")
    joined = hash_join(lines, ords, on="l_orderkey",
                       right_on="o_orderkey",
                       left_cols=["sd", "status"],
                       right_cols=["odate", "is_high"])

    def late_partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("sd").to_numpy(zero_copy_only=False)
        od = batch.column("odate").to_numpy(zero_copy_only=False)
        keep = sd - od >= late_us
        if not keep.any():
            return pa.table({"status": pa.array([], pa.string()),
                             "high_part": pa.array([], pa.int64()),
                             "low_part": pa.array([], pa.int64())})
        t = batch.filter(pa.array(keep))
        st = t.column("status")
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        d = st.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        hi_f = t.column("is_high").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nvoc = len(d.dictionary)
        high = np.bincount(codes, weights=hi_f,
                           minlength=nvoc).astype(np.int64)
        low = np.bincount(codes, weights=1 - hi_f,
                          minlength=nvoc).astype(np.int64)
        return pa.table({"status": d.dictionary,
                         "high_part": pa.array(high, pa.int64()),
                         "low_part": pa.array(low, pa.int64())})

    out = (
        joined.map_batches(late_partial, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Sum("high_part", alias_name="high_line_count"),
                   Sum("low_part", alias_name="low_line_count"))
        .to_pandas()  # ≤ |linestatus| rows
    ).sort_values("status").reset_index(drop=True)
    return pa.table({
        "l_linestatus": pa.array(out["status"], pa.string()),
        "high_line_count": pa.array(
            out["high_line_count"].astype(np.int64), pa.int64()),
        "low_line_count": pa.array(
            out["low_line_count"].astype(np.int64), pa.int64()),
    })


def q21_waiting_suppliers(lineitem_ds, orders_ds, sf_dir: str,
                          topk: int = 10, num_buckets: int = 32):
    """TPC-H Q21 adapted (suppliers who kept orders waiting): with no
    commit/receipt dates, "the supplier that kept order O waiting" is
    the UNIQUE latest shipper of a finished (status 'F') multi-supplier
    order — l_shipdate strictly greater than every other supplier's
    lines, preserving Q21's exists/not-exists structure (≥2 suppliers on
    the order; no second supplier ties the latest ship date) →
    ``(s_name, numwait, rank)`` top-k by (numwait desc, s_name).

    Scale shape: orders ship ONLY status-'F' orderkeys into a semi-join
    (lineitem side prunes to 3 int columns before the exchange); the
    per-order verdict needs every line of an order in one place, so
    qualifying lines co-partition by orderkey-hash — segment reduceat
    max/distinct scans per bucket, no per-order Python.  Per-supplier
    counts pre-aggregate per bucket; the final groupby is |suppliers|
    rows and top-k merges B·k partials driver-side
    (:func:`top_revenue_orders` shape).  s_name attaches from the
    driver-read supplier dimension at the very end (k rows)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.arrowutil import id_buckets
    from .join import hash_join

    def order_keys(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("o_orderstatus"), "F")
        return batch.select(["o_orderkey"]).filter(keep)

    def line_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_suppkey": batch.column("l_suppkey"),
            "sd": batch.column("l_shipdate").cast(pa.int64())})

    lines = lineitem_ds.map_batches(line_side, batch_format="pyarrow")
    okeys = orders_ds.map_batches(order_keys, batch_format="pyarrow")
    fin = hash_join(lines, okeys, on="l_orderkey",
                    right_on="o_orderkey", how="semi",
                    left_cols=["l_suppkey", "sd"])

    def bucketize(batch: pa.Table) -> pa.Table:
        b = id_buckets(batch.column("l_orderkey"), num_buckets)
        return batch.append_column("ob", pa.array(b, pa.int32()))

    def bucket_verdicts(group: pa.Table) -> pa.Table:
        """One bucket holds complete orders: per order segment, emit the
        supplier iff the order has ≥2 distinct suppliers and exactly one
        of them owns the max ship date."""
        empty = pa.table({"suppkey": pa.array([], pa.int64()),
                          "wait_part": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = group.column("l_suppkey").to_numpy(zero_copy_only=False)
        sd = group.column("sd").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok, sk, sd = ok[order], sk[order], sd[order]
        new_seg = np.empty(len(ok), bool)
        new_seg[0] = True
        new_seg[1:] = ok[1:] != ok[:-1]
        first = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        mx = np.maximum.reduceat(sd, first)
        new_pair = new_seg.copy()
        new_pair[1:] |= sk[1:] != sk[:-1]
        n_supp = np.add.reduceat(new_pair.astype(np.int64), first)
        cand = sd == mx[seg_id]
        cidx = np.flatnonzero(cand)
        if cidx.size == 0:
            return empty
        cseg = seg_id[cidx]
        csk = sk[cidx]
        cfirst = np.empty(cidx.size, bool)
        cfirst[0] = True
        cfirst[1:] = cseg[1:] != cseg[:-1]
        cstart = np.flatnonzero(cfirst)
        cmin = np.minimum.reduceat(csk, cstart)
        cmax = np.maximum.reduceat(csk, cstart)
        segs = cseg[cstart]
        win = (cmin == cmax) & (n_supp[segs] >= 2)
        if not win.any():
            return empty
        uniq, inv = np.unique(cmin[win], return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, 1)
        return pa.table({"suppkey": pa.array(uniq, pa.int64()),
                         "wait_part": pa.array(acc, pa.int64())})

    counts = (
        fin.map_batches(bucketize, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(bucket_verdicts, batch_format="pyarrow")
        .groupby("suppkey")
        .aggregate(Sum("wait_part", alias_name="numwait"))
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= topk:
            return batch.select(["suppkey", "numwait"])
        sk = batch.column("suppkey").to_numpy(zero_copy_only=False)
        nw = batch.column("numwait").to_numpy(zero_copy_only=False)
        sel = np.lexsort((sk, -nw))[:topk]
        return pa.table({"suppkey": pa.array(sk[sel], pa.int64()),
                         "numwait": pa.array(nw[sel], pa.int64())})

    import heapq

    partials = counts.map_batches(topk_partial,
                                  batch_format="pyarrow").take_all()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    name_of = {int(k): n for k, n in zip(
        supp.column("s_suppkey").to_pylist(),
        supp.column("s_name").to_pylist())}
    best = heapq.nsmallest(
        topk,
        ((-r["numwait"], name_of[int(r["suppkey"])]) for r in partials))
    return pa.table({
        "s_name": pa.array([n for _, n in best], pa.string()),
        "numwait": pa.array([-w for w, _ in best], pa.int64()),
        "rank": pa.array(range(1, len(best) + 1), pa.int32()),
    })


def search_docs_conjunctive(ds, words: list[str], text_col: str = "text",
                            id_col: str = "doc_id"):
    """ALL-words (conjunctive) case-insensitive substring match over
    documents → doc_ids.  The AND twin of :func:`search_docs_substring`
    (the reference's OCR search is ANY-word with early break,
    /root/reference/StudiOCR/ListDocuments.py:206-221); the index-side
    postings-intersection variant is :func:`studiocr_ray.search.
    search_corpus_all`.  One Arrow kernel per word per batch, stream-only."""
    import pyarrow.compute as pc

    lw = [w.lower() for w in words]

    def f(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column(text_col))
        mask = None
        for w in lw:
            m = pc.match_substring(low, w)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask).select([id_col])

    return ds.map_batches(f, batch_format="pyarrow")


def kendall_by_nation(orders_ds, customer_ds, sf_dir: str,
                      num_buckets: int = 16):
    """Exact Kendall tau-b per nation between customer account balance
    (exact cents) and the customer's order count →
    ``(n_name, n_customers, concordant, discordant, ties_x_pairs,
    ties_y_pairs, tau_b)``.

    The rank-correlation twin of :func:`spearman_by_nation` computed
    WITHOUT any global sort or O(n²) pair scan: Kendall's pair counts
    are a pure function of the per-nation contingency CELLS
    ``(x=cents, y=order count) → weight``, so the pipeline reduces to
    cell partials long before any exchange.  Concordant/discordant/tie
    pair counts come from one exclusive 2-D prefix-sum over the nation's
    D×K cell matrix (D = distinct balances, K = distinct order counts —
    K is tiny, D ≤ customers of the nation), all int64-exact, so every
    count column hash-matches the SQL oracle's cell self-join; ``tau_b``
    is then one IEEE-deterministic ``(C-D)/sqrt((n0-n1)·(n0-n2))``.

    Scale shape: customers enter as ZERO rows unioned with per-batch
    order-count partials, so customers with no orders are counted
    without any anti-join; ONE custkey-hash exchange totals counts per
    customer; nation/cents attach from dense driver-broadcast arrays
    (int8 + int64 per custkey — the :func:`orders_per_nation` pattern;
    at extreme key ranges swap in its documented custkey-hash semi-join
    shape); cell partials shrink each batch to its distinct cells before
    the tiny per-nation groupby."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey",
                                  "c_acctbal"])
    ck_arr = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    max_ck = int(ck_arr.max())
    nation_of = np.full(max_ck + 1, -1, np.int8)
    nation_of[ck_arr] = cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int8)
    cents_of = np.zeros(max_ck + 1, np.int64)
    cents_of[ck_arr] = np.floor(
        cust.column("c_acctbal").to_numpy(zero_copy_only=False)
        * 100.0 + 0.5).astype(np.int64)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    name_of = {int(k): n for k, n in zip(
        nation.column("n_nationkey").to_pylist(),
        nation.column("n_name").to_pylist())}
    dims_ref = ray.put((nation_of, cents_of))

    def order_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ck, return_inverse=True)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, 1)
        return pa.table({"ck": pa.array(uniq, pa.int64()),
                         "cnt_part": pa.array(acc, pa.int64())})

    def cust_zero(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey")
        return pa.table({"ck": ck.cast(pa.int64()),
                         "cnt_part": pa.array(
                             np.zeros(batch.num_rows, np.int64))})

    per_customer = (
        orders_ds.map_batches(order_partial, batch_format="pyarrow")
        .union(customer_ds.map_batches(cust_zero,
                                       batch_format="pyarrow"))
        .groupby("ck")
        .aggregate(Sum("cnt_part", alias_name="n_orders"))
    )

    class CellPartial:
        def __init__(self):
            self.nation_of, self.cents_of = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch.column("ck").to_numpy(zero_copy_only=False)
            if (ck < 0).any() or (ck >= len(self.nation_of)).any():
                raise ValueError("unknown customer key")
            nk = self.nation_of[ck]
            if (nk < 0).any():
                raise ValueError("customer key missing from dimension")
            cents = self.cents_of[ck]
            y = batch.column("n_orders").to_numpy(zero_copy_only=False)
            cells = np.stack([nk.astype(np.int64), cents, y], axis=1)
            uniq, inv = np.unique(cells, axis=0, return_inverse=True)
            w = np.zeros(len(uniq), np.int64)
            np.add.at(w, inv, 1)
            return pa.table({
                "nk": pa.array(uniq[:, 0].astype(np.int8), pa.int8()),
                "cents": pa.array(uniq[:, 1], pa.int64()),
                "y": pa.array(uniq[:, 2], pa.int64()),
                "w_part": pa.array(w, pa.int64())})

    def nation_tau(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "nk": pa.array([], pa.int8()),
                "n_customers": pa.array([], pa.int64()),
                "concordant": pa.array([], pa.int64()),
                "discordant": pa.array([], pa.int64()),
                "ties_x_pairs": pa.array([], pa.int64()),
                "ties_y_pairs": pa.array([], pa.int64()),
                "tau_b": pa.array([], pa.float64())})
        nk = int(group.column("nk")[0].as_py())
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        w = group.column("w_part").to_numpy(zero_copy_only=False)
        # merge duplicate cells across partials
        cells = np.stack([cents, y], axis=1)
        uniq, inv = np.unique(cells, axis=0, return_inverse=True)
        wm = np.zeros(len(uniq), np.int64)
        np.add.at(wm, inv, w)
        xs, xi = np.unique(uniq[:, 0], return_inverse=True)
        ys, yi = np.unique(uniq[:, 1], return_inverse=True)
        M = np.zeros((len(xs), len(ys)), np.int64)
        M[xi, yi] = wm
        # exclusive 2-D prefix sums: S_lt[i,j] = Σ_{i'<i, j'<j} M
        row_cum = np.cumsum(M, axis=0)
        S_below = np.zeros_like(M)
        S_below[1:, :] = row_cum[:-1, :]          # Σ_{i'<i} M[i',j]
        S_lt = np.zeros_like(M)
        S_lt[:, 1:] = np.cumsum(S_below, axis=1)[:, :-1]
        S_gt = np.zeros_like(M)                   # Σ_{i'<i, j'>j}
        S_gt[:, :-1] = (S_below[:, ::-1].cumsum(axis=1)[:, ::-1])[:, 1:]
        conc = int((M * S_lt).sum())
        disc = int((M * S_gt).sum())
        n = int(M.sum())
        tx = M.sum(axis=1)
        ty = M.sum(axis=0)
        n1 = int((tx * (tx - 1) // 2).sum())
        n2 = int((ty * (ty - 1) // 2).sum())
        n0 = n * (n - 1) // 2
        denom = float(n0 - n1) * float(n0 - n2)
        tau = (float(conc - disc) / math.sqrt(denom)) if denom > 0 \
            else 0.0
        return pa.table({
            "nk": pa.array([nk], pa.int8()),
            "n_customers": pa.array([n], pa.int64()),
            "concordant": pa.array([conc], pa.int64()),
            "discordant": pa.array([disc], pa.int64()),
            "ties_x_pairs": pa.array([n1], pa.int64()),
            "ties_y_pairs": pa.array([n2], pa.int64()),
            "tau_b": pa.array([tau], pa.float64())})

    out = (
        per_customer.map_batches(CellPartial, batch_format="pyarrow",
                                 concurrency=(1, 8))
        .groupby("nk")
        .map_groups(nation_tau, batch_format="pyarrow")
        .to_pandas()  # ≤ |nations| rows
    ).sort_values("nk").reset_index(drop=True)
    return pa.table({
        "n_name": pa.array([name_of[int(k)] for k in out["nk"]],
                           pa.string()),
        "n_customers": pa.array(out["n_customers"].astype(np.int64),
                                pa.int64()),
        "concordant": pa.array(out["concordant"].astype(np.int64),
                               pa.int64()),
        "discordant": pa.array(out["discordant"].astype(np.int64),
                               pa.int64()),
        "ties_x_pairs": pa.array(out["ties_x_pairs"].astype(np.int64),
                                 pa.int64()),
        "ties_y_pairs": pa.array(out["ties_y_pairs"].astype(np.int64),
                                 pa.int64()),
        "tau_b": pa.array(out["tau_b"].astype(np.float64),
                          pa.float64()),
    })


def changepoint_days(events_ds, ts_col: str = "ts",
                     type_col: str = "event_type"):
    """Integer CUSUM change-point screen per event type →
    ``(event_type, n_days, total_events, cp_day_us, cusum_peak)``: the
    day where the cumulative deviation of the DAILY event count from
    the type's own mean peaks (classic CUSUM; Page, Biometrika 1954).
    Complements :func:`anomaly_days` (single-day robust outliers) by
    finding sustained LEVEL SHIFTS — the screen run on a crawl/ingest
    feed before trusting a source's volume.

    Everything stays on integers: with D days and T total events, the
    scaled cumulative deviation after day k is
    ``s_k = D·(Σ_{i≤k} c_i) − k·T``  (= D·Σ(c_i − T/D), the exact mean
    deviation scaled by D) — int64-safe (≤ D·T) and hash-exact; the
    peak is ``max |s_k|`` with the EARLIEST day breaking ties.

    Scale shape: per-batch partial counts per (type, day) collapse each
    batch to its distinct cells; ONE type-keyed groupby co-locates a
    type's day table (bounded: days, not events); the per-type scan is
    one sort + cumsum.  Output is |types| rows."""
    from ray.data.aggregate import Sum  # noqa: F401  (pattern parity)

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = ts // DAY_US
        et = batch.column(type_col)
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        d = et.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = codes * (1 << 32) | (day & 0xFFFFFFFF)
        uniq, inv = np.unique(packed, return_inverse=True)
        c = np.zeros(len(uniq), np.int64)
        np.add.at(c, inv, 1)
        return pa.table({
            "event_type": d.dictionary.take(
                pa.array(uniq >> 32, pa.int64())),
            "day": pa.array(uniq & 0xFFFFFFFF, pa.int64()),
            "c_part": pa.array(c, pa.int64())})

    def type_cusum(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n_days": pa.array([], pa.int64()),
                "total_events": pa.array([], pa.int64()),
                "cp_day_us": pa.array([], pa.int64()),
                "cusum_peak": pa.array([], pa.int64())})
        day = group.column("day").to_numpy(zero_copy_only=False)
        cp = group.column("c_part").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(day, return_inverse=True)
        c = np.zeros(len(uniq), np.int64)
        np.add.at(c, inv, cp)
        D = len(uniq)
        T = int(c.sum())
        s = D * np.cumsum(c) - np.arange(1, D + 1, dtype=np.int64) * T
        k = int(np.argmax(np.abs(s)))  # argmax takes the FIRST maximum
        return pa.table({
            "event_type": pa.array(
                [group.column("event_type")[0].as_py()], pa.string()),
            "n_days": pa.array([D], pa.int64()),
            "total_events": pa.array([T], pa.int64()),
            "cp_day_us": pa.array([int(uniq[k]) * DAY_US], pa.int64()),
            "cusum_peak": pa.array([int(s[k])], pa.int64())})

    out = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(type_cusum, batch_format="pyarrow")
        .to_pandas()  # |types| rows
    ).sort_values("event_type").reset_index(drop=True)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_days": pa.array(out["n_days"].astype(np.int64), pa.int64()),
        "total_events": pa.array(out["total_events"].astype(np.int64),
                                 pa.int64()),
        "cp_day_us": pa.array(out["cp_day_us"].astype(np.int64),
                              pa.int64()),
        "cusum_peak": pa.array(out["cusum_peak"].astype(np.int64),
                               pa.int64()),
    })


def path_deviation(ds, k_events: int = 8, num_buckets: int = 64):
    """Behavioral-template deviation → ``(distance, n_users)``: every
    user's journey (first ``k_events`` event types by ``(ts, event_id)``,
    '>'-joined) scored by character-level edit distance against the
    corpus's MODAL journey (most frequent; ties → lexicographically
    smallest), histogrammed.  The population-level complement of
    :func:`user_paths` (which lists the templates; this measures how
    tightly the population clusters around the top one) — bot cohorts
    collapse to distance 0, organic traffic spreads.

    Shape: the :func:`user_paths` bucketed reassembly with an in-run
    position mask for the K-truncation (one exchange; a user's stream
    lands whole in one bucket); per-bucket path counts roll up through a
    path-keyed sum whose output is distinct-journey-bounded, the modal
    pick merges per-batch 1-row partials driver-side; pass 2 re-derives
    paths the same way and evaluates levenshtein once per DISTINCT path
    per bucket (dictionary encode — never per user).  Distances are
    exact ints; DuckDB's ``levenshtein`` is the same char DP as
    ``textfns.levenshtein``."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import id_buckets
    from ..functions.textfns import levenshtein

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "ts", "event_id", "event_type"])
        return t.append_column(
            "bucket",
            pa.array(id_buckets(t.column("user_id"), num_buckets),
                     pa.int32()))

    def bucket_paths(group: pa.Table):
        """→ (user-aligned ListArray of first-k types) as paths array."""
        t = group.sort_by([("user_id", "ascending"),
                           ("ts", "ascending"),
                           ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return None
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(new_u)
        seg = np.cumsum(new_u) - 1
        pos = np.arange(n) - starts[seg]
        keep = pos < k_events
        vals = t.column("event_type").combine_chunks()
        if isinstance(vals, pa.ChunkedArray):
            vals = (vals.chunk(0) if vals.num_chunks == 1
                    else pa.concat_arrays(vals.chunks))
        vals = vals.filter(pa.array(keep))
        lens = np.minimum(np.diff(np.append(starts, n)), k_events)
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       vals)
        return pc.binary_join(lst, ">")

    def count_partial(group: pa.Table) -> pa.Table:
        paths = bucket_paths(group)
        if paths is None:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        d = paths.dictionary_encode()
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary))
        return pa.table({
            "path": d.dictionary,
            "n_users": pa.array(cnt.astype(np.int64), pa.int64())})

    counted = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_partial, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def top1_part(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("n_users", "descending"), ("path", "ascending")])
        return batch.take(idx[: min(1, batch.num_rows)])

    cands = counted.map_batches(top1_part,
                                batch_format="pyarrow").take_all()
    if not cands:
        return pa.table({"distance": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    modal = min(cands, key=lambda r: (-r["n_users"], r["path"]))["path"]

    def dist_partial(group: pa.Table) -> pa.Table:
        paths = bucket_paths(group)
        if paths is None:
            return pa.table({"distance": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        d = paths.dictionary_encode()
        vocab = d.dictionary.to_pylist()
        dist = np.fromiter((levenshtein(p, modal) for p in vocab),
                           dtype=np.int64, count=len(vocab))
        per_user = dist[d.indices.to_numpy(zero_copy_only=False)]
        uniq, cnt = np.unique(per_user, return_counts=True)
        return pa.table({
            "distance": pa.array(uniq, pa.int64()),
            "n_part": pa.array(cnt.astype(np.int64), pa.int64())})

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dist_partial, batch_format="pyarrow")
        .groupby("distance")
        .aggregate(Sum("n_part", alias_name="n_users"))
        .to_pandas()  # ≤ max path length rows
    ).sort_values("distance").reset_index(drop=True)
    return pa.table({
        "distance": pa.array(out["distance"].astype(np.int64),
                             pa.int64()),
        "n_users": pa.array(out["n_users"].astype(np.int64),
                            pa.int64()),
    })


def term_dispersion(ds, k: int = 20, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Term burstiness over the corpus's top-``k`` terms →
    ``(term, tf_total, df, sum_tf2, fano)``: the variance-to-mean ratio
    (Fano factor) of each term's per-document frequency over ALL N
    docs — the classic content-vs-function-word separator (Church &
    Gale, 1995): function words scatter ~Poisson (Fano ≈ 1), topical
    words burst (Fano ≫ 1).  A quality screen for stopword lists and
    index hot-term salts alike.

    Two broadcast passes, no term-keyed shuffle of the open vocabulary:
    pass 1 reduces each batch to its term partials and merges only the
    per-batch top candidates (every global top-k term is a per-batch
    top-k term of some batch ⊇ guarantee does NOT hold for sums, so the
    candidate pass merges FULL per-batch term partials through the
    word_count-style bucketed sum, then takes top-k with term-ascending
    ties); pass 2 broadcasts the ≤k-term list via ``pc.is_in`` and
    folds each batch to ≤k (tf, tf², df, n) partial rows.  Fano uses
    the population variance over all N docs (zeros included):
    ``(S2/N − (S1/N)²) / (S1/N)`` — the same expression tree as the
    SQL oracle."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import string_buckets

    def count_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table({"wb": pa.array([], pa.int32()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        d = _dict_encode(flat)
        tf = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                         minlength=len(d.dictionary)).astype(np.int64)
        return pa.table({
            "wb": pa.array(string_buckets(d.dictionary, 64), pa.int32()),
            "term": d.dictionary,
            "tf": pa.array(tf, pa.int64())})

    def merge(group: pa.Table) -> pa.Table:
        d = _dict_encode(group.column("term"))
        tf = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            weights=group.column("tf").to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary)).astype(np.int64)
        t = pa.table({"term": d.dictionary,
                      "tf": pa.array(tf, pa.int64())})
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=[("tf", "descending"),
                                            ("term", "ascending")])
        return t.take(idx[:k])

    cands = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("wb")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )  # ≤ 64·k candidate rows
    cands.sort(key=lambda r: (-r["tf"], r["term"]))
    top = [r["term"] for r in cands[:k]]
    if not top:
        return pa.table({"term": pa.array([], pa.string()),
                         "tf_total": pa.array([], pa.int64()),
                         "df": pa.array([], pa.int64()),
                         "sum_tf2": pa.array([], pa.int64()),
                         "fano": pa.array([], pa.float64())})
    value_set = pa.array(sorted(top), pa.string())
    pos_of = {t: i for i, t in enumerate(sorted(top))}

    def probe(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch, text_col)
        kk = len(pos_of)
        cols = {"n_docs": pa.array([batch.num_rows], pa.int64())}
        if len(flat) == 0:
            for j in range(kk):
                for pre in ("s1", "s2", "df"):
                    cols[f"{pre}_{j}"] = pa.array([0], pa.int64())
            return pa.table(cols)
        hit = pc.is_in(flat, value_set=value_set).to_numpy(
            zero_copy_only=False)
        hflat = flat.take(pa.array(np.flatnonzero(hit)))
        hdoc = doc_idx[hit]
        codes = pc.index_in(hflat, value_set=value_set).to_numpy(
            zero_copy_only=False)
        n = batch.num_rows
        for j in range(kk):
            m = codes == j
            tf = np.bincount(hdoc[m], minlength=n).astype(np.int64)
            cols[f"s1_{j}"] = pa.array([int(tf.sum())], pa.int64())
            cols[f"s2_{j}"] = pa.array([int((tf * tf).sum())],
                                       pa.int64())
            cols[f"df_{j}"] = pa.array([int((tf > 0).sum())],
                                       pa.int64())
        return pa.table(cols)

    names = ["n_docs"] + [f"{p}_{j}" for j in range(len(pos_of))
                          for p in ("s1", "s2", "df")]
    sums = ds.map_batches(probe, batch_format="pyarrow").sum(names)
    n_f = float(sums["sum(n_docs)"])
    terms_sorted = sorted(top)
    out = {"term": [], "tf_total": [], "df": [], "sum_tf2": [],
           "fano": []}
    for t in sorted(top, key=lambda t: (-int(sums[
            f"sum(s1_{pos_of[t]})"]), t)):
        j = pos_of[t]
        s1 = int(sums[f"sum(s1_{j})"])
        s2 = int(sums[f"sum(s2_{j})"])
        df = int(sums[f"sum(df_{j})"])
        mean = float(s1) / n_f
        var = float(s2) / n_f - mean * mean
        out["term"].append(t)
        out["tf_total"].append(s1)
        out["df"].append(df)
        out["sum_tf2"].append(s2)
        out["fano"].append(var / mean if mean > 0.0 else 0.0)
    return pa.table({
        "term": pa.array(out["term"], pa.string()),
        "tf_total": pa.array(out["tf_total"], pa.int64()),
        "df": pa.array(out["df"], pa.int64()),
        "sum_tf2": pa.array(out["sum_tf2"], pa.int64()),
        "fano": pa.array(out["fano"], pa.float64()),
    })


def transition_entropy(ds, num_buckets: int = 64):
    """Next-event UNCERTAINTY per state → ``(from_type, n_transitions,
    ent_u, entropy)``: the Shannon entropy (nats) of each event type's
    next-type distribution over the :func:`transition_counts` Markov
    counts — near-zero entropy marks scripted/bot flows (the next step
    is always the same), high entropy marks organic browsing.

    Exactness discipline = ``char_entropy``'s: the per-cell term is the
    INTEGER micro-nat ``n·(⌊ln T·10⁶⌋ − ⌊ln n·10⁶⌋)`` so the sum is
    order-free and hash-exact; only the final ``ent_u / T / 10⁶``
    division is floating point, with the same expression tree as the
    SQL oracle.  The transition table is bounded by #types², so the
    final fold is driver-side over a tiny frame; the heavy lifting
    (user-bucketed adjacency) is transition_counts' one exchange."""
    from .lm import _log_micronats

    t = transition_counts(ds, num_buckets=num_buckets).to_pandas()
    out = {"from_type": [], "n_transitions": [], "ent_u": [],
           "entropy": []}
    for ft, sub in t.groupby("from_type"):
        n = sub["n"].to_numpy().astype(np.int64)
        T = int(n.sum())
        lt = int(_log_micronats(np.array([T], np.int64))[0])
        ln = _log_micronats(n)
        ent_u = int((n * (lt - ln)).sum())
        out["from_type"].append(ft)
        out["n_transitions"].append(T)
        out["ent_u"].append(ent_u)
        out["entropy"].append(
            float(ent_u) / T / 1e6 if T > 0 else 0.0)
    order = np.argsort(np.asarray(out["from_type"], dtype=object))
    return pa.table({
        "from_type": pa.array([out["from_type"][i] for i in order],
                              pa.string()),
        "n_transitions": pa.array(
            [out["n_transitions"][i] for i in order], pa.int64()),
        "ent_u": pa.array([out["ent_u"][i] for i in order], pa.int64()),
        "entropy": pa.array([out["entropy"][i] for i in order],
                            pa.float64()),
    })
