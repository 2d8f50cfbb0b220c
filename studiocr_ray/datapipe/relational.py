"""Relational / aggregate operators used by the driver-facing queries.

Every groupby here follows the partial-aggregation pattern: combine inside
``map_batches`` first (one row per key per batch), then a small
``groupby().aggregate()`` over partials — never a raw-row shuffle
(ray_guide 'Aggregation at scale').  Small join sides are broadcast via
``ray.put`` and looked up per batch — no shuffle join.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Sum


def word_count(ds, text_col: str = "text"):
    """Corpus term frequencies over lowered whitespace tokens → (term, cnt)."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(t.lower().split())
        terms = sorted(c)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array([c[t] for t in terms], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("term").aggregate(Sum("cnt", alias_name="cnt"))


def term_doc_freq(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Term document-frequency + total frequency → (term, df, tf).

    (term, doc) partials are exact because one document is one row (never
    split across batches)."""

    def partial(batch: pa.Table) -> pa.Table:
        terms, ids, tfs = [], [], []
        for did, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            c = Counter(t.lower().split())
            for term in sorted(c):
                terms.append(term)
                ids.append(did)
                tfs.append(c[term])
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("term").aggregate(
        Count("doc_id", alias_name="df"), Sum("tf", alias_name="tf")
    )


def char_histogram(ds, text_col: str = "text"):
    """Corpus printable-ASCII histogram → (code, cnt), codes 32..126.

    The corpus-level analogue of the reference's per-page
    ``char_histogram()`` (/root/reference/StudiOCR/OcrPageData.py:84-91).
    Byte-level bincount is exact for ASCII codes because UTF-8 continuation
    bytes are ≥ 0x80."""

    def partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(128, dtype=np.int64)
        for t in batch.column(text_col).to_pylist():
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            acc += np.bincount(b, minlength=256)[:128]
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
    query word (≤3-char tokens exact — the zero_one_loss rule)."""
    from ..functions.textfns import fuzzy_match

    w = word.lower()

    def f(batch: pa.Table) -> pa.Table:
        ids = []
        cache: dict[str, bool] = {}
        for did, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            hit = False
            for tok in set(t.lower().split()):
                v = cache.get(tok)
                if v is None:
                    v = fuzzy_match(tok, w, tol)
                    cache[tok] = v
                if v:
                    hit = True
                    break
            if hit:
                ids.append(did)
        return pa.table({id_col: pa.array(ids, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def conf_bucket_counts(ds, text_col: str = "text"):
    """Confidence-bucket counts over synthetic per-token confidences
    conf = 40 + (codepoint of first char) % 60 — exercises the reference's
    highlight bucketing (/root/reference/StudiOCR/DocWindow.py:221-227) at
    corpus scale with a SQL-reproducible confidence."""
    from ..functions.textfns import conf_bucket

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            for tok in t.split():
                conf = 40 + (ord(tok[0]) % 60)
                c[conf_bucket(conf)] += 1
        buckets = sorted(c)
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int32()),
                "cnt": pa.array([c[b] for b in buckets], pa.int64()),
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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty=("l_quantity", "sum"), n_items=("l_orderkey", "size"))
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"), Sum("n_items", alias_name="n_items")
    )
    return out


def orders_by_priority(ds):
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("o_orderkey", "size")
        )

    return ds.map_batches(partial, batch_format="pandas").groupby(
        "o_orderpriority"
    ).aggregate(Sum("n_orders", alias_name="n_orders"))


def orders_per_nation(orders_ds, sf_dir: str):
    """Broadcast join: orders ⋈ customer ⋈ nation (both dimension tables are
    small sides — ray.put once, numpy lookup per batch; no shuffle join)."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation_of = dict(zip(cust.column("c_custkey").to_pylist(),
                         cust.column("c_nationkey").to_pylist()))
    name_of = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))
    ref = ray.put((nation_of, name_of))

    class J:
        def __init__(self):
            self.nation_of, self.name_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            c: Counter = Counter()
            for ck in batch.column("o_custkey").to_pylist():
                c[self.name_of[self.nation_of[ck]]] += 1
            names = sorted(c)
            return pa.table(
                {
                    "n_name": pa.array(names, pa.string()),
                    "n_orders": pa.array([c[n] for n in names], pa.int64()),
                }
            )

    partials = orders_ds.map_batches(J, batch_format="pyarrow", concurrency=(1, 4))
    return partials.groupby("n_name").aggregate(Sum("n_orders", alias_name="n_orders"))


def events_daily(ds):
    """Per (user_id, day): event count + distinct event types. Two-stage
    partial aggregation (tumbling daily window over event time)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(day=batch["ts"].dt.strftime("%Y-%m-%d"))
        return batch.groupby(["user_id", "day", "event_type"], as_index=False).agg(
            n=("event_id", "size")
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    per_type = partials.groupby(["user_id", "day", "event_type"]).aggregate(
        Sum("n", alias_name="n")
    )
    return per_type.groupby(["user_id", "day"]).aggregate(
        Count("event_type", alias_name="n_event_types"),
        Sum("n", alias_name="n_events"),
    )
