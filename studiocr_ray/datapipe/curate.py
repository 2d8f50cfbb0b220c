"""Corpus curation: the composed training-data cleaning pipeline.

What a 100 TB web-text pipeline actually runs end-to-end — language filter →
quality filter → exact dedup → near-duplicate dedup — composed from the
engine's individually-oracled operators into one streaming flow:

    documents
      → map_batches(lang_id + quality_score, fused single pass)  # no shuffle
      → filter(pred_lang == lang AND score ≥ min_quality)
      → exact_dedup                      # bucketed hash exchange, keep-min-id
      → minhash near-dup pairs → union-find clusters
      → drop non-representative cluster members (broadcast set filter)

Only the dedup stages shuffle, and only narrow (hash, id) rows move; texts
stream through stateless map_batches.  The whole composition is reproduced
in SQL by the ``curate_corpus`` oracle (every stage's formula is the one the
per-operator oracles already prove).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import duplicate_clusters, exact_dedup, minhash_dedup_pairs
from .text import lang_id, quality_score


def _lang_quality_filter(
    batch: pa.Table, lang: str, min_quality: float, text_col: str = "text"
) -> pa.Table:
    """Fused single-pass language + quality gate (one tokenization walk per
    batch would be nicer still, but both functions are vectorized/bounded and
    fusing at the batch level already avoids a second Dataset stage)."""
    langs = lang_id(batch, text_col).column("pred_lang")
    scores = quality_score(batch, text_col).column("quality_score")
    mask = pc.and_(
        pc.equal(langs, lang), pc.greater_equal(scores, min_quality)
    )
    return batch.filter(mask)


def curate(
    ds,
    lang: str = "en",
    min_quality: float = 0.5,
    neardup_threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 32,
    shingle: str = "word",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """documents Dataset → Dataset of surviving rows (id + text + the
    content_hash the exact-dedup stage added).

    Near-dup policy mirrors exact dedup: within each verified cluster the
    minimum id survives (cluster_rep), every other member is dropped."""
    import ray

    filtered = ds.map_batches(
        _lang_quality_filter,
        fn_kwargs={"lang": lang, "min_quality": min_quality,
                   "text_col": text_col},
        batch_format="pyarrow",
    )
    # materialize ONCE: the near-dup stage consumes this twice (signatures +
    # co-partitioned verify side) and the final drop filter a third time —
    # without the pin the lang/quality filter + content-hash shuffle would
    # re-execute per consumer
    deduped = exact_dedup(filtered, text_col=text_col, id_col=id_col).materialize()
    pairs = minhash_dedup_pairs(
        deduped.select_columns([id_col, text_col]).map_batches(
            lambda b: b.rename_columns(["doc_id", "text"]),
            batch_format="pyarrow",
        ) if id_col != "doc_id" or text_col != "text" else
        deduped.select_columns([id_col, text_col]),
        threshold=neardup_threshold,
        num_perm=num_perm,
        bands=bands,
        shingle=shingle,
        n=n,
    )
    clusters = duplicate_clusters(pairs)
    drop = {
        d for d, rep in zip(
            clusters.column("doc_id").to_pylist(),
            clusters.column("cluster_rep").to_pylist(),
        )
        if d != rep
    }
    if not drop:
        return deduped
    drop_arr = ray.put(pa.array(sorted(drop)))

    def drop_non_reps(batch: pa.Table) -> pa.Table:
        import ray as _ray

        return batch.filter(
            pc.invert(pc.is_in(batch.column(id_col), _ray.get(drop_arr)))
        )

    return deduped.map_batches(drop_non_reps, batch_format="pyarrow")
