"""Blocked fuzzy-match self-join (record linkage at edit distance ≤ 1).

The SymSpell / deletion-neighborhood blocking scheme (public method —
Garbe's symmetric-delete algorithm): two strings within Levenshtein
distance 1 ALWAYS share at least one member of each other's
{identity ∪ one-char-deletion} variant sets (substitution at i ⇒ both
i-deletions equal; insertion ⇒ the longer string's deletion equals the
shorter), so equal-variant runs are a complete candidate generator — no
all-pairs scan, no similarity shuffle wider than the variant rows.

Reference lineage: the edit-distance predicate is the same Levenshtein
the reference uses for fuzzy search
(`/root/reference/Image_Preprocessing_Optimization/CustomFunctions.py:19-38`,
mirrored in ``functions.textfns``); the reference applies it per query
scan — this module lifts it to a corpus-scale self-JOIN, which the
reference has no analogue for.

Pipeline shape (three bucketed exchanges, the engine's standard pattern):

1. per batch, each DISTINCT name (dictionary-encoded — hot names cost one
   variant expansion per batch) emits its variants tagged
   ``vb = hash(variant) % B``;
2. ``groupby(vb)``: equal-variant runs expand to candidate id pairs
   (vectorized triangular expansion per run), locally deduped;
3. ``groupby(pair bucket)``: global pair dedup (the same pair arises from
   several variants) + Levenshtein verify.

Run sizes are bounded by the variant's collision set (alphabet × name
length for synthetic keys, empirically small for natural names); a
pathological hot variant (e.g. the empty string from 1-char names) would
need the same hot-bucket cap discipline as the MinHash bands
(`dedup.py`); names there are ≥ 2 chars by contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowutil import (
    first_of_run_mask,
    id_buckets,
    string_buckets,
)
from ..functions.textfns import levenshtein
from .relational import _dict_encode


def fuzzy_pairs(
    ds,
    id_col: str = "id",
    name_col: str = "name",
    num_buckets: int = 64,
):
    """All record pairs whose ``name_col`` values are within Levenshtein
    distance 1 → ``(id_a, id_b, dist)`` with ``id_a < id_b``; exact
    (complete + verified), never all-pairs."""

    def variants(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        names = batch.column(name_col)
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        d = _dict_encode(names)
        dict_words = d.dictionary.to_pylist()
        # per DISTINCT word: itself + each 1-deletion variant
        var_flat: list[str] = []
        counts = np.empty(len(dict_words), np.int64)
        for k, w in enumerate(dict_words):
            var_flat.append(w)
            for i in range(len(w)):
                var_flat.append(w[:i] + w[i + 1:])
            counts[k] = len(w) + 1
        codes = d.indices.to_numpy(zero_copy_only=False)
        # scatter: row r replicates its word's variant block
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        row_counts = counts[codes]
        row_idx = np.repeat(np.arange(batch.num_rows), row_counts)
        flat_pos = (
            np.repeat(starts[codes], row_counts)
            + (np.arange(row_counts.sum())
               - np.repeat(np.concatenate(([0], np.cumsum(row_counts)[:-1])),
                           row_counts))
        )
        var_arr = pa.array(var_flat, pa.string()).take(pa.array(flat_pos))
        return pa.table(
            {
                "vb": pa.array(
                    string_buckets(var_arr, num_buckets), pa.int32()
                ),
                "variant": var_arr,
                "rid": ids.take(pa.array(row_idx)),
                "name": names.take(pa.array(row_idx)),
            }
        )

    def candidates(group: pa.Table) -> pa.Table:
        t = group.sort_by([("variant", "ascending"), ("rid", "ascending")])
        first = first_of_run_mask([t.column("variant")])
        run_id = np.cumsum(first) - 1
        rid = t.column("rid").to_numpy(zero_copy_only=False)
        order_in_run = np.arange(len(rid)) - np.flatnonzero(first)[run_id]
        # triangular expansion: each row pairs with every EARLIER row of
        # its run (same variant)
        counts = order_in_run.astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {"pb": pa.array([], pa.int32()),
                 "id_a": pa.array([], t.column("rid").type),
                 "id_b": pa.array([], t.column("rid").type),
                 "name_a": pa.array([], pa.string()),
                 "name_b": pa.array([], pa.string())}
            )
        right = np.repeat(np.arange(len(rid)), counts)
        left = (
            np.arange(total)
            - np.repeat(np.concatenate(([0], np.cumsum(counts)[:-1])),
                        counts)
            + np.repeat(np.flatnonzero(first)[run_id], counts)
        )
        ia, ib = rid[left], rid[right]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        keep = lo != hi
        lo, hi, left, right = lo[keep], hi[keep], left[keep], right[keep]
        # local dedup (same pair via several variants in this bucket)
        _, uniq_idx = np.unique(
            np.stack([lo, hi]), axis=1, return_index=True
        )
        lo, hi = lo[uniq_idx], hi[uniq_idx]
        left, right = left[uniq_idx], right[uniq_idx]
        swap = rid[left] != lo  # name_a must follow id_a
        na = np.where(swap, right, left)
        nb = np.where(swap, left, right)
        names = t.column("name")
        la = pa.array(lo, t.column("rid").type)
        lb = pa.array(hi, t.column("rid").type)
        from ..functions.arrowutil import pair_buckets

        return pa.table(
            {
                "pb": pa.array(pair_buckets(la, lb, num_buckets), pa.int32()),
                "id_a": la,
                "id_b": lb,
                "name_a": names.take(pa.array(na)),
                "name_b": names.take(pa.array(nb)),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        t = group.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
        first = first_of_run_mask([t.column("id_a"), t.column("id_b")])
        t = t.filter(pa.array(first))
        na = t.column("name_a").to_pylist()
        nb = t.column("name_b").to_pylist()
        dist = np.empty(len(na), np.int64)
        ok = np.zeros(len(na), bool)
        for i, (a, b) in enumerate(zip(na, nb)):
            if abs(len(a) - len(b)) > 1:
                continue
            d = levenshtein(a, b)
            if d <= 1:
                ok[i] = True
                dist[i] = d
        t = t.filter(pa.array(ok))
        return pa.table(
            {
                "id_a": t.column("id_a"),
                "id_b": t.column("id_b"),
                "dist": pa.array(dist[ok], pa.int64()),
            }
        )

    return (
        ds.map_batches(variants, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(candidates, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(verify, batch_format="pyarrow")
    )
