"""Hypothesis property tests for the storage-elision invariants and the
arithmetic kernels the engine's correctness rests on.

These are the load-bearing equalities: if any of them breaks, stored data
and reconstructed data silently diverge (layout pages), signatures stop
matching their SQL oracles (minhash/simhash), or buckets mis-partition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# visible-ASCII tokens, whitespace-separated — the domain extracted text
# lives in after normalization
token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=12,
)
token_list = st.lists(token, min_size=0, max_size=40)


class TestLayoutRoundtrip:
    @settings(max_examples=200, deadline=None)
    @given(token_list)
    def test_layout_page_reconstruction_exact(self, toks):
        """materialize_pages' inverse property: a layout page rebuilt from
        its stored text equals the page built from the original tokens."""
        from studiocr_ray.functions.document import layout_page_row
        from studiocr_ray.functions.html_extract import layout_tokens

        page_text = " ".join(toks)
        direct = layout_tokens(page_text)
        rebuilt = layout_page_row(0, page_text)
        assert [b["text"] for b in rebuilt["blocks"]] == direct["text"]
        assert [b["left"] for b in rebuilt["blocks"]] == direct["left"]
        assert [b["top"] for b in rebuilt["blocks"]] == direct["top"]
        assert [b["conf"] for b in rebuilt["blocks"]] == direct["conf"]
        assert rebuilt["dropped"] == []
        # and the stored text round-trips: joining the blocks reproduces it
        assert " ".join(b["text"] for b in rebuilt["blocks"]) == page_text

    @settings(max_examples=100, deadline=None)
    @given(st.lists(token_list, min_size=1, max_size=4), st.integers(0, 3))
    def test_materialize_pages_fills_missing(self, pages_toks, raster_at):
        """Any subset of pages may be stored; materialize_pages regenerates
        exactly the missing (layout) positions from the text segments."""
        from studiocr_ray.functions.document import (
            layout_page_row,
            materialize_pages,
        )

        texts = [" ".join(t) for t in pages_toks]
        n = len(texts)
        full = [layout_page_row(i, texts[i]) for i in range(n)]
        stored_idx = {min(raster_at, n - 1)}
        stored = [full[i] for i in sorted(stored_idx)]
        got = materialize_pages(n, "\n".join(texts), stored)
        assert [p["page"] for p in got] == list(range(n))
        for i in range(n):
            assert [b["text"] for b in got[i]["blocks"]] == [
                b["text"] for b in full[i]["blocks"]
            ]


class TestKernels:
    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(0, (1 << 61) - 2), st.integers(0, (1 << 61) - 2)
    )
    def test_mulmod61(self, a, b):
        from studiocr_ray.datapipe.dedup import _mulmod61

        got = _mulmod61(
            np.array([a], np.uint64), np.array([b], np.uint64)
        )[0]
        assert int(got) == (a * b) % ((1 << 61) - 1)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(token, min_size=0, max_size=30), st.integers(2, 64))
    def test_string_buckets_in_range_and_deterministic(self, strings, nb):
        from studiocr_ray.functions.arrowutil import string_buckets

        arr = pa.array(strings, pa.string())
        b1 = string_buckets(arr, nb)
        b2 = string_buckets(arr, nb)
        assert (b1 == b2).all()
        assert len(b1) == len(strings)
        if len(b1):
            assert b1.min() >= 0 and b1.max() < nb
        # slicing must not change a value's bucket (buffer-offset handling)
        if len(strings) > 2:
            sliced = string_buckets(arr.slice(1, len(strings) - 1), nb)
            assert (sliced == b1[1:]).all()

    @settings(max_examples=150, deadline=None)
    @given(token_list, token_list, st.integers(0, 2))
    def test_zero_one_hits_matches_naive(self, expected, predicted, tol):
        from studiocr_ray.functions.textfns import fuzzy_match, zero_one_hits

        naive = sum(
            1 for e in expected
            if any(fuzzy_match(p, e, tol) for p in predicted)
        )
        assert zero_one_hits(expected, predicted, tol) == naive
