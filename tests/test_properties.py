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


class TestSketchKernels:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, (1 << 64) - 1), min_size=1, max_size=50))
    def test_bit_length_matches_python(self, vals):
        from studiocr_ray.datapipe.sketch import _bit_length_u64

        w = np.array(vals, dtype=np.uint64)
        assert _bit_length_u64(w).tolist() == [v.bit_length() for v in vals]

    @settings(max_examples=100, deadline=None)
    @given(st.lists(token, min_size=1, max_size=60), st.integers(0, 5))
    def test_hll_partial_split_invariant(self, vals, cut):
        """Register partials are max-combinable: folding any split of the
        value list equals folding the whole — the property the distributed
        merge rests on."""
        from studiocr_ray.datapipe.sketch import _HLLPartial

        def regs_of(tables):
            out: dict[int, int] = {}
            for t in tables:
                part = _HLLPartial("g", "v", 12)(t)
                for i, r in zip(part.column("idx").to_pylist(),
                                part.column("rho").to_pylist()):
                    out[i] = max(out.get(i, 0), r)
            return out

        whole = pa.table({"g": pa.array(["x"] * len(vals)),
                          "v": pa.array(vals)})
        k = min(cut, len(vals))
        a = pa.table({"g": pa.array(["x"] * k), "v": pa.array(vals[:k])})
        b = pa.table({"g": pa.array(["x"] * (len(vals) - k)),
                      "v": pa.array(vals[k:])})
        assert regs_of([whole]) == regs_of([a, b])

    @settings(max_examples=100, deadline=None)
    @given(st.lists(token, min_size=0, max_size=40),
           st.lists(token, min_size=1, max_size=10))
    def test_cm_partial_never_undercounts(self, corpus_toks, probes):
        """Summing CM cell partials and taking the min over rows is >= the
        true count for every probe (the Count-Min guarantee, exercised at
        a tiny width where collisions are common)."""
        from collections import Counter

        from studiocr_ray.datapipe.dedup import _stable64
        from studiocr_ray.datapipe.sketch import _bloom_positions, _cm_partial

        width, depth = 32, 3
        t = pa.table(
            {"doc_id": pa.array(list(range(1)), pa.int64()),
             "text": pa.array([" ".join(corpus_toks)])}
        )
        part = _cm_partial(t, "text", depth, width, 8)
        cells = dict(zip(part.column("cellkey").to_pylist(),
                         part.column("c").to_pylist()))
        # the sketch counts lowered whitespace tokens (the corpus-standard
        # tokenization its SQL oracle mirrors) — compare in that domain
        true = Counter(tok.lower() for tok in corpus_toks)
        probes = [p.lower() for p in probes]
        for p in probes:
            hv = np.array([_stable64(p)], dtype=np.uint64)
            pos = _bloom_positions(hv, depth, width)[0]
            est = min(
                cells.get(i * width + int(pos[i]), 0) for i in range(depth)
            )
            assert est >= true[p]

    @settings(max_examples=100, deadline=None)
    @given(st.lists(token, min_size=0, max_size=50), st.integers(1, 4))
    def test_bloom_or_partials_split_invariant(self, vals, pieces):
        """Bloom word partials OR to the same bit array however the probe
        set is split across batches."""
        from studiocr_ray.datapipe.sketch import _bloom_word_partial

        m = 1 << 12

        def words_of(tables):
            acc: dict[int, int] = {}
            for t in tables:
                part = _bloom_word_partial(t, "v", 2, m, 4)
                for i, w in zip(part.column("word_idx").to_pylist(),
                                part.column("word").to_pylist()):
                    acc[i] = acc.get(i, 0) | (w & 0xFFFFFFFFFFFFFFFF)
            return acc

        whole = pa.table({"v": pa.array(vals, pa.string())})
        chunks = [
            pa.table({"v": pa.array(vals[i::pieces], pa.string())})
            for i in range(pieces)
        ]
        assert words_of([whole]) == words_of(chunks)


class TestRawCodecs:
    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_ppm_bmp_round_trip(self, h, w, seed):
        import numpy as np

        from studiocr_ray.datapipe.multimodal import (
            PixmapDecoder,
            encode_bmp,
            encode_ppm,
        )

        rng = np.random.RandomState(seed % (2**31))
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        want = img.astype(np.float32) / 255.0
        dec = PixmapDecoder()
        assert (dec.decode(encode_ppm(img), "image") == want).all()
        assert (dec.decode(encode_bmp(img), "image") == want).all()

    @given(
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_round_trip(self, n, ch, seed):
        import numpy as np

        from studiocr_ray.datapipe.multimodal import (
            WaveDecoder,
            encode_wav,
        )

        rng = np.random.RandomState(seed % (2**31))
        shape = (n,) if ch == 1 else (n, ch)
        pcm = rng.randint(-32768, 32768, size=shape).astype(np.int16)
        got = WaveDecoder().decode(encode_wav(pcm), "audio")
        assert got.shape == shape
        assert (got == pcm.astype(np.float32) / 32768.0).all()


class TestLevenshteinProperties:
    @given(st.text(max_size=12), st.text(max_size=12))
    @settings(max_examples=80, deadline=None)
    def test_metric_axioms(self, a, b):
        from studiocr_ray.functions.textfns import levenshtein

        d = levenshtein(a, b)
        assert d == levenshtein(b, a)
        assert (d == 0) == (a == b)
        assert d <= max(len(a), len(b))
        assert d >= abs(len(a) - len(b))

    @given(st.text(max_size=8), st.text(max_size=8), st.text(max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_triangle_inequality(self, a, b, c):
        from studiocr_ray.functions.textfns import levenshtein

        assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)
