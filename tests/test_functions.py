"""Unit tests for the pure extraction functions (no Ray)."""

import pytest

from studiocr_ray.functions.html_extract import (
    extract_content,
    layout_tokens,
)
from studiocr_ray.functions.page_stats import build_page_stats, keep_token
from studiocr_ray.functions.raster import (
    SyntheticRasterEngine,
    decode_payload,
    encode_payload,
    validate_config,
)
from studiocr_ray.functions.textfns import (
    conf_bucket,
    levenshtein,
    zero_one_loss,
)


class TestRasterCodec:
    def test_roundtrip(self):
        toks = [(0, 0, 10, 18, 95, "hello"), (12, 0, 8, 18, 42, " "), (22, 0, 1, 18, 7, "")]
        cols = decode_payload(encode_payload(toks))
        assert cols["text"] == ["hello", " ", ""]
        assert cols["conf"] == [95, 42, 7]
        assert cols["left"] == [0, 12, 22]

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_payload(b"NOTMAGIC")

    def test_config_validation(self):
        # mirrors /root/reference/StudiOCR/OcrEngine.py:36-44
        validate_config(0, 3)
        validate_config(3, 13)
        for oem, psm in [(-1, 3), (4, 3), (3, 2), (3, 14)]:
            with pytest.raises(ValueError):
                validate_config(oem, psm)

    def test_fast_model_lowers_conf(self):
        payload = encode_payload([(0, 0, 10, 18, 50, "word")])
        eng = SyntheticRasterEngine()
        best = eng.process(payload, best=True)
        fast = eng.process(payload, best=False)
        assert fast["conf"][0] < best["conf"][0]
        pre = eng.process(payload, preprocessing=True)
        assert pre["conf"][0] > best["conf"][0]


class TestHtmlExtract:
    HTML = (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>p{}</style></head><body>"
        b"<nav><ul><li><a href='/a'>home page link</a></li>"
        b"<li><a href='/b'>about us page link</a></li></ul></nav>"
        b"<article><p>This is the main article content with enough length to count.</p>"
        b"<p>Second paragraph of real content, also long enough to matter here.</p></article>"
        b"<footer><a href='/c'>contact link footer text</a></footer></body></html>"
    )

    def test_keeps_content_drops_chrome(self):
        c = extract_content(self.HTML)
        assert "main article content" in c.main_text
        assert "Second paragraph" in c.main_text
        assert "home page link" not in c.main_text
        assert "contact link footer" not in c.main_text
        assert "var x=1" not in c.main_text
        assert 0.0 < c.boilerplate_ratio < 1.0

    def test_collects_raster_payloads_in_order(self):
        import base64

        p1 = encode_payload([(0, 0, 5, 5, 90, "one")])
        p2 = encode_payload([(0, 0, 5, 5, 90, "two")])
        html = (
            "<body><p>Some long enough main content paragraph goes here ok.</p>"
            f'<img src="data:image/x-rstr;base64,{base64.b64encode(p1).decode()}">'
            f'<img src="data:image/x-rstr;base64,{base64.b64encode(p2).decode()}">'
            '<img src="http://x/normal.jpg"></body>'
        )
        c = extract_content(html)
        assert [decode_payload(p)["text"] for p in c.raster_payloads] == [["one"], ["two"]]

    def test_layout_deterministic(self):
        a = layout_tokens("alpha beta gamma " * 30)
        b = layout_tokens("alpha beta gamma " * 30)
        assert a == b
        assert max(l + w for l, w in zip(a["left"], a["width"])) <= 960


class TestPageStats:
    def test_isspace_quirk(self):
        # '' passes the filter, ' ' does not — OcrEngine.py:131 behavior
        assert keep_token("")
        assert keep_token("a")
        assert not keep_token(" ")
        assert not keep_token("\t\n")

    def test_filtered_unfiltered_asymmetry(self):
        tokens = {
            "left": [0, 1, 2, 3],
            "top": [0, 0, 0, 0],
            "width": [1, 1, 1, 1],
            "height": [1, 1, 1, 1],
            "conf": [90, 80, 70, 60],
            "text": ["ab", " ", "ab", ""],
        }
        s = build_page_stats(tokens)
        # word stats over filtered tokens: 'ab' x2 and '' x1
        assert s["texts"] == ["", "ab"]
        assert s["text_counts"] == [1, 2]
        # char stats over the UNFILTERED join "ab ab" (G3 asymmetry)
        assert dict(zip(s["chars"], s["char_counts"])) == {" ": 1, "a": 2, "b": 2}
        # conf sets per filtered text, sorted
        assert dict(s["conf_by_text"]) == {"": [60], "ab": [70, 90]}
        # 95-bin histogram over ASCII 32..126
        assert len(s["char_hist"]) == 95
        assert s["char_hist"][0] == 1  # space
        assert s["char_hist"][ord("a") - 32] == 2

    def test_char_hist_ignores_non_ascii(self):
        tokens = {k: [0] for k in ("left", "top", "width", "height", "conf")}
        tokens["text"] = ["é\x1f"]
        s = build_page_stats(tokens)
        assert sum(s["char_hist"]) == 0


class TestTextFns:
    def test_levenshtein(self):
        # semantics of Image_Preprocessing_Optimization/CustomFunctions.py:19-38
        assert levenshtein("", "") == 0
        assert levenshtein("abc", "") == 3
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("flaw", "lawn") == 2

    def test_zero_one_loss_exact_short(self):
        # ≤3-char predictions must match exactly (CustomFunctions.py:66-69)
        assert zero_one_loss(["cat"], ["cot"], tol=2) == 0.0
        assert zero_one_loss(["cat"], ["cat"], tol=0) == 1.0

    def test_zero_one_loss_tolerance(self):
        assert zero_one_loss(["maize"], ["maze"], tol=1) == 1.0
        assert zero_one_loss(["maize"], ["mace"], tol=1) == 0.0
        # proportional float tolerance: int(0.5 * len('mouse')) = 2
        assert zero_one_loss(["house"], ["mouse"], tol=0.5) == 1.0
        assert zero_one_loss([], ["x"], tol=0) == 1.0

    def test_conf_bucket(self):
        # /root/reference/StudiOCR/DocWindow.py:221-227
        assert conf_bucket(80) == 2 and conf_bucket(100) == 2
        assert conf_bucket(79) == 1 and conf_bucket(40) == 1
        assert conf_bucket(39) == 0 and conf_bucket(0) == 0


class TestStepPipeline:
    """T7 — ImagePipeline-equivalent user-extension surface
    (/root/reference/StudiOCR/ImagePipeline.py:20-145)."""

    def test_ordering_and_prefix_run(self):
        from studiocr_ray.functions.steps import StepPipeline

        p = StepPipeline()
        p.add_step("a", lambda v: v + "a")
        p.add_step("b", lambda v: v + "b")
        p.add_step("c", lambda v: v + "c")
        assert p.run("") == "abc"
        assert p.run("", until="b") == "ab"  # prefix execution (:102-115)
        assert p.step_names == ["a", "b", "c"]

    def test_capture_index_and_kwargs(self):
        from studiocr_ray.functions.steps import StepPipeline

        p = StepPipeline()
        p.add_step("thresh", lambda v, t: (t, v * 2), capture_index=1, t=9)
        assert p.run(21) == 42  # tuple return, index select (:92-100)

    def test_method_by_name_dispatch(self):
        from studiocr_ray.functions.steps import StepPipeline

        p = StepPipeline()
        p.add_step("up", "upper")  # the PIL outer_function trick (:88-96)
        p.add_step("strip", "strip")
        assert p.run("  hi  ") == "HI"

    def test_copy_steps_slice(self):
        from studiocr_ray.functions.steps import StepPipeline

        src = StepPipeline()
        for ch in "abcd":
            src.add_step(ch, (lambda c: lambda v: v + c)(ch))
        dst = StepPipeline().copy_steps(src, start="b", end="c")
        assert dst.step_names == ["b", "c"]  # inclusive slice (:50-76)
        assert dst.run("") == "bc"

    def test_config_hash_changes_with_steps(self):
        from studiocr_ray.functions.steps import StepPipeline, to_grayscale

        a = StepPipeline().add_step("g", to_grayscale)
        b = StepPipeline().add_step("g", to_grayscale).add_step("i", "upper")
        assert a.config_hash() != b.config_hash()
        assert a.config_hash() == StepPipeline().add_step("g", to_grayscale).config_hash()

    def test_image_steps(self):
        import numpy as np

        from studiocr_ray.functions.steps import (
            bgr_to_rgb,
            binary_threshold,
            default_preprocessing_pipeline,
            to_grayscale,
        )

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[..., 0] = 10  # B
        img[..., 2] = 200  # R
        rgb = bgr_to_rgb(img)
        assert rgb[0, 0, 0] == 200 and rgb[0, 0, 2] == 10
        gray = to_grayscale(rgb)
        assert gray.shape == (4, 4)
        # luma of (200, 0, 10) ≈ 0.299*200 + 0.114*10
        assert abs(int(gray[0, 0]) - int(0.299 * 200 + 0.114 * 10)) <= 1
        retval, bw = binary_threshold(gray, thresh=20)
        assert retval == 20.0 and set(np.unique(bw)) <= {0, 255}
        # flat-field: uniform image stays (approximately) uniform
        flat = default_preprocessing_pipeline(ksize=3).run(
            np.full((8, 8, 3), 120, dtype=np.uint8)
        )
        assert flat.shape == (8, 8)
        assert int(flat.min()) >= 118 and int(flat.max()) <= 122


class TestFastParserParity:
    def test_fast_parser_matches_stdlib_on_fixture_corpus(self):
        """The regex scanner and the stdlib HTMLParser builder must produce
        identical extraction output — the scanner is the hot path, the stdlib
        DOM is the reference."""
        from studiocr_ray.fixtures import generate_pages
        from studiocr_ray.functions import html_extract as he

        t = generate_pages(80, seed=23)
        orig = he.parse_html
        try:
            fast = [he.extract_content(h) for h in t.column("html").to_pylist()]
            he.parse_html = he.parse_html_stdlib
            std = [he.extract_content(h) for h in t.column("html").to_pylist()]
        finally:
            he.parse_html = orig
        for a, b in zip(fast, std):
            assert a.main_text == b.main_text
            assert a.raster_payloads == b.raster_payloads
            assert a.total_chars == b.total_chars
