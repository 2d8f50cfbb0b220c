

class TestWindowedRead:
    def test_parquet_pushdown_matches_post_filter(self, ray_session, tmp_path):
        from datetime import timedelta

        import ray.data as rd

        from studiocr_ray.fixtures import EPOCH, write_pages_from_documents
        from studiocr_ray.sources.pages import read_pages

        pages = str(tmp_path / "pages_in")
        write_pages_from_documents("/root/testdata/sf0.001", pages)
        lo = EPOCH + timedelta(seconds=50)
        hi = EPOCH + timedelta(seconds=200)
        got = (read_pages(pages, ts_min=lo, ts_max=hi, langs=["en"])
               .to_pandas().sort_values("url").reset_index(drop=True))
        base = read_pages(pages).to_pandas()
        want = (base[(base.warc_ts >= lo) & (base.warc_ts < hi)
                     & (base.lang == "en")]
                .sort_values("url").reset_index(drop=True))
        assert got.equals(want)
        assert len(got) > 0
        # half-open window: the hi bound itself is excluded
        assert (got.warc_ts < hi).all()

    def test_jsonl_window_applies_post_parse(self, ray_session, tmp_path):
        from datetime import timedelta

        from studiocr_ray.fixtures import EPOCH, pages_from_documents
        from studiocr_ray.sources.pages import read_pages

        t = pages_from_documents("/root/testdata/sf0.001").select(
            ["url", "warc_ts", "html", "text", "lang"])
        # JSONL cannot carry binary html: re-encode as text rows
        import json

        path = tmp_path / "pages.jsonl"
        with open(path, "w") as f:
            for r in t.slice(0, 300).to_pylist():
                r["html"] = r["html"].decode("utf-8")
                r["warc_ts"] = r["warc_ts"].strftime("%Y-%m-%d %H:%M:%S")
                f.write(json.dumps(r) + "\n")
        lo = EPOCH + timedelta(seconds=10)
        hi = EPOCH + timedelta(seconds=60)
        got = read_pages(str(path), ts_min=lo, ts_max=hi).to_pandas()
        assert len(got) == 50
        assert (got.warc_ts >= lo).all() and (got.warc_ts < hi).all()
