"""Golden byte-identity + resume + invariance tests for the extraction
pipeline (SURVEY.md §5: the t2 gate)."""

import pandas as pd
import pytest

from studiocr_ray.oracle import oracle_blocks_table, oracle_docs_table
from studiocr_ray.pipelines.extract_pipeline import (
    blocks_dataset,
    corpus_metrics,
    docs_dataset,
    invalidate_parts,
    page_stats_dataset,
    run_extract,
)
from studiocr_ray.state.manifest import load_manifests


def _sorted_pdf(ds_or_table, by):
    df = ds_or_table.to_pandas() if hasattr(ds_or_table, "to_pandas") else ds_or_table
    return df.sort_values(by).reset_index(drop=True)


@pytest.fixture(scope="module")
def extracted(ray_session, pages_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("extract_out"))
    summary = run_extract(pages_dir, out, num_partitions=8)
    return out, summary


class TestGoldenIdentity:
    def test_docs_byte_identical(self, extracted, pages_table):
        out, _ = extracted
        got = _sorted_pdf(docs_dataset(out), ["url"])
        want = _sorted_pdf(oracle_docs_table(pages_table), ["url"])
        got = got[want.columns.tolist()]
        pd.testing.assert_frame_equal(got, want)
        # byte-identity of the extracted text, explicitly
        assert got["extracted_text"].tolist() == want["extracted_text"].tolist()

    def test_blocks_identical(self, extracted, pages_table):
        out, _ = extracted
        got = _sorted_pdf(blocks_dataset(out), ["url", "page", "block"])
        want = _sorted_pdf(
            oracle_blocks_table(pages_table), ["url", "page", "block"]
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    def test_dedup_keeps_first(self, extracted, pages_table):
        out, _ = extracted
        n_unique = len(set(pages_table.column("url").to_pylist()))
        assert docs_dataset(out).count() == n_unique
        assert pages_table.num_rows > n_unique  # fixture really has dups

    def test_page_stats_match_oracle(self, extracted, pages_table):
        out, _ = extracted
        from studiocr_ray.oracle import oracle_extract

        got = {
            (r["url"], r["page"]): r["stats"]
            for r in page_stats_dataset(out).take_all()
        }
        for doc in oracle_extract(pages_table):
            for p in doc["pages"]:
                g = got[(doc["url"], p["page"])]
                w = p["stats"]
                assert g["texts"] == w["texts"]
                assert g["text_counts"] == w["text_counts"]
                assert g["chars"] == w["chars"]
                assert g["char_counts"] == w["char_counts"]
                assert [(k, list(v)) for k, v in g["conf_by_text"]] == [
                    (k, list(v)) for k, v in w["conf_by_text"]
                ]
                assert list(g["char_hist"]) == w["char_hist"]

    def test_metrics_consistent(self, extracted):
        out, summary = extracted
        m = corpus_metrics(out)
        assert m["docs"] == summary["docs"]
        assert m["blocks"] == summary["blocks"]
        assert m["errors"] == 0
        assert 0.0 < m["mean_boilerplate_ratio"] < 1.0
        assert m["chars_per_doc"] > 0


class TestAppend:
    def test_append_second_crawl(self, ray_session, pages_dir, pages_table, tmp_path):
        """Reference OcrEngine.py:108-110,128: a second crawl of an existing
        url appends its pages with numbering offset by the current count;
        only the affected partitions are rewritten."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from studiocr_ray.functions.document import ExtractConfig
        from studiocr_ray.pipelines.extract_pipeline import (
            append_extract,
            export_document,
            run_extract,
        )
        from studiocr_ray.stages.extract import url_part
        from studiocr_ray.state.manifest import part_dir

        out = str(tmp_path / "out")
        run_extract(pages_dir, out, num_partitions=8)
        before = {r["url"]: r for r in docs_dataset(out).take_all()}

        urls = sorted(before)[:2]
        rows, seen = [], set()
        for r in pages_table.to_pylist():
            if r["url"] in urls and r["url"] not in seen:
                seen.add(r["url"])
                rows.append(r)
        new_url = "https://appended.example/new"
        rows.append({**rows[0], "url": new_url})
        crawl2 = str(tmp_path / "crawl2")
        os.makedirs(crawl2)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=pages_table.schema),
            os.path.join(crawl2, "p.parquet"),
        )

        touched = {url_part(u, 8) for u in urls} | {url_part(new_url, 8)}
        mtimes = {
            p: os.path.getmtime(part_dir(out, p))
            for p in range(8)
            if os.path.isdir(part_dir(out, p))
        }

        s = append_extract(crawl2, out)
        assert s["docs_appended_to"] == 2
        assert s["docs_new"] == 1
        assert s["parts_touched"] == len(touched)
        for p, mt in mtimes.items():
            if p not in touched:
                assert os.path.getmtime(part_dir(out, p)) == mt, p

        after = {r["url"]: r for r in docs_dataset(out).take_all()}
        assert len(after) == len(before) + 1
        for u in urls:
            o, a = before[u], after[u]
            assert a["n_pages"] == 2 * o["n_pages"]
            assert a["n_blocks"] == 2 * o["n_blocks"]
            assert (
                a["extracted_text"]
                == o["extracted_text"] + "\n" + o["extracted_text"]
            )
        # page numbering continues across the append (the reference offset)
        doc = export_document(out, urls[0])
        assert [p["page"] for p in doc["pages"]] == list(
            range(after[urls[0]]["n_pages"])
        )
        assert new_url in after

        m = corpus_metrics(out)
        assert m["docs"] == len(before) + 1
        assert m["blocks"] == sum(r["n_blocks"] for r in after.values())

        # the index explode must handle multi-layout-page docs (layout pages
        # at positions 0 AND n after the append): tf of a token present in
        # both crawls of url[0] doubles, and indexed search still finds it
        from studiocr_ray.pipelines.index_pipeline import index_dataset, run_index
        from studiocr_ray.search import search_corpus, search_corpus_indexed

        info = run_index(out, index_dir=str(tmp_path / "idx2"))
        idx = index_dataset(info["index_dir"]).to_pandas()
        total_tf = int(idx["tf"].sum())
        assert total_tf == sum(r["n_blocks"] for r in after.values())
        tok = before[urls[0]]["extracted_text"].split()[0].lower()
        a = sorted(
            r["url"] for r in search_corpus_indexed(
                info["index_dir"], tok
            ).take_all()
        )
        b = sorted(
            r["url"] for r in search_corpus(
                index_dataset(info["index_dir"]), tok
            ).take_all()
        )
        assert a == b and urls[0] in a

        # a different extraction config must be refused
        with pytest.raises(ValueError):
            append_extract(crawl2, out, cfg=ExtractConfig(psm=6))

    def test_append_replaces_errored_doc(self, ray_session, tmp_path):
        """A re-crawl of a doc whose first crawl ERRORED replaces it
        outright (no phantom empty text segment); a re-crawl that errors
        leaves the good doc untouched."""
        import base64
        import os
        from datetime import datetime, timedelta

        import pyarrow as pa
        import pyarrow.parquet as pq

        from studiocr_ray.pipelines.extract_pipeline import (
            append_extract,
            corpus_metrics,
            docs_dataset,
            export_document,
            run_extract,
        )
        from studiocr_ray.pipelines.index_pipeline import run_index
        from studiocr_ray.search import search_corpus_indexed

        bad_payload = base64.b64encode(b"corrupt").decode()
        bad_html = (
            "<html><body><article><img "
            f'src="data:image/x-rstr;base64,{bad_payload}">'
            "</article></body></html>"
        ).encode()
        good_html = (
            "<html><body><article><p>replacement crawl recovered body"
            "</p></article></body></html>"
        ).encode()
        epoch = datetime(2024, 1, 1)

        def crawl(dirname, rows):
            d = str(tmp_path / dirname)
            os.makedirs(d)
            pq.write_table(
                pa.table(
                    {
                        "url": pa.array([r[0] for r in rows], pa.string()),
                        "warc_ts": pa.array(
                            [epoch + timedelta(seconds=i)
                             for i in range(len(rows))],
                            pa.timestamp("us"),
                        ),
                        "html": pa.array([r[1] for r in rows], pa.binary()),
                        "text": pa.array([""] * len(rows), pa.string()),
                        "lang": pa.array(["en"] * len(rows), pa.string()),
                    }
                ),
                os.path.join(d, "p.parquet"),
            )
            return d

        u_bad, u_good = "https://e.example/bad", "https://e.example/good"
        out = str(tmp_path / "out")
        run_extract(
            crawl("c1", [(u_bad, bad_html), (u_good, good_html)]),
            out, num_partitions=4,
        )
        m0 = corpus_metrics(out)
        assert m0["errors"] == 1

        # re-crawl: the errored doc succeeds, the good doc now errors
        append_extract(
            crawl("c2", [(u_bad, good_html), (u_good, bad_html)]), out
        )
        docs = {r["url"]: r for r in docs_dataset(out).take_all()}
        want_text = "replacement crawl recovered body"
        assert docs[u_bad]["extracted_text"] == want_text
        assert docs[u_bad]["n_pages"] == 1  # replaced, not appended-to-empty
        assert docs[u_good]["extracted_text"] == want_text  # untouched
        assert corpus_metrics(out)["errors"] == 0  # bad doc recovered
        # reconstruction + index see the replacement text
        doc = export_document(out, u_bad)
        assert doc["pages"][0]["text"] == want_text
        info = run_index(out, index_dir=str(tmp_path / "idx"))
        got = sorted(
            r["url"] for r in search_corpus_indexed(
                info["index_dir"], "recovered"
            ).take_all()
        )
        assert got == [u_bad, u_good]

        # a resumed re-run of the ORIGINAL extraction must treat every
        # appended-to partition as complete (manifests carry the resume
        # identity) — the appended docs survive
        c1 = str(tmp_path / "c1")
        s2 = run_extract(c1, out, num_partitions=4)
        assert s2["parts_computed"] == 0
        docs2 = {r["url"]: r for r in docs_dataset(out).take_all()}
        assert docs2[u_bad]["extracted_text"] == want_text
        assert docs2[u_good]["extracted_text"] == want_text


class TestConfigSweep:
    def test_sweep_ranks_configs(self, ray_session, tmp_path):
        """ImageGridSearch analogue: sweep (psm × preprocessing) + presets
        over a labeled raster corpus; preprocessing configs must rank first
        by conf (the synthetic engine's PREPROCESS_CONF_BONUS), all configs
        must recover the ground-truth tokens (hit_rate 1.0 at tol=0.2)."""
        import os

        import pyarrow.parquet as pq

        from studiocr_ray.fixtures import tolerance_corpus
        from studiocr_ray.pipelines.sweep import config_sweep, default_grid

        pages, truth = tolerance_corpus()
        d = str(tmp_path / "tol_pages")
        os.makedirs(d)
        pq.write_table(pages, os.path.join(d, "p.parquet"))

        res = config_sweep(d, truth, tol=0.2).to_pandas()
        grid = default_grid()
        assert set(res["config"]) == set(grid)
        assert (res["expected"] == sum(len(v) for v in truth.values())).all()
        # the synthetic raster engine recovers every token verbatim
        assert (res["hit_rate"] == 1.0).all()
        # preprocessing=True configs outrank preprocessing=False by conf
        pre = {n for n, c in grid.items() if c.preprocessing}
        n_pre = len(pre)
        assert set(res["config"].head(n_pre)) == pre
        # deterministic: a second run returns the identical table
        res2 = config_sweep(d, truth, tol=0.2).to_pandas()
        pd.testing.assert_frame_equal(res, res2)


class TestResume:
    def test_partition_granular_resume(self, ray_session, pages_dir, tmp_path):
        out = str(tmp_path / "out")
        s1 = run_extract(pages_dir, out, num_partitions=8)
        assert s1["parts_computed"] == 8
        before = _sorted_pdf(docs_dataset(out), ["url"])

        invalidate_parts(out, [0, 1, 2, 3])
        s2 = run_extract(pages_dir, out, num_partitions=8)
        assert s2["parts_skipped"] == 4
        assert s2["parts_computed"] == 4

        after = _sorted_pdf(docs_dataset(out), ["url"])
        pd.testing.assert_frame_equal(before, after)

        s3 = run_extract(pages_dir, out, num_partitions=8)
        assert s3["parts_computed"] == 0 and s3["parts_skipped"] == 8
        assert len(load_manifests(out)) == 8

    def test_config_change_invalidates(self, ray_session, pages_dir, tmp_path):
        from studiocr_ray.functions.document import ExtractConfig

        out = str(tmp_path / "out")
        run_extract(pages_dir, out, num_partitions=4)
        s = run_extract(
            pages_dir, out, cfg=ExtractConfig(best=False), num_partitions=4
        )
        assert s["parts_computed"] == 4  # different config hash → recompute


class TestInvariance:
    def test_partitioning_invariant(self, ray_session, pages_dir, tmp_path, pages_table):
        """Same input at different partitioning/batching ⇒ identical output
        (guards ordering / nondeterminism bugs, SURVEY.md §5)."""
        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        run_extract(pages_dir, a, num_partitions=2, batch_size=8)
        run_extract(pages_dir, b, num_partitions=32, batch_size=128)
        da = _sorted_pdf(docs_dataset(a), ["url"])
        db = _sorted_pdf(docs_dataset(b), ["url"])
        pd.testing.assert_frame_equal(da, db)


class TestToleranceCorpus:
    def test_full_pipeline_accuracy(self, ray_session, tmp_path):
        """Port of the reference's tolerance-corpus harness
        (Image_Preprocessing_Optimization): every doc's extracted terms must
        match ground truth at zero_one_loss(tol=0.2) == 1.0."""
        import pyarrow.parquet as pq

        from studiocr_ray.fixtures import tolerance_corpus
        from studiocr_ray.functions.textfns import zero_one_loss

        t, ground = tolerance_corpus()
        ind = tmp_path / "in"
        ind.mkdir()
        pq.write_table(t, str(ind / "part-0.parquet"))
        out = str(tmp_path / "out")
        run_extract(str(ind), out, num_partitions=4)
        docs = {r["url"]: r for r in docs_dataset(out).take_all()}
        assert len(docs) == 20
        for url, words in ground.items():
            pred = docs[url]["extracted_text"].split()
            assert zero_one_loss(words, pred, tol=0.2) == 1.0, url


class TestMaintenance:
    def test_export_document(self, extracted, pages_table):
        """K2 analogue: ordered-page reassembly via partition-pruned point
        lookup (DocWindow.export_pdf, /root/reference/StudiOCR/DocWindow.py:157-185)."""
        from studiocr_ray.pipelines.extract_pipeline import export_document

        out, _ = extracted
        url = sorted(set(pages_table.column("url").to_pylist()))[0]
        doc = export_document(out, url)
        assert doc["url"] == url
        assert doc["n_pages"] == len(doc["pages"])
        assert [p["page"] for p in doc["pages"]] == list(range(doc["n_pages"]))
        # body is byte-identical to the pipeline's extracted_text assembly rule
        assert doc["body"] == "\n".join(p["text"] for p in doc["pages"])
        assert export_document(out, "https://no.such/url") == {}

    def test_delete_docs(self, ray_session, pages_dir, tmp_path, pages_table):
        """K4 analogue: row-level delete rewrites only affected partitions and
        keeps manifests/metrics consistent (db.py:26-38 cascade + G8 count)."""
        from studiocr_ray.pipelines.extract_pipeline import delete_docs

        out = str(tmp_path / "del")
        run_extract(pages_dir, out, num_partitions=8)
        urls = sorted(set(pages_table.column("url").to_pylist()))
        victims = urls[:3]
        before = docs_dataset(out).count()
        n = delete_docs(out, victims + ["https://no.such/url"])
        assert n == 3
        remaining = set(docs_dataset(out).to_pandas()["url"])
        assert remaining == set(urls) - set(victims)
        assert docs_dataset(out).count() == before - 3
        # manifests reflect the delete: corpus metrics recount from manifests
        assert corpus_metrics(out)["docs"] == before - 3
        # resume still sees every partition complete (no recompute)
        s = run_extract(pages_dir, out, num_partitions=8)
        assert s["parts_skipped"] == 8


class TestQuarantine:
    def test_malformed_rows_quarantined(self, ray_session, tmp_path, pages_table):
        """S3 analogue (/root/reference/StudiOCR/EditDocWindow.py:463-486):
        invalid rows are routed to a quarantine sink, not dropped silently,
        and never fail the job."""
        import glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        good = pages_table.slice(0, 20)
        bad = pa.table(
            {
                "url": pa.array([None, "", "ftp://x/1", "https://ok.example/1"],
                                pa.string()),
                "warc_ts": pa.array(
                    [good.column("warc_ts")[0].as_py()] * 3 + [None],
                    pa.timestamp("us"),
                ),
                "html": pa.array([b"<p>x</p>"] * 4, pa.binary()),
                "text": pa.array(["", "", "", ""], pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
            }
        )
        ind = tmp_path / "in"
        ind.mkdir()
        pq.write_table(pa.concat_tables([good, bad.cast(good.schema)]),
                       str(ind / "p.parquet"))
        out = str(tmp_path / "out")
        s = run_extract(str(ind), out, num_partitions=4)
        n_unique_good = len(set(good.column("url").to_pylist()))
        assert s["docs"] == n_unique_good  # all 4 bad rows gone from output
        qfiles = glob.glob(out + "/quarantine/*.parquet")
        assert qfiles
        q = pa.concat_tables([pq.read_table(f) for f in qfiles])
        assert q.num_rows == 4
        assert sorted(set(q.column("reason").to_pylist())) == [
            "bad_url", "null_warc_ts"
        ]
        # the triage rollup sees the same rows grouped by reason
        from studiocr_ray.sources.pages import quarantine_stats

        stats = quarantine_stats(out + "/quarantine").to_pandas()
        got = dict(zip(stats["reason"], stats["rows"]))
        assert got == {"bad_url": 3, "null_warc_ts": 1}


class TestDedupModes:
    def test_pre_and_post_exchange_identical(self, ray_session, pages_dir, tmp_path):
        """dedup="pre" (url-hash exchange of raw input before extraction) and
        the default dedup="post" (exchange of extracted rows) must produce
        identical output — same keep-first (warc_ts, sha1(html)) winner rule
        on both sides of the extract stage."""
        a = str(tmp_path / "pre")
        b = str(tmp_path / "post")
        run_extract(pages_dir, a, num_partitions=8, dedup="pre")
        run_extract(pages_dir, b, num_partitions=8, dedup="post")
        da = _sorted_pdf(docs_dataset(a), ["url"])
        db = _sorted_pdf(docs_dataset(b), ["url"])
        pd.testing.assert_frame_equal(da, db)
        assert corpus_metrics(a)["blocks"] == corpus_metrics(b)["blocks"]


class TestUpdateIndex:
    def test_incremental_equals_full_rebuild(
        self, ray_session, pages_dir, pages_table, tmp_path
    ):
        """update_index after an append must be file-identical to a full
        run_index of the post-append corpus: the appended partitions map to
        one url shard (8 | P), only that shard's files rebuild, and the
        deterministic merge makes the rebuilt files byte-comparable."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from studiocr_ray.pipelines.extract_pipeline import (
            append_extract,
            run_extract,
        )
        from studiocr_ray.pipelines.index_pipeline import (
            index_dataset,
            run_index,
            update_index,
        )

        out = str(tmp_path / "out")
        run_extract(pages_dir, out, num_partitions=8)
        run_index(out)
        idx = os.path.join(out, "index")
        files_before = {
            n: os.path.getmtime(os.path.join(idx, n))
            for n in os.listdir(idx)
            if n.endswith(".parquet")
        }

        rows, seen = [], set()
        for r in pages_table.to_pylist():
            if r["url"] not in seen and len(seen) < 2:
                seen.add(r["url"])
                rows.append(r)
        rows.append({**rows[0], "url": "https://appended.example/new"})
        crawl2 = str(tmp_path / "crawl2")
        os.makedirs(crawl2)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=pages_table.schema),
            os.path.join(crawl2, "p.parquet"),
        )
        s = append_extract(crawl2, out)
        res = update_index(out, s["parts"])
        assert res["mode"] == "incremental"
        assert res["files_rebuilt"] >= 1

        # untouched shards carried over (hard links preserve mtime)
        shards = set(res["shards"])
        for n, mt in files_before.items():
            if int(n[:-8].rsplit("-", 1)[1]) not in shards:
                assert os.path.getmtime(os.path.join(idx, n)) == mt, n

        # full rebuild on a copy of the corpus → identical index content
        idx_full = str(tmp_path / "index_full")
        run_index(out, index_dir=idx_full)

        def canon(d):
            df = index_dataset(d).to_pandas()
            df["urls"] = df["urls"].map(tuple)
            df["postings"] = df["postings"].map(
                lambda ps: tuple(sorted(
                    (p["url_idx"], p["page"], p["block"], p["conf"])
                    for p in ps
                ))
            )
            return df.sort_values(["term", "urls"]).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(idx), canon(idx_full))

        # the incrementally-updated index actually serves the new doc
        from studiocr_ray.search import search_corpus_indexed

        new_doc = [
            r for r in docs_dataset(out).take_all()
            if r["url"] == "https://appended.example/new"
        ][0]
        probe_tok = new_doc["extracted_text"].split()[0].lower()
        hits = {
            r["url"]
            for r in search_corpus_indexed(idx, probe_tok).take_all()
        }
        assert "https://appended.example/new" in hits

    def test_update_index_noop_and_full_fallback(
        self, ray_session, pages_dir, tmp_path
    ):
        import os

        from studiocr_ray.pipelines.extract_pipeline import run_extract
        from studiocr_ray.pipelines.index_pipeline import (
            run_index,
            update_index,
        )

        # P not a multiple of URL_SHARDS → documented full-rebuild fallback
        out = str(tmp_path / "out12")
        run_extract(pages_dir, out, num_partitions=12)
        run_index(out)
        res = update_index(out, [3])
        assert res["mode"] == "full_rebuild"

        out8 = str(tmp_path / "out8")
        run_extract(pages_dir, out8, num_partitions=8)
        run_index(out8)
        assert update_index(out8, [])["mode"] == "noop"
        # missing index dir → builds from scratch
        idx2 = str(tmp_path / "fresh_index")
        res = update_index(out8, [1], index_dir=idx2)
        assert res["mode"] == "full_rebuild"
        assert os.path.isdir(idx2)


class TestSourceFormats:
    def test_conform_timestamp_variants(self, ray_session):
        """ISO-8601 variants common in real crawl JSONL: fractional seconds
        keep us precision, UTC designators (Z / +00:00 / UTC) strip, and
        anything unconformable — non-UTC offsets included — becomes NULL so
        the quarantine path handles it per-row instead of the batch
        failing."""
        import datetime

        import pyarrow as pa

        from studiocr_ray.sources.pages import conform_pages

        ts = [
            "2024-01-02 03:04:05",
            "2024-01-02T03:04:05.123456Z",
            "2024-01-02T03:04:05.123456789Z",  # ns → truncated to us
            "2024-01-02T03:04:05Z",
            "2024-01-02T03:04:05+00:00",
            "2024-01-02 03:04:05 UTC",
            "2024-01-02T03:04:05 UTC",  # 'T' separator AND a designator
            "2024-01-02T03:04:05-05:00",  # non-UTC offset → null
            "garbage",
            None,
        ]
        batch = pa.table(
            {"url": [f"http://x{i}" for i in range(len(ts))],
             "warc_ts": ts,
             "html": ["<p>x</p>"] * len(ts)}
        )
        got = conform_pages(batch).column("warc_ts").to_pylist()
        base = datetime.datetime(2024, 1, 2, 3, 4, 5)
        frac = base + datetime.timedelta(microseconds=123456)
        assert got == [base, frac, frac, base, base, base, base,
                       None, None, None]

    def test_jsonl_and_csv_inputs_match_parquet(
        self, ray_session, pages_dir, pages_table, tmp_path
    ):
        """The same crawl via JSONL or CSV pages_in extracts byte-identical
        text to the parquet path (conform_pages casts the row formats to
        the canonical schema)."""
        import json
        import os

        from studiocr_ray.pipelines.extract_pipeline import run_extract

        rows = pages_table.to_pylist()[:40]

        jl_dir = str(tmp_path / "in_jsonl")
        os.makedirs(jl_dir)
        with open(os.path.join(jl_dir, "pages.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps({
                    "url": r["url"],
                    "warc_ts": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%S"),
                    "html": r["html"].decode("utf-8"),
                    "lang": r["lang"],
                }) + "\n")

        csv_dir = str(tmp_path / "in_csv")
        os.makedirs(csv_dir)
        import csv as csv_mod

        with open(os.path.join(csv_dir, "pages.csv"), "w", newline="") as f:
            wr = csv_mod.writer(f)
            wr.writerow(["url", "warc_ts", "html", "lang"])
            for r in rows:
                wr.writerow([
                    r["url"],
                    r["warc_ts"].strftime("%Y-%m-%d %H:%M:%S"),
                    r["html"].decode("utf-8"),
                    r["lang"],
                ])

        pq_dir = str(tmp_path / "in_pq")
        os.makedirs(pq_dir)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pylist(rows, schema=pages_table.schema),
            os.path.join(pq_dir, "p.parquet"),
        )

        texts = {}
        for name, d in (("pq", pq_dir), ("jsonl", jl_dir), ("csv", csv_dir)):
            out = str(tmp_path / f"out_{name}")
            run_extract(d, out, num_partitions=4)
            texts[name] = {
                r["url"]: r["extracted_text"]
                for r in docs_dataset(out).take_all()
            }
        assert texts["jsonl"] == texts["pq"]
        assert texts["csv"] == texts["pq"]

    def test_jsonl_export_roundtrip(self, ray_session, pages_dir, tmp_path):
        import ray.data as rd

        from studiocr_ray.pipelines.extract_pipeline import (
            export_corpus_jsonl,
            run_extract,
        )

        out = str(tmp_path / "out")
        run_extract(pages_dir, out, num_partitions=8)
        dest = str(tmp_path / "corpus_jsonl")
        export_corpus_jsonl(out, dest)
        back = {
            r["url"]: r["extracted_text"]
            for r in rd.read_json(dest).take_all()
        }
        want = {
            r["url"]: r["extracted_text"]
            for r in docs_dataset(out).take_all()
        }
        assert back == want


class TestUpdateIndexAfterDelete:
    def test_delete_then_update_equals_full_rebuild(
        self, ray_session, pages_dir, tmp_path
    ):
        """update_index composes with delete_docs: the shard rebuild drops
        the deleted urls' old postings and the delta re-read of the
        partition no longer contains them — no tombstones needed."""
        import os

        from studiocr_ray.pipelines.extract_pipeline import (
            delete_docs,
            run_extract,
        )
        from studiocr_ray.pipelines.index_pipeline import (
            index_dataset,
            run_index,
            update_index,
        )
        from studiocr_ray.search import search_corpus_indexed
        from studiocr_ray.stages.extract import url_part

        out = str(tmp_path / "out")
        run_extract(pages_dir, out, num_partitions=8)
        run_index(out)
        idx = os.path.join(out, "index")

        victims = sorted(
            r["url"] for r in docs_dataset(out).take_all()
        )[:3]
        victim_doc = [
            r for r in docs_dataset(out).take_all() if r["url"] == victims[0]
        ][0]
        probe_tok = victim_doc["extracted_text"].split()[0].lower()
        assert victims[0] in {
            r["url"] for r in search_corpus_indexed(idx, probe_tok).take_all()
        }

        n = delete_docs(out, victims)
        assert n == len(victims)
        parts = sorted({url_part(u, 8) for u in victims})
        res = update_index(out, parts)
        assert res["mode"] == "incremental"

        # deleted docs are gone from search; index equals a full rebuild
        assert victims[0] not in {
            r["url"] for r in search_corpus_indexed(idx, probe_tok).take_all()
        }
        idx_full = str(tmp_path / "index_full")
        run_index(out, index_dir=idx_full)

        def canon(d):
            df = index_dataset(d).to_pandas()
            df["urls"] = df["urls"].map(tuple)
            df["postings"] = df["postings"].map(
                lambda ps: tuple(sorted(
                    (p["url_idx"], p["page"], p["block"], p["conf"])
                    for p in ps
                ))
            )
            return df.sort_values(["term", "urls"]).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(idx), canon(idx_full))


class TestUpdateIndexTruncationGuard:
    def test_truncated_index_falls_back_to_full(
        self, ray_session, pages_dir, tmp_path
    ):
        """A max_postings-truncated index is lossy — stored postings can't
        re-derive exact df/tf — so update_index must refuse the incremental
        path and rebuild."""
        from studiocr_ray.pipelines.extract_pipeline import run_extract
        from studiocr_ray.pipelines.index_pipeline import (
            run_index,
            update_index,
        )

        out = str(tmp_path / "out")
        run_extract(pages_dir, out, num_partitions=8)
        run_index(out, max_postings=2)
        res = update_index(out, [1])
        assert res["mode"] == "full_rebuild"


class TestCompaction:
    def test_compact_fragmented_partitions(self, ray_session, pages_dir,
                                           tmp_path):
        """Small-file compaction: fragmented partitions collapse to one
        file each, data and manifests/metrics are preserved exactly, and
        a second compact is a no-op."""
        import os

        import pyarrow.parquet as pq
        from studiocr_ray.pipelines.extract_pipeline import (
            compact_output, corpus_metrics, docs_dataset,
        )
        from studiocr_ray.state.manifest import part_dir

        out = str(tmp_path / "cmp")
        run_extract(pages_dir, out, num_partitions=8)
        before = docs_dataset(out).to_pandas().sort_values("url") \
            .reset_index(drop=True)
        metrics_before = corpus_metrics(out)

        # fragment two partitions by splitting their file(s) in half
        fragged = 0
        for p in range(8):
            d = part_dir(out, p)
            if not os.path.isdir(d) or fragged == 2:
                continue
            t = pq.read_table(d)
            if t.num_rows < 2:
                continue
            for n in os.listdir(d):
                if n.endswith(".parquet"):
                    os.remove(os.path.join(d, n))
            h = t.num_rows // 2
            pq.write_table(t.slice(0, h), os.path.join(d, "a.parquet"))
            pq.write_table(t.slice(h), os.path.join(d, "b.parquet"))
            fragged += 1
        assert fragged == 2

        s = compact_output(out)
        assert s["parts_compacted"] == 2
        assert s["files_before"] == 4
        # one file per compacted partition; bytes accounted in manifests
        for p in range(8):
            d = part_dir(out, p)
            if os.path.isdir(d):
                files = [n for n in os.listdir(d) if n.endswith(".parquet")]
                assert len(files) == 1

        after = docs_dataset(out).to_pandas().sort_values("url") \
            .reset_index(drop=True)
        assert after.equals(before)
        assert corpus_metrics(out) == metrics_before
        # resume identity intact: no partition recomputes
        r = run_extract(pages_dir, out, num_partitions=8)
        assert r["parts_skipped"] == 8
        # idempotent
        assert compact_output(out)["parts_compacted"] == 0
