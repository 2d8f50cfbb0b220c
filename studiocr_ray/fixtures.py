"""Deterministic synthetic ``pages_in`` table generator (FIXTURES.md §1).

One row = one Common-Crawl-style crawled page, schema from BASELINE.json
``input_hint``: ``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``.  Fully seeded — no wall clock, no network, no external data —
so goldens are byte-stable.

Content features exercised:
* boilerplate chrome (nav/header/footer/aside link farms — high link density)
  wrapping main-content paragraphs (the extraction target);
* ~2%% duplicate urls (later crawl of the same url, different warc_ts) —
  exercises keep-first dedup, the analogue of the reference's name-collision
  handling (/root/reference/StudiOCR/OcrEngine.py:112-118);
* ~10%% of rows embed 1–8 RSTR1 raster payloads (stand-ins for PDF pages /
  <img>-only notes; allowed reference inputs .jpg/.jpeg/.png/.pdf,
  /root/reference/StudiOCR/EditDocWindow.py:467), including whitespace-only
  and empty-string tokens to exercise the isspace-filter quirk
  (/root/reference/StudiOCR/OcrEngine.py:131);
* a few de/fr rows for lang pass-through.
"""

from __future__ import annotations

import base64
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.raster import encode_payload

EPOCH = datetime(2024, 1, 1)

_VOCAB = (
    "the of and a to in is was he for it with as his on be at by had not are "
    "but from or have an they which one you were her all she there would their "
    "we him been has when who will more no if out so said what up its about "
    "into than them can only other new some could time these two may then do "
    "first any my now such like our over man me even most made after also did "
    "many before must through back years where much your way well down should "
    "because each just those people how too little state good very make world "
    "still own see men work long get here between both life being under never "
    "day same another know while last might us great old year off come since "
    "against go came right used take three states himself few house use during "
    "without again place american around however home small found mrs thought "
    "went say part once general high upon school every don does got united left "
    "number course war until always away something fact though water less public "
    "put think almost hand enough far took head yet government system better set "
    "told nothing night end why called didn eyes find going look asked later "
    "knew point next program city business give group toward young days let room "
    "word maize corn cornfield harvest encounter"
).split()

_DE = "der die das und ist ein eine nicht mit von auf für wird sind werden".split()
_FR = "le la les et est une un pas avec pour dans sur sont être plus que".split()


def _sentence(rng: random.Random, vocab: list[str], n: int) -> str:
    words = [rng.choice(vocab) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _link_farm(rng: random.Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/x/{rng.randrange(10**6)}">{rng.choice(_VOCAB)} '
        f"{rng.choice(_VOCAB)}</a></li>"
        for _ in range(n)
    )
    return f"<ul>{items}</ul>"


def _raster_payload(rng: random.Random, vocab: list[str]) -> bytes:
    """Encode a token grid incl. whitespace-only / empty tokens."""
    tokens = []
    x = y = 0
    for _ in range(rng.randrange(5, 40)):
        r = rng.random()
        if r < 0.05:
            text = ""  # empty string: passes the isspace filter (quirk)
        elif r < 0.10:
            text = rng.choice([" ", "  ", "\t", "\n"])  # dropped by filter
        else:
            text = rng.choice(vocab)
            if rng.random() < 0.1:
                text = text.capitalize()
        w = max(1, len(text)) * 9
        if x + w > 900:
            x, y = 0, y + 22
        tokens.append((x, y, w, 18, rng.randrange(15, 100), text))
        x += w + 9
    return encode_payload(tokens)


def make_page_html(rng: random.Random, lang: str, n_paras: int, payloads: list[bytes]) -> str:
    vocab = {"en": _VOCAB, "de": _DE, "fr": _FR}[lang]
    title = _sentence(rng, vocab, 4)
    nav = _link_farm(rng, rng.randrange(5, 15))
    paras = "".join(
        f"<p>{' '.join(_sentence(rng, vocab, rng.randrange(8, 25)) for _ in range(rng.randrange(1, 4)))}</p>"
        for _ in range(n_paras)
    )
    imgs = "".join(
        f'<img src="data:image/x-rstr;base64,{base64.b64encode(p).decode()}">'
        for p in payloads
    )
    aside = _link_farm(rng, rng.randrange(3, 10))
    footer = _link_farm(rng, rng.randrange(3, 8))
    ad = f"<div><a href='/ad'>{_sentence(rng, vocab, 6)}</a></div>"
    return (
        f"<html><head><title>{title}</title><style>p{{margin:0}}</style>"
        f"<script>var x={rng.randrange(100)};</script></head><body>"
        f"<nav>{nav}</nav><header><h1>{title}</h1></header>"
        f"{ad}<article>{paras}{imgs}</article>"
        f"<aside>{aside}</aside><footer>{footer}</footer></body></html>"
    )


def generate_pages(n_rows: int, seed: int = 42) -> pa.Table:
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    i = 0
    while len(urls) < n_rows:
        r = rng.random()
        lang = "en" if r < 0.9 else ("de" if r < 0.95 else "fr")
        url = f"https://site{i % 97}.example/p/{i}"
        n_paras = rng.randrange(2, 8)
        payloads = (
            [_raster_payload(rng, _VOCAB) for _ in range(rng.randrange(1, 9))]
            if rng.random() < 0.10
            else []
        )
        html = make_page_html(rng, lang, n_paras, payloads)
        ts = EPOCH + timedelta(seconds=i * 37)
        urls.append(url)
        tss.append(ts)
        htmls.append(html.encode("utf-8"))
        texts.append(" ".join(html.split()))  # crawler's noisy rendering
        langs.append(lang)
        if rng.random() < 0.02 and len(urls) < n_rows:
            # duplicate url: a later crawl, different content → keep-first wins
            html2 = make_page_html(rng, lang, max(1, n_paras - 1), [])
            urls.append(url)
            tss.append(ts + timedelta(days=30))
            htmls.append(html2.encode("utf-8"))
            texts.append(" ".join(html2.split()))
            langs.append(lang)
        i += 1
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(out_dir: str, n_rows: int, seed: int = 42, n_files: int = 8) -> str:
    """Write the pages_in table as n_files parquet fragments (fragment-parallel
    reads; rows round-robin so duplicate urls usually land in different files,
    making dedup a genuinely cross-partition operation)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = generate_pages(n_rows, seed)
    for f in range(n_files):
        idx = list(range(f, t.num_rows, n_files))
        pq.write_table(t.take(idx), os.path.join(out_dir, f"part-{f:04d}.parquet"))
    return out_dir


# Tolerance corpus (FIXTURES.md §2): 20 docs mirroring
# Image_Preprocessing_Optimization/{image_src,text_src}; ground truth is the
# comma-separated expected word list.
def tolerance_corpus(seed: int = 7) -> tuple[pa.Table, dict[str, list[str]]]:
    rng = random.Random(seed)
    names = [
        f"sentence_{w}"
        for w in "one two three four five six seven eight nine ten".split()
    ] + [f"b_{i}" for i in range(1, 11)]
    ground: dict[str, list[str]] = {}
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for k, name in enumerate(names):
        if name == "sentence_one":
            words = ["This", "is", "a", "test", "sentence"]
        elif name == "b_1":
            words = ["when", "he", "encountered", "maize", "in", "the", "cornfield"]
        else:
            words = [rng.choice(_VOCAB) for _ in range(rng.randrange(5, 12))]
        url = f"https://tolerance.example/{name}"
        ground[url] = words
        tokens = [
            (j * 90, 10, max(1, len(w)) * 9, 18, rng.randrange(60, 100), w)
            for j, w in enumerate(words)
        ]
        payload = encode_payload(tokens)
        html = (
            "<html><body><article>"
            f'<img src="data:image/x-rstr;base64,{base64.b64encode(payload).decode()}">'
            "</article></body></html>"
        )
        urls.append(url)
        tss.append(EPOCH + timedelta(seconds=k))
        htmls.append(html.encode())
        texts.append("")
        langs.append("en")
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return t, ground


def raster_pages_from_documents(sf_dir: str) -> tuple[pa.Table, dict[str, list[str]]]:
    """Deterministic RASTER pages + ground truth from a testdata ``documents``
    table: each doc's whitespace tokens become one RSTR1 payload with
    ``conf = 88 + len(token) % 12`` (the layout_tokens conf rule, so the SQL
    oracle can recompute every sweep statistic).  Returns (pages, truth)."""
    import base64
    import os

    import pyarrow.parquet as pq

    from .functions.raster import encode_payload

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    truth: dict[str, list[str]] = {}
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(
        docs.column("doc_id").to_pylist(),
        docs.column("text").to_pylist(),
        docs.column("lang").to_pylist(),
    ):
        words = text.split()
        url = f"https://raster.example/{doc_id}"
        truth[url] = words
        tokens = [
            (j * 90, 10, max(1, len(w)) * 9, 18, 88 + len(w) % 12, w)
            for j, w in enumerate(words)
        ]
        payload = encode_payload(tokens)
        html = (
            "<html><body><article>"
            f'<img src="data:image/x-rstr;base64,{base64.b64encode(payload).decode()}">'
            "</article></body></html>"
        )
        urls.append(url)
        tss.append(EPOCH + timedelta(seconds=doc_id))
        htmls.append(html.encode())
        texts.append("")
        langs.append(lang)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return t, truth


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Deterministic pages_in table derived from a testdata ``documents``
    table: each doc's text is embedded (html-escaped) as the single main
    <article><p> of a boilerplate-wrapped page.  Because extraction recovers
    exactly the whitespace-normalized text, the full distributed pipeline
    becomes SQL-checkable end-to-end:
    ``extracted_text == trim(regexp_replace(text,'\\s+',' ','g'))``."""
    import html as html_mod
    import os

    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(
        docs.column("doc_id").to_pylist(),
        docs.column("text").to_pylist(),
        docs.column("lang").to_pylist(),
    ):
        rng = random.Random(10_000 + doc_id)
        nav = _link_farm(rng, rng.randrange(4, 10))
        footer = _link_farm(rng, rng.randrange(3, 6))
        page = (
            f"<html><head><title>doc {doc_id}</title></head><body>"
            f"<nav>{nav}</nav>"
            f"<article><p>{html_mod.escape(text)}</p></article>"
            f"<footer>{footer}</footer></body></html>"
        )
        urls.append(f"https://docs.example/{doc_id}")
        tss.append(EPOCH + timedelta(seconds=doc_id))
        htmls.append(page.encode("utf-8"))
        texts.append(" ".join(page.split()))
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_from_documents(sf_dir: str, out_dir: str, n_files: int = 8) -> str:
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pages_from_documents(sf_dir)
    for f in range(n_files):
        idx = list(range(f, t.num_rows, n_files))
        pq.write_table(t.take(idx), os.path.join(out_dir, f"part-{f:04d}.parquet"))
    return out_dir


def bench_pages(sf_dir: str, out_dir: str, replicas: int = 3, n_files: int = 16) -> str:
    """Bench corpus: pages_from_documents × replicas (distinct urls per
    replica), ~10% of docs carry 1–3 raster payloads (exercises the OCR actor
    path), ~2% duplicate urls (exercises dedup). Deterministic; cached by the
    bench harness."""
    import html as html_mod
    import os

    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    # Accumulate per output file (round-robin), so no single Arrow binary
    # array approaches the 2 GiB int32-offset limit at large replica counts.
    buckets = [
        {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        for _ in range(n_files)
    ]
    row_no = 0

    def emit(url, ts, html_b, lang):
        nonlocal row_no
        b = buckets[row_no % n_files]
        b["url"].append(url)
        b["warc_ts"].append(ts)
        b["html"].append(html_b)
        b["text"].append("")
        b["lang"].append(lang)
        row_no += 1

    doc_ids = docs.column("doc_id").to_pylist()
    doc_texts = docs.column("text").to_pylist()
    doc_langs = docs.column("lang").to_pylist()
    for rep in range(replicas):
        for doc_id, text, lang in zip(doc_ids, doc_texts, doc_langs):
            rng = random.Random(rep * 1_000_003 + doc_id)
            nav = _link_farm(rng, rng.randrange(4, 10))
            footer = _link_farm(rng, rng.randrange(3, 6))
            payloads = (
                [_raster_payload(rng, _VOCAB) for _ in range(rng.randrange(1, 4))]
                if doc_id % 10 == 0
                else []
            )
            imgs = "".join(
                f'<img src="data:image/x-rstr;base64,{base64.b64encode(p).decode()}">'
                for p in payloads
            )
            esc = html_mod.escape(text)
            words = esc.split()
            paras = "".join(
                f"<p>{' '.join(words[k::3])}</p>" for k in range(3) if words[k::3]
            )
            page = (
                f"<html><head><title>doc {rep}/{doc_id}</title></head><body>"
                f"<nav>{nav}</nav>"
                f"<article><p>{esc}</p>{paras}{imgs}</article>"
                f"<aside>{_link_farm(rng, rng.randrange(3, 8))}</aside>"
                f"<footer>{footer}</footer></body></html>"
            )
            url = f"https://bench{rep}.example/{doc_id}"
            ts = EPOCH + timedelta(seconds=rep * 1_000_000 + doc_id)
            html_b = page.encode("utf-8")
            emit(url, ts, html_b, lang)
            if rng.random() < 0.02:
                emit(url, ts + timedelta(days=30), html_b, lang)
    os.makedirs(out_dir, exist_ok=True)
    for f in range(n_files):
        b = buckets[f]
        t = pa.table(
            {
                "url": pa.array(b["url"], pa.string()),
                "warc_ts": pa.array(b["warc_ts"], pa.timestamp("us")),
                "html": pa.array(b["html"], pa.binary()),
                "text": pa.array(b["text"], pa.string()),
                "lang": pa.array(b["lang"], pa.string()),
            }
        )
        pq.write_table(t, os.path.join(out_dir, f"part-{f:04d}.parquet"))
    return out_dir
