"""Arrow schemas for every table the engine reads or writes (SURVEY.md §1.2).

Replaces the reference's peewee/SQLite models (OcrDocument/OcrPage/OcrBlock,
/root/reference/StudiOCR/db.py:22-61) and its pickled OcrPageData blob
(/root/reference/StudiOCR/OcrEngine.py:129) with typed Arrow."""

from __future__ import annotations

import pyarrow as pa

PAGES_IN = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

BLOCK_STRUCT = pa.struct(
    [
        ("block", pa.int32()),
        ("left", pa.int32()),
        ("top", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("conf", pa.int32()),
        ("text", pa.string()),
    ]
)

PAGE_STATS_STRUCT = pa.struct(
    [
        ("texts", pa.list_(pa.string())),
        ("text_counts", pa.list_(pa.int32())),
        ("chars", pa.list_(pa.string())),
        ("char_counts", pa.list_(pa.int32())),
        ("conf_by_text", pa.map_(pa.string(), pa.list_(pa.int16()))),
        ("char_hist", pa.list_(pa.int32())),  # 95 bins, ASCII 32..126
    ]
)

DROPPED_STRUCT = pa.struct([("pos", pa.int32()), ("text", pa.string())])

# Pages store blocks + the whitespace tokens the non-space filter removed
# (with their unfiltered positions); the OcrPageData-equivalent stats are
# NOT stored — they are exactly derivable (page_stats.stats_from_page) and
# were ~25% of the bytes moving through the url-hash exchange.
PAGE_STRUCT = pa.struct(
    [
        ("page", pa.int32()),
        ("blocks", pa.list_(BLOCK_STRUCT)),
        ("dropped", pa.list_(DROPPED_STRUCT)),
    ]
)

# The canonical nested extraction output: one row per url.
#
# ``pages`` stores ONLY raster (OCR) pages.  Layout pages — the HTML main
# text flowed through the deterministic monospace layout — are fully
# derivable from ``extracted_text`` (page texts are its "\n" segments;
# bbox/conf/block follow from functions.document.layout_tokens), so storing
# them would ship ~80% redundant bytes through the url-hash exchange and the
# parquet write for the ~90% of web docs with no embedded raster content.
# ``layout_pages`` lists the implicit page numbers (``[0]`` for a fresh doc;
# appends add the later crawls' layout positions).  Readers call
# ``functions.document.materialize_pages`` (exactness proved by the golden
# blocks/page-stats tests against the sequential oracle).
EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("part", pa.int32()),
        ("n_pages", pa.int32()),
        ("n_blocks", pa.int64()),
        ("mean_conf", pa.float64()),
        ("boilerplate_ratio", pa.float64()),
        ("n_chars", pa.int64()),
        ("extracted_text", pa.string()),
        ("layout_pages", pa.list_(pa.int32())),
        ("pages", pa.list_(PAGE_STRUCT)),
        ("error", pa.string()),
    ]
)

# Flat projections derived from EXTRACTED.
DOCS = pa.schema(
    [
        ("url", pa.string()),
        ("n_pages", pa.int32()),
        ("extracted_text", pa.string()),
        ("n_blocks", pa.int64()),
        ("mean_conf", pa.float64()),
        ("boilerplate_ratio", pa.float64()),
    ]
)

BLOCKS = pa.schema(
    [
        ("url", pa.string()),
        ("page", pa.int32()),
        ("block", pa.int32()),
        ("left", pa.int32()),
        ("top", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("conf", pa.int32()),
        ("text", pa.string()),
    ]
)

# A posting references its url by INDEX into the row's ``urls`` list (a
# per-row dictionary): a 4-byte int instead of a repeated ~30-byte url
# string.  At web scale tf/df ≈ 10–1000 for hot terms, so this is the
# difference between shipping the url once per document and once per token
# occurrence through the index's all-to-all exchange and onto disk.
POSTING_STRUCT = pa.struct(
    [
        ("url_idx", pa.int32()),
        ("page", pa.int32()),
        ("block", pa.int32()),
        ("conf", pa.int32()),
    ]
)

INDEX = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),          # number of distinct urls
        ("tf", pa.int64()),          # total postings
        ("urls", pa.list_(pa.string())),  # sorted distinct urls (the row dict)
        ("postings", pa.list_(POSTING_STRUCT)),  # sorted (url, page, block)
    ]
)
