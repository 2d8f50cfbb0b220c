"""pages_in source: column-pruned read + input validation + quarantine.

The reference gatekeeps its inputs in the GUI — only ``.jpg/.jpeg/.png/.pdf``
files are accepted and duplicates are skipped (``insert_files``,
/root/reference/StudiOCR/EditDocWindow.py:463-486, SURVEY.md S3).  The
engine-side analogue over a pages table is a vectorized validity predicate in
the first ``map_batches`` after the read, with malformed rows routed to a
quarantine sink instead of silently dropped — at 10^12 rows "some rows are
garbage" is a certainty, and a quarantine table keeps the job auditable
without failing it (same philosophy as ExtractAssemble's poison-row columns,
SURVEY.md §4 stragglers row).

Validity rules (vectorized, pyarrow.compute):
* ``url`` non-null, non-empty, parses with a scheme (``http://``/``https://``);
* ``html`` non-null;
* ``warc_ts`` non-null (it is the dedup tiebreak-of-record).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

INPUT_COLUMNS = ["url", "warc_ts", "html", "lang"]

_SCHEME_RE = r"^https?://."


def valid_mask(batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    url = batch.column("url")
    ok = pc.and_(pc.is_valid(url), pc.match_substring_regex(
        url.cast(pa.string()), _SCHEME_RE))
    ok = pc.fill_null(ok, False)
    ok = pc.and_(ok, pc.is_valid(batch.column("html")))
    ok = pc.and_(ok, pc.is_valid(batch.column("warc_ts")))
    return ok


def split_valid(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(valid_rows, quarantined_rows_with_reason)."""
    mask = valid_mask(batch)
    good = batch.filter(mask)
    bad = batch.filter(pc.invert(mask))
    if bad.num_rows:
        url = bad.column("url")
        reason = pc.if_else(
            pc.invert(pc.fill_null(pc.and_(
                pc.is_valid(url),
                pc.match_substring_regex(url.cast(pa.string()), _SCHEME_RE)), False)),
            pa.scalar("bad_url"),
            pc.if_else(pc.is_null(bad.column("html")), pa.scalar("null_html"),
                       pa.scalar("null_warc_ts")),
        )
        bad = bad.append_column("reason", reason)
    else:
        bad = bad.append_column("reason", pa.array([], pa.string()))
    return good, bad


def window_predicate(ts_min=None, ts_max=None, langs=None):
    """pyarrow dataset Expression for a crawl-window read: ``ts_min <=
    warc_ts < ts_max`` and ``lang IN langs`` (each part optional; None
    when nothing is constrained).  Passed to the parquet scanner this
    prunes at ROW-GROUP granularity from the footer statistics — a
    re-crawl job over one week of a 10^12-page corpus reads ~week/history
    of the bytes instead of all of them."""
    import pyarrow.dataset as pads

    expr = None

    def _and(e, part):
        return part if e is None else e & part

    if ts_min is not None:
        expr = _and(expr, pads.field("warc_ts") >= ts_min)
    if ts_max is not None:
        expr = _and(expr, pads.field("warc_ts") < ts_max)
    if langs is not None:
        expr = _and(expr, pads.field("lang").isin(list(langs)))
    return expr


def read_pages(
    input_path: str,
    quarantine_dir: str | None = None,
    override_num_blocks: int | None = None,
    file_format: str | None = None,
    ts_min=None,
    ts_max=None,
    langs=None,
):
    """Validated pages dataset. Malformed rows are written to
    ``quarantine_dir`` (one parquet per offending batch, keyed by
    task/batch uuid — append-only, never read back by the pipeline) and
    dropped from the returned stream.

    ``file_format``: "parquet" (default; columns prune AT the read — the
    scale path), "jsonl" or "csv" (row formats: whole rows parse, then
    ``conform_pages`` casts to the canonical schema and prunes).  Detected
    from file extensions when not given.

    ``ts_min``/``ts_max``/``langs``: optional crawl-window predicate.  On
    parquet it pushes into the scanner (row groups outside the window
    never leave storage — see :func:`window_predicate`); on JSONL/CSV the
    same predicate applies right after ``conform_pages`` (row formats
    cannot skip bytes).  Note rows with a NULL predicate column are out
    of scope for a windowed read and are excluded by the scanner BEFORE
    validation — they do not reach the quarantine sink (run an unwindowed
    read when auditing malformed rows)."""
    kw = {}
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    pred = window_predicate(ts_min=ts_min, ts_max=ts_max, langs=langs)
    fmt = file_format or detect_format(input_path)
    if fmt == "parquet":
        if pred is not None:
            kw["filter"] = pred
        ds = rd.read_parquet(input_path, columns=INPUT_COLUMNS, **kw)
    elif fmt in ("jsonl", "csv"):
        reader = rd.read_json if fmt == "jsonl" else rd.read_csv
        ds = reader(input_path, **kw).map_batches(
            conform_pages, batch_format="pyarrow"
        )
        if pred is not None:

            def window(batch: pa.Table) -> pa.Table:
                mask = None
                if ts_min is not None:
                    m = pc.greater_equal(batch.column("warc_ts"),
                                         pa.scalar(ts_min,
                                                   pa.timestamp("us")))
                    mask = m if mask is None else pc.and_(mask, m)
                if ts_max is not None:
                    m = pc.less(batch.column("warc_ts"),
                                pa.scalar(ts_max, pa.timestamp("us")))
                    mask = m if mask is None else pc.and_(mask, m)
                if langs is not None:
                    m = pc.is_in(batch.column("lang"),
                                 value_set=pa.array(list(langs)))
                    mask = m if mask is None else pc.and_(mask, m)
                return batch.filter(pc.fill_null(mask, False))

            ds = ds.map_batches(window, batch_format="pyarrow")
    else:
        raise ValueError(f"unknown pages format: {fmt!r}")

    if quarantine_dir is None:
        return ds.map_batches(
            lambda b: b.filter(valid_mask(b)),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    os.makedirs(quarantine_dir, exist_ok=True)

    def validate(batch: pa.Table) -> pa.Table:
        good, bad = split_valid(batch)
        if bad.num_rows:
            import uuid

            import pyarrow.parquet as pq

            name = f"quarantine-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(quarantine_dir, f".{name}.tmp")
            pq.write_table(bad, tmp)
            os.replace(tmp, os.path.join(quarantine_dir, name))
        return good

    return ds.map_batches(validate, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Multi-format input (JSONL / CSV crawls) + JSONL corpus export
# ---------------------------------------------------------------------------

_FORMAT_EXTS = {
    ".parquet": "parquet",
    ".jsonl": "jsonl",
    ".json": "jsonl",
    ".csv": "csv",
}


def detect_format(input_path: str) -> str:
    """File format of a pages_in directory/file by extension (majority
    wins; parquet when ambiguous).  Parquet is the scale path — columnar
    pruning at the read; JSONL/CSV parse whole rows and prune after."""
    paths = []
    if os.path.isdir(input_path):
        for root, _, files in os.walk(input_path):
            paths += [f for f in files if not f.startswith((".", "_"))]
    else:
        paths = [input_path]
    counts: dict[str, int] = {}
    for p in paths:
        ext = os.path.splitext(p)[1].lower()
        fmt = _FORMAT_EXTS.get(ext)
        if fmt:
            counts[fmt] = counts.get(fmt, 0) + 1
    if not counts:
        return "parquet"
    return max(counts, key=lambda k: (counts[k], k == "parquet"))


def conform_pages(batch: pa.Table) -> pa.Table:
    """Row-format batch (JSONL/CSV parse output) → the canonical pages
    schema: url string, warc_ts timestamp[us] (ISO strings accepted: 'T'
    or space separator, optional fractional seconds — truncated — and an
    optional UTC designator 'Z'/'+00:00'), html binary (utf-8 strings
    accepted), lang string.  Missing lang becomes null (the extractor
    treats it as unknown).

    Unparseable timestamps — including non-UTC zone offsets, which cannot
    be conformed without silently shifting the instant — become NULL here
    rather than failing the batch, so read_pages' per-row validate stage
    quarantines exactly the offending rows (reason ``null_warc_ts``)."""
    n = batch.num_rows
    cols = {}
    cols["url"] = pc.cast(batch.column("url"), pa.string())
    ts = batch.column("warc_ts")
    if pa.types.is_timestamp(ts.type):
        cols["warc_ts"] = pc.cast(ts, pa.timestamp("us"))
    else:
        # only the ISO date-time separator becomes a space — a blanket
        # T-replace would mangle zone designators ('UTC' → 'U C')
        s = pc.replace_substring_regex(
            pc.cast(ts, pa.string()),
            r"^(\d{4}-\d{2}-\d{2})T",
            r"\1 ",
        )
        parsed = pc.strptime(s, format="%Y-%m-%d %H:%M:%S", unit="us",
                             error_is_null=True)
        if parsed.null_count > pc.count(s, mode="only_null").as_py():
            # slow path only when the fast format missed: split off
            # fractional seconds and a UTC designator, retry the base,
            # then add the fraction back at us precision (warc_ts is the
            # dedup tiebreak-of-record — sub-second bits decide ties);
            # anything else (e.g. a non-UTC offset) stays null
            s2 = pc.replace_substring_regex(
                s, r"(\.\d+)?\s*(Z|z|\+00:?00|UTC)?$", ""
            )
            retry = pc.strptime(s2, format="%Y-%m-%d %H:%M:%S", unit="us",
                                error_is_null=True)
            frac = pc.struct_field(
                pc.extract_regex(s, r"\.(?P<f>\d{1,6})"), "f"
            )
            us = pc.cast(
                pc.fill_null(pc.ascii_rpad(frac, width=6, padding="0"), "0"),
                pa.int64(),
            )
            retry = pc.add(retry, pc.cast(us, pa.duration("us")))
            parsed = pc.coalesce(parsed, retry)
        cols["warc_ts"] = parsed
    # utf-8 string html casts to its bytes; binary passes through
    cols["html"] = pc.cast(batch.column("html"), pa.binary())
    if "lang" in batch.column_names:
        cols["lang"] = pc.cast(batch.column("lang"), pa.string())
    else:
        cols["lang"] = pa.nulls(n, pa.string())
    return pa.table(cols)


def quarantine_stats(quarantine_dir: str):
    """Roll up the quarantine sink → (reason, rows) — the operational
    read-back half of read_pages' per-row quarantine: a crawl operator
    triages WHY rows were rejected without touching the healthy pipeline
    output.  Streams the quarantine parquet only; per-batch bincount
    partials keep the exchange at one row per reason per batch."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(quarantine_dir, columns=["reason"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"reason": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64())}
            )
        col = batch.column("reason")
        d = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        rows = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table(
            {"reason": d.dictionary,
             "rows": pa.array(rows.astype(np.int64))}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "reason"
    ).aggregate(Sum("rows", alias_name="rows"))
