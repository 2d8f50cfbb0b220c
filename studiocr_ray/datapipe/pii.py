"""PII redaction for training-data curation.

Web text destined for model training has personally identifiable
information scrubbed before tokenization (Subramani et al., "Detecting
Personal Information in Training Corpora", 2023; the BigScience ROOTS
pipeline's pii-manager stage).  This module implements the standard
regex-class pass — emails, IPv4 addresses, North-American phone numbers —
as a single stateless ``map_batches`` transform: three RE2 kernels
(``pc.count_substring_regex`` + ``pc.replace_substring_regex``) per batch,
no shuffle, no per-row Python, so the stage runs at regex-engine speed and
scales embarrassingly.

Patterns are applied in a fixed order (email → ipv4 → phone) and each
class's match count is measured on the text as it stands *at that step* —
an IPv4 embedded in an email host (``bob@10.0.0.1.example``) counts as
email, not as IP, exactly matching what got replaced.  The DuckDB oracle
reproduces the same chain with ``regexp_replace(..., 'g')`` /
``regexp_extract_all`` (both RE2), so counts and redacted text are
bit-comparable.

The reference has no PII surface (it is a local OCR tool); this operator
belongs to the engine's corpus-curation family alongside
``datapipe/text.py`` quality scoring and ``datapipe/lines.py`` dedup.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied in order; patterns are ASCII
# \b word-boundary anchored where over-matching would bleed into prose.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
     "<IP>"),
    ("phone",
     r"\b\d{3}-\d{3}-\d{4}\b",
     "<PHONE>"),
)


def pii_scrub(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Redact PII classes from ``text_col`` →
    ``(id_col, text, n_email, n_ipv4, n_phone)``."""
    text = batch.column(text_col)
    counts = {}
    for name, pattern, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pattern), pa.int64()
        )
        text = pc.replace_substring_regex(text, pattern, repl)
    cols = {id_col: batch.column(id_col)} if id_col in batch.column_names \
        else {}
    return pa.table({**cols, "text": text, **counts})
