"""Regex PII detection and masking over the corpus.

The CCNet/Dolma-style preprocessing step a training-data pipeline runs
before publication: find emails / IPv4s / phone numbers / US-SSN-shaped
ids / credit-card-shaped numbers and replace each with a typed mask token.

Everything is `regexp_count` / `regexp_replace` over built-in functions —
JVM-side, whole-stage codegen, zero shuffle, so at 100 TB this fuses into
whatever scan already reads the text column. The patterns stay inside the
common Java-regex / RE2 subset (no backrefs, no lookaround) so the DuckDB
oracle twin executes the IDENTICAL expressions.

Semantics:
  - `pii_stats`: per-pattern match counts on the RAW text, computed
    independently (a token matched by two patterns counts in both);
  - `mask_pii`: sequential replacement in _MASK_ORDER — email first (its
    local part may contain digits), then the most-specific numeric shapes
    (ssn, credit card, ipv4) before the loosest (phone), so a phone regex
    never eats half an IP. Mask tokens contain no digits/@, so a later
    pattern can never re-match an earlier mask.

Reference parity: none (the reference ingests pre-trusted text); this is
part of the large-scale-pipeline surface the graft adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common subset only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}|\(\d{3}\) ?\d{3}-\d{4}",
}

_MASK_ORDER = ("email", "ssn", "credit_card", "ipv4", "phone")


def mask_token(kind: str) -> str:
    return f"<{kind.upper()}>"


def pii_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document match counts for every PII pattern + their sum."""
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]
    out = docs.select(F.col(id_col), *counts)
    total = None
    for kind in PII_PATTERNS:
        col = F.col(f"n_{kind}")
        total = col if total is None else total + col
    return out.withColumn("n_pii", total)


def mask_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, masked_text): every PII match replaced by its typed token, in
    _MASK_ORDER (see module docstring for why the order is load-bearing)."""
    masked = F.col(text_col)
    for kind in _MASK_ORDER:
        masked = F.regexp_replace(masked, PII_PATTERNS[kind], mask_token(kind))
    return docs.select(F.col(id_col), masked.alias("masked_text"))
