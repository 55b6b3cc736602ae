"""Entity-name normalization.

Reproduces the reference's ``normalize_entity_name``
(/root/reference/graphiti_core/utils/maintenance/node_operations.py:49-79):
    lowercase -> separators ([-.\\s]+) to '_' -> strip non-alphanumeric/_
    -> collapse runs of '_' -> strip leading/trailing '_'

Implemented twice, semantically identical:
 - as a pure Spark Column expression chain (JVM-side, whole-stage codegen —
   no Python in the hot path), and
 - as a plain Python function (used inside uuid5 pandas UDFs and in tests).

Predicate normalization follows the reference's SCREAMING_SNAKE_CASE contract
(/root/reference/graphiti_core/prompts/extract_edges.py:111).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP_RE = re.compile(r"[-.\s]+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9_]")
_COLLAPSE_RE = re.compile(r"_+")


def normalize_entity_name_py(name: str) -> str:
    s = name.lower()
    s = _SEP_RE.sub("_", s)
    s = _NON_ALNUM_RE.sub("", s)
    s = _COLLAPSE_RE.sub("_", s)
    return s.strip("_")


def normalize_entity_name_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[-.\s]+", "_")
    c = F.regexp_replace(c, r"[^a-z0-9_]", "")
    c = F.regexp_replace(c, r"_+", "_")
    return F.regexp_replace(c, r"^_+|_+$", "")


# SQL twin for DuckDB oracles — identical regex chain, ANSI syntax.
def normalize_entity_name_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"lower({expr}), '[-.\\s]+', '_', 'g'), '[^a-z0-9_]', '', 'g'),"
        " '_+', '_', 'g'), '^_+|_+$', '', 'g')"
    )


def predicate_name_py(phrase: str) -> str:
    """Verb phrase -> SCREAMING_SNAKE_CASE predicate (extract_edges.py:111)."""
    s = phrase.strip().upper()
    s = re.sub(r"[^A-Z0-9]+", "_", s)
    return s.strip("_")


def predicate_name_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.upper(F.trim(c))
    c = F.regexp_replace(c, r"[^A-Z0-9]+", "_")
    return F.regexp_replace(c, r"^_+|_+$", "")
