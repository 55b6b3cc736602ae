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


# --- Enhanced normalization (uuid_utils.py:52-155) -------------------------
#
# The reference's DEFAULT for entity uuid identity (nodes.py:131,
# node_operations.py:331 both call generate_deterministic_uuid, whose
# normalize_entity_name defaults to enhanced=True): NFKD accent stripping,
# possessive/contraction handling, positional title/suffix skipping,
# company-indicator removal, abbreviation expansion, and a fall-back to the
# ORIGINAL name when normalization empties the string.

COMMON_TITLES = frozenset({"mr", "mrs", "ms", "dr", "prof", "sir", "madam"})
COMMON_SUFFIXES = frozenset({"jr", "sr", "ii", "iii", "iv", "phd", "md", "esq"})
COMPANY_INDICATORS = frozenset(
    {"inc", "corp", "ltd", "llc", "co", "company", "corporation", "limited"}
)
ABBREVIATION_MAP = {
    "dr": "doctor",
    "prof": "professor",
    "mr": "mister",
    "mrs": "missus",
    "ms": "miss",
    "alex": "alexander",
    "bob": "robert",
    "bill": "william",
    "dick": "richard",
    "jim": "james",
    "joe": "joseph",
    "mike": "michael",
    "nick": "nicholas",
    "pat": "patricia",
    "sam": "samuel",
    "tom": "thomas",
    "tony": "anthony",
    "corp": "corporation",
    "inc": "incorporated",
    "ltd": "limited",
    "co": "company",
}

_POSSESSIVE_RE = re.compile(r"'s\b")
_CONTRACTION_RE = re.compile(r"n't\b")
_WORD_RE = re.compile(r"\w+")


def normalize_entity_name_enhanced_py(name: str) -> str:
    """uuid_utils.py:99-155 ``_enhanced_normalize`` + the :78-80 wrapper
    fallback (empty result -> original name), reproduced step-for-step:

    NFKD-decompose and drop combining marks -> lowercase -> strip possessive
    's / rewrite n't->not -> \\w+ tokenize -> skip leading title, trailing
    suffix, any company indicator -> expand abbreviations -> join '_' ->
    final cleanup. A name whose tokens are ALL filtered (e.g. just "Dr.")
    falls back to the original string, exactly like the reference."""
    import unicodedata

    if not name or not name.strip():
        return name
    s = unicodedata.normalize("NFKD", name)
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = s.lower()
    s = _POSSESSIVE_RE.sub("", s)
    s = _CONTRACTION_RE.sub("not", s)
    tokens = _WORD_RE.findall(s)
    if not tokens:
        return name
    processed: list[str] = []
    last = len(tokens) - 1
    for i, tok in enumerate(tokens):
        if tok in COMMON_TITLES and i == 0:
            continue
        if tok in COMMON_SUFFIXES and i == last:
            continue
        if tok in COMPANY_INDICATORS:
            continue
        processed.append(ABBREVIATION_MAP.get(tok, tok))
    if not processed:
        return name
    out = "_".join(processed)
    out = _NON_ALNUM_RE.sub("", out)
    out = _COLLAPSE_RE.sub("_", out)
    out = out.strip("_")
    return out or name


def normalize_entity_name_enhanced_sql(expr: str) -> str:
    """DuckDB twin of the enhanced normalizer for the correctness oracle.

    ``strip_accents`` stands in for NFKD-minus-combining — identical on
    ASCII/Latin-1 names (the oracle tables); full-NFKD edge cases
    (ligatures, full-width forms) and non-decomposable letters (Python's
    \\w is unicode-aware, RE2's is ASCII, so 'Wałęsa' tokenizes differently)
    are covered by pytest against the Python twin, not the SQL one."""
    titles = ", ".join(f"'{t}'" for t in sorted(COMMON_TITLES))
    suffixes = ", ".join(f"'{t}'" for t in sorted(COMMON_SUFFIXES))
    indicators = ", ".join(f"'{t}'" for t in sorted(COMPANY_INDICATORS))
    abbrev_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(ABBREVIATION_MAP.items())
    )
    # The '' -> original fallback (wrapper :78-80 plus the empty-tokens early
    # return) collapses to coalesce(nullif(normalized, ''), original).
    return f"""
        coalesce(nullif((
          WITH t0 AS (
            SELECT regexp_extract_all(
                     regexp_replace(regexp_replace(
                       lower(strip_accents({expr})), '''s\\b', '', 'g'),
                       'n''t\\b', 'not', 'g'),
                     '\\w+') AS toks
          ), t1 AS (
            SELECT CASE WHEN len(toks) > 0 AND toks[1] IN ({titles})
                        THEN toks[2:] ELSE toks END AS toks FROM t0
          ), t2 AS (
            SELECT CASE WHEN len(toks) > 0 AND toks[len(toks)] IN ({suffixes})
                        THEN toks[:len(toks)-1] ELSE toks END AS toks FROM t1
          ), t3 AS (
            SELECT list_transform(
                     list_filter(toks, x -> x NOT IN ({indicators})),
                     x -> CASE x {abbrev_case} ELSE x END) AS toks FROM t2
          )
          SELECT regexp_replace(regexp_replace(regexp_replace(
                   array_to_string(toks, '_'),
                   '[^a-z0-9_]', '', 'g'), '_+', '_', 'g'), '^_+|_+$', '', 'g')
          FROM t3
        ), ''), {expr})"""


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
