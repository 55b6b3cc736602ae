"""Quotation attribution: mine `"<quote>" said <Speaker>` /
`<Speaker> said: "<quote>"` patterns into (speaker, verb, quote) rows —
reported-speech triples with page provenance.

The reference's LLM extractor emits such statements as ordinary
entity-relation facts when a page contains them (extract_edges,
graphiti_core/utils/maintenance/edge_operations.py — the fact text IS the
sentence); a deterministic engine gets the high-precision core of that
behavior from the two canonical news-attribution templates, the same
rule shapes used by quote-mining corpora (e.g. Cornell's QUOTUS and the
PolNeAR/DirectQuote attribution literature): a quoted span adjacent to a
speech verb with a capitalized speaker name.

Both patterns are RE2-safe (no lookaround/backreferences) so the DuckDB
oracle can execute the byte-identical regexes, and the speaker surface
form feeds the same ER/normalization tier as any other mention.

Scale shape: map-only — two codegen'd regexp_extract_all passes fused
into the scan, one explode per pattern (output-proportional, page-
bounded), zero shuffles. At 10^12 pages this runs embarrassingly
parallel inside the text-extraction wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Capitalized 1-4 token name: "Jane", "Jane van Dorn" (particles lowercase
# excluded on purpose — precision over recall, misses are documented).
_NAME = r"[A-Z][a-z]+(?: [A-Z][a-z]+){0,3}"
_VERBS = r"(?:said|says|told|wrote|added|warned)"

# A capitalized sentence-starter directly before the name matches _NAME's
# leading token (RE2 has no lookbehind to exclude it), so "Then Bob Cole
# wrote ..." captures "Then Bob Cole". Strip the common starters as a
# post-pass — one anchored replace removes any run of them.
_LEADING_STOP = (
    r"^(?:(?:Then|The|But|However|And|So|Meanwhile|Later|Today|Yesterday|"
    r"Finally|Still|Next|Afterward|A|An) )+"
)


def _patterns(min_len: int, max_len: int) -> dict[str, str]:
    q = f'"([^"]{{{min_len},{max_len}}})"'
    return {
        # "We will grow," said Jane Doe.   /   "... growth" says Carl Dorn
        "quote_first": f"{q},? ({_VERBS}) ({_NAME})",
        # Jane Doe said: "We will grow."   /   Carl Dorn wrote "..."
        "speaker_first": f"({_NAME}) ({_VERBS})[,:]? {q}",
    }


def extract_quotes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 8,
    max_len: int = 400,
) -> DataFrame:
    """(id, speaker, verb, quote, pattern) — one row per attributed
    quotation. Straight double quotes only (curly quotes normalize
    upstream in extract_text). A span consumed by ``quote_first`` is not
    re-matched by ``speaker_first`` because the latter requires the name
    BEFORE the quote and regexp_extract_all spans cannot overlap within
    one pattern; across patterns a `X said "q" said Y` contrivance can
    emit both readings — both are true attributions of the span."""
    pats = _patterns(min_len, max_len)
    parts = []
    for kind, pat in pats.items():
        spans = docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).alias("span"),
        )
        if kind == "quote_first":
            g_quote, g_verb, g_speaker = 1, 2, 3
        else:
            g_speaker, g_verb, g_quote = 1, 2, 3
        parts.append(
            spans.select(
                "id",
                F.regexp_replace(
                    F.regexp_extract("span", pat, g_speaker), _LEADING_STOP, ""
                ).alias("speaker"),
                F.regexp_extract("span", pat, g_verb).alias("verb"),
                F.regexp_extract("span", pat, g_quote).alias("quote"),
                F.lit(kind).alias("pattern"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("speaker") != "")


def quotes_sql(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    min_len: int = 8,
    max_len: int = 400,
) -> str:
    """DuckDB twin running the identical RE2 patterns (oracle helper)."""
    pats = _patterns(min_len, max_len)
    legs = []
    for kind, pat in pats.items():
        if kind == "quote_first":
            g_quote, g_verb, g_speaker = 1, 2, 3
        else:
            g_speaker, g_verb, g_quote = 1, 2, 3
        p = pat.replace("'", "''")
        legs.append(f"""
            SELECT {id_expr} AS id,
                   regexp_replace(regexp_extract(span, '{p}', {g_speaker}),
                                  '{_LEADING_STOP}', '') AS speaker,
                   regexp_extract(span, '{p}', {g_verb}) AS verb,
                   regexp_extract(span, '{p}', {g_quote}) AS quote,
                   '{kind}' AS pattern
            FROM (SELECT {id_expr}, unnest(regexp_extract_all({text_expr}, '{p}', 0)) AS span
                  FROM {table})""")
    return (
        "SELECT * FROM (" + " UNION ALL ".join(legs) + ") WHERE speaker <> ''"
    )
