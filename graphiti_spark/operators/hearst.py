"""Hearst-pattern hypernym extraction: mine `X such as A, B and C` /
`A and other X` lexico-syntactic templates into (hyponym, IS_A, hypernym)
rows — taxonomy-induction triples with page provenance.

The reference's LLM extractor produces class-membership facts as ordinary
edges when a page states them (extract_edges,
graphiti_core/utils/maintenance/edge_operations.py — the sentence IS the
fact); a deterministic engine recovers the high-precision core of that
behavior from the four canonical Hearst (1992, COLING) templates — the
same patterns behind WebIsA/KB-construction harvests:

  1. ``<hypernym> such as <list>``        ("companies such as Acme, Bex")
  2. ``such <hypernym> as <list>``        ("such languages as French")
  3. ``<list> and/or other <hypernym>``   ("Acme and other companies")
  4. ``<hypernym>, including/especially <list>``

Hyponyms are capitalized 1-4 token names (the NER contract's surface
shape); hypernyms are lowercase plural nouns, singularized by the shared
two-step rule (``ies$ -> y`` then ``s$ -> ''`` — "companies" -> "company",
"classes" -> "classe" is a documented precision trade). All patterns are
RE2-safe (no lookaround/backreferences) so the DuckDB oracle executes the
byte-identical regexes; the list splits by first normalizing
``,? (and|or) `` to ``, `` and then splitting on the literal ``, `` —
identical semantics in both engines, no reliance on engine-specific
regex-split behavior.

Scale shape: map-only — four codegen'd regexp_extract_all passes fused
into the scan, one explode per pattern plus one list-explode
(output-proportional, page-bounded), zero shuffles. At 10^12 pages this
runs embarrassingly parallel inside the text-extraction wave; emitted
(hyponym, hypernym) pairs feed the same normalization/ER tier as any
other mention, and IS_A edges enter the edge table like any extracted
triple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Capitalized 1-4 token name (the quotes.py/_NAME shape — particles
# excluded on purpose: precision over recall, misses documented).
_NAME = r"[A-Z][a-z]+(?: [A-Z][a-z]+){0,3}"
# Enumeration of names: "A", "A, B", "A, B and C", "A or B". Inner groups
# are all non-capturing so patterns can capture LIST as one span.
_LIST = rf"{_NAME}(?:, {_NAME})*(?:,? (?:and|or) {_NAME})?"
# Lowercase plural common noun ("companies", "languages"). >=3 letters
# before the final s keeps "as"/"is" and similar function words out; the
# \b anchors stop mid-word matches ("Engines" must not yield "ngines",
# and "system stuff" must not backtrack to a bogus "sys"). RE2, Java and
# DuckDB all implement ASCII \b identically here — the DuckDB-identity
# test pins it.
_HYPER = r"\b[a-z]{3,}s\b"

# kind -> (pattern, hypernym group, list group)
_PATTERNS: dict[str, tuple[str, int, int]] = {
    "such_as": (rf"({_HYPER}) such as ({_LIST})", 1, 2),
    "such_n_as": (rf"such ({_HYPER}) as ({_LIST})", 1, 2),
    "other": (rf"({_LIST}),? (?:and|or) other ({_HYPER})", 2, 1),
    "including": (rf"({_HYPER}), (?:including|especially) ({_LIST})", 1, 2),
}

# "A, B and C" -> "A, B, C": one normalize pass, then a literal split.
_CONJ = r",? (?:and|or) "


def singularize_col(c):
    """The shared two-step plural -> singular rule as a column expr."""
    return F.regexp_replace(F.regexp_replace(c, F.lit("ies$"), F.lit("y")), F.lit("s$"), F.lit(""))


def singularize_sql(expr: str) -> str:
    """The identical rule as a DuckDB expression (oracle helper)."""
    return f"regexp_replace(regexp_replace({expr}, 'ies$', 'y'), 's$', '')"


def extract_hypernyms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, hyponym, hypernym, pattern) — one row per harvested IS_A
    assertion. The hypernym is singularized; the hyponym keeps its
    surface form (it joins the NER mention surface space downstream).
    A span can legitimately match two templates ("X such as A and other
    Y" contrivances); each match is an independent assertion.
    """
    parts = []
    for kind, (pat, g_hyper, g_list) in _PATTERNS.items():
        spans = docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).alias("span"),
        )
        parts.append(
            spans.select(
                "id",
                F.explode(
                    F.split(
                        F.regexp_replace(
                            F.regexp_extract("span", pat, g_list),
                            F.lit(_CONJ),
                            F.lit(", "),
                        ),
                        ", ",
                        -1,
                    )
                ).alias("hyponym"),
                singularize_col(F.regexp_extract("span", pat, g_hyper)).alias(
                    "hypernym"
                ),
                F.lit(kind).alias("pattern"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("hyponym") != "")


def hypernym_edges(pairs: DataFrame) -> DataFrame:
    """Aggregate harvested assertions into IS_A candidate edges:
    (hyponym, hypernym, n_pages, n_assertions, patterns). One hash agg
    with map-side combine; hot classes ("companies") collapse before the
    shuffle, so the skew bound is distinct (hypo, hyper) pairs — never
    page count. Downstream, `hyponym` normalizes through the same ER
    exact tier as any mention and the edge lands as relation IS_A.
    """
    return pairs.groupBy("hyponym", "hypernym").agg(
        F.countDistinct("id").alias("n_pages"),
        F.count(F.lit(1)).alias("n_assertions"),
        F.array_sort(F.collect_set("pattern")).alias("patterns"),
    )


def hearst_sql(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin running the identical RE2 patterns + the identical
    normalize-then-literal-split list explosion (oracle helper)."""
    legs = []
    for kind, (pat, g_hyper, g_list) in _PATTERNS.items():
        p = pat.replace("'", "''")
        legs.append(f"""
            SELECT id,
                   unnest(string_split(
                       regexp_replace(regexp_extract(span, '{p}', {g_list}),
                                      '{_CONJ}', ', ', 'g'),
                       ', ')) AS hyponym,
                   {singularize_sql(f"regexp_extract(span, '{p}', {g_hyper})")} AS hypernym,
                   '{kind}' AS pattern
            FROM (SELECT {id_expr} AS id,
                         unnest(regexp_extract_all({text_expr}, '{p}', 0)) AS span
                  FROM {table})""")
    return (
        "SELECT * FROM (" + " UNION ALL ".join(legs) + ") WHERE hyponym <> ''"
    )
