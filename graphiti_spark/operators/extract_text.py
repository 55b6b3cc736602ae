"""S1 — deterministic trafilatura-style boilerplate stripping (html -> text).

Contract (BASELINE.json input_hint): extracted text must be a **pure function
of the html bytes** — byte-identical per url across runs, partitionings, and
executor counts. So: self-contained stripper (no external extractor whose
version could drift), no locale/time dependence, stable entity decoding.

The reference ingests pre-extracted text (EpisodicNode.content,
/root/reference/graphiti_core/nodes.py:224-234); this stage is the web-corpus
front door the north rule adds.

Execution shape: Arrow-batched pandas UDF over the binary ``html`` column.
At 100 TB this is the dominant map stage — it is embarrassingly parallel,
shuffle-free, and scales linearly with input splits; keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so each task holds one Arrow
batch stream rather than a whole file.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.session import session_pandas_udf
from pyspark.sql.types import StringType

# Elements whose entire subtree is boilerplate / non-content.
_DROP_SUBTREE = r"script|style|noscript|head|nav|footer|header|aside|form|iframe|svg|template|button"
_DROP_RE = re.compile(
    rf"<(?P<tag>{_DROP_SUBTREE})\b[^>]*>.*?</(?P=tag)\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# Block-level tags become paragraph breaks so sentences don't glue together.
_BLOCK_RE = re.compile(
    r"</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|blockquote|pre|dd|dt|figure)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_SPACE_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n{2,}")


def extract_text_py(html_bytes: bytes | None) -> str:
    """Pure deterministic html -> text. utf-8 with replacement (stable)."""
    if html_bytes is None:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", raw)
    # Drop boilerplate subtrees repeatedly (handles nesting like nav>ul).
    prev = None
    while prev != s:
        prev = s
        s = _DROP_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = html_mod.unescape(s)
    # Whitespace canonicalization: collapse runs, trim line edges, squeeze
    # blank lines. Fully byte-deterministic.
    lines = [_SPACE_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    out = "\n".join(ln for ln in lines if ln)
    return _NL_RE.sub("\n", out).strip()


@session_pandas_udf(StringType())
def extract_text_udf(html_bytes: pd.Series) -> pd.Series:
    return pd.Series([extract_text_py(b) for b in html_bytes])


def extract_text_stage(pages: DataFrame) -> DataFrame:
    """S1: fill ``text`` from ``html`` where null (reference bypass: fixtures
    with non-null text skip extraction, FIXTURES.md §1)."""
    return pages.withColumn(
        "text",
        F.when(F.col("text").isNotNull(), F.col("text")).otherwise(extract_text_udf(F.col("html"))),
    )


def page_title_col(html: Column | str) -> Column:
    """<title> contents (JVM regexp — used for episode names)."""
    c = F.col(html) if isinstance(html, str) else html
    raw = F.decode(c, "UTF-8")
    t = F.regexp_extract(raw, r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# --- page-level meta directives (crawl-policy tier) -------------------------
#
# The first gate a crawl pipeline applies is the page's OWN policy: a
# `<meta name="robots" content="noindex">` page must not enter the corpus
# (the Common-Crawl convention), and `<html lang=...>` is the strongest
# language prior available before any model-based langID. Both are cheap
# JVM regexps over the raw bytes — map-only, zero shuffle, pushdown-safe —
# and every pattern sits in the Java-regex / RE2 common subset so the
# DuckDB oracle executes the identical extraction.
#
# Supported meta shape (documented subset of real HTML): name before
# content OR content before name, single/double/no quotes, any case.

_META_NAME_FIRST = (
    r"""(?is)<meta\s+name=["']?robots["']?\s+content=["']([^"'>]*)["']"""
)
_META_CONTENT_FIRST = (
    r"""(?is)<meta\s+content=["']([^"'>]*)["']\s+name=["']?robots["']?"""
)
_HTML_LANG = r"""(?is)<html[^>]*\slang=["']?([a-zA-Z-]+)"""


def robots_directives_col(html: Column | str) -> Column:
    """The robots meta content, lowercased ('' when the page has none):
    name-first wins, content-first is the fallback."""
    c = F.col(html) if isinstance(html, str) else html
    raw = F.decode(c, "UTF-8")
    name_first = F.regexp_extract(raw, _META_NAME_FIRST, 1)
    content_first = F.regexp_extract(raw, _META_CONTENT_FIRST, 1)
    return F.lower(F.when(name_first != "", name_first).otherwise(content_first))


def html_lang_col(html: Column | str) -> Column:
    """The <html lang=...> attribute, lowercased ('' when absent)."""
    c = F.col(html) if isinstance(html, str) else html
    return F.lower(F.regexp_extract(F.decode(c, "UTF-8"), _HTML_LANG, 1))


def page_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Append page-policy columns: ``title``, ``html_lang``, ``robots``,
    ``noindex``, ``nofollow``. Map-only (no exchange at any scale)."""
    robots = robots_directives_col(F.col(html_col))
    return (
        pages.withColumn("title", page_title_col(F.col(html_col)))
        .withColumn("html_lang", html_lang_col(F.col(html_col)))
        .withColumn("robots", robots)
        .withColumn("noindex", F.col("robots").contains("noindex"))
        .withColumn("nofollow", F.col("robots").contains("nofollow"))
    )


def filter_noindex(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages whose robots meta says noindex — the crawl-policy gate
    every public webtext pipeline applies before content filters. A pure
    map-side predicate: at 100 TB it prunes rows inside the scan stage."""
    return pages.filter(~robots_directives_col(F.col(html_col)).contains("noindex"))
