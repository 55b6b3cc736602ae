"""Webtext URL/domain analysis: URL feature extraction, per-domain corpus
accounting, and domain blocklist filtering.

The source-level view a webtext pipeline needs before mixing: which hosts
dominate the token budget, which registered domains to drop (the public
C4/RefinedWeb pipelines gate on curated domain blocklists), and URL shape
features (path depth is a cheap quality prior — deep auto-generated paths
correlate with boilerplate).

All column expressions are regex/string built-ins (JVM codegen, zero
Python) chosen inside the Java-regex / RE2 common subset so the DuckDB
oracle twins execute identical expressions. Domain aggregation is one
groupBy on a ~bounded key space (registered domains ≪ docs — map-side
combine collapses it before the exchange); the blocklist filter broadcasts
the blocklist (a small dim by construction).

Reference parity: none (the reference has no corpus-curation tier); part of
the large-scale-pipeline surface the graft adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?"


def host_col(url) -> F.Column:
    return F.regexp_extract(url, _HOST_RE, 1)


def domain_col(url) -> F.Column:
    """Registered domain = last two host labels (a public-suffix list would
    slot in here; two labels is the deterministic stand-in)."""
    labels = F.split(host_col(url), r"\.")
    return F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host_col(url))


def url_features(
    docs: DataFrame, url_col: str = "url", keep_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Per-URL features: host, registered domain (last two labels), tld,
    path, path_depth (non-empty segments)."""
    u = F.col(url_col)
    host = host_col(u)
    labels = F.split(host, r"\.")
    domain = domain_col(u)
    path = F.regexp_extract(u, _PATH_RE, 1)
    return docs.select(
        *keep_cols,
        u.alias("url"),
        host.alias("host"),
        domain.alias("domain"),
        F.element_at(labels, -1).alias("tld"),
        path.alias("path"),
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")).alias("path_depth"),
    )


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per registered domain: doc count, char and token totals, corpus
    share — the accounting behind mixing weights and blocklist review."""
    from graphiti_spark.functions.textstats import token_count_col

    feats = url_features(
        docs.withColumn("_n_chars", F.length(text_col)).withColumn(
            "_n_tokens", token_count_col(F.col(text_col))
        ),
        url_col=url_col,
        keep_cols=("_n_chars", "_n_tokens"),
    )
    agg = feats.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n_chars").alias("total_chars"),
        F.sum("_n_tokens").alias("total_tokens"),
    )
    total = agg.agg(F.sum("total_tokens").alias("_corpus_tokens"))
    return agg.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        "total_chars",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("_corpus_tokens"), 6).alias("token_share"),
    )


# Tracking / click-id query params stripped by canonicalization — the
# public-pipeline convention (C4/CCNet dedup on normalized URLs): analytics
# params never change page content, so they only fragment URL-level dedup.
_TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src)="


def canonical_url_col(url, strip_www: bool = True) -> F.Column:
    """RFC-3986-style URL normalization as one JVM column expression:
    lowercase scheme+host, drop default ports (80/http, 443/https) but keep
    explicit non-default ports, strip a leading ``www.``, collapse an empty
    path to ``/`` and strip trailing slashes elsewhere, drop the fragment,
    drop tracking params (``utm_*``/click ids) and sort the survivors.

    Every piece is regexp/array built-ins inside the Java-regex / DuckDB
    common subset, so the SQL oracle executes the identical normalization.
    Zero Python, zero shuffle — at 100 TB this is a free map stage fused
    into whatever scan precedes it."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


def canonicalize_urls(
    docs: DataFrame, url_col: str = "url", strip_www: bool = True
) -> DataFrame:
    """Append a ``canonical_url`` column (see canonical_url_col)."""
    return docs.withColumn("canonical_url", canonical_url_col(F.col(url_col), strip_www))


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = True,
) -> DataFrame:
    """URL-level exact dedup after canonicalization: one row per canonical
    URL with the winning (minimum) document id and the duplicate count.

    The CommonCrawl-style first pass before any content dedup — tracking
    params, fragments, and www/port/slash variants account for a large
    share of crawl duplicates and are free to collapse. One hash
    aggregation on the canonical key (map-side combine absorbs the hot
    hosts' repeats before the exchange); no second shuffle, no window."""
    return (
        canonicalize_urls(docs, url_col=url_col, strip_www=strip_www)
        .groupBy("canonical_url")
        .agg(
            F.min(F.col(id_col)).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def filter_blocked_domains(
    docs: DataFrame, blocked: DataFrame | list[str], url_col: str = "url"
) -> DataFrame:
    """Drop documents whose registered domain is on the blocklist.

    ``blocked``: a one-column DataFrame of domains, or a plain list (built
    into a broadcast dim). The filter is a broadcast LEFT ANTI join — at
    100 TB the corpus never shuffles; only the kilobyte-scale blocklist
    moves."""
    spark = docs.sparkSession
    if isinstance(blocked, list):
        blocked = spark.createDataFrame([(d,) for d in blocked], "domain string")
    else:
        blocked = blocked.select(F.col(blocked.columns[0]).alias("domain"))
    blocked = blocked.select(F.col("domain").alias("_blk_domain"))
    return (
        docs.withColumn("_blk_domain", domain_col(F.col(url_col)))
        .join(F.broadcast(blocked), "_blk_domain", "left_anti")
        .drop("_blk_domain")
    )


def domain_quality_stats(
    docs: DataFrame,
    scores: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Per registered domain: doc count and mean per-document quality score.

    The domain-level curation signal the public pipelines act on
    (RefinedWeb's host-level filtering, C4's curated domain lists are the
    manual form): a *host* whose pages are consistently low-quality is a
    better drop unit than any single page, because boilerplate farms and
    SEO spam are host-shaped, not page-shaped.

    ``scores`` is any (id, score) frame — gopher rule fractions, NB
    class-probabilities (nb_classifier.py), LM perplexity buckets mapped to
    numbers — the aggregation is signal-agnostic.

    Plan shape at 100 TB: the id join co-shuffles docs and scores once on
    the doc id (or is free if scores was derived from docs in the same
    lineage); the groupBy key space is registered domains (≪ docs), so
    map-side combine collapses each partition to ~|domains| rows before
    one small exchange. No window, no skew exposure (hot domains combine
    map-side).
    """
    dom = docs.select(F.col(id_col), domain_col(F.col(url_col)).alias("domain"))
    joined = dom.join(scores.select(id_col, score_col), id_col)
    return joined.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(score_col), 6).alias("mean_score"),
    )


def domain_quality_gate(
    docs: DataFrame,
    scores: DataFrame,
    min_mean_score: float,
    min_docs: int = 5,
    url_col: str = "url",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Drop every document of a domain whose mean quality score is below
    ``min_mean_score`` — but only when the domain has at least ``min_docs``
    documents (below that, the evidence is too thin to condemn a host, so
    its pages pass through to the per-document gates).

    The bad-domain list is tiny by construction (bounded by |domains|), so
    the gate is a broadcast LEFT ANTI join: at 100 TB the corpus never
    shuffles — only the kilobyte/megabyte-scale domain verdicts move.
    """
    stats = domain_quality_stats(
        docs, scores, url_col=url_col, id_col=id_col, score_col=score_col
    )
    bad = stats.filter(
        (F.col("n_docs") >= min_docs) & (F.col("mean_score") < min_mean_score)
    ).select(F.col("domain").alias("_bad_domain"))
    return (
        docs.withColumn("_bad_domain", domain_col(F.col(url_col)))
        .join(F.broadcast(bad), "_bad_domain", "left_anti")
        .drop("_bad_domain")
    )
