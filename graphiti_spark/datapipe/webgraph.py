"""Web link-graph extraction: href harvesting, URL- and host-level edge
tables, and host in/out-degree accounting over Common-Crawl-style pages.

The link graph is the other first-class artifact of a web corpus besides the
text (Common Crawl publishes it separately as cc-main-*-webgraph); a KG
pipeline over web pages wants it for source authority (host PageRank feeds
the quality prior in datapipe/webstats.py) and for crawl-frontier /
coverage accounting. The reference has no crawl tier — this is part of the
web-corpus surface the north rule adds on top of its graph operators; the
host graph feeds the same `analytics/centrality.py:pagerank` used for
entity centrality (reference: graphiti_core/utils/maintenance/graph_data_operations.py
centrality jobs).

Execution shape, sized for 100 TB of raw html:
 - `extract_links` is map-only (decode + one compiled regex + explode):
   embarrassingly parallel, no shuffle, codegen'd JVM regex — the dominant
   cost is the scan itself.
 - `link_graph` / `host_graph` are single groupBy aggregations. Hub pages
   (every page links to a handful of portals) make dst keys zipfian, but
   count aggregation is algebraic: map-side partial combine collapses each
   hot key to one row per task BEFORE the exchange, so skew never
   concentrates a reducer.
 - `host_link_stats` aggregates the two bounded host-level views (hosts ≪
   pages) and joins them host-to-host — both sides are post-aggregation
   small; AQE broadcasts them.
All expressions sit in the Java-regex / DuckDB common subset so the oracle
twins execute the identical logic in SQL over the pinned pages golden.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.datapipe.webstats import host_col

# href values in double quotes — the deterministic common-subset extraction
# (both engines: regexp_extract_all(s, pattern, 1)). Single-quoted and bare
# attribute syntax is out of contract for the synthetic corpus.
_HREF_PATTERN = r'href="([^"]*)"'


def resolve_href(href: Column, src_host: Column) -> Column:
    """Resolve one href against the source host: absolute http(s) URLs pass
    through; root-relative paths (`/...`) resolve to the source host; every
    other form (fragment, mailto:, protocol-relative, bare relative) is NULL
    — dropped by the caller. Pure column expression."""
    return (
        F.when(href.rlike("^https?://"), href)
        # protocol-relative (`//host/p`) is out of contract — it must be
        # checked BEFORE the root-relative branch, which it would otherwise
        # match (both start with "/").
        .when(href.startswith("//"), F.lit(None).cast("string"))
        .when(
            href.startswith("/"),
            F.concat(F.lit("https://"), src_host, href),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, src_host, dst_url, dst_host) — one row per resolvable href
    occurrence. Map-only: decode + regexp_extract_all + explode, no Python."""
    raw = F.decode(F.col(html_col), "UTF-8")
    src_host = host_col(F.col(url_col))
    exploded = pages.select(
        F.col(url_col).alias("src_url"),
        src_host.alias("src_host"),
        F.explode(F.regexp_extract_all(raw, F.lit(_HREF_PATTERN), 1)).alias("href"),
    )
    dst = resolve_href(F.col("href"), F.col("src_host"))
    return (
        exploded.select(
            "src_url",
            "src_host",
            dst.alias("dst_url"),
        )
        .filter(F.col("dst_url").isNotNull())
        .withColumn("dst_host", host_col(F.col("dst_url")))
    )


def link_graph(links: DataFrame) -> DataFrame:
    """URL-level edge list: (src_url, dst_url, n_links). One shuffle;
    algebraic count → map-side combine bounds hot-dst skew."""
    return links.groupBy("src_url", "dst_url").agg(F.count(F.lit(1)).alias("n_links"))


def host_graph(links: DataFrame) -> DataFrame:
    """Host-level edge list: (src_host, dst_host, n_links, n_src_pages).
    The input to host PageRank (`analytics.centrality.pagerank` takes any
    (src, dst) edge frame). count_distinct(src_url) is the dedup-resistant
    edge weight (a page linking the same host 50× counts once)."""
    return links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct("src_url").alias("n_src_pages"),
    )


def host_link_stats(links: DataFrame) -> DataFrame:
    """Per-host degree accounting: outbound link count + distinct dst hosts,
    inbound link count + distinct src hosts, self-link count. Full outer on
    the host key — a host appearing only as a destination (pure sink, e.g.
    a hub that is linked but not crawled) still gets a row."""
    out_agg = links.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_links"),
        F.count_distinct("dst_host").alias("out_hosts"),
        F.sum(
            F.when(F.col("src_host") == F.col("dst_host"), F.lit(1)).otherwise(F.lit(0))
        ).alias("self_links"),
    )
    in_agg = links.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_links"),
        F.count_distinct("src_host").alias("in_hosts"),
    )
    joined = out_agg.join(in_agg, "host", "full_outer")
    return joined.select(
        "host",
        F.coalesce("out_links", F.lit(0)).alias("out_links"),
        F.coalesce("out_hosts", F.lit(0)).alias("out_hosts"),
        F.coalesce("in_links", F.lit(0)).alias("in_links"),
        F.coalesce("in_hosts", F.lit(0)).alias("in_hosts"),
        F.coalesce("self_links", F.lit(0)).alias("self_links"),
    )


def host_pagerank(
    links: DataFrame, damping: float = 0.85, n_iter: int = 20
) -> DataFrame:
    """Host authority: PageRank over the distinct host→host edge set,
    reusing the entity-graph implementation (one job per iteration, dangling
    mass folded in). Self-links are dropped first (standard for web-graph
    authority — a host cannot vouch for itself)."""
    from graphiti_spark.analytics.centrality import pagerank

    edges = (
        links.filter(F.col("src_host") != F.col("dst_host"))
        .select(F.col("src_host"), F.col("dst_host"))
        .distinct()
    )
    return pagerank(
        edges,
        src_col="src_host",
        dst_col="dst_host",
        damping=damping,
        iterations=n_iter,
    )


# <a href="...">anchor</a> with a text-only body — the common-subset
# extraction both engines can run (nested markup inside an anchor is out of
# contract for the synthetic corpus, as with _HREF_PATTERN).
_ANCHOR_PATTERN = r'<a href="([^"]*)">([^<]*)</a>'


def anchor_text_stats(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Anchor-text aggregation per link target: (dst_host, anchor, n) —
    how the web DESCRIBES each destination. The classic external naming
    signal for KG entity resolution (anchor texts are human-written aliases
    of the target; search engines have indexed them since PageRank-era
    Google) and the web-scale complement to the reference's name-based ER.

    Map-only harvest: decode + one codegen'd regex for the full anchor
    element, then per-element regexp_extract for the href/body groups
    (Spark's regexp_extract_all returns ONE group, so the element is
    re-parsed in a transform — still zero Python, zero shuffle). One
    algebraic groupBy on (dst_host, anchor): map-side combine collapses the
    hot hub targets before the exchange, same skew argument as host_graph."""
    raw = F.decode(F.col(html_col), "UTF-8")
    src_host = host_col(F.col(url_col))
    elems = pages.select(
        src_host.alias("src_host"),
        F.explode(F.regexp_extract_all(raw, F.lit(_ANCHOR_PATTERN), 0)).alias("elem"),
    )
    parsed = elems.select(
        "src_host",
        F.regexp_extract(F.col("elem"), _ANCHOR_PATTERN, 1).alias("href"),
        F.regexp_extract(F.col("elem"), _ANCHOR_PATTERN, 2).alias("anchor"),
    )
    resolved = parsed.select(
        host_col(resolve_href(F.col("href"), F.col("src_host"))).alias("dst_host"),
        "anchor",
    ).filter(F.col("dst_host").isNotNull() & (F.trim(F.col("anchor")) != ""))
    return resolved.groupBy("dst_host", "anchor").agg(F.count(F.lit(1)).alias("n"))


def _shared_neighbor_pairs(
    e: DataFrame,
    key_col: str,
    val_col: str,
    df_cap: int,
    min_common: int,
) -> DataFrame:
    """Pairs of `val` entities sharing >= min_common `key` neighbors, with
    cosine normalization: (a, b, common, cosine) where
    cosine = common / sqrt(deg(a) * deg(b)) over the deduped edge set.
    Keys whose fan-out exceeds df_cap are dropped from pair generation
    only (their O(deg^2) blow-up is the skew; degrees keep counting them)."""
    deg = e.groupBy(val_col).agg(F.count(F.lit(1)).alias("deg"))
    kd = e.groupBy(key_col).agg(F.count(F.lit(1)).alias("_kd"))
    ek = e.join(
        kd.filter(F.col("_kd") <= df_cap).select(key_col), key_col
    )
    a, b = ek.alias("a"), ek.alias("b")
    pairs = (
        a.join(b, key_col)
        .filter(F.col(f"a.{val_col}") < F.col(f"b.{val_col}"))
        .groupBy(
            F.col(f"a.{val_col}").alias("a"),
            F.col(f"b.{val_col}").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_common)
    )
    da = deg.select(F.col(val_col).alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col(val_col).alias("b"), F.col("deg").alias("_db"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            (F.col("common") / F.sqrt(F.col("_da") * F.col("_db"))).alias(
                "cosine"
            ),
        )
    )


def cocitation_pairs(
    links: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    df_cap: int = 1000,
    min_common: int = 2,
) -> DataFrame:
    """Co-citation related-pages (Small 1973): two DESTINATIONS are
    related when the same sources link to both — the inbound-evidence
    "related entities" signal a KG consumer ranks by. Returns
    (a, b, common, cosine) with cosine = common / sqrt(in_a * in_b).

    Scale shape: one distinct over the edge list, one fan-out-capped
    self-join keyed on the SOURCE (the cap bounds the O(out_deg^2) pair
    blow-up of hub pages — at web scale directory/sitemap pages are
    exactly the keys the cap drops), one keyed agg with map-side combine,
    two degree joins. Never all-pairs.
    """
    e = (
        links.select(F.col(src_col).alias("k"), F.col(dst_col).alias("v"))
        .filter(F.col("k") != F.col("v"))
        .dropDuplicates()
    )
    return _shared_neighbor_pairs(e, "k", "v", df_cap, min_common)


def coupling_pairs(
    links: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    df_cap: int = 1000,
    min_common: int = 2,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): two SOURCES are related
    when they link to the same destinations — the outbound-evidence dual
    of cocitation_pairs. (a, b, common, cosine) with
    cosine = common / sqrt(out_a * out_b); the capped self-join key is
    the DESTINATION (universally-linked hubs — home pages, policy pages —
    are the skew the cap drops)."""
    e = (
        links.select(F.col(dst_col).alias("k"), F.col(src_col).alias("v"))
        .filter(F.col("k") != F.col("v"))
        .dropDuplicates()
    )
    return _shared_neighbor_pairs(e, "k", "v", df_cap, min_common)


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_iter: int = 6,
) -> DataFrame:
    """Collapse HTTP redirect chains to their final targets by pointer
    jumping: (url, final_url, is_cycle). A crawl's 3xx edges form a
    functional graph (one outgoing redirect per URL — enforced by
    dropping duplicate sources deterministically, min dst wins); chains
    a -> b -> c -> d resolve so every member points at d directly — the
    canonicalization step that must run BEFORE URL-level dedup or the
    link graph, or syndicated redirects fragment both.

    Pointer jumping doubles the resolved distance per round (p[u] <-
    p[p[u]]), so ``max_iter`` rounds resolve chains up to length
    2^max_iter — 6 rounds cover length-64 chains, far past the 5-hop
    limit real crawlers enforce. Cycles (a -> b -> a) cannot terminate:
    after the rounds their pointer still lands on a REDIRECTING url —
    that is the detection rule — and the row is flagged ``is_cycle``
    (final_url is then some member of the cycle, state-dependent and
    meaningless; downstream drops flagged rows, since a redirect cycle
    serves no content).

    Scale shape: each round is ONE self-join of the pointer table on the
    current target key (size = number of redirecting URLs, a small
    fraction of the corpus) + localCheckpoint lineage cut. log2(chain)
    shuffles total — the textbook reason pointer jumping, not row-at-a-
    time chasing, is how a 10^12-URL crawl resolves redirects.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    ptr = (
        redirects.select(F.col(src_col).alias("u"), F.col(dst_col).alias("p"))
        .filter(F.col("u") != F.col("p"))
        .groupBy("u")
        .agg(F.min("p").alias("p"))
        .localCheckpoint(eager=True)
    )
    base = ptr
    for _ in range(max_iter):
        # true doubling: compose the CURRENT pointer table with itself
        # (composing with the original one-step table would advance only
        # one hop per round — path chasing, the thing this op exists to
        # avoid)
        hop = ptr.select(F.col("u").alias("_u2"), F.col("p").alias("_p2"))
        nxt = (
            ptr.join(hop, ptr["p"] == hop["_u2"], "left")
            .select("u", F.coalesce("_p2", "p").alias("p"))
            .localCheckpoint(eager=True)
        )
        if nxt.exceptAll(ptr).isEmpty():
            ptr = nxt
            break
        ptr = nxt
    # a pointer that STILL lands on a redirecting url after the rounds is
    # inside a cycle (otherwise it would have escaped to a non-source)
    srcs = base.select(F.col("u").alias("_s"))
    out = ptr.join(srcs, ptr["p"] == srcs["_s"], "left").select(
        F.col("u").alias("url"),
        F.col("p").alias("final_url"),
        F.col("_s").isNotNull().alias("is_cycle"),
    )
    return out


def anchor_alias_pairs(
    anchors: DataFrame,
    min_count: int = 2,
    per_target_cap: int = 50,
) -> DataFrame:
    """Alias candidate pairs from anchor-text co-reference: two surface
    forms that the web uses to link the SAME target are alias candidates
    ("IBM" and "International Business Machines" both anchoring
    ibm.example.com) — the classic external-alias ER signal, here turned
    into (alias_a, alias_b, n_targets) pair evidence ready for
    er.duplicate_pairs_stage's kb_aliases input (the sameAs tier).

    Input is anchor_text_stats output (dst_host, anchor, n). Anchors
    below ``min_count`` per target drop first (typo hygiene); targets
    keep only their ``per_target_cap`` most-frequent anchors (ties by
    anchor ascending) before the within-target pair join — a mega-hub
    with 10^5 distinct anchor texts ("click here" spam) would otherwise
    fan out O(10^10) pairs. One window per target + one self-join keyed
    on the target + one pair agg.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), F.asc("anchor"))
    kept = (
        anchors.filter(F.col("n") >= min_count)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= per_target_cap)
        .select("dst_host", "anchor")
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(b, "dst_host")
        .filter(F.col("a.anchor") < F.col("b.anchor"))
        .groupBy(
            F.col("a.anchor").alias("alias_a"),
            F.col("b.anchor").alias("alias_b"),
        )
        .agg(F.count_distinct("dst_host").alias("n_targets"))
    )
