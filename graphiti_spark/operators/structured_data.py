"""Structured-data harvest from raw html: JSON-LD, OpenGraph, rel=canonical.

Web pages carry machine-readable entity statements alongside the prose —
schema.org JSON-LD islands (``<script type="application/ld+json">``),
OpenGraph ``<meta property="og:*">`` tags, and the ``rel=canonical`` link
that names the page's preferred URL. A web-scale KG-construction pipeline
harvests these *before* any NLP: they are explicit (subj, pred, obj)
assertions published by the site itself, and the canonical link is the
strongest URL-level dedup signal a crawl carries (it is how Common-Crawl
derivatives collapse syndicated / parameterized duplicates).

The reference ingests pre-structured JSON episodes through the same triple
path as text (graphiti_core/utils/maintenance/node_operations.py episode
dispatch; nodes.py EpisodeType.json) — this module is the web-native front
door for that flow: page html -> typed entity rows -> (subj, pred, obj)
triples that union into the same canonical edge tables.

Execution shape: every extractor here is a JVM ``regexp_extract`` /
``from_json`` column expression — map-only, zero Python, zero shuffle,
fused into the scan stage at 100 TB. ``canonical_dedup`` is the only
shuffle (one hash aggregation on the canonical key, map-side combine
absorbs syndication hot keys). Every regexp sits in the Java-regex /
DuckDB-RE2 common subset so the SQL oracles execute the identical
extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from graphiti_spark.datapipe.webstats import canonical_url_col

# --- OpenGraph ---------------------------------------------------------------
#
# Supported meta shape (documented subset of real HTML, mirroring
# extract_text.page_meta): property before content OR content before
# property, single/double quotes, any case.

def _og_prop_first(prop: str) -> str:
    return (
        r"""(?is)<meta\s+property=["']og:"""
        + prop
        + r"""["']\s+content=["']([^"'>]*)["']"""
    )


def _og_content_first(prop: str) -> str:
    return (
        r"""(?is)<meta\s+content=["']([^"'>]*)["']\s+property=["']og:"""
        + prop
        + r"""["']"""
    )


def og_meta_col(html: Column | str, prop: str) -> Column:
    """One OpenGraph property ('' when absent): property-first attribute
    order wins, content-first is the fallback."""
    c = F.col(html) if isinstance(html, str) else html
    raw = F.decode(c, "UTF-8")
    p_first = F.regexp_extract(raw, _og_prop_first(prop), 1)
    c_first = F.regexp_extract(raw, _og_content_first(prop), 1)
    return F.when(p_first != "", p_first).otherwise(c_first)


def og_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``og_title``, ``og_type``, ``og_site_name``, ``og_url``.
    Map-only (no exchange at any scale)."""
    return (
        pages.withColumn("og_title", og_meta_col(F.col(html_col), "title"))
        .withColumn("og_type", og_meta_col(F.col(html_col), "type"))
        .withColumn("og_site_name", og_meta_col(F.col(html_col), "site_name"))
        .withColumn("og_url", og_meta_col(F.col(html_col), "url"))
    )


# --- rel=canonical -----------------------------------------------------------

_CANON_REL_FIRST = (
    r"""(?is)<link\s+rel=["']canonical["']\s+href=["']([^"'>]*)["']"""
)
_CANON_HREF_FIRST = (
    r"""(?is)<link\s+href=["']([^"'>]*)["']\s+rel=["']canonical["']"""
)


def canonical_link_col(html: Column | str) -> Column:
    """The ``<link rel="canonical" href=...>`` target ('' when the page
    declares none). Both attribute orders, any case."""
    c = F.col(html) if isinstance(html, str) else html
    raw = F.decode(c, "UTF-8")
    rel_first = F.regexp_extract(raw, _CANON_REL_FIRST, 1)
    href_first = F.regexp_extract(raw, _CANON_HREF_FIRST, 1)
    return F.when(rel_first != "", rel_first).otherwise(href_first)


def canonical_dedup(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """URL dedup that HONORS the page's own rel=canonical declaration:
    the dedup key is the normalized canonical-link target when the page
    declares one (and it is absolute), else the normalized crawl URL.
    One row per canonical target with the winning (minimum) crawl url and
    the collapsed count.

    This is the crawl-side companion to webstats.url_dedup — syndicated
    copies and parameterized variants that *declare* their canonical all
    collapse even when their crawl URLs share no syntactic prefix. Only
    absolute http(s) targets are honored (relative canonicals depend on
    base-href resolution; the documented subset skips them).

    Shape: map-side key derivation + ONE hash aggregation on the canonical
    key. Syndication hubs (one canonical, thousands of copies) are exactly
    the hot keys map-side combine absorbs before the exchange."""
    link = canonical_link_col(F.col(html_col))
    key_src = F.when(
        link.rlike(r"^https?://"), link
    ).otherwise(F.col(url_col))
    return (
        pages.withColumn("_canon", canonical_url_col(key_src))
        .groupBy(F.col("_canon").alias("canonical_url"))
        .agg(
            F.min(F.col(url_col)).alias("keep_url"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --- JSON-LD -----------------------------------------------------------------

_JSONLD_BLOCK_RE = (
    r"""(?is)<script\s+type=["']application/ld\+json["'][^>]*>(.*?)</script\s*>"""
)

# Documented schema.org subset: flat Thing fields + one nested affiliation
# hop. Pages publishing richer graphs still parse — unknown fields are
# ignored by from_json, exactly as the reference's json-episode path keeps
# only the fields its prompt schema names (graphiti_core episode dispatch).
JSONLD_SCHEMA = StructType(
    [
        StructField("@type", StringType()),
        StructField("name", StringType()),
        StructField("url", StringType()),
        StructField("sameAs", ArrayType(StringType())),
        StructField(
            "worksFor",
            StructType([StructField("name", StringType())]),
        ),
    ]
)


def jsonld_blocks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Explode every JSON-LD island on each page:
    (url, block_idx, jsonld). Pages without islands drop out (inner
    posexplode). Map-only — regexp_extract_all + posexplode fuse into the
    scan; no shuffle."""
    raw = F.decode(F.col(html_col), "UTF-8")
    blocks = F.regexp_extract_all(raw, F.lit(_JSONLD_BLOCK_RE), 1)
    return pages.select(
        F.col(url_col).alias("url"), F.posexplode(blocks).alias("block_idx", "jsonld")
    )


def jsonld_entities(blocks: DataFrame) -> DataFrame:
    """Parse each island against the documented schema.org subset:
    (url, block_idx, etype, name, entity_url, same_as, works_for).
    Malformed JSON yields nulls (PERMISSIVE), never a failed task — a
    100-TB crawl always contains broken islands. Rows without a usable
    ``name`` are dropped (a Thing with no name joins nothing downstream)."""
    parsed = F.from_json(F.trim(F.col("jsonld")), JSONLD_SCHEMA)
    out = blocks.select(
        "url",
        "block_idx",
        parsed["@type"].alias("etype"),
        parsed["name"].alias("name"),
        parsed["url"].alias("entity_url"),
        parsed["sameAs"].alias("same_as"),
        parsed["worksFor"]["name"].alias("works_for"),
    )
    return out.filter(F.col("name").isNotNull() & (F.col("name") != ""))


def jsonld_triples(entities: DataFrame) -> DataFrame:
    """Flatten parsed schema.org entities into explicit (subj, pred, obj)
    rows — the site-published triples that union into the KG edge path:

      (name, 'isA',      @type)           when @type present
      (name, 'url',      entity_url)      when present
      (name, 'sameAs',   each sameAs[i])  one row per alias URL
      (name, 'worksFor', worksFor.name)   when present

    Provenance (source url + block_idx) rides along, mirroring the
    episodic provenance the reference keeps on every extracted edge
    (edges.py EntityEdge.episodes). Map-only: three filters + one explode,
    unioned — Catalyst collapses them onto one scan of the parsed frame."""
    base = entities.select(
        "url", "block_idx", F.col("name").alias("subj"),
        "etype", "entity_url", "same_as", "works_for",
    )
    is_a = base.filter(F.col("etype").isNotNull() & (F.col("etype") != "")).select(
        "url", "block_idx", "subj", F.lit("isA").alias("pred"), F.col("etype").alias("obj")
    )
    url_t = base.filter(
        F.col("entity_url").isNotNull() & (F.col("entity_url") != "")
    ).select(
        "url", "block_idx", "subj", F.lit("url").alias("pred"),
        F.col("entity_url").alias("obj"),
    )
    same = (
        base.filter(F.col("same_as").isNotNull())
        .select("url", "block_idx", "subj", F.explode("same_as").alias("obj"))
        .filter(F.col("obj") != "")
        .select("url", "block_idx", "subj", F.lit("sameAs").alias("pred"), "obj")
    )
    works = base.filter(
        F.col("works_for").isNotNull() & (F.col("works_for") != "")
    ).select(
        "url", "block_idx", "subj", F.lit("worksFor").alias("pred"),
        F.col("works_for").alias("obj"),
    )
    return is_a.unionByName(url_t).unionByName(same).unionByName(works)


# --- hreflang alternates -----------------------------------------------------

# <link rel="alternate" hreflang="xx" href="..."> in its two common
# attribute orders (rel-first with hreflang before href, and href-first);
# any case, either quote style — the og_meta convention. BCP-47-ish code.
_HREFLANG_REL_FIRST = (
    r"""(?is)<link\s+rel=["']alternate["']\s+hreflang=["']([a-zA-Z-]+)["']"""
    r"""\s+href=["']([^"'>]*)["']"""
)
_HREFLANG_HREF_FIRST = (
    r"""(?is)<link\s+href=["']([^"'>]*)["']\s+rel=["']alternate["']"""
    r"""\s+hreflang=["']([a-zA-Z-]+)["']"""
)


def hreflang_links(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, hreflang, href) — one row per declared language alternate.

    hreflang clusters are how multilingual sites declare translation
    sets (Google's documented markup); a monolingual training corpus
    wants ONE page per translation cluster, which URL/content dedup
    cannot see (translations share no shingles). Map-only: two
    codegen'd regexp_extract_all passes + output-proportional explodes,
    zero shuffles — runs inside the scan wave at any scale.
    """
    raw = F.decode(F.col(html_col), "UTF-8")
    legs = []
    for pat, g_lang, g_href in (
        (_HREFLANG_REL_FIRST, 1, 2),
        (_HREFLANG_HREF_FIRST, 2, 1),
    ):
        spans = pages.select(
            "url",
            F.explode(
                F.regexp_extract_all(raw, F.lit(pat), F.lit(0))
            ).alias("span"),
        )
        legs.append(
            spans.select(
                "url",
                F.lower(F.regexp_extract("span", pat, g_lang)).alias("hreflang"),
                F.regexp_extract("span", pat, g_href).alias("href"),
            )
        )
    out = legs[0].unionByName(legs[1])
    return out.filter(F.col("href") != "")


def translation_clusters(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, cluster_id, n_langs) — connected components over the
    declared-alternate edge list (url <-> href), cluster_id = the
    lexicographically smallest member URL **present in `pages`**. The raw
    CC canonical can be a declared href absent from the corpus (a page we
    never crawled); re-picking the minimum over in-corpus members keeps
    the documented `keep = (url = cluster_id)` policy total — every
    cluster retains exactly one page. A page with no hreflang markup is
    its own singleton cluster. Downstream, `keep = (url = cluster_id)` or
    `hreflang = target lang` picks one page per translation set.

    Scale shape: the alternate edge list is tiny relative to the corpus
    (only multilingual pages emit rows); CC runs over it with the
    large-star/small-star rounds used everywhere else; the final attach
    is one left join on url. n_langs counts distinct declared hreflang
    codes in the cluster (self-referential x-default included).
    """
    from graphiti_spark.operators.components import connected_components

    links = hreflang_links(pages, html_col)
    edges = links.select(
        F.col("url").alias("uuid_a"), F.col("href").alias("uuid_b")
    ).filter(F.col("uuid_a") != F.col("uuid_b"))
    cc = connected_components(edges)  # (uuid, canonical_uuid), non-identity rows
    base = pages.select("url").join(
        cc.select(F.col("uuid").alias("url"), "canonical_uuid"), "url", "left"
    )
    raw_assigned = base.select(
        "url", F.coalesce("canonical_uuid", F.col("url")).alias("_raw_cluster")
    )
    # Re-canonicalize over in-corpus members only: one tiny agg + join on
    # the (multilingual-pages-sized) cluster list, not the corpus.
    corpus_canon = raw_assigned.groupBy("_raw_cluster").agg(
        F.min("url").alias("cluster_id")
    )
    assigned = raw_assigned.join(corpus_canon, "_raw_cluster").select(
        "url", "cluster_id"
    )
    lang_counts = (
        links.join(
            assigned.select(F.col("url"), F.col("cluster_id")), "url"
        )
        .groupBy("cluster_id")
        .agg(F.count_distinct("hreflang").alias("n_langs"))
    )
    return assigned.join(lang_counts, "cluster_id", "left").select(
        "url",
        "cluster_id",
        F.coalesce("n_langs", F.lit(0)).alias("n_langs"),
    )


# --- DOM template fingerprinting --------------------------------------------

# Opening/closing tag names, attributes ignored: '</?([a-zA-Z0-9]+)'.
# Shared verbatim with the DuckDB oracle.
_TAG_RE = r"</?([a-zA-Z0-9]+)"


def template_fingerprint(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, template_fp, n_tags) — md5 of the page's lowercased tag
    SEQUENCE (attributes and text stripped). Pages rendered by the same
    CMS template share the fingerprint even with entirely different
    content — the structural-clustering signal template-aware boilerplate
    removal (and template-spam detection) keys on, orthogonal to every
    text-shingle method in datapipe/dedup.py (translations share a
    template but no shingles; syndicated text shares shingles but not a
    template).

    Map-only: one codegen'd regexp_extract_all + array transform + md5,
    no shuffle — runs inside the scan wave at any scale.
    """
    raw = F.decode(F.col(html_col), "UTF-8")
    tags = F.transform(
        F.regexp_extract_all(raw, F.lit(_TAG_RE), F.lit(1)),
        lambda t: F.lower(t),
    )
    return pages.select(
        "url",
        F.md5(F.concat_ws(">", tags)).alias("template_fp"),
        F.size(tags).alias("n_tags"),
    )


def template_stats(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-(host, template) accounting: (host, template_fp, n_pages,
    n_tags). A host whose page count concentrates in one fingerprint is
    a single-template site (usual); a template spanning MANY hosts is a
    mirror/spam-farm signal. One hash agg over the fingerprint frame —
    map-side combine collapses each host's pages before the shuffle."""
    from graphiti_spark.datapipe.webstats import host_col

    fp = template_fingerprint(pages, html_col)
    return (
        fp.withColumn("host", host_col(F.col("url")))
        .groupBy("host", "template_fp")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.max("n_tags").alias("n_tags"),
        )
    )
