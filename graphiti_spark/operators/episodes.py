"""S2 — pages -> episodes (the reference's EpisodicNode rows).

Parity target: EpisodicNode (/root/reference/graphiti_core/nodes.py:224-234):
(uuid, name, group_id, source, source_description, content, valid_at,
created_at). Mapping per SURVEY.md §1.4 / FIXTURES.md §2:
 - uuid      = uuid5(episode namespace, url)       (deterministic batch twin
               of the reference's uuid4)
 - group_id  = registrable domain of the url, sanitized to the reference's
               ``^[a-zA-Z0-9_.-]+$`` contract (nodes.py:159-168)
 - valid_at  = warc_ts (event time; bi-temporal axis 1)
 - created_at = fixed job timestamp (ingestion time; bi-temporal axis 2) —
               injected from config, never now() (determinism, SURVEY §7.3)
 - content   = extracted text, capped at 100_000 chars (nodes.py:248)
 - source    = 'text' (EpisodeType enum, nodes.py:55-77)

Everything except the uuid5 is a JVM-side expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.functions.ids import episode_uuid_udf
from graphiti_spark.operators.extract_text import page_title_col


def group_id_col(url: Column | str) -> Column:
    """Registrable-ish domain from url, sanitized to `^[a-zA-Z0-9_.-]+$`
    (nodes.py:159-168; helpers.py:130-153). parse_url is JVM-native."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.parse_url(c, F.lit("HOST"))
    host = F.when(host.isNull() | (host == ""), F.lit("default")).otherwise(host)
    return F.substring(F.regexp_replace(F.lower(host), r"[^a-zA-Z0-9_.-]", "_"), 1, 100)


def episodes_stage(pages: DataFrame, config: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> episodes DF.

    Scale note: pure projection — no shuffle; partition count follows the
    input scan. Output is the anchor table for resume (the reference saves
    episodes first for the same reason, graphiti.py:664-672).
    """
    created_at = F.to_timestamp(F.lit(config.created_at_iso))
    name = page_title_col("html")
    # EpisodeType is a per-row property (nodes.py:55-77): inputs that carry a
    # `source` column (message/json corpora) keep it; html page corpora
    # default to 'text'. Downstream NER/triple stages dispatch on it.
    source = (
        F.coalesce(F.col("source"), F.lit("text"))
        if "source" in pages.columns
        else F.lit("text")
    )
    source_desc = (
        F.coalesce(F.col("source_description"), F.lit("common-crawl page"))
        if "source_description" in pages.columns
        else F.lit("common-crawl page")
    )
    return pages.select(
        episode_uuid_udf(F.col("url")).alias("uuid"),
        # NULL-safe fallback: pages with no html (typed message/json sources
        # synthesize html=NULL) yield a NULL title, not "" — both fall back
        # to the url.
        F.when(name.isNull() | (name == ""), F.col("url")).otherwise(name).alias("name"),
        group_id_col("url").alias("group_id"),
        source.alias("source"),
        source_desc.alias("source_description"),
        F.substring(F.col("text"), 1, config.max_episode_content_len).alias("content"),
        F.col("valid_at") if "valid_at" in pages.columns else F.col("warc_ts").alias("valid_at"),
        created_at.alias("created_at"),
        F.col("url"),
        F.col("lang"),
    )


def backfill_entity_edges(episodes: DataFrame, edges: DataFrame) -> DataFrame:
    """episode.entity_edges backfill (graphiti.py:524-528; EpisodicNode
    field nodes.py:231): each episode carries the uuids of every final
    entity edge whose provenance includes it. The merged edge table's
    ``episodes`` array IS that provenance, so the backfill is one explode +
    groupBy — sorted for determinism. Episodes with no edges get [].

    Scale: explode keyed by episode_uuid, one shuffle; the per-episode edge
    list is bounded by edges-per-page, not corpus size.
    """
    prov = (
        edges.select(F.col("uuid").alias("_edge_uuid"), F.explode("episodes").alias("episode_uuid"))
        .groupBy("episode_uuid")
        .agg(F.array_sort(F.collect_set("_edge_uuid")).alias("entity_edges"))
    )
    out = episodes.join(prov, episodes["uuid"] == prov["episode_uuid"], "left").drop(
        "episode_uuid"
    )
    return out.withColumn(
        "entity_edges",
        F.coalesce("entity_edges", F.array().cast("array<string>")),
    )


def retrieve_episodes(
    episodes: DataFrame,
    reference_time,
    last_n: int = 3,
    group_ids: list[str] | None = None,
    source: str | None = None,
) -> DataFrame:
    """As-of scan parity with ``retrieve_episodes``
    (/root/reference/graphiti_core/utils/maintenance/graph_data_operations.py:122-189):
    episodes with valid_at <= reference_time, optional group/source filter,
    ORDER BY valid_at DESC LIMIT n, returned chronologically.

    Plan shape: filter (pushed to scan) + TakeOrderedAndProject — no full sort.
    """
    df = episodes.filter(F.col("valid_at") <= F.lit(reference_time))
    if group_ids:
        df = df.filter(F.col("group_id").isin(group_ids))
    if source:
        df = df.filter(F.col("source") == source)
    return (
        df.orderBy(F.desc("valid_at"), F.asc("uuid"))
        .limit(last_n)
        .orderBy(F.asc("valid_at"), F.asc("uuid"))
    )


def previous_episode_context(episodes: DataFrame, window: int = DEFAULT_CONFIG.episode_window) -> DataFrame:
    """Bulk twin of retrieve_previous_episodes_bulk (bulk_utils.py:70-85):
    one shuffle instead of a per-episode query — Window over
    (group_id, valid_at) collecting the previous `window` episode uuids."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("group_id")
        .orderBy(F.asc("valid_at"), F.asc("uuid"))
        .rowsBetween(-window, -1)
    )
    return episodes.withColumn("previous_episode_uuids", F.collect_list("uuid").over(w))
