"""S7b — entity attribute/summary hydration from mention evidence.

Parity target: ``extract_attributes_from_nodes``
(/root/reference/graphiti_core/utils/maintenance/node_operations.py:628-712):
per entity, the reference LLM-summarizes the episodes that mention it
(<=250-word summary, nodes sorted by episode valid_at desc) and fills typed
attributes. The deterministic restatement: summary = the entity's evidence
sentences (the mention context windows), newest episodes first, joined and
truncated to the reference's summary cap (nodes.py:427-432); attributes =
a map of deterministic profile facts (mention_count, first/last seen).

Execution shape: ONE groupBy over the mentions-with-context table — the
evidence string is built with collect_list over a window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig


def mention_contexts(mentions: DataFrame, episodes: DataFrame, context_chars: int = 160) -> DataFrame:
    """Attach the +/-context window of episode content around each mention —
    the evidence the reference feeds its summarizer prompt."""
    ep = episodes.select(F.col("uuid").alias("episode_uuid"), "content")
    j = mentions.join(ep, "episode_uuid")
    start = F.greatest(F.col("start_pos") - F.lit(context_chars // 2), F.lit(0))
    return j.withColumn(
        "evidence", F.substring(F.col("content"), start + 1, F.lit(context_chars))
    ).drop("content")


def hydrate_attributes(
    nodes: DataFrame,
    mentions_ctx: DataFrame,
    uuid_map: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """nodes + per-canonical-entity evidence -> nodes with summary and
    attributes map.

    Ordering: evidence sorted by (valid_at DESC, episode_uuid) — the
    reference hydrates from episodes sorted by valid_at desc
    (graphiti.py:716-754). Deterministic under parallelism because the sort
    key is total.
    """
    m = F.broadcast(uuid_map)
    ctx = (
        mentions_ctx.join(
            m.select(F.col("uuid").alias("entity_uuid"), "canonical_uuid"), "entity_uuid", "left"
        )
        .withColumn("canonical", F.coalesce("canonical_uuid", "entity_uuid"))
    )
    ev = ctx.groupBy("canonical").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (F.lit(0) - F.unix_micros(F.col("valid_at").cast("timestamp"))).alias("neg_ts"),
                            F.col("episode_uuid"),
                            F.col("evidence"),
                        )
                    )
                ),
                lambda s: s["evidence"],
            ),
            " | ",
        ).alias("_summary_raw"),
        F.unix_micros(F.min(F.col("valid_at").cast("timestamp"))).alias("first_seen_us"),
        F.unix_micros(F.max(F.col("valid_at").cast("timestamp"))).alias("last_seen_us"),
        F.countDistinct("episode_uuid").alias("episode_count"),
    )
    out = nodes.join(ev, nodes["uuid"] == ev["canonical"], "left").drop("canonical")
    return (
        out.withColumn(
            "summary",
            F.substring(F.coalesce("_summary_raw", F.lit("")), 1, config.max_summary_len),
        )
        .withColumn(
            "attributes",
            F.map_from_arrays(
                F.array(F.lit("mention_count"), F.lit("episode_count"), F.lit("first_seen_us"), F.lit("last_seen_us")),
                F.array(
                    F.col("mention_count").cast("string"),
                    F.coalesce(F.col("episode_count"), F.lit(0)).cast("string"),
                    F.coalesce(F.col("first_seen_us"), F.lit(0)).cast("string"),
                    F.coalesce(F.col("last_seen_us"), F.lit(0)).cast("string"),
                ),
            ),
        )
        .drop("_summary_raw", "first_seen_us", "last_seen_us", "episode_count")
    )
