"""Entity type induction by vote aggregation: turn per-source type
assertions (schema.org JSON-LD `@type` harvests, gazetteer hits, any
tagger's output) into one type per normalized entity name by plurality
vote with a deterministic tie-break.

The reference types entities with a per-episode LLM classification
against user-declared Pydantic entity types (extract_nodes' entity_type
prompt + extract_attributes, graphiti_core/utils/maintenance/
node_operations.py — each episode's extraction picks a type id), then
trusts the latest write. A corpus-scale deterministic engine instead
accumulates EVERY site-published assertion and votes: a name asserted
Person on 40 pages and Organization on 2 is a Person, and the vote
margin is a confidence the consumer can threshold. The vote unit is the
assertion row, the key is the ER exact tier's normalized name, so the
induced type lands on exactly the node the pipeline canonicalizes.

Scale shape: one shuffle agg on (name_norm, etype), one per-name window
over the handful of competing types (bounded by the type vocabulary,
never the corpus), and an optional broadcast-friendly join back to the
canonical node table. No skew risk: a viral entity concentrates votes,
but votes pre-aggregate map-side into one row per (name, type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.normalize import normalize_entity_name_col


def induce_entity_types(
    assertions: DataFrame,
    name_col: str = "name",
    type_col: str = "etype",
    min_votes: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """(name_norm, etype, votes, total_votes, confidence) — the winning
    type per normalized name. Ties break on (votes desc, etype asc);
    null/empty types and names that normalize to '' drop; names with
    fewer than ``min_votes`` total assertions drop."""
    base = (
        assertions.select(
            normalize_entity_name_col(name_col).alias("name_norm"),
            F.col(type_col).alias("etype"),
        )
        .filter(
            F.col("etype").isNotNull()
            & (F.col("etype") != "")
            & (F.col("name_norm") != "")
        )
    )
    votes = base.groupBy("name_norm", "etype").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("name_norm")
    ranked = votes.withColumn(
        "total_votes", F.sum("votes").over(w)
    ).withColumn(
        "_rnk",
        F.row_number().over(w.orderBy(F.desc("votes"), F.asc("etype"))),
    )
    return (
        ranked.filter((F.col("_rnk") == 1) & (F.col("total_votes") >= min_votes))
        .select(
            "name_norm",
            "etype",
            "votes",
            "total_votes",
            F.round(F.col("votes") / F.col("total_votes"), round_dp).alias(
                "confidence"
            ),
        )
    )


def assign_types_to_nodes(
    nodes: DataFrame, induced: DataFrame
) -> DataFrame:
    """Attach the induced type to the canonical node table on the ER
    exact-tier key (nodes already carry name_norm): adds (etype,
    type_confidence), null where no assertion voted. One equi-join; the
    induced table is |distinct typed names|-sized — broadcastable for
    gazetteer-scale vocabularies, hash join at harvest scale."""
    return nodes.join(
        induced.select(
            "name_norm",
            "etype",
            F.col("confidence").alias("type_confidence"),
        ),
        "name_norm",
        "left",
    )
