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


def propagate_types(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Semi-supervised type propagation: spread entity types from a
    high-confidence typed seed set (gazetteer hits, JSON-LD @type
    harvest — induce_entity_types output) across the canonical graph, the
    label-propagation-with-clamping scheme (Zhu & Ghahramani 2002) that
    types the long tail no assertion ever names.

    Per round, every still-untyped node adopts the PLURALITY type among
    its typed neighbors (undirected view), ties broken type-ascending;
    seeds are clamped (never change); a node typed in round r keeps that
    type (first-assignment-wins keeps rounds monotone and the fixpoint
    deterministic). Returns (uuid, etype, hops) where hops = 0 for seeds
    and r for round-r adoptions; nodes unreached within ``n_iter`` rounds
    emit no row.

    Scale shape: per round one join of the frontier-adjacent edge list
    against the typed table, one (node, type) count agg with map-side
    combine, one deterministic argmax (min_by over a (-count, type)
    struct — no window), one anti-join to keep only new nodes.
    localCheckpoint truncates lineage per round. Votes flow ONLY from
    typed to untyped, so per-round work is proportional to the typed
    frontier's edge neighborhood, never the graph.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    adj = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    typed = seeds.select(
        F.col("uuid"), F.col("etype"), F.lit(0).alias("hops")
    ).dropDuplicates(["uuid"]).localCheckpoint(eager=True)
    for r in range(1, n_iter + 1):
        votes = (
            typed.join(adj, typed["uuid"] == adj["a"])
            .select(F.col("b").alias("uuid"), "etype")
            .join(typed.select(F.col("uuid").alias("_t")), F.col("uuid") == F.col("_t"), "left_anti")
            .groupBy("uuid", "etype")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new = votes.groupBy("uuid").agg(
            F.min_by(
                "etype",
                F.struct((-F.col("cnt")).alias("nc"), F.col("etype").alias("t")),
            ).alias("etype")
        ).select("uuid", "etype", F.lit(r).alias("hops"))
        typed = typed.unionByName(new).localCheckpoint(eager=True)
        if new.isEmpty():
            break
    return typed
