"""S7 — pointer remap through the uuid_map + edge property-merge aggregation.

Parity targets (citations into /root/reference):
 - resolve_edge_pointers (utils/bulk_utils.py:492-499): rewrite edge src/dst
   through uuid_map -> two joins with coalesce (identity when unmapped),
 - in-batch edge dedup + merge policy (bulk_utils.py:181-213 and
   merge_edge_properties, node_operations.py:134-207):
     episodes   = ordered distinct union,
     created_at = min,
     valid_at   = min,
     invalid_at = max,
     fact       = deterministic "first" (earliest valid_at, then lexical),
 - build_duplicate_of_edges (edge_operations.py:130-169): IS_DUPLICATE_OF
   audit rows from the duplicate-pair list, self-pairs skipped,
 - merge_node_into / execute_merge_operations (node_operations.py:760-1169):
   the imperative per-edge transfer collapses into the remap join + merge agg
   (set semantics instead of row-at-a-time transfer).

Scale design: the uuid_map holds only non-identity rows (duplicates are a
small fraction of entities), so both remap joins are broadcast-able; we hint
broadcast and let AQE fall back to shuffle if the map is unexpectedly large.
The merge groupBy shuffles on (group_id, src, dst, name) — the natural key,
already well-distributed because canonical uuids are uuid5 hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.ids import edge_uuid_udf


def resolve_edge_pointers(triples: DataFrame, uuid_map: DataFrame) -> DataFrame:
    """Rewrite source/target entity uuids to canonical (bulk_utils.py:492-499)."""
    m = F.broadcast(uuid_map)
    src_map = m.select(
        F.col("uuid").alias("source_entity_uuid"), F.col("canonical_uuid").alias("_src_canon")
    )
    dst_map = m.select(
        F.col("uuid").alias("target_entity_uuid"), F.col("canonical_uuid").alias("_dst_canon")
    )
    out = (
        triples.join(src_map, "source_entity_uuid", "left")
        .join(dst_map, "target_entity_uuid", "left")
        .withColumn("source_node_uuid", F.coalesce("_src_canon", "source_entity_uuid"))
        .withColumn("target_node_uuid", F.coalesce("_dst_canon", "target_entity_uuid"))
        .drop("_src_canon", "_dst_canon")
    )
    # Canonicalization may collapse endpoints together; distinct-endpoint rule
    # still applies (edge_operations.py:283-289).
    return out.filter(F.col("source_node_uuid") != F.col("target_node_uuid"))


def merge_edges(remapped: DataFrame) -> DataFrame:
    """groupBy the canonical triple key and fold properties
    (merge_edge_properties parity, node_operations.py:134-207)."""
    merged = remapped.groupBy("group_id", "source_node_uuid", "target_node_uuid", "name").agg(
        F.array_sort(F.collect_set("episode_uuid")).alias("episodes"),
        F.min("created_at").alias("created_at"),
        F.min("valid_at").alias("valid_at"),
        F.max("invalid_at").alias("invalid_at"),
        F.min_by("fact", F.struct(F.col("valid_at"), F.col("fact"))).alias("fact"),
        F.count(F.lit(1)).alias("mention_count"),
    )
    return merged.withColumn(
        "uuid",
        edge_uuid_udf("source_node_uuid", "target_node_uuid", "name", "group_id"),
    )


def dedupe_edges_by_fact(
    edges: DataFrame,
    fact_cosine_threshold: float = 0.6,
) -> DataFrame:
    """Fact-similarity edge dedup (dedupe_edges_bulk parity,
    bulk_utils.py:360-446): candidates are edges with the SAME canonical
    (source, target) whose fact embeddings reach cosine >= 0.6
    (min_score at bulk_utils.py:369); duplicates merge under the
    lexicographically-smallest edge uuid with the standard property fold.

    With deterministic predicate extraction, most duplicates already share
    (src, dst, name) and were folded by merge_edges; this pass additionally
    collapses predicate paraphrases ("WORKS_AT" vs "EMPLOYED_AT") whose fact
    sentences agree. Self-join fan-out is bounded: the key (group, src, dst)
    has small multiplicity after merge_edges.
    """
    from graphiti_spark.functions.embeddings import dot_col, hashed_ngram_embedding_udf

    e = edges.withColumn("_femb", hashed_ngram_embedding_udf(F.substring("fact", 1, 256)))
    e = e.localCheckpoint(eager=False)
    key = ["group_id", "source_node_uuid", "target_node_uuid"]
    a = e.select(*key, F.col("uuid").alias("uuid_a"), F.col("_femb").alias("femb_a"))
    b = e.select(*key, F.col("uuid").alias("uuid_b"), F.col("_femb").alias("femb_b"))
    pairs = (
        a.join(b, key)
        .filter(F.col("uuid_a") < F.col("uuid_b"))
        .withColumn("fact_cosine", dot_col("femb_a", "femb_b"))
        .filter(F.col("fact_cosine") >= fact_cosine_threshold)
        .select(*key, "uuid_a", "uuid_b", "fact_cosine")
    )
    from graphiti_spark.operators.components import connected_components

    edge_uuid_map = connected_components(pairs.select("uuid_a", "uuid_b"))
    m = F.broadcast(edge_uuid_map)
    remapped = (
        e.join(m, e["uuid"] == m["uuid"], "left")
        .drop(m["uuid"])
        .withColumn("canonical_edge_uuid", F.coalesce("canonical_uuid", F.col("uuid")))
        .drop("canonical_uuid", "_femb")
    )
    merged = remapped.groupBy("group_id", "source_node_uuid", "target_node_uuid", "canonical_edge_uuid").agg(
        F.min_by("name", "uuid").alias("name"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("episodes")))).alias("episodes"),
        F.min("created_at").alias("created_at"),
        F.min("valid_at").alias("valid_at"),
        F.max("invalid_at").alias("invalid_at"),
        F.min_by("fact", F.struct(F.col("valid_at"), F.col("fact"))).alias("fact"),
        F.sum("mention_count").alias("mention_count"),
    )
    return merged.withColumnRenamed("canonical_edge_uuid", "uuid")


def build_duplicate_of_edges(uuid_map: DataFrame, created_at_iso: str) -> DataFrame:
    """IS_DUPLICATE_OF audit edges (edge_operations.py:130-169): one edge per
    (canonical <- duplicate) mapping; self-pairs excluded by construction."""
    created_at = F.to_timestamp(F.lit(created_at_iso))
    out = uuid_map.select(
        F.col("canonical_uuid").alias("source_node_uuid"),
        F.col("uuid").alias("target_node_uuid"),
        F.lit("IS_DUPLICATE_OF").alias("name"),
        created_at.alias("created_at"),
    )
    return out.withColumn(
        "uuid",
        edge_uuid_udf("source_node_uuid", "target_node_uuid", "name", F.lit("_audit")),
    )


def canonical_nodes(entities: DataFrame, uuid_map: DataFrame, created_at_iso: str) -> DataFrame:
    """Fold the entity catalog through the uuid_map into canonical nodes.

    Canonical-node properties follow the merge policy: name = name of the
    canonical member (min uuid — its original name), mention counts summed,
    labels = ['Entity'] (nodes.py:406-411).
    """
    m = F.broadcast(uuid_map)
    with_canon = entities.join(
        m.select(F.col("uuid").alias("entity_uuid"), "canonical_uuid"), "entity_uuid", "left"
    ).withColumn("canonical", F.coalesce("canonical_uuid", "entity_uuid"))
    nodes = with_canon.groupBy("group_id", "canonical").agg(
        F.min_by("name", "entity_uuid").alias("name"),
        F.min_by("name_norm", "entity_uuid").alias("name_norm"),
        F.sum("mention_count").alias("mention_count"),
        F.array_sort(F.collect_set("name")).alias("aliases"),
        F.min_by("name_embedding", "entity_uuid").alias("name_embedding"),
    )
    return nodes.select(
        F.col("canonical").alias("uuid"),
        "name",
        "name_norm",
        "group_id",
        F.array(F.lit("Entity")).alias("labels"),
        "aliases",
        "mention_count",
        "name_embedding",
        F.to_timestamp(F.lit(created_at_iso)).alias("created_at"),
    )


def remap_mentions(mentions: DataFrame, uuid_map: DataFrame) -> DataFrame:
    """MENTIONS edges on canonical entities (build_episodic_edges parity,
    edge_operations.py:110-127), deduped per (episode, entity)."""
    m = F.broadcast(uuid_map)
    out = (
        mentions.join(m.select(F.col("uuid").alias("entity_uuid"), "canonical_uuid"), "entity_uuid", "left")
        .withColumn("entity_canonical", F.coalesce("canonical_uuid", "entity_uuid"))
        .select(
            "episode_uuid",
            F.col("entity_canonical").alias("entity_uuid"),
            "group_id",
            "created_at",
        )
        .dropDuplicates(["episode_uuid", "entity_uuid"])
    )
    return out.withColumn(
        "uuid", edge_uuid_udf("episode_uuid", "entity_uuid", F.lit("MENTIONS"), "group_id")
    )
