"""Batch candidate fetchers — the join-based twins of the reference's
per-probe `UNWIND $probes MATCH ...` queries.

Parity targets (citations into /root/reference):
 - get_relevant_nodes (graphiti_core/search/search_utils.py:698-789):
   per probe node, existing nodes with cosine(name_embedding) >= min_score
   OR exact fulltext name hit, capped per probe,
 - get_relevant_edges (:792-858): per probe edge, edges with the SAME
   endpoints whose fact cosine >= min_score, top-k per probe,
 - get_edge_invalidation_candidates (:861-927): edges sharing >=1 endpoint,
   cosine >= 0.2, top-k per probe.

Where the reference loops probes client-side (UNWIND batches per request),
the Spark form is ONE join per fetcher: probes x corpus on the blocking key,
cosine as a column expression, per-probe top-k as a window. Probe sets are
small relative to the corpus -> broadcast the probe side; the corpus side
never re-partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.functions.embeddings import cosine_col


def get_relevant_nodes(
    probes: DataFrame,
    nodes: DataFrame,
    min_score: float = DEFAULT_CONFIG.node_min_score,
    limit: int = 10,
) -> DataFrame:
    """probes(uuid, group_id, name_norm, name_embedding) x existing nodes ->
    (probe_uuid, candidate_uuid, score), top-`limit` per probe.

    Blocking: same group_id (the reference's group-scoped index lookups) +
    exact-norm OR cosine over that block; per-probe cap = the RELEVANT_
    SCHEMA_LIMIT cut (search_utils.py:56).
    """
    p = probes.select(
        F.col("uuid").alias("probe_uuid"),
        "group_id",
        F.col("name_norm").alias("probe_norm"),
        F.col("name_embedding").alias("probe_emb"),
    )
    n = nodes.select(
        F.col("uuid").alias("candidate_uuid"),
        "group_id",
        F.col("name_norm").alias("cand_norm"),
        F.col("name_embedding").alias("cand_emb"),
    )
    j = F.broadcast(p).join(n, "group_id")
    j = j.filter(F.col("probe_uuid") != F.col("candidate_uuid"))
    j = j.withColumn("cosine", cosine_col("probe_emb", "cand_emb"))
    j = j.filter((F.col("probe_norm") == F.col("cand_norm")) | (F.col("cosine") >= min_score))
    w = Window.partitionBy("probe_uuid").orderBy(F.desc("cosine"), F.asc("candidate_uuid"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .select("probe_uuid", "candidate_uuid", F.col("cosine").alias("score"))
    )


def get_relevant_edges(
    probe_edges: DataFrame,
    edges: DataFrame,
    min_score: float = DEFAULT_CONFIG.edge_min_score,
    limit: int = 10,
) -> DataFrame:
    """Same-endpoint edges with fact-embedding cosine >= min_score
    (search_utils.py:792-858). Join key = (group_id, src, dst) — exact
    endpoint equality, so the join is a hash equi-join, no fan-out."""
    p = probe_edges.select(
        F.col("uuid").alias("probe_uuid"),
        "group_id",
        F.col("source_node_uuid").alias("src"),
        F.col("target_node_uuid").alias("dst"),
        F.col("fact_embedding").alias("probe_emb"),
    )
    e = edges.select(
        F.col("uuid").alias("candidate_uuid"),
        "group_id",
        F.col("source_node_uuid").alias("src"),
        F.col("target_node_uuid").alias("dst"),
        F.col("fact_embedding").alias("cand_emb"),
    )
    j = F.broadcast(p).join(e, ["group_id", "src", "dst"])
    j = j.filter(F.col("probe_uuid") != F.col("candidate_uuid"))
    j = j.withColumn("score", cosine_col("probe_emb", "cand_emb")).filter(
        F.col("score") >= min_score
    )
    w = Window.partitionBy("probe_uuid").orderBy(F.desc("score"), F.asc("candidate_uuid"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .select("probe_uuid", "candidate_uuid", "score")
    )


def get_edge_invalidation_candidates(
    probe_edges: DataFrame,
    edges: DataFrame,
    min_score: float = 0.2,  # search_utils.py:342 default
    limit: int = 10,
) -> DataFrame:
    """Edges sharing >=1 endpoint with the probe (either side), cosine >= 0.2
    (search_utils.py:861-927): two equi-joins (src-side, dst-side) unioned —
    the OR-join decomposed so both halves stay hash joins."""
    p = probe_edges.select(
        F.col("uuid").alias("probe_uuid"),
        "group_id",
        F.col("source_node_uuid").alias("p_src"),
        F.col("target_node_uuid").alias("p_dst"),
        F.col("fact_embedding").alias("probe_emb"),
    )
    e = edges.select(
        F.col("uuid").alias("candidate_uuid"),
        "group_id",
        F.col("source_node_uuid").alias("c_src"),
        F.col("target_node_uuid").alias("c_dst"),
        F.col("fact_embedding").alias("cand_emb"),
    )
    pb = F.broadcast(p)
    halves = []
    for p_end in ("p_src", "p_dst"):
        for c_end in ("c_src", "c_dst"):
            halves.append(
                pb.join(e, (F.col(p_end) == F.col(c_end)) & (p["group_id"] == e["group_id"]))
                .drop(e["group_id"])
            )
    j = halves[0]
    for h in halves[1:]:
        j = j.unionByName(h)
    j = j.dropDuplicates(["probe_uuid", "candidate_uuid"]).filter(
        F.col("probe_uuid") != F.col("candidate_uuid")
    )
    j = j.withColumn("score", cosine_col("probe_emb", "cand_emb")).filter(
        F.col("score") >= min_score
    )
    w = Window.partitionBy("probe_uuid").orderBy(F.desc("score"), F.asc("candidate_uuid"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .select("probe_uuid", "candidate_uuid", "score")
    )


def filter_existing_duplicate_pairs(
    pairs: DataFrame, existing_audit_edges: DataFrame
) -> DataFrame:
    """Drop pairs already recorded as IS_DUPLICATE_OF
    (edge_operations.py:610-637) — a left_anti join."""
    existing = existing_audit_edges.select(
        F.col("source_node_uuid").alias("uuid_a"),
        F.col("target_node_uuid").alias("uuid_b"),
    )
    return pairs.join(existing, ["uuid_a", "uuid_b"], "left_anti")
