"""Community detection: synchronous label propagation to fixpoint.

Parity target: ``label_propagation``
(/root/reference/graphiti_core/utils/maintenance/community_operations.py:78-123)
via the neighbor projection of ``get_community_clusters`` (:28-75):
 - projection: RELATES_TO edge counts per (src, dst) pair,
 - each node adopts the plurality label among neighbors, weighted by edge
   count; ties break toward the LARGER community id (:104-108 — we mirror
   with max label id on equal weight),
 - iterate synchronously until no label changes (or max_iter).

Community build (build_community, :152-191) is a deterministic reduce here:
member names aggregated per community instead of LLM pairwise summarization.

Scale: one groupBy-join round per iteration (same shuffle key both sides);
lineage cut per round; converges in O(diameter) rounds on typical KG graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.ids import edge_uuid_udf


def neighbor_projection(
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Undirected weighted adjacency: (u, v, weight=edge count)
    (get_community_clusters, community_operations.py:28-75)."""
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    bidir = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return bidir.groupBy("u", "v").agg(F.count(F.lit(1)).alias("weight"))


def label_propagation(
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
    max_iterations: int = 20,
) -> DataFrame:
    """(uuid, community) — synchronous LPA (community_operations.py:78-123).

    Initial label = own uuid. Per round: label <- argmax_w(sum weight of
    neighbors with that label), ties to the larger label (reference tie rule
    :104-108). Stops when no label changed.
    """
    adj = neighbor_projection(edges, src_col, dst_col).localCheckpoint(eager=True)
    labels = adj.select(F.col("u").alias("uuid")).dropDuplicates(["uuid"]).withColumn(
        "community", F.col("uuid")
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        votes = (
            adj.join(labels.withColumnRenamed("uuid", "v"), "v")
            .groupBy(F.col("u").alias("uuid"), "community")
            .agg(F.sum("weight").alias("w"))
        )
        w_rank = Window.partitionBy("uuid").orderBy(F.desc("w"), F.desc("community"))
        new_labels = (
            votes.withColumn("_rn", F.row_number().over(w_rank))
            .filter(F.col("_rn") == 1)
            .select("uuid", "community")
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "uuid")
            .filter(F.col("n.community") != F.col("o.community"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def update_communities(
    labels: DataFrame,
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Incremental community update (update_community /
    determine_entity_community, community_operations.py:229-308): nodes in
    the graph but ABSENT from the persisted ``labels`` table adopt the modal
    community among their already-labeled neighbors, weighted by edge count
    (the Cypher pattern matches once per RELATES_TO path). Ties break toward
    the larger community uuid — the same rule as the LPA tie-break, so a
    delta attach agrees with what a recompute would do. New nodes with no
    labeled neighbor become their own singleton community (the reference
    returns None/unassigned; singleton = LPA's behavior for isolated nodes).

    Cost shape: ONE round over the delta — a broadcast semi-join of the new
    nodes against the adjacency + one grouped vote, instead of re-running
    LPA over the full graph.
    """
    adj = neighbor_projection(edges, src_col, dst_col)
    nodes = adj.select(F.col("u").alias("uuid")).dropDuplicates(["uuid"])
    new_nodes = nodes.join(labels.select("uuid"), "uuid", "left_anti")
    votes = (
        adj.join(F.broadcast(new_nodes.withColumnRenamed("uuid", "u")), "u")
        .join(labels.withColumnRenamed("uuid", "v"), "v")
        .groupBy(F.col("u").alias("uuid"), "community")
        .agg(F.sum("weight").alias("w"))
    )
    w_rank = Window.partitionBy("uuid").orderBy(F.desc("w"), F.desc("community"))
    assigned = (
        votes.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") == 1)
        .select("uuid", "community")
    )
    singleton = new_nodes.join(assigned.select("uuid"), "uuid", "left_anti").withColumn(
        "community", F.col("uuid")
    )
    return labels.unionByName(assigned).unionByName(singleton)


def build_communities(
    labels: DataFrame, nodes: DataFrame, created_at_iso: str
) -> tuple[DataFrame, DataFrame]:
    """(community_nodes, has_member_edges) — deterministic restatement of
    build_community + build_community_edges (community_operations.py:152-191;
    edge_operations.py:172-187): name = first member names joined, summary =
    sorted member-name digest instead of LLM pairwise summarization."""
    members = labels.join(nodes.select(F.col("uuid"), "name", "group_id"), "uuid")
    comm = members.groupBy("community").agg(
        F.array_sort(F.collect_set("name")).alias("member_names"),
        F.first("group_id").alias("group_id"),
        F.count(F.lit(1)).alias("member_count"),
    )
    community_nodes = comm.select(
        F.col("community").alias("uuid"),
        F.concat_ws(" | ", F.slice("member_names", 1, 3)).alias("name"),
        "group_id",
        F.concat_ws(", ", "member_names").alias("summary"),
        "member_count",
        F.to_timestamp(F.lit(created_at_iso)).alias("created_at"),
    )
    has_member = labels.select(
        F.col("community").alias("source_node_uuid"),
        F.col("uuid").alias("target_node_uuid"),
        F.lit("HAS_MEMBER").alias("name"),
        F.to_timestamp(F.lit(created_at_iso)).alias("created_at"),
    )
    has_member = has_member.withColumn(
        "uuid",
        edge_uuid_udf("source_node_uuid", "target_node_uuid", "name", F.lit("_community")),
    )
    return community_nodes, has_member
