"""Community detection: synchronous label propagation to fixpoint.

Parity target: ``label_propagation``
(/root/reference/graphiti_core/utils/maintenance/community_operations.py:78-123)
via the neighbor projection of ``get_community_clusters`` (:28-75):
 - projection: RELATES_TO edge counts per (src, dst) pair,
 - each node adopts the plurality label among neighbors, weighted by edge
   count; ties break toward the LARGER community id, and a weak plurality
   (top vote weight <= 1) falls back to max(candidate, current) instead of
   adopting outright (:101-106 — we mirror with max label id on equal
   weight and the same weak-vote fallback, so weight-1 two-node islands
   converge to the max label instead of oscillating),
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


def _plurality_vote(
    adj: DataFrame, labels: DataFrame, restrict_to: DataFrame | None = None
) -> DataFrame:
    """One weighted-plurality vote round: each voter (u, restricted to
    ``restrict_to`` uuids if given) takes the label with the largest summed
    neighbor weight, ties to the larger community uuid; then applies the
    reference's weak-plurality fallback (community_operations.py:101-106):
    the candidate is adopted outright only when its vote weight is > 1,
    otherwise the voter takes max(candidate, current label). A voter with no
    current label (the incremental attach path, determine_entity_community
    :229-308, which is plain modal vote) adopts the candidate — ``greatest``
    ignores the null current. The ONE definition shared by full LPA and the
    incremental delta attach — the 'delta agrees with recompute' guarantee
    depends on both using this exact ordering."""
    votes = adj
    if restrict_to is not None:
        votes = votes.join(
            F.broadcast(restrict_to.select(F.col("uuid").alias("u"))), "u"
        )
    votes = (
        votes.join(labels.withColumnRenamed("uuid", "v"), "v")
        .groupBy(F.col("u").alias("uuid"), "community")
        .agg(F.sum("weight").alias("w"))
    )
    w_rank = Window.partitionBy("uuid").orderBy(F.desc("w"), F.desc("community"))
    top = (
        votes.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") == 1)
        .select("uuid", F.col("community").alias("_cand"), "w")
    )
    cur = labels.select("uuid", F.col("community").alias("_cur"))
    return (
        top.join(cur, "uuid", "left")
        .select(
            "uuid",
            F.when(F.col("w") > 1, F.col("_cand"))
            .otherwise(F.greatest("_cand", "_cur"))
            .alias("community"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
    max_iterations: int = 20,
) -> DataFrame:
    """(uuid, community) — synchronous LPA (community_operations.py:78-123).

    Initial label = own uuid. Per round: label <- argmax_w(sum weight of
    neighbors with that label), ties to the larger label; weak plurality
    (w <= 1) falls back to max(candidate, current) (reference rule
    :101-106). Stops when no label changed.
    """
    adj = neighbor_projection(edges, src_col, dst_col).localCheckpoint(eager=True)
    labels = adj.select(F.col("u").alias("uuid")).dropDuplicates(["uuid"]).withColumn(
        "community", F.col("uuid")
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        new_labels = _plurality_vote(adj, labels).localCheckpoint(eager=True)
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
    max_rounds: int = 10,
) -> DataFrame:
    """Incremental community update (update_community /
    determine_entity_community, community_operations.py:229-308): nodes in
    the graph but ABSENT from the persisted ``labels`` table adopt the modal
    community among their already-labeled neighbors, weighted by edge count,
    ties to the larger community uuid — `_plurality_vote`, the same rule as
    LPA, so a delta attach agrees with what a recompute would do.

    Attach rounds repeat (bounded by ``max_rounds``) so a CHAIN of new nodes
    reaches the labeled graph transitively — the reference's one-node-at-a-
    time update gets this by sequencing. New nodes whose whole neighborhood
    is also new (a disconnected new cluster) are resolved by running full
    LPA on just that remainder subgraph, which is exactly what a recompute
    would do with it (two connected new nodes share one community, not two
    singletons).

    Cost shape: a few broadcast-restricted vote rounds over the delta + LPA
    over only the residual new-new subgraph, instead of re-running LPA over
    the full graph.
    """
    adj = neighbor_projection(edges, src_col, dst_col).localCheckpoint(eager=True)
    nodes = adj.select(F.col("u").alias("uuid")).dropDuplicates(["uuid"])
    unassigned = nodes.join(labels.select("uuid"), "uuid", "left_anti").localCheckpoint(
        eager=True
    )
    out = labels
    for _ in range(max_rounds):
        if unassigned.isEmpty():
            break
        assigned = _plurality_vote(adj, out, restrict_to=unassigned).localCheckpoint(
            eager=True
        )
        if assigned.isEmpty():
            break
        out = out.unionByName(assigned).localCheckpoint(eager=True)
        unassigned = unassigned.join(assigned.select("uuid"), "uuid", "left_anti").localCheckpoint(
            eager=True
        )
    if not unassigned.isEmpty():
        # Residual new-new subgraph: both endpoints unlabeled.
        rem_edges = edges.join(
            unassigned.select(F.col("uuid").alias(src_col)), src_col, "left_semi"
        ).join(unassigned.select(F.col("uuid").alias(dst_col)), dst_col, "left_semi")
        out = out.unionByName(label_propagation(rem_edges, src_col, dst_col))
        # Nodes with no surviving remainder edge (all their edges touch a
        # labeled node yet voting never reached them — cannot happen — or
        # self-loop-only): keep the singleton fallback for safety.
        leftover = unassigned.join(out.select("uuid"), "uuid", "left_anti")
        out = out.unionByName(leftover.withColumn("community", F.col("uuid")))
    return out


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


def community_profiles(
    assignments: DataFrame,
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Deterministic per-community profile — the structured analogue of the
    reference's LLM community summaries (build_community's pairwise
    summarize + name generation, community_operations.py:126-170): instead
    of prose, each community gets its size, its top-k most-mentioned member
    names, its internal edge count, and its plurality internal relation:

      (community, n_members, top_members, n_internal_edges, top_relation)

    top_members = ", "-joined names ranked by (mention_count desc, name,
    uuid); top_relation = plurality vote over intra-community edge names
    (ties break lexicographically); communities with no internal edges get
    0 / null. This is what a UI renders next to a community and what a
    retrieval layer uses as a community descriptor without an LLM pass.

    Scale shape: one member join + per-community top-k window (bounded by
    community size), two broadcast-sized joins to tag edge endpoints with
    communities (the assignment table is |V|-sized — hash join at KG
    scale), one count agg and one plurality window over the distinct
    relation names per community. Nothing global, nothing driver-side.
    """
    m = assignments.join(
        nodes.select("uuid", "name", "mention_count"), "uuid"
    )
    sizes = m.groupBy("community").agg(F.count(F.lit(1)).alias("n_members"))
    w = Window.partitionBy("community").orderBy(
        F.desc("mention_count"), "name", "uuid"
    )
    top = (
        m.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .groupBy("community")
        .agg(
            F.concat_ws(
                ", ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_rnk", "name"))),
                    lambda s: s["name"],
                ),
            ).alias("top_members")
        )
    )
    ca = assignments.select(
        F.col("uuid").alias("source_node_uuid"), F.col("community").alias("_ca")
    )
    cb = assignments.select(
        F.col("uuid").alias("target_node_uuid"), F.col("community").alias("_cb")
    )
    internal = (
        edges.select("source_node_uuid", "target_node_uuid", "name")
        .join(ca, "source_node_uuid")
        .join(cb, "target_node_uuid")
        .filter(F.col("_ca") == F.col("_cb"))
        .select(F.col("_ca").alias("community"), "name")
    )
    n_int = internal.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_internal_edges")
    )
    rv = internal.groupBy("community", "name").agg(F.count(F.lit(1)).alias("_v"))
    wr = Window.partitionBy("community").orderBy(F.desc("_v"), "name")
    top_rel = (
        rv.withColumn("_rnk", F.row_number().over(wr))
        .filter(F.col("_rnk") == 1)
        .select("community", F.col("name").alias("top_relation"))
    )
    return (
        sizes.join(top, "community")
        .join(n_int, "community", "left")
        .join(top_rel, "community", "left")
        .withColumn(
            "n_internal_edges", F.coalesce("n_internal_edges", F.lit(0)).cast("long")
        )
        .select(
            "community",
            F.col("n_members").cast("long").alias("n_members"),
            "top_members",
            "n_internal_edges",
            "top_relation",
        )
    )
