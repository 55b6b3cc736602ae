"""Deterministic random-walk generation over the canonical entity graph —
the data-prep stage for DeepWalk/node2vec-style graph embeddings
(Perozzi et al. 2014 "DeepWalk"; Grover & Leskovec 2016 "node2vec" with
p = q = 1, i.e. unbiased walks): emit walk sequences that a skip-gram
trainer consumes exactly like sentences.

The reference walks its graph only per-query (bfs search,
graphiti_core/search/search_utils.py edge/node_bfs_search); corpus-scale
representation learning instead wants ALL-node walk corpora, regenerated
deterministically per snapshot.

Neighbor choice is hash-min selection: at step s, walk w standing on
node u moves to argmin_{v in N(u)} md5(w, s, v). For a fixed (w, s) the
md5 values are i.i.d. uniform over neighbors, so the pick is uniform —
but needs NO neighbor indexing, NO per-node window, and NO stored
degree: each step is one equi-join on the current node plus one min_by
aggregate, both partition-parallel and skew-safe (a hub's candidate
rows spread across its hash partitions; min_by combines map-side).
Dead-end nodes simply stop extending (their walks are shorter — the
DeepWalk convention).

Scale shape: walk_len × (1 join + 1 agg) shuffles over a frontier of
|V| × walks_per_node rows — each step's frontier is ONE row per walk,
never the edge list; total work O(walk_len × (|frontier| + matched
edges)). Deterministic: a pure function of the edge set and the salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.hashing import md5_long_col


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    salt: str = "walk",
) -> DataFrame:
    """(walk_id, step, node): ``walks_per_node`` walks from every node
    with out-edges, extended up to ``walk_len`` hops by uniform
    hash-min neighbor selection; step 0 is the start node. walk_id =
    '<start>#<walk index>'."""
    adj = (
        edges.select(
            F.col("source_node_uuid").alias("src"),
            F.col("target_node_uuid").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )
    starts = adj.select("src").dropDuplicates().select(
        "src",
        F.explode(F.array(*[F.lit(i) for i in range(walks_per_node)])).alias("_w"),
    )
    cur = starts.select(
        F.concat_ws("#", "src", "_w").alias("walk_id"), F.col("src").alias("node")
    )
    out = cur.select("walk_id", F.lit(0).alias("step"), "node")
    for step in range(1, walk_len + 1):
        pick_key = md5_long_col(
            F.concat_ws("\x1f", F.col("walk_id"), F.lit(f"{salt}:{step}"), F.col("dst"))
        )
        cur = (
            cur.join(adj, cur["node"] == adj["src"])
            .groupBy("walk_id")
            .agg(F.min_by("dst", pick_key).alias("node"))
        )
        out = out.unionByName(
            cur.select("walk_id", F.lit(step).alias("step"), "node")
        )
    return out


def walk_sentences(walks: DataFrame) -> DataFrame:
    """(walk_id, sentence): each walk as an ordered node array — the
    skip-gram trainer's input row. One per-walk agg (sort_array over
    (step, node) structs keeps it shuffle-minimal and deterministic)."""
    return walks.groupBy("walk_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("step", "node"))), lambda s: s["node"]
        ).alias("sentence")
    )


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    return_tickets: int = 1,
    common_tickets: int = 4,
    far_tickets: int = 16,
    salt: str = "n2v",
) -> DataFrame:
    """Second-order BIASED walks (Grover & Leskovec 2016 node2vec): from
    node u with previous node t, a candidate v in N(u) is weighted by
      - 1/p  if v = t            (return),
      - 1    if edge t->v exists (distance 1 from t),
      - 1/q  otherwise           (distance 2 — exploration),
    expressed here as INTEGER ticket counts proportional to (1/p, 1, 1/q)
    — e.g. the defaults (1, 4, 16) encode p = 4, q = 1/4, the
    "exploratory/DFS-ish" regime. Tickets make the weighted choice exact
    AND portable: candidate v holds `k` tickets, each ticket is one md5
    draw, and the walk moves to the candidate owning the globally
    smallest draw — P(v picked) = k_v / sum(k). No ln()/exp() enters, so
    the DuckDB oracle reproduces every pick bit-for-bit (float libm
    differences can flip an argmin; 60-bit integer md5 cannot).

    Step 1 has no previous node and is uniform (1 ticket each), the
    node2vec convention. Returns (walk_id, step, node) like random_walks.

    Scale shape: per step, one equi-join on the current node (frontier ×
    adjacency), one left join marking distance-1 candidates (edge list
    keyed on (prev, dst) — same key both sides), and one min_by agg; the
    ticket min is an in-row array_min over <= max(tickets) md5 draws
    (codegen, no explode). Frontier stays one row per walk.
    """
    for name, t in (
        ("return_tickets", return_tickets),
        ("common_tickets", common_tickets),
        ("far_tickets", far_tickets),
    ):
        if t < 1:
            raise ValueError(f"{name} must be >= 1, got {t}")
    adj = (
        edges.select(
            F.col("source_node_uuid").alias("src"),
            F.col("target_node_uuid").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )
    starts = adj.select("src").dropDuplicates().select(
        "src",
        F.explode(F.array(*[F.lit(i) for i in range(walks_per_node)])).alias("_w"),
    )
    cur = starts.select(
        F.concat_ws("#", "src", "_w").alias("walk_id"),
        F.col("src").alias("node"),
        F.lit(None).cast("string").alias("prev"),
    )
    out = cur.select("walk_id", F.lit(0).alias("step"), "node")
    mark = adj.select(
        F.col("src").alias("prev"),
        F.col("dst").alias("dst"),
        F.lit(True).alias("_common"),
    )
    for step in range(1, walk_len + 1):
        cand = cur.join(adj, cur["node"] == adj["src"]).select(
            "walk_id", "node", "prev", "dst"
        )
        cand = cand.join(mark, ["prev", "dst"], "left")
        tickets = (
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("dst") == F.col("prev"), F.lit(return_tickets))
            .when(F.col("_common"), F.lit(common_tickets))
            .otherwise(F.lit(far_tickets))
        )
        key = F.array_min(
            F.transform(
                F.sequence(F.lit(1), tickets),
                lambda t: md5_long_col(
                    F.concat_ws(
                        "\x1f",
                        F.col("walk_id"),
                        F.lit(f"{salt}:{step}"),
                        F.col("dst"),
                        t.cast("string"),
                    )
                ),
            )
        )
        picked = cand.groupBy("walk_id").agg(
            F.min_by(F.struct("dst", "node"), key).alias("_s")
        )
        cur = picked.select(
            "walk_id",
            F.col("_s.dst").alias("node"),
            F.col("_s.node").alias("prev"),
        )
        out = out.unionByName(
            cur.select("walk_id", F.lit(step).alias("step"), "node")
        )
    return out
