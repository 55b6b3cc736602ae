"""Centrality operators: degree, PageRank, sampled betweenness, composite.

Parity targets (citations into /root/reference):
 - calculate_degree_centrality: in/out/both distinct-edge counts
   (graphiti_core/utils/maintenance/centrality_operations.py:159-231),
 - calculate_pagerank: damping 0.85, 20 iterations (:58-156; Rust twin
   graphiti-centrality-rs/src/algorithms.rs:12-57),
 - calculate_betweenness_centrality: sampled sources (<=50 when >100 nodes),
   path length <=10, normalization 2/((n-1)(n-2)) (:234-329),
 - calculate_all_centralities composite:
   0.5*(pagerank*1000) + 0.3*ln(degree+1) + 0.2*(betweenness*100) (:444-453).

Scale design: PageRank is the classic iterative join — contributions =
edges ⋈ ranks grouped by dst; each iteration is ONE shuffle on the edge
partitioning, lineage cut with localCheckpoint. Dangling mass is
redistributed uniformly so ranks sum to 1 (matching the standard formulation
the Rust implementation uses). Betweenness runs per-source BFS frontier
joins from a deterministic sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig


def degree_centrality(
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """(uuid, out_degree, in_degree, degree) over distinct edges
    (centrality_operations.py:159-231). One shuffle per direction, unioned."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).dropDuplicates(
        ["src", "dst"]
    )
    outd = e.groupBy(F.col("src").alias("uuid")).agg(F.count(F.lit(1)).alias("out_degree"))
    ind = e.groupBy(F.col("dst").alias("uuid")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        outd.join(ind, "uuid", "full")
        .withColumn("out_degree", F.coalesce("out_degree", F.lit(0)))
        .withColumn("in_degree", F.coalesce("in_degree", F.lit(0)))
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
    damping: float = DEFAULT_CONFIG.pagerank_damping,
    iterations: int = DEFAULT_CONFIG.pagerank_iterations,
) -> DataFrame:
    """Power iteration (centrality_operations.py:58-156, algorithms.rs:12-57):
    rank = (1-d)/n + d * (sum of in-contributions + dangling_mass/n).

    Returns (uuid, pagerank). Deterministic: fixed iteration count, double
    arithmetic, no sampling.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).dropDuplicates(
        ["src", "dst"]
    )
    nodes = (
        e.select(F.col("src").alias("uuid"))
        .unionByName(e.select(F.col("dst").alias("uuid")))
        .dropDuplicates(["uuid"])
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # Edge list annotated with out-degree once; reused every iteration.
    e_w = e.join(out_deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            e_w.join(ranks.withColumnRenamed("uuid", "src"), "src")
            .groupBy(F.col("dst").alias("uuid"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        # Dangling nodes (no out-edges) leak rank; redistribute uniformly.
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "uuid"), "uuid", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        ranks = (
            nodes.join(contribs, "uuid", "left")
            .withColumn(
                "rank",
                F.lit(base)
                + F.lit(damping) * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n)),
            )
            .drop("contrib")
            .localCheckpoint(eager=True)
        )
    return ranks.withColumnRenamed("rank", "pagerank")


def betweenness_centrality(
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
    sample_size: int = 50,
    max_depth: int = 10,
) -> DataFrame:
    """Sampled betweenness (centrality_operations.py:234-329): BFS from <=50
    lexicographically-first nodes (deterministic sample), count how often each
    node sits on a shortest path (intermediate hop), normalize by
    2/((n-1)(n-2)) scaled by n/sample.

    Approximation matches the reference's own approximation (it also samples
    and caps path length) rather than exact Brandes.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    bidir = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    bidir = bidir.localCheckpoint(eager=True)
    nodes = bidir.select(F.col("src").alias("uuid")).dropDuplicates(["uuid"]).localCheckpoint(True)
    n = nodes.count()
    if n < 3:
        return nodes.withColumn("betweenness", F.lit(0.0))
    sources = [r["uuid"] for r in nodes.orderBy("uuid").limit(sample_size).collect()]
    spark = edges.sparkSession
    # parent-count BFS: layer by layer, track (node, depth, n_paths).
    total = None
    for s in sources:
        layer = spark.createDataFrame([(s, 0, 1)], "uuid string, depth int, paths long")
        seen = layer
        for depth in range(1, max_depth + 1):
            frontier = layer.select(F.col("uuid").alias("src"), "paths")
            nxt = (
                bidir.join(F.broadcast(frontier), "src")
                .groupBy(F.col("dst").alias("uuid"))
                .agg(F.sum("paths").alias("paths"))
                .join(seen.select("uuid"), "uuid", "left_anti")
                .withColumn("depth", F.lit(depth))
                .select("uuid", "depth", "paths")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            seen = seen.unionByName(nxt).localCheckpoint(eager=True)
            layer = nxt
        # Every non-endpoint node on a shortest path from s to some t at
        # depth d is counted once per (s, t) pair it mediates; approximate by
        # crediting interior nodes (0 < depth < max reached) with their path
        # share — the reference similarly counts intermediate hops (:305-320).
        interior = seen.filter((F.col("depth") > 0)).select("uuid", "paths", "depth")
        maxd = interior.agg(F.coalesce(F.max("depth"), F.lit(0))).collect()[0][0]
        credit = interior.filter(F.col("depth") < maxd).select(
            "uuid", F.col("paths").cast("double").alias("credit")
        )
        total = credit if total is None else total.unionByName(credit)
    if total is None:
        return nodes.withColumn("betweenness", F.lit(0.0))
    agg = total.groupBy("uuid").agg(F.sum("credit").alias("raw"))
    norm = 2.0 / ((n - 1) * (n - 2)) * (n / max(len(sources), 1))
    scored = agg.withColumn("betweenness", F.col("raw") * F.lit(norm)).drop("raw")
    return (
        nodes.join(scored, "uuid", "left")
        .withColumn("betweenness", F.coalesce("betweenness", F.lit(0.0)))
    )


def composite_importance(
    degree_df: DataFrame, pagerank_df: DataFrame, betweenness_df: DataFrame
) -> DataFrame:
    """importance = 0.5*(pagerank*1000) + 0.3*ln(degree+1) + 0.2*(betweenness*100)
    (centrality_operations.py:444-453)."""
    j = (
        degree_df.select("uuid", "degree")
        .join(pagerank_df.select("uuid", "pagerank"), "uuid", "full")
        .join(betweenness_df.select("uuid", "betweenness"), "uuid", "full")
        .fillna({"degree": 0, "pagerank": 0.0, "betweenness": 0.0})
    )
    return j.withColumn(
        "importance",
        F.lit(0.5) * (F.col("pagerank") * 1000)
        + F.lit(0.3) * F.log(F.col("degree") + 1)
        + F.lit(0.2) * (F.col("betweenness") * 100),
    )
