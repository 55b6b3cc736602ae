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
    dangling_mode: str = "crossjoin",
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Power iteration (centrality_operations.py:58-156, algorithms.rs:12-57):
    rank = (1-d)/n + d * (sum of in-contributions + dangling_mass/n).

    Returns (uuid, pagerank). Deterministic: fixed iteration count, double
    arithmetic, no sampling.

    ``dangling_mode`` selects how the dangling-node rank mass re-enters the
    update: ``"crossjoin"`` (default) broadcast-crossJoins the 1-row dangling
    aggregate so each iteration is a single Spark job with no driver barrier;
    ``"collect"`` collects the scalar to the driver and re-broadcasts it as a
    literal. Two paired A/Bs (tools/pagerank_ab.py, sf0.1×4 = 350k edges, 10
    iterations, alternating trials, identical rank sums): on the OLD code —
    which re-derived out_deg and ran an anti-join per iteration to find the
    dangling mass — collect won 1.21× (median 23.4 s vs 28.3 s). After
    precomputing the static ``_dangling_node`` flag below, the dangling
    aggregate is a pure filter+sum over the checkpointed ranks and the two
    modes tie (medians 15.9 vs 15.5 s, ratio 1.02, inside trial noise) while
    both dropped ~40%. With local cost a wash, crossjoin is the right default:
    it removes a per-iteration driver synchronization point, which is the only
    term that grows with cluster latency (stragglers, RPC) at 1000 executors.
    """
    if dangling_mode not in ("crossjoin", "collect"):
        raise ValueError(f"dangling_mode must be crossjoin|collect, got {dangling_mode!r}")
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
    # Dangling membership is STATIC — flag it on the node table once so the
    # per-iteration dangling aggregate is a pure scan of the checkpointed
    # ranks (filter + sum), not an anti-join that re-derives out_deg from
    # the raw edge list every iteration (was: one extra groupBy shuffle +
    # join per iteration, pure fixed cost at any scale).
    nodes = nodes.join(
        out_deg.select(F.col("src").alias("uuid"), F.lit(True).alias("_has_out")),
        "uuid",
        "left",
    ).withColumn("_dangling_node", F.col("_has_out").isNull()).drop("_has_out").localCheckpoint(
        eager=True
    )
    if init_ranks is None:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    else:
        # Warm start (incremental tier): power iteration converges to the
        # same fixpoint from ANY probability vector, but starting from the
        # previous snapshot's ranks after a small graph delta cuts the
        # distance-to-fixpoint by orders of magnitude — the standard
        # incremental-PageRank recipe (Langville & Meyer 2006 ch.10 restart;
        # measured in test_pagerank_warmstart: warm-from-fixpoint moves less
        # in 2 iterations than cold moves in 10). Nodes new since the
        # snapshot start at 1/n; the vector renormalizes to sum 1 over the
        # CURRENT node set via the same broadcast 1-row-aggregate pattern as
        # the dangling mass (no driver barrier).
        rank_col = "pagerank" if "pagerank" in init_ranks.columns else "rank"
        ir = init_ranks.select("uuid", F.col(rank_col).alias("_init"))
        seeded = nodes.join(ir, "uuid", "left").withColumn(
            "_init", F.coalesce("_init", F.lit(1.0 / n))
        )
        tot = seeded.agg(F.sum("_init").alias("_tot"))
        ranks = (
            seeded.crossJoin(F.broadcast(tot))
            .withColumn("rank", F.col("_init") / F.col("_tot"))
            .drop("_init", "_tot")
            .localCheckpoint(eager=True)
        )
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            e_w.join(ranks.select(F.col("uuid").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("uuid"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        # Dangling nodes (no out-edges) leak rank; redistribute uniformly.
        # Both modes feed the same 1-row aggregate into the update — see the
        # docstring for the measured A/B; they tie locally and "crossjoin"
        # avoids a per-iteration driver barrier at cluster scale.
        dangling_df = ranks.filter(F.col("_dangling_node")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        if dangling_mode == "collect":
            dangling_df = ranks.sparkSession.createDataFrame(
                [(float(dangling_df.collect()[0][0]),)], "_dangling double"
            )
        ranks = (
            nodes.join(contribs, "uuid", "left")
            .crossJoin(F.broadcast(dangling_df))
            .withColumn(
                "rank",
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce("contrib", F.lit(0.0)) + F.col("_dangling") / F.lit(float(n))),
            )
            .drop("contrib", "_dangling")
            .localCheckpoint(eager=True)
        )
    return ranks.drop("_dangling_node").withColumnRenamed("rank", "pagerank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[str],
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
    damping: float = DEFAULT_CONFIG.pagerank_damping,
    iterations: int = 10,
    round_dp: int = 9,
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling) mass returns to the
    `seeds` set uniformly instead of all nodes — the topic-conditioned
    authority used for 'relevant to THESE entities' retrieval (the graph
    twin of the search orchestrator's node_distance reranker; global
    pagerank is centrality_operations.py:58-156).

        rank' = (1-d)*seed(v) + d*(sum of in-contribs + dangling_mass*seed(v))

    with seed(v) = 1/|seeds| on the seed set, 0 elsewhere; ranks start AT
    the seed distribution. Ranks are rounded to `round_dp` decimals each
    iteration — the cross-engine determinism contract that lets the DuckDB
    oracle replay the fixpoint in unrolled CTEs (the HITS convention).
    Same cost shape as `pagerank`: one join + one algebraic agg + a
    broadcast 1-row dangling aggregate per iteration, lineage cut per
    iteration."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).dropDuplicates(
        ["src", "dst"]
    )
    nodes = (
        e.select(F.col("src").alias("uuid"))
        .unionByName(e.select(F.col("dst").alias("uuid")))
        .dropDuplicates(["uuid"])
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_w = e.join(out_deg, "src").localCheckpoint(eager=True)
    # Seeds absent from the edge-derived node set can receive no rank mass:
    # renormalize the teleport share over the seeds actually PRESENT so the
    # rank vector still sums to 1 (the convention NetworkX's nstart
    # normalization uses), and fail loudly when no seed exists at all —
    # silently returning the all-zero vector would masquerade as "no
    # relevant nodes". The probe is one column-pruned scan of the (small,
    # localCheckpoint-bound) node list against a literal IN — cheap.
    present = {
        r[0] for r in nodes.filter(F.col("uuid").isin(list(seeds))).collect()
    }
    if not present:
        raise ValueError(f"none of the {len(seeds)} seeds exist in the graph")
    seed_w = 1.0 / len(present)
    nodes = (
        nodes.withColumn(
            "_seed",
            F.when(F.col("uuid").isin(list(present)), F.lit(seed_w)).otherwise(F.lit(0.0)),
        )
        .join(
            out_deg.select(F.col("src").alias("uuid"), F.lit(True).alias("_has_out")),
            "uuid",
            "left",
        )
        .withColumn("_dangling_node", F.col("_has_out").isNull())
        .drop("_has_out")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.round(F.col("_seed"), round_dp))
    for _ in range(iterations):
        contribs = (
            e_w.join(ranks.select(F.col("uuid").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("uuid"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        dangling_df = ranks.filter(F.col("_dangling_node")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        ranks = (
            nodes.join(contribs, "uuid", "left")
            .crossJoin(F.broadcast(dangling_df))
            .withColumn(
                "rank",
                F.round(
                    F.lit(1.0 - damping) * F.col("_seed")
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("_dangling") * F.col("_seed")
                    ),
                    round_dp,
                ),
            )
            .drop("contrib", "_dangling")
            .localCheckpoint(eager=True)
        )
    return ranks.select("uuid", F.col("rank").alias("ppr"))


def multi_source_bfs(
    edges: DataFrame,
    sources: list[str],
    max_depth: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Shortest-hop distances from every source at once: (source, uuid, depth).

    ALL frontiers advance together, keyed by (source, uuid) — one DataFrame
    loop of <= max_depth iterations total (<= max_depth shuffles), instead of
    a sequential per-source driver loop (the round-1 anti-pattern: 50 sources
    x ~10 depths x 2-3 actions each => >1,000 serial Spark jobs).
    """
    spark = edges.sparkSession
    g = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    dist = spark.createDataFrame(
        [(s, s, 0) for s in sources], "source string, uuid string, depth int"
    ).localCheckpoint(eager=True)
    frontier = dist
    for depth in range(1, max_depth + 1):
        # No broadcast hint: the combined multi-source frontier is
        # O(sources x reachable-set) and can exceed the broadcast limit on a
        # large graph — let AQE pick broadcast only while it is actually
        # small.
        nxt = (
            g.join(frontier.select("source", F.col("uuid").alias("src")), "src")
            .select("source", F.col("dst").alias("uuid"))
            .dropDuplicates(["source", "uuid"])
            .join(dist.select("source", "uuid"), ["source", "uuid"], "left_anti")
            .withColumn("depth", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def betweenness_centrality(
    edges: DataFrame,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
    sample_size: int = 50,
    max_depth: int = 10,
    directed: bool = True,
) -> DataFrame:
    """Sampled betweenness with the reference's path-credit rule
    (centrality_operations.py:234-329): take <= ``sample_size`` nodes
    (deterministic: lexicographically first), find shortest paths of length
    <= 10 between every ordered sampled pair (s, t), credit each SAMPLED
    intermediate node u on a shortest path with +1 per (s, t) pair
    (:305-320 credits path_nodes[1:-1] filtered to the sampled dict), and
    normalize by 2/((m-1)(m-2)) with m = sample size (:322-326).

    Deterministic restatement: the reference credits the intermediates of the
    single (engine-chosen, unstable) path FalkorDB returns; here u is
    credited iff dist(s,u) + dist(u,t) == dist(s,t) — membership in ANY
    shortest path. Same rule both here and in the DuckDB oracle.

    ``directed=True`` matches the reference's directed traversal
    (``(source)-[*..10]->(target)``); ``directed=False`` treats edges as
    undirected (useful for bipartite graphs where directed paths have no
    intermediates).

    Cost shape: ONE multi-source BFS (<= max_depth shuffle rounds for all
    sources together); the credit join runs on the m x m sampled-pair
    distance table (tiny).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    g = e if directed else e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates(["src", "dst"])
    g = g.localCheckpoint(eager=True)
    nodes = (
        g.select(F.col("src").alias("uuid"))
        .unionByName(g.select(F.col("dst").alias("uuid")))
        .dropDuplicates(["uuid"])
        .localCheckpoint(eager=True)
    )
    sample = [r["uuid"] for r in nodes.orderBy("uuid").limit(sample_size).collect()]
    m = len(sample)
    if m < 3:
        return nodes.withColumn("betweenness", F.lit(0.0))
    dist = multi_source_bfs(g, sample, max_depth)
    # distances between sampled nodes only: m x m rows
    apsp = dist.join(
        F.broadcast(nodes.sparkSession.createDataFrame([(s,) for s in sample], "uuid string")),
        "uuid",
    ).localCheckpoint(eager=True)
    st = apsp.filter((F.col("depth") >= 2) & (F.col("source") != F.col("uuid"))).select(
        F.col("source").alias("s"), F.col("uuid").alias("t"), F.col("depth").alias("d_st")
    )
    su = apsp.select(F.col("source").alias("s"), F.col("uuid").alias("u"), F.col("depth").alias("d_su"))
    ut = apsp.select(F.col("source").alias("u"), F.col("uuid").alias("t"), F.col("depth").alias("d_ut"))
    credit = (
        st.join(su, "s")
        .filter((F.col("u") != F.col("s")) & (F.col("u") != F.col("t")))
        .join(ut, ["u", "t"])
        .filter(F.col("d_su") + F.col("d_ut") == F.col("d_st"))
        .groupBy(F.col("u").alias("uuid"))
        .agg(F.count(F.lit(1)).cast("double").alias("raw"))
    )
    norm = 2.0 / ((m - 1) * (m - 2))
    scored = credit.withColumn("betweenness", F.col("raw") * F.lit(norm)).drop("raw")
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
