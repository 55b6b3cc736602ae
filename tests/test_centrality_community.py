from __future__ import annotations

from graphiti_spark.analytics.centrality import (
    composite_importance,
    degree_centrality,
    pagerank,
)
from graphiti_spark.analytics.community import build_communities, label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "source_node_uuid string, target_node_uuid string")


def test_degree_counts_distinct_edges(spark):
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "c"), ("c", "a")])
    out = {r["uuid"]: (r["out_degree"], r["in_degree"], r["degree"]) for r in degree_centrality(e).collect()}
    assert out["a"] == (2, 1, 3)
    assert out["b"] == (0, 1, 1)
    assert out["c"] == (1, 1, 2)


def test_pagerank_sums_to_one_and_orders(spark):
    # star: everyone points at 'hub'
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub")])
    ranks = {r["uuid"]: r["pagerank"] for r in pagerank(e, iterations=10).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert ranks["hub"] > ranks["a"] == ranks["b"] == ranks["c"]


def test_pagerank_dangling_modes_identical(spark):
    # 'hub' is dangling (no out-edges): both dangling-mass formulations must
    # produce the exact same ranks (collect is the A/B-only driver-barrier
    # variant, crossjoin the default one-job-per-iteration path).
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("a", "b")])
    cj = {r["uuid"]: r["pagerank"] for r in pagerank(e, iterations=8).collect()}
    co = {
        r["uuid"]: r["pagerank"]
        for r in pagerank(e, iterations=8, dangling_mode="collect").collect()
    }
    assert cj == co
    assert abs(sum(cj.values()) - 1.0) < 1e-9


def test_pagerank_two_cycle_symmetric(spark):
    e = _edges(spark, [("a", "b"), ("b", "a")])
    ranks = {r["uuid"]: r["pagerank"] for r in pagerank(e, iterations=5).collect()}
    assert abs(ranks["a"] - 0.5) < 1e-9 and abs(ranks["b"] - 0.5) < 1e-9


def test_lpa_two_cliques(spark):
    clique1 = [("a", "b"), ("b", "c"), ("a", "c")]
    clique2 = [("x", "y"), ("y", "z"), ("x", "z")]
    bridge = [("c", "x")]
    labels = {r["uuid"]: r["community"] for r in label_propagation(_edges(spark, clique1 + clique2 + bridge)).collect()}
    assert labels["a"] == labels["b"] == labels["c"]
    assert labels["x"] == labels["y"] == labels["z"]


def test_build_communities(spark):
    e = _edges(spark, [("a", "b")])
    labels = label_propagation(e)
    nodes = spark.createDataFrame(
        [("a", "Alice", "g"), ("b", "Bob", "g")], "uuid string, name string, group_id string"
    )
    comm, members = build_communities(labels, nodes, "2025-01-01T00:00:00+00:00")
    assert comm.count() >= 1
    assert members.count() == 2
    assert members.select("name").distinct().collect()[0]["name"] == "HAS_MEMBER"


def test_composite_importance_formula(spark):
    import math

    e = _edges(spark, [("a", "b")])
    deg, pr = degree_centrality(e), pagerank(e, iterations=2)
    bw = deg.selectExpr("uuid", "cast(0.0 as double) as betweenness")
    out = {r["uuid"]: r for r in composite_importance(deg, pr, bw).collect()}
    a = out["a"]
    assert abs(a["importance"] - (0.5 * a["pagerank"] * 1000 + 0.3 * math.log(2) + 0.0)) < 1e-9
