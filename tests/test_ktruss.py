"""k-truss peeling (graph_metrics.k_truss): hand-built clique/triangle/
pendant graph at several k, cascade peeling, and guards."""

from __future__ import annotations

import pytest

from graphiti_spark.analytics.graph_metrics import k_truss


def _g(spark, pairs):
    return spark.createDataFrame([(str(a), str(b)) for a, b in pairs], ["src", "dst"])


@pytest.fixture(scope="module")
def graph(spark):
    # K4 on 1-4, a triangle 4-5-6 hanging off it, a pendant edge 6-7
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(4, 5), (4, 6), (5, 6)]
    return _g(spark, k4 + tri + [(6, 7)])


def edges_of(df):
    return {(r["a"], r["b"]) for r in df.collect()}


def test_k2_keeps_everything(graph):
    assert len(edges_of(k_truss(graph, k=2))) == 10


def test_k3_drops_pendant_only(graph):
    got = edges_of(k_truss(graph, k=3))
    assert ("6", "7") not in got and len(got) == 9


def test_k4_keeps_only_the_clique(graph):
    got = edges_of(k_truss(graph, k=4))
    assert got == {("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"), ("2", "4"), ("3", "4")}
    # support recomputed on the survivors: every K4 edge sits in 2 triangles
    assert all(r["support"] == 2 for r in k_truss(graph, k=4).collect())


def test_k5_empty(graph):
    assert k_truss(graph, k=5).count() == 0


def test_cascade_peeling(spark):
    # two triangles sharing edge a-b: ab has support 2, the rest 1.
    # k=4 keeps ab in round one, then ab has no triangles left -> empty.
    g = _g(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")])
    assert k_truss(g, k=4).count() == 0
    assert len(edges_of(k_truss(g, k=3))) == 5


def test_k_guard(graph):
    with pytest.raises(ValueError):
        k_truss(graph, k=1)


def _sorted_rows(df):
    return sorted((r["a"], r["b"], r["support"]) for r in df.collect())


def test_delta_parity_on_fixture(spark, graph):
    """k_truss_delta must return IDENTICAL (a, b, support) rows as the
    per-round-recompute k_truss at every k, including the maintained
    support equalling a fresh recount on the survivors."""
    from graphiti_spark.analytics.graph_metrics import k_truss_delta

    for k in (2, 3, 4, 5):
        assert _sorted_rows(k_truss_delta(graph, k=k)) == _sorted_rows(
            k_truss(graph, k=k)
        ), f"mismatch at k={k}"


def test_delta_parity_cascade_and_random(spark):
    from graphiti_spark.analytics.graph_metrics import k_truss_delta

    g = _g(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")])
    for k in (3, 4):
        assert _sorted_rows(k_truss_delta(g, k=k)) == _sorted_rows(k_truss(g, k=k))
    # deterministic pseudo-random graph: 40 nodes, md5-derived edges
    import hashlib

    pairs = []
    for i in range(40):
        for j in range(i + 1, 40):
            h = hashlib.md5(f"{i}-{j}".encode()).hexdigest()
            if int(h[:4], 16) % 7 == 0:
                pairs.append((i, j))
    g2 = _g(spark, pairs)
    for k in (3, 4, 5):
        assert _sorted_rows(k_truss_delta(g2, k=k)) == _sorted_rows(
            k_truss(g2, k=k)
        ), f"random-graph mismatch at k={k}"
