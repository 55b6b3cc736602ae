"""Effective-diameter BFS curve (graph_metrics.effective_diameter):
hand-checked on a path graph and a star, early stop, determinism."""

from __future__ import annotations

import pytest

from graphiti_spark.analytics.graph_metrics import effective_diameter


def test_path_graph_curve(spark):
    # path a-b-c-d, all 4 nodes as seeds: reached-at-hop counts are exact:
    # hop0: 4 pairs (self), hop1: 2+2+2... ends: a reaches b; b reaches a,c;
    # c reaches b,d; d reaches c -> 6; hop2: a->c, b->d, c->a, d->b -> 4;
    # hop3: a->d, d->a -> 2. total 16 = 4*4 pairs, cum_frac hits 1.0
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    rows = {r["hop"]: (r["reached"], r["cum_frac"]) for r in effective_diameter(edges, n_seeds=4, max_hops=10).collect()}
    assert rows[0] == (4, 0.25)
    assert rows[1] == (6, 0.625)
    assert rows[2] == (4, 0.875)
    assert rows[3] == (2, 1.0)
    assert 4 not in rows  # early stop at the exact diameter


def test_star_diameter_two(spark):
    edges = spark.createDataFrame(
        [("c", "x1"), ("c", "x2"), ("c", "x3")], ["src", "dst"]
    )
    rows = {r["hop"]: r["cum_frac"] for r in effective_diameter(edges, n_seeds=4, max_hops=10).collect()}
    assert max(rows) == 2  # leaf-to-leaf via the hub
    assert rows[2] == 1.0


def test_seed_subset_deterministic(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], ["src", "dst"]
    )
    a = [tuple(r) for r in effective_diameter(edges, n_seeds=3, max_hops=5).collect()]
    b = [tuple(r) for r in effective_diameter(edges, n_seeds=3, max_hops=5).collect()]
    assert a == b
    assert len(a) == 6  # hops 0..5, chain not exhausted


def test_validation(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        effective_diameter(edges, n_seeds=0)


def test_degree_distribution_hand_checked(spark):
    from graphiti_spark.analytics.graph_metrics import degree_distribution

    # star c-x1..x3 plus edge x1-x2: degrees c=3, x1=2, x2=2, x3=1
    edges = spark.createDataFrame(
        [("c", "x1"), ("c", "x2"), ("c", "x3"), ("x1", "x2")], ["src", "dst"]
    )
    got = {r["degree"]: (r["n_nodes"], r["n_ge"]) for r in degree_distribution(edges).collect()}
    assert got == {3: (1, 1), 2: (2, 3), 1: (1, 4)}
