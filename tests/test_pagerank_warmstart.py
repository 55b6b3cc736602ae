"""Warm-start PageRank (centrality.pagerank init_ranks): restarting from
a previous snapshot's ranks after a small graph delta converges far
closer than a cold start at equal iterations, and restarting AT the
fixpoint barely moves."""

from __future__ import annotations

import pytest

from graphiti_spark.analytics.centrality import pagerank


def _graph(spark, n=60, extra=()):
    # hub-skewed (webgraph-like): most links land on the 6 hub nodes, so the
    # fixpoint is far from uniform and a cold (uniform) start pays for it
    pairs = [(f"v{i}", f"v{i % 6}") for i in range(6, n)] + [
        (f"v{i}", f"v{(i + 1) % n}") for i in range(0, n, 3)
    ]
    pairs += list(extra)
    return spark.createDataFrame(pairs, ["source_node_uuid", "target_node_uuid"])


def _l1(a, b):
    ka = {r["uuid"]: r["pagerank"] for r in a.collect()}
    kb = {r["uuid"]: r["pagerank"] for r in b.collect()}
    return sum(abs(ka.get(k, 0.0) - kb.get(k, 0.0)) for k in set(ka) | set(kb))


def test_warm_start_from_fixpoint_barely_moves(spark):
    g = _graph(spark)
    ref = pagerank(g, iterations=40)
    moved = _l1(pagerank(g, iterations=2, init_ranks=ref), ref)
    cold = _l1(pagerank(g, iterations=2), ref)
    assert moved < 1e-6
    assert cold > 100 * moved


def test_warm_start_beats_cold_after_delta(spark):
    g0 = _graph(spark)
    snapshot = pagerank(g0, iterations=40)
    # small delta: three new edges, one new node
    g1 = _graph(spark, extra=[("v1", "v50"), ("v9", "vNEW"), ("vNEW", "v0")])
    ref = pagerank(g1, iterations=60)
    warm = _l1(pagerank(g1, iterations=2, init_ranks=snapshot), ref)
    cold = _l1(pagerank(g1, iterations=2), ref)
    # measured ~0.077 vs ~0.295 on this fixture: the warm start launches
    # ~4x closer to the new fixpoint at equal iteration budget
    assert warm < cold / 3


def test_warm_start_vector_is_normalized_and_total_preserved(spark):
    g = _graph(spark)
    # un-normalized init (sums to ~37): output must still be a distribution
    bad_init = pagerank(g, iterations=5).selectExpr(
        "uuid", "pagerank * 37 as pagerank"
    )
    out = pagerank(g, iterations=3, init_ranks=bad_init)
    total = sum(r["pagerank"] for r in out.collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_default_path_unchanged(spark):
    g = _graph(spark)
    a = sorted(map(tuple, pagerank(g, iterations=10).collect()))
    b = sorted(map(tuple, pagerank(g, iterations=10, init_ranks=None).collect()))
    assert a == b
