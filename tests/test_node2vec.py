"""node2vec biased walks (analytics/walks.node2vec_walks): determinism,
edge-following, and the three bias regimes measured on 50 independent
3-node gadgets (exact deterministic outcomes given the md5 draws, but
asserted statistically so the test doesn't pin hash values)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.analytics.walks import node2vec_walks


def _chains(spark, n=50, with_common=False):
    """n independent gadgets: t_i -> u_i, u_i -> {t_i (return), x_i, y_i};
    when with_common, also t_i -> x_i so x_i is distance-1 from t_i."""
    rows = []
    for i in range(n):
        t, u, x, y = f"t{i}", f"u{i}", f"x{i}", f"y{i}"
        rows += [(t, u), (u, t), (u, x), (u, y)]
        if with_common:
            rows.append((t, x))
    return spark.createDataFrame(rows, ["source_node_uuid", "target_node_uuid"])


def _step2_from_t(walks, n=50):
    """The step-2 node of each walk that started at t_i and moved to u_i."""
    w = {(r["walk_id"], r["step"]): r["node"] for r in walks.collect()}
    out = {}
    for i in range(n):
        wid = f"t{i}#0"
        if w.get((wid, 1)) == f"u{i}" and (wid, 2) in w:
            out[i] = w[(wid, 2)]
    return out


def test_deterministic_and_follows_edges(spark):
    edges = _chains(spark, 10)
    a = sorted(map(tuple, node2vec_walks(edges, walk_len=3).collect()))
    b = sorted(map(tuple, node2vec_walks(edges, walk_len=3).collect()))
    assert a == b
    adj = {(r[0], r[1]) for r in edges.collect()}
    byw = {}
    for wid, step, node in a:
        byw.setdefault(wid, {})[step] = node
    for steps in byw.values():
        for s in range(1, max(steps)):
            if s in steps and s + 1 in steps:
                assert (steps[s], steps[s + 1]) in adj


def test_return_bias(spark):
    # from u with prev=t: candidates t (return), x, y (far). 64:1:1
    # tickets -> return picked w.p. 64/66; over ~50 gadgets expect >> half
    edges = _chains(spark, 50)
    walks = node2vec_walks(
        edges, walk_len=2, return_tickets=64, common_tickets=1, far_tickets=1
    )
    s2 = _step2_from_t(walks)
    assert len(s2) == 50  # t's only neighbor is u, so every walk qualifies
    returns = sum(1 for i, n in s2.items() if n == f"t{i}")
    assert returns >= 40


def test_exploration_bias(spark):
    # far_tickets dominant -> x/y picked, return rare
    edges = _chains(spark, 50)
    walks = node2vec_walks(
        edges, walk_len=2, return_tickets=1, common_tickets=1, far_tickets=64
    )
    s2 = _step2_from_t(walks)
    far = sum(1 for i, n in s2.items() if n in (f"x{i}", f"y{i}"))
    assert far >= 45


def test_distance1_bias(spark):
    # with t->x present, x is distance-1; common_tickets dominant -> x wins
    edges = _chains(spark, 50, with_common=True)
    walks = node2vec_walks(
        edges, walk_len=2, return_tickets=1, common_tickets=64, far_tickets=1
    )
    s2 = _step2_from_t(walks)
    # only count walks whose step1 went t->u (t now has 2 out-edges)
    assert len(s2) > 10
    common = sum(1 for i, n in s2.items() if n == f"x{i}")
    assert common / len(s2) >= 0.7


def test_ticket_validation(spark):
    edges = _chains(spark, 2)
    with pytest.raises(ValueError):
        node2vec_walks(edges, far_tickets=0)
