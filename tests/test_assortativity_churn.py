"""degree_assortativity (analytics/graph_metrics.py) and snapshot_churn
(operators/temporal.py): hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from graphiti_spark.analytics.graph_metrics import degree_assortativity
from graphiti_spark.operators.temporal import snapshot_churn


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_star_is_perfectly_disassortative(spark):
    (row,) = degree_assortativity(
        _edges(spark, [("c", "x1"), ("c", "x2"), ("c", "x3")])
    ).collect()
    assert row["n_edges"] == 3
    assert row["assortativity"] == -1.0


def test_path_p3_hand_value(spark):
    # degrees 1-2-1; orientations (1,2)x2,(2,1)x2 -> r = -0.25/0.25 = -1
    (row,) = degree_assortativity(_edges(spark, [("a", "b"), ("b", "c")])).collect()
    assert row["assortativity"] == -1.0


def test_regular_graph_null_variance(spark):
    # 4-cycle: every degree 2 -> zero variance -> NULL, not a crash
    (row,) = degree_assortativity(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    ).collect()
    assert row["n_edges"] == 4
    assert row["assortativity"] is None


def test_mixed_graph_hand_value(spark):
    # triangle a-b-c plus pendant d on a:
    # degrees a=3, b=2, c=2, d=1; 8 orientation rows (jd,kd):
    # (3,2),(2,3),(2,2),(2,2),(3,2),(2,3),(3,1),(1,3)
    # mean = (3+2+2+2+3+2+3+1)/8 = 2.25
    # E[jk] = (6+6+4+4+6+6+3+3)/8 = 4.75
    # E[j^2] = (9+4+4+4+9+4+9+1)/8 = 5.5
    # r = (4.75 - 2.25^2) / (5.5 - 2.25^2) = -0.3125/0.4375 = -0.714286
    (row,) = degree_assortativity(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")])
    ).collect()
    assert row["n_edges"] == 4
    assert row["assortativity"] == pytest.approx(-0.714286, abs=1e-6)


def test_duplicate_and_reversed_edges_collapse(spark):
    one = degree_assortativity(_edges(spark, [("c", "x1"), ("c", "x2"), ("c", "x3")]))
    two = degree_assortativity(
        _edges(
            spark,
            [("c", "x1"), ("x1", "c"), ("c", "x2"), ("c", "x2"), ("c", "x3")],
        )
    )
    assert one.collect() == two.collect()


@pytest.fixture()
def temporal_edges(spark):
    T = dt.datetime
    rows = [
        # (uuid, name, valid_at, invalid_at)
        ("e1", "WORKS_AT", T(2024, 1, 1), None),            # retained
        ("e2", "WORKS_AT", T(2024, 1, 1), T(2024, 2, 1)),   # removed by t2
        ("e3", "LIKES", T(2024, 1, 20), None),              # added after t1
        ("e4", "LIKES", T(2023, 12, 1), T(2024, 1, 5)),     # gone before t1? no: true at t1=Jan10? invalid Jan5 -> absent both
        ("e5", "WORKS_AT", T(2024, 3, 1), None),            # added after t1
    ]
    return spark.createDataFrame(
        rows, ["uuid", "name", "valid_at", "invalid_at"]
    )


def test_snapshot_churn_hand_checked(temporal_edges):
    got = {
        r["rel"]: (r["n_from"], r["n_to"], r["added"], r["removed"], r["retained"])
        for r in snapshot_churn(
            temporal_edges, "2024-01-10 00:00:00", "2024-03-15 00:00:00"
        ).collect()
    }
    # t1: e1, e2 (WORKS_AT). t2: e1, e5 (WORKS_AT), e3 (LIKES)
    assert got["WORKS_AT"] == (2, 2, 1, 1, 1)
    assert got["LIKES"] == (0, 1, 1, 0, 0)
    assert set(got) == {"WORKS_AT", "LIKES"}
