"""S8 — bi-temporal contradiction window
(edge_operations.py:425-455 + :552-566 semantics in batch form)."""

from __future__ import annotations

from datetime import datetime, timezone

from graphiti_spark.operators.temporal import invalidate_contradictions


def _ts(s):
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows,
        "group_id string, source_node_uuid string, target_node_uuid string, "
        "name string, valid_at timestamp, invalid_at timestamp",
    )
    out = invalidate_contradictions(df).collect()
    return {(r["target_node_uuid"]): (r["invalid_at"], r["expired_at"]) for r in out}


def test_later_fact_invalidates_earlier(spark):
    got = _run(
        spark,
        [
            ("g", "s", "nestly", "OWNS", _ts("2024-01-01T12:00:00"), None),
            ("g", "s", "firmly", "OWNS", _ts("2024-03-01T12:00:00"), None),
        ],
    )
    inv, exp = got["nestly"]
    assert inv == _ts("2024-03-01T12:00:00").replace(tzinfo=None)
    assert exp is not None  # system expiry stamped
    assert got["firmly"] == (None, None)  # newest stays open


def test_already_closed_interval_keeps_earlier_bound(spark):
    got = _run(
        spark,
        [
            ("g", "s", "o1", "OWNS", _ts("2024-01-01T00:00:00"), _ts("2024-02-01T00:00:00")),
            ("g", "s", "o2", "OWNS", _ts("2024-03-01T00:00:00"), None),
        ],
    )
    inv, exp = got["o1"]
    # interval already disjoint from the contradiction -> untouched (skip rule)
    assert inv == _ts("2024-02-01T00:00:00").replace(tzinfo=None)
    assert exp is None


def test_different_predicates_do_not_contradict(spark):
    got = _run(
        spark,
        [
            ("g", "s", "o1", "OWNS", _ts("2024-01-01T00:00:00"), None),
            ("g", "s", "o2", "LIKES", _ts("2024-02-01T00:00:00"), None),
        ],
    )
    assert got["o1"] == (None, None)
    assert got["o2"] == (None, None)


def test_different_subjects_do_not_contradict(spark):
    got = _run(
        spark,
        [
            ("g", "s1", "o1", "OWNS", _ts("2024-01-01T00:00:00"), None),
            ("g", "s2", "o2", "OWNS", _ts("2024-02-01T00:00:00"), None),
        ],
    )
    assert got["o1"] == (None, None)


def test_three_way_chain(spark):
    got = _run(
        spark,
        [
            ("g", "s", "o1", "OWNS", _ts("2024-01-01T00:00:00"), None),
            ("g", "s", "o2", "OWNS", _ts("2024-02-01T00:00:00"), None),
            ("g", "s", "o3", "OWNS", _ts("2024-03-01T00:00:00"), None),
        ],
    )
    assert got["o1"][0] == _ts("2024-02-01T00:00:00").replace(tzinfo=None)
    assert got["o2"][0] == _ts("2024-03-01T00:00:00").replace(tzinfo=None)
    assert got["o3"] == (None, None)


def test_graph_at_hand_computed(spark):
    """Bi-temporal slice: per (user, pred) timeline a-t1 -> b-t3; at t2 only
    the a edge is true; at t4 only b; tx axis hides rows created later."""
    from graphiti_spark.operators.temporal import graph_at, invalidate_contradictions

    rows = [
        # group, src, pred, obj, valid_at, invalid_at, created_at
        ("g", "u1", "OWNS", "a", "2024-01-01", None, "2024-01-02"),
        ("g", "u1", "OWNS", "b", "2024-01-10", None, "2024-01-11"),
        ("g", "u2", "OWNS", "c", "2024-02-01", None, "2024-02-02"),
    ]
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        rows,
        "group_id string, source_node_uuid string, name string, "
        "target_node_uuid string, valid_at string, invalid_at string, created_at string",
    ).select(
        "group_id",
        "source_node_uuid",
        "name",
        "target_node_uuid",
        F.to_timestamp("valid_at").alias("valid_at"),
        F.to_timestamp("invalid_at").alias("invalid_at"),
        F.to_timestamp("created_at").alias("created_at"),
    )
    inv = invalidate_contradictions(edges)  # a closed at b's valid_at
    at = lambda t, **kw: sorted(
        r["target_node_uuid"] for r in graph_at(inv, t, **kw).collect()
    )
    assert at("2024-01-05") == ["a"]
    assert at("2024-01-15") == ["b"]
    assert at("2024-02-05") == ["b", "c"]
    assert at("2023-12-01") == []
    # tx axis: on 2024-01-01 the 'a' row wasn't recorded yet
    assert at("2024-01-05", tx_time="2024-01-01") == []
    assert at("2024-01-05", tx_time="2024-01-03") == ["a"]
