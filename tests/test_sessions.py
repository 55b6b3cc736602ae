"""Hand-computed sessionization cases (operators/sessions.py)."""

from __future__ import annotations

from datetime import datetime

from graphiti_spark.operators.sessions import session_summary, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.utcfromtimestamp(t)) for u, t in rows],
        "user_id long, ts timestamp",
    )


def test_sessionize_gap_splits(spark):
    # user 1: 0s, 100s, 2000s with gap 600 -> sessions [0, 0, 1];
    # user 2: one event -> session 0.
    e = _events(spark, [(1, 0), (1, 100), (1, 2000), (2, 50)])
    got = {
        (r["user_id"], int(r["ts"].timestamp())): r["session_idx"]
        for r in sessionize(e, gap_sec=600).collect()
    }
    assert got == {(1, 0): 0, (1, 100): 0, (1, 2000): 1, (2, 50): 0}


def test_sessionize_exact_gap_continues(spark):
    # strictly-greater rule: a gap of exactly gap_sec stays in-session
    e = _events(spark, [(1, 0), (1, 600), (1, 1201)])
    got = sorted(r["session_idx"] for r in sessionize(e, gap_sec=600).collect())
    assert got == [0, 0, 1]


def test_session_summary(spark):
    # user 1 session 0: events at 0 and 100 -> n=2, duration 100s;
    # session 1: single event -> duration 0.
    e = _events(spark, [(1, 0), (1, 100), (1, 2000)])
    got = {
        (r["user"], r["session_idx"]): r
        for r in session_summary(e, gap_sec=600).collect()
    }
    s0 = got[(1, 0)]
    assert s0["n_events"] == 2 and s0["duration_sec"] == 100.0
    assert s0["start_us"] == 0 and s0["end_us"] == 100_000_000
    assert got[(1, 1)]["n_events"] == 1 and got[(1, 1)]["duration_sec"] == 0.0
