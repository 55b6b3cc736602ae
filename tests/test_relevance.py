"""RelevanceScorer feedback-loop tests (reference: relevance/scorer.py,
relevance/models.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphiti_spark.analytics.relevance import (
    combine_scores_col,
    effective_score_col,
    empty_feedback,
    filter_relevant,
    heuristic_relevance_col,
    update_feedback,
)


def test_heuristic_score_formula(spark):
    df = spark.createDataFrame(
        [("m1", "spark join filter operations"), ("m2", "completely unrelated prose")],
        "memory_id string, content string",
    )
    out = {
        r["memory_id"]: r["s"]
        for r in df.select(
            "memory_id", heuristic_relevance_col("spark join", "content").alias("s")
        ).collect()
    }
    # m1: jaccard({spark,join},{spark,join,filter,operations}) = 2/4
    assert abs(out["m1"] - (0.3 + 0.4 * 0.5)) < 1e-9
    # m2: jaccard 0 -> 0.3
    assert abs(out["m2"] - 0.3) < 1e-9


def test_heuristic_response_boost(spark):
    df = spark.createDataFrame([("m1", "alpha beta")], "memory_id string, content string")
    out = df.select(
        heuristic_relevance_col(
            "alpha", "content", response_col=F.lit("i used alpha beta in my answer")
        ).alias("s")
    ).collect()[0]["s"]
    # jaccard({alpha},{alpha,beta}) = 1/2 -> 0.5; +0.2 boost = 0.7
    assert abs(out - 0.7) < 1e-9


def test_combine_scores_renormalizes(spark):
    df = spark.createDataFrame([(1,)], "x int")
    # only semantic (0.4) + keyword (0.3) present -> weights 4/7, 3/7
    got = df.select(
        combine_scores_col(semantic=F.lit(0.7), keyword=F.lit(0.0)).alias("c")
    ).collect()[0]["c"]
    assert abs(got - 0.7 * (0.4 / 0.7)) < 1e-9


def test_feedback_ema_and_decay(spark):
    fb = empty_feedback(spark)
    s1 = spark.createDataFrame([("m", 0.8)], "memory_id string, score double")
    fb = update_feedback(fb, s1, "2024-01-01 00:00:00")
    r = fb.collect()[0]
    assert r["avg_relevance"] == 0.8 and r["usage_count"] == 1  # first score initializes
    assert abs(r["decay_factor"] - 1.0) < 1e-9

    s2 = spark.createDataFrame([("m", 0.2)], "memory_id string, score double")
    fb = update_feedback(fb, s2, "2024-01-31 00:00:00")
    r = fb.collect()[0]
    assert abs(r["avg_relevance"] - (0.3 * 0.2 + 0.7 * 0.8)) < 1e-9  # EMA alpha=0.3
    assert r["usage_count"] == 2

    # a round that doesn't touch m: stats keep, decay advances 30 days
    other = spark.createDataFrame([("x", 0.5)], "memory_id string, score double")
    fb = update_feedback(fb, other, "2024-03-01 00:00:00")
    rows = {r["memory_id"]: r for r in fb.collect()}
    m = rows["m"]
    assert m["usage_count"] == 2
    expected_decay = math.exp(-0.693 * 30.0 / 30.0)  # ~half after one half-life
    assert abs(m["decay_factor"] - expected_decay) < 1e-6
    assert abs(
        m["avg_relevance"] * m["decay_factor"]
        - fb.filter("memory_id = 'm'").select(effective_score_col().alias("e")).collect()[0]["e"]
    ) < 1e-9


def test_filter_relevant_threshold(spark):
    fb = spark.createDataFrame(
        [("hi", 0.9, 1, None, 1.0), ("lo", 0.2, 1, None, 1.0)],
        "memory_id string, avg_relevance double, usage_count long, last_accessed timestamp, decay_factor double",
    )
    kept = {r["memory_id"] for r in filter_relevant(fb, 0.3).collect()}
    assert kept == {"hi"}
