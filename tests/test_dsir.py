"""Hand-computed / property tests for DSIR importance resampling
(datapipe/dsir.py): hashed n-gram features, likelihood-ratio weights,
deterministic Gumbel top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.datapipe.dsir import (
    dsir_sample,
    hashed_ngram_features,
    importance_weights,
)


def test_hashed_ngram_features_counts(spark):
    """'a a b' -> unigrams [a, a, b] + bigrams ['a a', 'a b'] = 5 gram
    occurrences over 4 distinct grams; with a huge bucket space the
    distinct grams land in distinct buckets (md5 collision ~0)."""
    docs = spark.createDataFrame([(1, "a a b"), (2, "")], "doc_id long, text string")
    f = hashed_ngram_features(docs, n_buckets=1_000_000_000).collect()
    assert all(r["id"] == 1 for r in f)  # empty doc emits nothing
    assert sum(r["cnt"] for r in f) == 5
    assert len(f) == 4
    # the duplicated unigram 'a' is the only count-2 bucket
    assert sorted(r["cnt"] for r in f) == [1, 1, 1, 2]


def test_importance_weights_favor_target_like_docs(spark):
    raw = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta"),  # shares all grams with target
            (2, "zeta yota qqq"),  # disjoint from target
            (3, ""),  # no tokens -> no weight row
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "alpha beta alpha")], "doc_id long, text string"
    )
    w = {r["id"]: r["log_weight"] for r in importance_weights(raw, target).collect()}
    assert set(w) == {1, 2}
    assert w[1] > w[2]
    # disjoint doc: every gram has t_cnt=0, so its weight is strictly
    # negative (target model assigns only smoothing mass).
    assert w[2] < 0


def test_dsir_sample_deterministic_topk(spark):
    raw = spark.createDataFrame(
        [(i, f"w{i} common common") for i in range(20)], "doc_id long, text string"
    )
    target = spark.createDataFrame([(99, "common common")], "doc_id long, text string")
    w = importance_weights(raw, target)
    s1 = dsir_sample(w, k=5).collect()
    s2 = dsir_sample(w, k=5).collect()
    assert [r["id"] for r in s1] == [r["id"] for r in s2]  # pinned noise
    assert len(s1) == 5
    keys = [r["sample_key"] for r in s1]
    assert keys == sorted(keys, reverse=True)
    # keys really are weight + Gumbel(md5): recompute one row's key
    from graphiti_spark.datapipe.dsir import gumbel_key_col

    row = s1[0]
    expect = (
        w.filter(F.col("id") == row["id"])
        .select(gumbel_key_col(F.col("id"), F.col("log_weight")).alias("k"))
        .collect()[0]["k"]
    )
    assert abs(row["sample_key"] - expect) < 1e-9
