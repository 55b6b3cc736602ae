"""Hand-computed expectations for the multinomial-NB quality classifier
(datapipe/nb_classifier.py) — closed-form Laplace odds on a 4-token vocab."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.nb_classifier import (
    nb_classifier_scores,
    train_nb_classifier,
)


@pytest.fixture(scope="module")
def model(spark):
    seed = spark.createDataFrame(
        [
            (1, True, "good good fine"),
            (2, True, "good fine"),
            (3, False, "bad bad ugly"),
            (4, False, "bad ugly"),
        ],
        "doc_id long, label boolean, text string",
    )
    return train_nb_classifier(seed, min_df=2)


def test_model_hand_computed(model):
    # c_pos: good=3 fine=2; c_neg: bad=3 ugly=2; T_pos=T_neg=5, V=4
    odds = {r["token"]: r["log_odds"] for r in model.token_odds.collect()}
    assert odds["good"] == pytest.approx(math.log(4 / 9) - math.log(1 / 9), abs=1e-6)
    assert odds["fine"] == pytest.approx(math.log(3), abs=1e-6)
    assert odds["bad"] == pytest.approx(-math.log(4), abs=1e-6)
    assert odds["ugly"] == pytest.approx(-math.log(3), abs=1e-6)
    # balanced seed: zero prior, zero unseen-token odds
    assert model.prior_log_odds == 0.0
    assert model.default_odds == 0.0
    assert model.vocab_size == 4


def test_scoring_hand_computed(spark, model):
    docs = spark.createDataFrame(
        [
            (10, "good good zz"),  # 2*ln4 + default(0) > 0
            (11, "good bad zz"),  # ln4 - ln4 + 0 = 0 -> NOT kept (strict >)
            (12, "ugly bad"),  # negative
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nb_classifier_scores(docs, model).collect()}
    assert got[10]["log_odds"] == pytest.approx(2 * math.log(4), abs=2e-6)
    assert got[10]["keep"] is True
    assert got[11]["log_odds"] == pytest.approx(0.0, abs=2e-6)
    assert got[11]["keep"] is False
    assert got[12]["keep"] is False
    assert got[10]["n_tokens"] == 3


def test_min_df_prunes_rare_tokens(spark):
    seed = spark.createDataFrame(
        [
            (1, True, "common rareword"),
            (2, True, "common"),
            (3, False, "common"),
            (4, False, "common"),
        ],
        "doc_id long, label boolean, text string",
    )
    m = train_nb_classifier(seed, min_df=2)
    tokens = {r["token"] for r in m.token_odds.collect()}
    assert tokens == {"common"}  # rareword (df=1) dropped from vocab AND totals
    # T_pos=2, T_neg=2, V=1: odds(common)=ln(3/3)-ln(3/3)=0
    assert {r["log_odds"] for r in m.token_odds.collect()} == {0.0}


def test_scoring_plan_shape(spark, model):
    docs = spark.createDataFrame([(1, "good bad")], "doc_id long, text string")
    plan = nb_classifier_scores(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # model never shuffles the corpus


def test_single_class_or_empty_vocab_raise(spark):
    one_class = spark.createDataFrame(
        [(1, True, "a b"), (2, True, "a c")], "doc_id long, label boolean, text string"
    )
    with pytest.raises(ValueError, match="both classes"):
        train_nb_classifier(one_class, min_df=1)
    all_rare = spark.createDataFrame(
        [(1, True, "unique1"), (2, False, "unique2")],
        "doc_id long, label boolean, text string",
    )
    with pytest.raises(ValueError, match="min_df"):
        train_nb_classifier(all_rare, min_df=2)
