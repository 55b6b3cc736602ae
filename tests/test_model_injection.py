"""End-to-end tests for the real-model injection surfaces (VERDICT r3 #7):
a learned model cannot execute in this sandbox, so each test injects a
NON-TRIVIAL deterministic stand-in through the exact seam a real model
would use and asserts the injected scores drive the decision.

Surfaces under test (README "Plugging in real models"):
  1. ``make_score_pair_udf(config, embed_fn=...)`` — batch name-encoder
     inside the ER pair scorer (the ``model.encode`` seam).
  2. ``entity_catalog(mentions, external_embeddings=...)`` — precomputed
     embedding table replacing the hashed-3-gram column on the
     search/candidates surface.
  3. ``cross_encoder_rerank(..., scorer=<pandas-udf call>)`` — pairwise
     (query, passage) scoring seam in the search orchestrator.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. embed_fn: the ER cosine gate obeys the injected encoder
# ---------------------------------------------------------------------------

# fuzzy("northwind_trading_co", "northwind_traders_co") = 0.85: below the
# 0.9 fuzzy rule, token-Jaccard 0.5 below the 0.95 rule — acceptance hinges
# on (cosine >= 0.92 AND fuzzy >= 0.8). Built-in hashed-3-gram cosine is
# 0.653 (measured) -> rejected; an encoder that maps both names to the same
# unit vector -> cosine 1.0 -> accepted.
_NAME_A = "northwind_trading_co"
_NAME_B = "northwind_traders_co"


def _er_fixture(spark):
    entities = spark.createDataFrame(
        [("g1", "u1", _NAME_A), ("g1", "u2", _NAME_B)],
        "group_id string, entity_uuid string, name_norm string",
    )
    pairs = spark.createDataFrame(
        [("g1", "u1", "u2")], "group_id string, uuid_a string, uuid_b string"
    )
    return entities, pairs


def test_er_default_encoder_rejects_pair(spark):
    from graphiti_spark.operators.er import score_and_filter_pairs

    entities, pairs = _er_fixture(spark)
    assert score_and_filter_pairs(entities, pairs).count() == 0


def test_er_injected_encoder_flips_cosine_gate(spark):
    from graphiti_spark.operators.er import score_and_filter_pairs

    calls: list[list[str]] = []

    def stub_encoder(names: list[str]) -> np.ndarray:
        # a real integration would lazily load a sentence-transformer here
        # (once per worker) and return model.encode(names, normalize=True);
        # the stand-in collapses the trading/traders surface forms the way
        # a learned encoder would.
        calls.append(list(names))
        out = np.zeros((len(names), 4))
        out[:, 0] = 1.0  # every name -> e1: pairwise cosine 1.0
        return out

    entities, pairs = _er_fixture(spark)
    rows = score_and_filter_pairs(entities, pairs, embed_fn=stub_encoder).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["uuid_a"], r["uuid_b"]) == ("u1", "u2")
    assert r["cosine"] == pytest.approx(1.0)
    assert 0.8 <= r["fuzzy"] < 0.9  # the cosine rule, not the fuzzy rule, fired


def test_er_injected_encoder_batches_distinct_names(spark):
    """The seam is batch-shaped: the encoder sees each distinct name once
    per Arrow batch (the memoized-encode contract a real model relies on),
    never one call per pair. Counted with an accumulator — the encoder runs
    in the worker process, so a driver-side list would never see the calls."""
    from graphiti_spark.operators.er import make_score_pair_udf

    n_encoded = spark.sparkContext.accumulator(0)

    def counting_encoder(names):
        n_encoded.add(len(names))
        return np.eye(max(len(names), 1), 8)[: len(names)]

    udf = make_score_pair_udf(embed_fn=counting_encoder)
    # 4 pairs over only 3 distinct names, single partition = one Arrow batch
    df = spark.createDataFrame(
        [("aa", "bb"), ("aa", "cc"), ("bb", "cc"), ("cc", "aa")],
        "norm_a string, norm_b string",
    ).coalesce(1)
    df.select(udf("norm_a", "norm_b")).collect()
    assert n_encoded.value == 3  # aa, bb, cc — deduped before encoding


# ---------------------------------------------------------------------------
# 2. external_embeddings: the catalog column comes from the supplied table
# ---------------------------------------------------------------------------


def test_entity_catalog_external_embedding_table(spark):
    from graphiti_spark.operators.er import entity_catalog

    mentions = spark.createDataFrame(
        [
            ("g1", "e1", "ep1", "Acme Corp"),
            ("g1", "e2", "ep1", "Globex"),
        ],
        "group_id string, entity_uuid string, episode_uuid string, name string",
    )
    # e1 supplied NON-normalized (norm 2.0) — the catalog must renormalize;
    # e2 absent — falls back to the built-in hashed-3-gram embedding.
    ext = spark.createDataFrame(
        [("e1", [2.0, 0.0, 0.0])],
        "entity_uuid string, name_embedding array<float>",
    )
    out = {r["entity_uuid"]: r for r in entity_catalog(mentions, ext).collect()}
    e1 = [round(float(x), 6) for x in out["e1"]["name_embedding"]]
    assert e1 == [1.0, 0.0, 0.0]
    e2 = np.array(out["e2"]["name_embedding"], dtype=np.float64)
    assert len(e2) > 3 and math.isclose(float(np.linalg.norm(e2)), 1.0, rel_tol=1e-5)

    baseline = {
        r["entity_uuid"]: r for r in entity_catalog(mentions).collect()
    }
    assert list(out["e2"]["name_embedding"]) == list(baseline["e2"]["name_embedding"])
    assert list(out["e1"]["name_embedding"]) != list(baseline["e1"]["name_embedding"])


# ---------------------------------------------------------------------------
# 3. cross-encoder: a pandas-UDF pairwise model drives search ordering
# ---------------------------------------------------------------------------


def test_cross_encoder_pandas_udf_scorer(spark):
    from graphiti_spark.analytics.search import cross_encoder_rerank

    def _ce_score_py(passage: str, query: str) -> float:
        """Non-trivial pairwise relevance: logistic over length-damped
        weighted token overlap — the SHAPE of a cross-encoder head (pair
        in, scalar logit out), deterministic so the test can hand-compute
        expectations. Defined as a closure so cloudpickle ships it BY VALUE
        to executors (the test module itself is not importable there)."""
        import math as _m

        pt = passage.lower().split()
        qt = query.lower().split()
        hit = sum((1.0 + _m.log(1 + len(t))) for t in qt if t in set(pt))
        logit = 2.0 * hit - 0.1 * len(pt) - 1.0
        return 1.0 / (1.0 + _m.exp(-logit))

    @F.pandas_udf("double")
    def ce_udf(passage: pd.Series, query: pd.Series) -> pd.Series:
        # a real integration loads the cross-encoder lazily per worker and
        # returns model.predict(list(zip(query, passage))) — same seam,
        # same batch shape.
        return pd.Series([_ce_score_py(p or "", q or "") for p, q in zip(passage, query)])

    table = spark.createDataFrame(
        [
            ("d1", "the quarterly revenue report for acme"),
            ("d2", "acme revenue grew this quarter on strong demand"),
            ("d3", "weather was mild in the north this quarter"),
        ],
        "uuid string, fact string",
    )
    results = table.select("uuid", F.lit(1.0).alias("score"))
    query = "acme revenue"
    ranked = cross_encoder_rerank(
        results,
        table,
        "uuid",
        "fact",
        query,
        scorer=lambda text_col, q: ce_udf(text_col, F.lit(q)),
    ).collect()
    got = [r["uuid"] for r in ranked]
    want = sorted(
        ["d1", "d2", "d3"],
        key=lambda u: -_ce_score_py(
            dict((r["uuid"], r["fact"]) for r in table.collect())[u], query
        ),
    )
    assert got == want
    # and the injected model's exact scores surface in the output
    by_id = {r["uuid"]: r for r in ranked}
    assert by_id["d2"]["ce_score"] == pytest.approx(
        _ce_score_py("acme revenue grew this quarter on strong demand", query)
    )
