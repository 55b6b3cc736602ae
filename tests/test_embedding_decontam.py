"""Embedding eval-set decontamination (datapipe/decontam.py) — hand-computed
cosines, tie-break contract, zero-norm contract, GEMM/exact path identity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.decontam import embedding_decontam


def _frames(spark):
    ev = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "eval_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (10, [2.0, 0.0]),     # cos 1.0 vs eval 0
            (11, [0.6, 0.8]),     # 0.6 vs eval0, 0.8 vs eval1 -> eval 1
            (12, [-1.0, 0.0]),    # -1 vs eval0, 0 vs eval1 -> max 0.0, eval 1
            (13, [0.0, 0.0]),     # zero norm -> 0.0 everywhere, tie -> eval 0
            (14, [1.0, 1.0]),     # exact tie 1/sqrt(2) both -> lower id, eval 0
        ],
        "doc_id long, embedding array<double>",
    )
    return corpus, ev


EXPECT = {
    10: (1.0, 0, True),
    11: (0.8, 1, False),
    12: (0.0, 1, False),
    13: (0.0, 0, False),
    14: (round(1 / math.sqrt(2), 6), 0, False),
}


@pytest.mark.parametrize("gemm", [False, True])
def test_hand_computed(spark, gemm):
    corpus, ev = _frames(spark)
    got = {
        r["doc_id"]: (r["max_cos"], r["nearest_eval_id"], r["contaminated"])
        for r in embedding_decontam(corpus, ev, threshold=0.95, use_gemm=gemm).collect()
    }
    assert len(got) == 5
    for did, (cos, eid, flag) in EXPECT.items():
        assert got[did][0] == pytest.approx(cos, abs=1e-9), did
        assert got[did][1] == eid, did
        assert got[did][2] == flag, did


def test_gemm_matches_exact_on_corpus(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ev = emb.filter((F.col("vec_id") % 11) == 1).select(
        F.col("vec_id").cast("long").alias("eval_id"), "embedding"
    )
    exact = embedding_decontam(emb, ev, id_col="vec_id").sort("vec_id").collect()
    gemm = (
        embedding_decontam(emb, ev, id_col="vec_id", use_gemm=True)
        .sort("vec_id")
        .collect()
    )
    assert len(exact) == len(gemm) > 0
    for a, b in zip(exact, gemm):
        assert a["vec_id"] == b["vec_id"]
        assert a["max_cos"] == pytest.approx(b["max_cos"], abs=1e-6)
        assert a["nearest_eval_id"] == b["nearest_eval_id"]
        assert a["contaminated"] == b["contaminated"]
