from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphiti_spark.analytics.search import (
    bm25_scores,
    bfs_nodes,
    fulltext_search,
    hybrid_search,
    maximal_marginal_relevance,
    rrf,
    similarity_search,
)


def _docs(spark):
    rows = [
        (1, "spark join shuffle join join"),
        (2, "spark filter scan"),
        (3, "join order by limit"),
        (4, "completely unrelated words here"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_bm25_ranks_tf_and_idf(spark):
    scored = {r["doc_id"]: r["score"] for r in bm25_scores(_docs(spark), "doc_id", "text", ["join"]).collect()}
    assert set(scored) == {1, 3}
    assert scored[1] > scored[3]  # higher tf wins


def test_bm25_formula_exact(spark):
    # doc 2, term 'filter': tf=1, df=1, N=4, dl=3, avgdl=(5+3+4+4)/4=4
    scored = {r["doc_id"]: r["score"] for r in bm25_scores(_docs(spark), "doc_id", "text", ["filter"]).collect()}
    idf = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 3 / 4.0))
    assert abs(scored[2] - expect) < 1e-9


def test_fulltext_search_limit_and_order(spark):
    out = fulltext_search(_docs(spark), "doc_id", "text", "spark join", limit=2).collect()
    assert [r["doc_id"] for r in out] == [1, 3] or out[0]["doc_id"] == 1


def test_similarity_search_topk(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = similarity_search(df, "vec_id", "embedding", [1.0, 0.0], min_score=0.5, limit=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]


def test_rrf_fusion(spark):
    a = spark.createDataFrame([(1, 3.0), (2, 2.0)], "uuid int, score double")
    b = spark.createDataFrame([(2, 9.0), (3, 1.0)], "uuid int, score double")
    out = {r["uuid"]: r["rrf_score"] for r in rrf([a, b], "uuid").collect()}
    # ranks: a: 1->0, 2->1 ; b: 2->0, 3->1 ; const=1
    assert abs(out[2] - (1 / 2 + 1 / 1)) < 1e-9
    assert abs(out[1] - 1.0) < 1e-9
    assert abs(out[3] - 0.5) < 1e-9


def test_bfs_depth(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "source_node_uuid string, target_node_uuid string",
    )
    out = {r["uuid"]: r["depth"] for r in bfs_nodes(edges, ["a"], max_depth=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_mmr_prefers_diverse():
    cands = [("a", [1.0, 0.0]), ("b", [0.99, 0.01]), ("c", [0.6, 0.8])]
    got = maximal_marginal_relevance(cands, [1.0, 0.0], lambda_mult=0.3, limit=2)
    assert got[0] == "a" and got[1] == "c"  # near-duplicate 'b' penalized


def test_hybrid_search_runs(spark):
    docs = _docs(spark).withColumn(
        "embedding", F.array(F.lit(1.0), F.lit(0.0))
    )
    out = hybrid_search(docs, "doc_id", "text", "embedding", "spark join", [1.0, 0.0], limit=3)
    assert out.count() == 3
