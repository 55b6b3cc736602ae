"""Hand-computed expectations for PMI collocations and TF-IDF keywords
(datapipe/textanalysis.py) and anchor-text aggregation (datapipe/webgraph.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_pmi_collocations_hand_computed(spark):
    from graphiti_spark.datapipe.textanalysis import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    # pairs: (a,b)x2 (b,a) (a,c); N_b=4; unigrams a:3 b:2 c:1, N_u=6
    rows = pmi_collocations(docs, min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["pair_count"]) == ("a", "b", 2)
    # pmi = ln((2/4) / ((3/6)*(2/6))) = ln 3
    assert r["pmi"] == pytest.approx(math.log(3), abs=1e-6)


def test_pmi_min_count_keeps_all_at_one(spark):
    from graphiti_spark.datapipe.textanalysis import pmi_collocations

    docs = spark.createDataFrame([(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    got = {(r["w1"], r["w2"]): r["pair_count"] for r in pmi_collocations(docs, min_count=1).collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}


def test_tfidf_keywords_hand_computed(spark):
    from graphiti_spark.datapipe.textanalysis import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "y q")], "doc_id long, text string"
    )
    out = tfidf_keywords(docs, k=5, min_df=2).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    idf = math.log(4 / 3) + 1
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [(r["token"], r["tf"], r["rank"]) for r in d1] == [("x", 2, 1), ("y", 1, 2)]
    assert d1[0]["score"] == pytest.approx(round(2 * idf, 6), abs=1e-9)
    # z and q have df=1 < min_df: excluded entirely
    assert [(r["token"], r["rank"]) for r in by_doc[2]] == [("x", 1)]
    assert [(r["token"], r["rank"]) for r in by_doc[3]] == [("y", 1)]


def test_tfidf_k_truncates_and_ties_break_by_token(spark):
    from graphiti_spark.datapipe.textanalysis import tfidf_keywords

    # all four tokens share df=2 and tf=1 -> equal scores, rank by token asc
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = tfidf_keywords(docs, k=2, min_df=2)
    got = {(r["doc_id"], r["rank"]): r["token"] for r in out.collect()}
    assert got == {(1, 1): "a", (1, 2): "b", (2, 1): "a", (2, 2): "b"}


def test_anchor_text_stats_hand_computed(spark):
    from graphiti_spark.datapipe.webgraph import anchor_text_stats

    html = (
        '<p>x</p><a href="https://h1.com/x">Alpha</a>'
        '<a href="/p">Beta</a><a href="#frag">Gamma</a>'
        '<a href="https://h1.com/y">Alpha</a><a href="/q"> </a>'
    ).encode()
    pages = spark.createDataFrame(
        [("https://src.com/a", bytearray(html))], "url string, html binary"
    )
    got = {(r["dst_host"], r["anchor"]): r["n"] for r in anchor_text_stats(pages).collect()}
    # fragment href unresolvable -> dropped; whitespace-only anchor dropped
    assert got == {("h1.com", "Alpha"): 2, ("src.com", "Beta"): 1}
