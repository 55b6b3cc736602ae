"""TextRank keywords (datapipe/textanalysis.textrank_keywords) vs an
independent pure-Python reference implementation (same rounded-fixpoint
rule), plus structural gates."""

from __future__ import annotations

import pytest

from graphiti_spark.datapipe.textanalysis import TEXTRANK_STOP, textrank_keywords


def _ref_textrank(text, window=2, n_iter=5, d=0.85, min_len=3, round_dp=6):
    toks = [
        t
        for t in text.lower().split()
        if t and len(t) >= min_len and t not in TEXTRANK_STOP
    ]
    edges = set()
    for off in range(1, window + 1):
        for i in range(len(toks) - off):
            a, b = toks[i], toks[i + off]
            if a != b:
                edges.add((min(a, b), max(a, b)))
    nodes = sorted(set(toks))
    nbrs = {n: set() for n in nodes}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    r = {n: 1.0 for n in nodes}
    for _ in range(n_iter):
        nr = {}
        for v in nodes:
            s = sum(r[u] / len(nbrs[u]) for u in nbrs[v])
            nr[v] = round((1 - d) + d * s, round_dp)
        r = nr
    return r


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark engine runs spark jobs fast engine"),
        (2, "graph nodes link graph edges while graph metrics count nodes"),
        (3, "the of and to"),  # all stopwords -> no keywords
        (4, "solo"),  # one content word, no edges -> settles at 1-d
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_matches_independent_reference(docs):
    got = {}
    for r in textrank_keywords(docs, k=100).collect():
        got.setdefault(r["id"], {})[r["token"]] = r["score"]
    for doc_id, text in [(1, docs.collect()[0]["text"]), (2, docs.collect()[1]["text"])]:
        ref = _ref_textrank(text)
        assert got[doc_id] == pytest.approx(ref), f"doc {doc_id}"


def test_stopword_doc_and_isolated_vertex(docs):
    rows = {(r["id"], r["token"]): r["score"] for r in textrank_keywords(docs, k=10).collect()}
    assert not any(i == 3 for i, _ in rows)
    assert rows[(4, "solo")] == pytest.approx(0.15)


def test_topk_and_deterministic_order(docs):
    a = [tuple(r) for r in textrank_keywords(docs, k=2).orderBy("id", "rank").collect()]
    b = [tuple(r) for r in textrank_keywords(docs, k=2).orderBy("id", "rank").collect()]
    assert a == b
    per_doc = {}
    for id_, token, rank, score in a:
        per_doc.setdefault(id_, []).append((rank, score))
    for ranks in per_doc.values():
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        scores = [s for _, s in ranks]
        assert scores == sorted(scores, reverse=True)
