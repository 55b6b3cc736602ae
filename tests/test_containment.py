"""Broder containment pairs (datapipe/dedup.containment_pairs): the
asymmetric subset-document detector."""

from __future__ import annotations

import pytest

from graphiti_spark.datapipe.dedup import containment_pairs, ngram_jaccard_pairs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "intro words alpha beta gamma delta outro tail more words here now"),
        (3, "completely different content about other topics entirely today"),
        (4, "alpha beta gamma delta"),  # exact twin of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_subset_doc_detected_despite_low_jaccard(docs):
    got = {
        (r["id_a"], r["id_b"]): (
            r["cont_a_in_b"],
            r["cont_b_in_a"],
            r["jaccard"],
        )
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    # doc1's 3 bigrams all appear in doc2 -> containment 1.0, J = 3/11
    ca, cb, j = got[(1, 2)]
    assert ca == 1.0
    assert cb == pytest.approx(3 / 11)
    assert j == pytest.approx(3 / 11)
    # the symmetric exact twin
    assert got[(1, 4)] == (1.0, 1.0, 1.0)
    # doc3 pairs with nothing
    assert not any(3 in p for p in got)
    # Jaccard at the same threshold would MISS the embedded-article pair
    jp = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert (1, 2) not in jp and (1, 4) in jp


def test_direction_tells_which_side_is_subset(docs):
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    r = rows[(1, 2)]
    assert r["cont_a_in_b"] > r["cont_b_in_a"]  # doc1 is the subset
