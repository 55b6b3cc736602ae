"""Hand-computed cases for datapipe/spandedup.repeated_span_dedup (the
ExactSubstr k-gram analog). Every expectation derived in comments."""

from __future__ import annotations

import pytest

from graphiti_spark.datapipe.spandedup import repeated_span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_document_span_removed_keeper_kept(spark):
    # k=3. d1 = "a b c d e f", d2 = "x y a b c d w".
    # d1 grams: abc bcd cde def; d2 grams: xya yab abc bcd cdw.
    # Duplicated: abc (d1@0 keeper, d2@2), bcd (d1@1 keeper, d2@3).
    # d2 dup starts {2, 3} cover positions 2..4 U 3..5 = {2,3,4,5}
    # -> "a b c d" removed from d2, kept "x y w"; d1 untouched.
    out = {
        r["doc_id"]: r
        for r in repeated_span_dedup(
            _docs(spark, [(1, "a b c d e f"), (2, "x y a b c d w")]), k=3
        ).collect()
    }
    assert out[1]["text_dedup"] == "a b c d e f" and out[1]["n_removed"] == 0
    assert out[2]["text_dedup"] == "x y w"
    assert out[2]["n_tokens"] == 7 and out[2]["n_removed"] == 4


def test_within_document_repeat_collapsed_to_first_copy(spark):
    # "p q r" repeated 3x, k=3: dup gram starts are 3,4,5,6 (pos 0,1,2 are
    # the keepers of pqr/qrp/rpq), covering positions 3..8 -> kept "p q r".
    out = repeated_span_dedup(_docs(spark, [(1, "p q r p q r p q r")]), k=3).collect()[0]
    assert out["text_dedup"] == "p q r"
    assert out["n_tokens"] == 9 and out["n_removed"] == 6


def test_repeats_shorter_than_k_survive(spark):
    # "z z" has no 3-grams: the one-sided approximation keeps short repeats.
    out = repeated_span_dedup(_docs(spark, [(1, "z z"), (2, "z z")]), k=3).collect()
    assert all(r["text_dedup"] == "z z" and r["n_removed"] == 0 for r in out)


def test_keeper_is_global_lexicographic_minimum(spark):
    # identical docs: doc 1 (lowest id) keeps everything, docs 2 and 3 are
    # fully covered -> empty output text.
    rows = [(i, "m n o q") for i in (3, 1, 2)]
    out = {r["doc_id"]: r for r in repeated_span_dedup(_docs(spark, rows), k=4).collect()}
    assert out[1]["text_dedup"] == "m n o q" and out[1]["n_removed"] == 0
    assert out[2]["text_dedup"] == "" and out[2]["n_removed"] == 4
    assert out[3]["text_dedup"] == "" and out[3]["n_removed"] == 4


def test_empty_and_short_documents_pass_through(spark):
    out = {
        r["doc_id"]: r
        for r in repeated_span_dedup(
            _docs(spark, [(1, ""), (2, "only two"), (3, "   ")]), k=3
        ).collect()
    }
    assert out[1]["n_tokens"] == 0 and out[1]["text_dedup"] == ""
    assert out[2]["text_dedup"] == "only two" and out[2]["n_removed"] == 0
    assert out[3]["n_tokens"] == 0


def test_k_validation(spark):
    with pytest.raises(ValueError):
        repeated_span_dedup(_docs(spark, [(1, "a b")]), k=1)
