"""Structural guarantees of winnowing fingerprints (datapipe/winnowing.py):
the Schleimer 2003 match guarantee, short-doc emptiness, determinism, and
the df-capped pair join."""

from __future__ import annotations

import pytest


def _fps(spark, rows, k=3, window=4):
    from graphiti_spark.datapipe.winnowing import winnow_fingerprints

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in winnow_fingerprints(df, k=k, window=window).collect():
        out.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    return out


def test_winnowing_match_guarantee(spark):
    """Any shared run of >= window + k - 1 = 6 tokens shares a fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"{shared} nine ten eleven twelve"),
        (3, "totally different words with no overlap at all here"),
    ]
    got = _fps(spark, rows)
    assert got[1] & got[2]  # guarantee: non-empty intersection
    assert not (got[1] & got[3])


def test_winnowing_short_doc_and_determinism(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e f"), (3, "a b c d e f")]
    got = _fps(spark, rows)  # k=3, window=4 -> needs >= 6 tokens
    assert 1 not in got  # 5 tokens: no full window
    assert got[2] == got[3]  # pure function of text


def test_winnow_pairs_planted_overlap_and_df_cap(spark):
    from graphiti_spark.datapipe.winnowing import winnow_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    boiler = "subscribe to our newsletter now please thanks"
    rows = (
        [(1, f"{shared} unique one xx"), (2, f"{shared} unique two yy")]
        + [(10 + i, f"{boiler} filler{i} a{i} b{i} c{i}") for i in range(30)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in winnow_pairs(df, k=3, window=4, df_cap=10, min_shared=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    # the 30-doc boilerplate fingerprints exceed df_cap=10 and are dropped:
    # no pair among docs 10..39 unless their unique tails collide (they don't)
    assert not any(a >= 10 and b >= 10 for (a, b) in pairs)
