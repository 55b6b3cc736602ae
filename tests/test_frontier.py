"""Bloom-prefiltered frontier dedup (datapipe/frontier.py): result must be
byte-identical to the plain anti-join (no false negatives), across overlap
shapes and filter sizings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.frontier import bloom_unseen


@pytest.fixture(scope="module")
def sets(spark):
    crawled = spark.range(0, 500).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url")
    )
    # half overlap, half new; extra payload column must ride through
    candidates = spark.range(250, 750).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 2).alias("depth"),
    )
    return crawled, candidates


def test_identical_to_plain_anti_join(sets):
    crawled, candidates = sets
    expect = sorted(
        map(tuple, candidates.join(crawled, "url", "left_anti").collect())
    )
    got = sorted(map(tuple, bloom_unseen(candidates, crawled).collect()))
    assert got == expect
    assert len(got) == 250


def test_tiny_filter_still_exact(sets):
    # grossly undersized bloom (64 bits for 500 keys) -> high fp rate -> everything funnels into
    # the exact anti-join; output unchanged
    crawled, candidates = sets
    got = sorted(
        map(tuple, bloom_unseen(candidates, crawled, m_bits=64).collect())
    )
    expect = sorted(
        map(tuple, candidates.join(crawled, "url", "left_anti").collect())
    )
    assert got == expect


def test_empty_crawled_passes_everything(spark, sets):
    _, candidates = sets
    empty = spark.createDataFrame([], "url string")
    assert bloom_unseen(candidates, empty).count() == candidates.count()


def test_disjoint_sets(spark):
    crawled = spark.createDataFrame([("a",), ("b",)], ["url"])
    cands = spark.createDataFrame([("c",), ("d",)], ["url"])
    assert {r["url"] for r in bloom_unseen(cands, crawled).collect()} == {"c", "d"}


def test_politeness_plan_waves(spark):
    from graphiti_spark.datapipe.frontier import politeness_plan

    rows = [(f"https://a.com/p{i}",) for i in range(5)] + [
        ("https://b.com/x",),
        ("https://b.com/y",),
    ]
    f = spark.createDataFrame(rows, ["url"])
    got = {r["url"]: (r["host"], r["wave"]) for r in politeness_plan(f, slots_per_wave=2).collect()}
    # a.com: 5 urls at 2/wave -> waves 0,0,1,1,2 in url order
    assert got["https://a.com/p0"] == ("a.com", 0)
    assert got["https://a.com/p1"] == ("a.com", 0)
    assert got["https://a.com/p2"] == ("a.com", 1)
    assert got["https://a.com/p4"] == ("a.com", 2)
    # b.com fits in wave 0
    assert got["https://b.com/x"][1] == 0 and got["https://b.com/y"][1] == 0
    # per (host, wave) cap holds
    from collections import Counter
    c = Counter((h, w) for h, w in got.values())
    assert max(c.values()) <= 2


def test_politeness_priority_order(spark):
    from graphiti_spark.datapipe.frontier import politeness_plan

    f = spark.createDataFrame(
        [("https://a.com/low", 1.0), ("https://a.com/high", 9.0)],
        ["url", "rank"],
    )
    got = {r["url"]: r["wave"] for r in politeness_plan(f, slots_per_wave=1, priority_col="rank").collect()}
    assert got["https://a.com/high"] == 0
    assert got["https://a.com/low"] == 1
