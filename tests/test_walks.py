"""Random-walk generation (analytics/walks.py): hand-checkable topology
(chain, dead-end, fan-out), determinism, uniform hash-min choice over a
known neighborhood, and the sentence packing."""

from __future__ import annotations

import hashlib

import pytest

from graphiti_spark.analytics.walks import random_walks, walk_sentences


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, t) for s, t in pairs], ["source_node_uuid", "target_node_uuid"]
    )


def test_chain_walks_deterministic_path(spark):
    # a -> b -> c -> d: only one walk possible from each node
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {
        (r["walk_id"], r["step"]): r["node"]
        for r in random_walks(e, walk_len=3).collect()
    }
    assert got[("a#0", 0)] == "a"
    assert got[("a#0", 1)] == "b"
    assert got[("a#0", 2)] == "c"
    assert got[("a#0", 3)] == "d"
    # d has no out-edges: no walk starts there, and c's walk stops at d
    assert got[("c#0", 1)] == "d" and ("c#0", 2) not in got
    assert not any(w.startswith("d#") for w, _ in got)


def test_hash_min_choice_matches_reference(spark):
    # star: s -> {n1, n2, n3}; step-1 pick must be argmin of the md5 key
    e = _edges(spark, [("s", "n1"), ("s", "n2"), ("s", "n3")])
    (row,) = random_walks(e, walk_len=1).filter("step = 1").collect()

    def key(dst):
        raw = "\x1f".join(["s#0", "walk:1", dst])
        return int(hashlib.md5(raw.encode()).hexdigest()[:15], 16)

    expect = min(["n1", "n2", "n3"], key=key)
    assert row["node"] == expect


def test_walks_per_node_and_divergence(spark):
    # with enough fan-out, independent walk ids pick different neighbors
    e = _edges(spark, [("s", f"n{i}") for i in range(16)])
    got = {
        r["walk_id"]: r["node"]
        for r in random_walks(e, walk_len=1, walks_per_node=8)
        .filter("step = 1")
        .collect()
    }
    assert len(got) == 8
    assert len(set(got.values())) > 1  # md5 over 8 walks x 16 targets must split


def test_deterministic_across_runs(spark):
    e = _edges(spark, [(f"v{i}", f"v{(i * 3 + 1) % 20}") for i in range(20)])
    a = sorted(map(tuple, random_walks(e, walk_len=4, walks_per_node=2).collect()))
    b = sorted(map(tuple, random_walks(e, walk_len=4, walks_per_node=2).collect()))
    assert a == b


def test_walk_sentences_ordered(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    rows = {
        r["walk_id"]: r["sentence"]
        for r in walk_sentences(random_walks(e, walk_len=2)).collect()
    }
    assert rows["a#0"] == ["a", "b", "c"]
    assert rows["b#0"] == ["b", "c"]


def test_self_loops_excluded(spark):
    e = _edges(spark, [("a", "a"), ("a", "b")])
    got = {r["step"]: r["node"] for r in random_walks(e, walk_len=1).collect()}
    assert got == {0: "a", 1: "b"}
