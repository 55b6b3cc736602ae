"""S6 — large-star/small-star CC must reproduce the reference union-find:
canonical = lexicographically smallest uuid in the component
(bulk_utils.py:449-486, tie-break :464-468)."""

from __future__ import annotations

import random
from dataclasses import replace

from graphiti_spark.config import DEFAULT_CONFIG
from graphiti_spark.operators.components import connected_components

# Force the distributed large-star/small-star path (the driver union-find
# fast path engages under cc_driver_threshold edges otherwise).
DIST_CFG = replace(DEFAULT_CONFIG, cc_driver_threshold=0)


def _reference_union_find(pairs):
    """Reference semantics twin (compress_uuid_map): min-uuid root."""
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        small, big = min(ra, rb), max(ra, rb)
        parent[big] = small

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent if find(x) != x}


def _run(spark, pairs, config=DIST_CFG):
    df = spark.createDataFrame([(a, b, "g") for a, b in pairs], "uuid_a string, uuid_b string, group_id string")
    return {r["uuid"]: r["canonical_uuid"] for r in connected_components(df, config).collect()}


def test_chain(spark):
    got = _run(spark, [("b", "c"), ("a", "b"), ("c", "d")])
    assert got == {"b": "a", "c": "a", "d": "a"}


def test_two_components_min_uuid_root(spark):
    got = _run(spark, [("x2", "x9"), ("x9", "x5"), ("a2", "a1")])
    assert got == {"x9": "x2", "x5": "x2", "a2": "a1"}


def test_star_and_cycle(spark):
    got = _run(spark, [("m", "n"), ("n", "o"), ("o", "m")])
    assert got == {"n": "m", "o": "m"}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = [f"u{i:03d}" for i in range(60)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run(spark, pairs) == _reference_union_find(pairs)


def test_empty(spark):
    assert _run(spark, []) == {}


def test_driver_path_matches_distributed_path(spark):
    """Hybrid execution parity: the driver union-find fast path and the
    large-star/small-star loop must emit the identical uuid_map."""
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(80)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(100)]
    pairs = [(a, b) for a, b in pairs if a != b]
    driver = _run(spark, pairs, DEFAULT_CONFIG)  # threshold engages
    dist = _run(spark, pairs, DIST_CFG)
    assert driver == dist == _reference_union_find(pairs)


def test_empty_driver_path(spark):
    assert _run(spark, [], DEFAULT_CONFIG) == {}
