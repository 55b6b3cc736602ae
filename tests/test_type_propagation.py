"""Type propagation (operators/entity_types.propagate_types): hand
fixtures for plurality, clamping, tie-break, hop counting, early stop."""

from __future__ import annotations

import pytest

from graphiti_spark.operators.entity_types import propagate_types


def _e(spark, pairs):
    return spark.createDataFrame(pairs, ["source_node_uuid", "target_node_uuid"])


def _s(spark, rows):
    return spark.createDataFrame(rows, ["uuid", "etype"])


def test_plurality_and_hops(spark):
    # u has typed neighbors p1, p2 (person) and o1 (org) -> person, hop 1;
    # v hangs off u -> adopts u's type at hop 2
    edges = _e(spark, [("p1", "u"), ("p2", "u"), ("o1", "u"), ("u", "v")])
    seeds = _s(spark, [("p1", "person"), ("p2", "person"), ("o1", "org")])
    got = {r["uuid"]: (r["etype"], r["hops"]) for r in propagate_types(edges, seeds).collect()}
    assert got["u"] == ("person", 1)
    assert got["v"] == ("person", 2)
    assert got["p1"] == ("person", 0)


def test_tie_breaks_type_ascending(spark):
    edges = _e(spark, [("a1", "u"), ("b1", "u")])
    seeds = _s(spark, [("a1", "org"), ("b1", "person")])
    got = {r["uuid"]: r["etype"] for r in propagate_types(edges, seeds).collect()}
    assert got["u"] == "org"  # 1-1 tie -> lexicographically first type


def test_seeds_clamped_and_first_assignment_wins(spark):
    # seed s is surrounded by org-typed nodes but keeps its own type;
    # w typed 'org' in round 1 stays 'org' even when round 2 would flip it
    edges = _e(spark, [("o1", "s"), ("o2", "s"), ("o1", "w"), ("s", "w"), ("s", "x"), ("x", "w")])
    seeds = _s(spark, [("s", "person"), ("o1", "org"), ("o2", "org")])
    got = {r["uuid"]: (r["etype"], r["hops"]) for r in propagate_types(edges, seeds, n_iter=4).collect()}
    assert got["s"] == ("person", 0)
    # w's round-1 voters: o1 (org), s (person) -> tie -> 'org'
    assert got["w"] == ("org", 1)
    assert got["x"][0] == "person"


def test_unreached_nodes_absent_and_early_stop(spark):
    edges = _e(spark, [("p1", "u"), ("iso1", "iso2")])
    seeds = _s(spark, [("p1", "person")])
    out = propagate_types(edges, seeds, n_iter=10)
    got = {r["uuid"] for r in out.collect()}
    assert got == {"p1", "u"}  # the isolated pair never types


def test_validation(spark):
    with pytest.raises(ValueError):
        propagate_types(_e(spark, [("a", "b")]), _s(spark, [("a", "t")]), n_iter=0)
