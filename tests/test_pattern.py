"""Triple-pattern matching (operators/pattern.match_pattern) and
fact_confidence decay (operators/temporal.py): hand fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from graphiti_spark.operators.pattern import match_pattern
from graphiti_spark.operators.temporal import fact_confidence

EDGES = [
    ("ana", "WORKS_AT", "acme"),
    ("bob", "WORKS_AT", "acme"),
    ("cat", "WORKS_AT", "bex"),
    ("acme", "LOCATED_IN", "berlin"),
    ("bex", "LOCATED_IN", "paris"),
    ("ana", "KNOWS", "bob"),
    ("self", "KNOWS", "self"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        EDGES, ["source_node_uuid", "name", "target_node_uuid"]
    )


def test_two_hop_join(edges):
    got = {
        (r["p"], r["c"], r["city"])
        for r in match_pattern(
            edges,
            [("?p", "WORKS_AT", "?c"), ("?c", "LOCATED_IN", "?city")],
        ).collect()
    }
    assert got == {
        ("ana", "acme", "berlin"),
        ("bob", "acme", "berlin"),
        ("cat", "bex", "paris"),
    }


def test_constant_subject_and_variable_predicate(edges):
    got = {(r["rel"], r["o"]) for r in match_pattern(edges, [("ana", "?rel", "?o")]).collect()}
    assert got == {("WORKS_AT", "acme"), ("KNOWS", "bob")}


def test_repeated_var_within_triple(edges):
    got = {r["x"] for r in match_pattern(edges, [("?x", "KNOWS", "?x")]).collect()}
    assert got == {"self"}


def test_shared_object_co_pattern(edges):
    got = {
        (r["a"], r["b"])
        for r in match_pattern(
            edges, [("?a", "WORKS_AT", "?x"), ("?b", "WORKS_AT", "?x")]
        ).collect()
        if r["a"] < r["b"]
    }
    assert got == {("ana", "bob")}


def test_ground_triple_existence(edges):
    assert match_pattern(edges, [("ana", "KNOWS", "bob")]).count() == 1
    assert match_pattern(edges, [("ana", "KNOWS", "cat")]).count() == 0


def test_ground_triple_gates_without_multiplying(spark):
    """A ground triple matched by N duplicate edge rows must GATE the
    variable bindings (existence), not multiply their multiplicity by N."""
    dup = spark.createDataFrame(
        [
            ("ana", "KNOWS", "bob"),
            ("ana", "KNOWS", "bob"),  # duplicate edge row
            ("ana", "KNOWS", "bob"),
            ("ana", "WORKS_AT", "acme"),
        ],
        ["source_node_uuid", "name", "target_node_uuid"],
    )
    rows = match_pattern(
        dup, [("ana", "KNOWS", "bob"), ("?p", "WORKS_AT", "?c")]
    ).collect()
    assert [(r["p"], r["c"]) for r in rows] == [("ana", "acme")]
    # absent ground triple zeroes the result
    assert (
        match_pattern(
            dup, [("ana", "KNOWS", "zed"), ("?p", "WORKS_AT", "?c")]
        ).count()
        == 0
    )


def test_all_ground_pattern_single_marker(edges):
    """ALL-ground patterns: conjunction of existence checks, one
    '_matched' column (no duplicate-column crossJoin crash)."""
    both = match_pattern(
        edges, [("ana", "KNOWS", "bob"), ("ana", "WORKS_AT", "acme")]
    )
    assert both.columns == ["_matched"]
    assert both.count() == 1
    missing = match_pattern(
        edges, [("ana", "KNOWS", "bob"), ("ana", "WORKS_AT", "bex")]
    )
    assert missing.count() == 0


def test_validation(edges):
    with pytest.raises(ValueError):
        match_pattern(edges, [])


def test_fact_confidence_half_life(spark):
    T = dt.datetime
    e = spark.createDataFrame(
        [
            ("e1", T(2024, 1, 1), None),   # age 90d at as_of -> 0.5
            ("e2", T(2024, 3, 31), None),  # age 0 -> 1.0
            ("e3", T(2023, 1, 1), T(2024, 1, 15)),  # invalidated -> absent
        ],
        ["uuid", "valid_at", "invalid_at"],
    )
    got = {r["uuid"]: r["confidence"] for r in fact_confidence(e, "2024-03-31 00:00:00", half_life_days=90.0).collect()}
    assert got["e1"] == pytest.approx(0.5)
    assert got["e2"] == 1.0
    assert "e3" not in got
