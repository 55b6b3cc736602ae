"""Entity type induction (operators/entity_types.py): plurality vote,
deterministic tie-break, normalization key, min-votes floor, node join."""

from __future__ import annotations

import pytest

from graphiti_spark.operators.entity_types import (
    assign_types_to_nodes,
    induce_entity_types,
)


@pytest.fixture(scope="module")
def assertions(spark):
    rows = (
        [("Acme Corp", "Organization")] * 4
        + [("Acme Corp", "Person")] * 2
        + [("acme-corp", "Organization")]  # normalizes onto the same key
        + [("Jane Doe", "Person"), ("Jane Doe", "Organization")]  # exact tie
        + [("Solo", "Place")]
        + [("NoType", None), ("NoType", ""), ("???", "Person")]  # drops
    )
    return spark.createDataFrame(rows, ["name", "etype"])


def test_plurality_and_normalization(assertions):
    got = {r["name_norm"]: r for r in induce_entity_types(assertions).collect()}
    acme = got["acme_corp"]
    # 4 + 1 (normalized variant) Organization votes vs 2 Person
    assert acme["etype"] == "Organization"
    assert acme["votes"] == 5 and acme["total_votes"] == 7
    assert acme["confidence"] == pytest.approx(round(5 / 7, 6))


def test_tie_breaks_lexicographically(assertions):
    got = {r["name_norm"]: r for r in induce_entity_types(assertions).collect()}
    assert got["jane_doe"]["etype"] == "Organization"  # O < P at equal votes


def test_null_empty_and_unnormalizable_drop(assertions):
    keys = {r["name_norm"] for r in induce_entity_types(assertions).collect()}
    assert "notype" not in keys  # only null/empty types voted
    assert "" not in keys  # "???" normalizes to empty
    assert keys == {"acme_corp", "jane_doe", "solo"}


def test_min_votes_floor(assertions):
    keys = {
        r["name_norm"] for r in induce_entity_types(assertions, min_votes=2).collect()
    }
    assert "solo" not in keys and "acme_corp" in keys


def test_assign_to_nodes(spark, assertions):
    nodes = spark.createDataFrame(
        [("u1", "acme_corp", "Acme Corp"), ("u2", "unknown_co", "Unknown Co")],
        ["uuid", "name_norm", "name"],
    )
    got = {
        r["uuid"]: (r["etype"], r["type_confidence"])
        for r in assign_types_to_nodes(nodes, induce_entity_types(assertions)).collect()
    }
    assert got["u1"][0] == "Organization"
    assert got["u2"] == (None, None)
