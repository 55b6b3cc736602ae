"""Normalization + identity parity tests (node_operations.py:49-79,
uuid_utils.py:282-334 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.ids import edge_uuid_py, entity_uuid_py
from graphiti_spark.functions.normalize import (
    normalize_entity_name_col,
    normalize_entity_name_py,
    predicate_name_py,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Alice", "alice"),
        ("CLAUDE", "claude"),
        ("claude", "claude"),
        ("Alice Smith-Jones", "alice_smith_jones"),
        ("  Acme.Corp  ", "acme_corp"),
        ("a--b..c  d", "a_b_c_d"),
        ("C3-PO!", "c3_po"),
        ("__x__", "x"),
        ("Ümlaut Co", "mlaut_co"),
    ],
)
def test_normalize_py(raw, expected):
    assert normalize_entity_name_py(raw) == expected


def test_normalize_col_matches_py(spark):
    names = ["Alice", "CLAUDE code", "Acme.Corp", "a--b..c  d", "C3-PO!", "Hello, World."]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r[0] for r in df.select(normalize_entity_name_col("name")).collect()]
    assert got == [normalize_entity_name_py(n) for n in names]


def test_entity_uuid_deterministic_and_case_insensitive():
    # Name variations normalize-equal -> identical uuid (dedup scenario
    # "Basic name variations", dedup_test_results_*.json).
    assert entity_uuid_py("Claude", "g") == entity_uuid_py("CLAUDE", "g")
    assert entity_uuid_py("Claude", "g") == entity_uuid_py("claude", "g")
    # group partitions the namespace
    assert entity_uuid_py("Claude", "g1") != entity_uuid_py("Claude", "g2")
    # compound names are different identities
    assert entity_uuid_py("Claude", "g") != entity_uuid_py("Claude Code", "g")


def test_edge_uuid_deterministic():
    a = edge_uuid_py("u1", "u2", "likes", "g")
    b = edge_uuid_py("u1", "u2", "LIKES", "g")  # predicate upper-cased in key
    assert a == b
    assert edge_uuid_py("u2", "u1", "LIKES", "g") != a  # directed


def test_predicate_name():
    assert predicate_name_py("works at") == "WORKS_AT"
    assert predicate_name_py("  founded ") == "FOUNDED"
    assert predicate_name_py("co-founded!") == "CO_FOUNDED"
