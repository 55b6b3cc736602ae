"""Community profiles (community.community_profiles): hand fixture with
two communities — member ranking, top-k cut, internal-edge counting (the
cross-community edge must not count), plurality relation, empty-edge
community."""

from __future__ import annotations

import pytest

from graphiti_spark.analytics.community import community_profiles


@pytest.fixture(scope="module")
def fixture(spark):
    assignments = spark.createDataFrame(
        [("c1", "a"), ("c1", "b"), ("c1", "c"), ("c2", "x"), ("c2", "y")],
        ["community", "uuid"],
    )
    nodes = spark.createDataFrame(
        [
            ("a", "Alpha", 10),
            ("b", "Beta", 30),
            ("c", "Gamma", 20),
            ("x", "Xi", 1),
            ("y", "Psi", 2),
        ],
        ["uuid", "name", "mention_count"],
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", "WORKS_AT"),
            ("b", "c", "WORKS_AT"),
            ("a", "c", "KNOWS"),
            ("c", "x", "KNOWS"),  # cross-community: counts nowhere
        ],
        ["source_node_uuid", "target_node_uuid", "name"],
    )
    return assignments, nodes, edges


def test_profiles_hand_checked(fixture):
    asg, nodes, edges = fixture
    got = {r["community"]: r for r in community_profiles(asg, nodes, edges).collect()}
    c1 = got["c1"]
    assert c1["n_members"] == 3
    assert c1["top_members"] == "Beta, Gamma, Alpha"  # mention_count order
    assert c1["n_internal_edges"] == 3
    assert c1["top_relation"] == "WORKS_AT"  # 2 votes vs 1
    c2 = got["c2"]
    assert c2["n_members"] == 2
    assert c2["top_members"] == "Psi, Xi"
    assert c2["n_internal_edges"] == 0 and c2["top_relation"] is None


def test_top_k_cut_and_tie_break(fixture):
    asg, nodes, edges = fixture
    got = {
        r["community"]: r["top_members"]
        for r in community_profiles(asg, nodes, edges, k=2).collect()
    }
    assert got["c1"] == "Beta, Gamma"


def test_relation_tie_breaks_lexicographically(spark):
    asg = spark.createDataFrame([("c", "a"), ("c", "b")], ["community", "uuid"])
    nodes = spark.createDataFrame(
        [("a", "A", 1), ("b", "B", 1)], ["uuid", "name", "mention_count"]
    )
    edges = spark.createDataFrame(
        [("a", "b", "ZETA"), ("b", "a", "ALPHA")],
        ["source_node_uuid", "target_node_uuid", "name"],
    )
    (row,) = community_profiles(asg, nodes, edges).collect()
    assert row["top_relation"] == "ALPHA"
