"""KG-embedding training examples (datapipe/kg_embed.py): hand-verified
entity index vs global uuid order, deterministic md5 negative sampling,
and the filtered protocol (no corrupted triple may be a true positive)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.kg_embed import entity_index, kg_embedding_examples


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("e1", "a1", "WORKS_AT", "b2"),
        ("e2", "b2", "LOCATED_IN", "c3"),
        ("e3", "a1", "KNOWS", "d4"),
        ("e4", "d4", "WORKS_AT", "b2"),
        ("e5", "a1", "WORKS_AT", "b2"),  # duplicate triple -> one positive
    ]
    return spark.createDataFrame(
        rows, ["uuid", "source_node_uuid", "name", "target_node_uuid"]
    )


def test_entity_index_matches_global_uuid_order(spark, edges):
    got = {r["uuid"]: r["ent_idx"] for r in entity_index(edges).collect()}
    uuids = sorted({"a1", "b2", "c3", "d4"})
    assert got == {u: i for i, u in enumerate(uuids)}


def test_entity_index_is_dense_across_buckets(spark):
    # uuids spanning many 3-char prefixes; index must stay a dense 0..n-1
    # permutation in sort order even when every bucket holds one row.
    uuids = [f"{i:03x}-node" for i in range(0, 64, 7)]
    e = spark.createDataFrame(
        [(u, "R", uuids[0]) for u in uuids],
        ["source_node_uuid", "name", "target_node_uuid"],
    )
    got = {r["uuid"]: r["ent_idx"] for r in entity_index(e).collect()}
    assert got == {u: i for i, u in enumerate(sorted(uuids))}


def test_examples_shape_and_determinism(edges):
    out1 = kg_embedding_examples(edges, n_negatives=3).collect()
    out2 = kg_embedding_examples(edges, n_negatives=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))

    pos = [r for r in out1 if r["label"] == 1]
    neg = [r for r in out1 if r["label"] == 0]
    assert len(pos) == 4  # e1/e5 collapse to one distinct triple
    assert all(r["neg_slot"] == -1 for r in pos)
    assert 0 < len(neg) <= 4 * 3
    assert all(0 <= r["neg_slot"] < 3 for r in neg)


def test_negatives_corrupt_exactly_one_endpoint(edges):
    out = kg_embedding_examples(edges, n_negatives=3)
    pos = {(r["head"], r["relation"], r["tail"])
           for r in out.filter("label = 1").collect()}
    for r in out.filter("label = 0").collect():
        same_head = any(h == r["head"] and rel == r["relation"] for h, rel, _ in pos)
        same_tail = any(t == r["tail"] and rel == r["relation"] for _, rel, t in pos)
        # the uncorrupted endpoint still matches some positive of that relation
        assert same_head or same_tail


def test_filtered_protocol_drops_true_triples(edges):
    out = kg_embedding_examples(edges, n_negatives=8)
    pos = {(r["head"], r["relation"], r["tail"])
           for r in out.filter("label = 1").collect()}
    for r in out.filter("label = 0").collect():
        assert (r["head"], r["relation"], r["tail"]) not in pos


def test_entity_index_plan_buckets_not_global_window(edges):
    plan = entity_index(edges)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_bkt" in plan
