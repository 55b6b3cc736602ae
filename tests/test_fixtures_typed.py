"""Hand-computed semantic ground truth for message/json/unicode/adversarial
corpora (graphiti_spark.fixtures_typed) — exact P = R = 1.0 set equality,
not regenerated goldens. Derivations live next to each EXPECTED_* constant.
"""

from __future__ import annotations

import pytest

from graphiti_spark.fixtures_typed import (
    EXPECTED_JSON_ENTITIES,
    EXPECTED_JSON_TRIPLES,
    EXPECTED_JSON_VALID_AT,
    EXPECTED_MESSAGE_ENTITIES,
    EXPECTED_MESSAGE_SAME,
    EXPECTED_MESSAGE_TRIPLES,
    EXPECTED_MESSAGE_VALID_AT,
    EXPECTED_MIRROR_TRIPLE,
    EXPECTED_UNICODE_SAME,
    EXPECTED_UNICODE_TRIPLES,
    FORBIDDEN_JSON_ENTITY_NAMES,
    JSON_GROUP,
    MESSAGE_GROUP,
    MIRROR_GROUP,
    UNICODE_GROUP,
    json_pages_df,
    message_pages_df,
    mirror_pages_df,
    unicode_pages_df,
)
from graphiti_spark.functions.ids import entity_uuid_py
from graphiti_spark.plans.pipeline import run_pipeline


def _canon_map(result):
    return {r["uuid"]: r["canonical_uuid"] for r in result["uuid_map"].collect()}


def _canon(umap, name, group):
    u = entity_uuid_py(name, group)
    return umap.get(u, u)


def _produced_triples(result, umap):
    """(src, name, dst) canonical uuid triples + per-triple valid_at date."""
    triples, valid = set(), {}
    for r in result["edges"].collect():
        key = (r["source_node_uuid"], r["name"], r["target_node_uuid"])
        triples.add(key)
        valid[key] = r["valid_at"].date().isoformat() if r["valid_at"] else None
    return triples, valid


def _assert_exact(result, group, expected_triples, expected_valid=None):
    umap = _canon_map(result)
    expected = {
        (_canon(umap, s, group), p, _canon(umap, o, group))
        for s, p, o in expected_triples
    }
    produced, valid = _produced_triples(result, umap)
    assert produced == expected, (
        f"extra={produced - expected} missing={expected - produced}"
    )
    if expected_valid:
        for (s, p, o), want in expected_valid.items():
            key = (_canon(umap, s, group), p, _canon(umap, o, group))
            assert valid[key] == want, f"{(s, p, o)}: valid_at {valid[key]} != {want}"
    # structural invariant: every edge endpoint is a node (the dangling
    # SINCE-endpoint regression caught by the json fixture)
    nodes = {r["uuid"] for r in result["nodes"].collect()}
    for src, _, dst in produced:
        assert src in nodes and dst in nodes, "dangling edge endpoint"
    return umap


@pytest.fixture(scope="module")
def message_result(spark):
    return run_pipeline(spark, message_pages_df(spark))


@pytest.fixture(scope="module")
def json_result(spark):
    return run_pipeline(spark, json_pages_df(spark))


@pytest.fixture(scope="module")
def unicode_result(spark):
    return run_pipeline(spark, unicode_pages_df(spark))


def test_message_triples_exact(message_result):
    _assert_exact(
        message_result, MESSAGE_GROUP, EXPECTED_MESSAGE_TRIPLES, EXPECTED_MESSAGE_VALID_AT
    )


def test_message_entity_set_exact(message_result):
    umap = _canon_map(message_result)
    expected = {_canon(umap, n, MESSAGE_GROUP) for n in EXPECTED_MESSAGE_ENTITIES}
    produced = {r["uuid"] for r in message_result["nodes"].collect()}
    assert produced == expected


def test_message_speaker_variants_merge(message_result):
    umap = _canon_map(message_result)
    for a, b in EXPECTED_MESSAGE_SAME:
        assert _canon(umap, a, MESSAGE_GROUP) == _canon(umap, b, MESSAGE_GROUP)


def test_json_triples_exact(json_result):
    _assert_exact(json_result, JSON_GROUP, EXPECTED_JSON_TRIPLES, EXPECTED_JSON_VALID_AT)


def test_json_entity_set_exact(json_result):
    umap = _canon_map(json_result)
    expected = {_canon(umap, n, JSON_GROUP) for n in EXPECTED_JSON_ENTITIES}
    produced = {r["uuid"] for r in json_result["nodes"].collect()}
    assert produced == expected


def test_json_no_date_or_url_entities(json_result):
    names = {r["name"] for r in json_result["nodes"].collect()}
    for forbidden in FORBIDDEN_JSON_ENTITY_NAMES:
        assert forbidden not in names


def test_unicode_triples_exact(unicode_result):
    _assert_exact(unicode_result, UNICODE_GROUP, EXPECTED_UNICODE_TRIPLES)


def test_unicode_identity_merges(unicode_result):
    umap = _canon_map(unicode_result)
    for a, b in EXPECTED_UNICODE_SAME:
        assert _canon(umap, a, UNICODE_GROUP) == _canon(umap, b, UNICODE_GROUP), (a, b)
    # one canonical node per merged identity, with mentions from BOTH pages
    mentions = unicode_result["mentions"].collect()
    cafe = _canon(umap, "Café Müller", UNICODE_GROUP)
    eps = {m["episode_uuid"] for m in mentions if m["entity_uuid"] == cafe}
    assert len(eps) == 2, "Café Müller / Cafe Muller must be mentioned on both pages"


def test_mirror_pages_merge_one_edge(spark):
    result = run_pipeline(spark, mirror_pages_df(spark))
    umap = _canon_map(result)
    s, p, o = EXPECTED_MIRROR_TRIPLE
    expected_key = (_canon(umap, s, MIRROR_GROUP), p, _canon(umap, o, MIRROR_GROUP))
    edges = [
        r
        for r in result["edges"].collect()
        if (r["source_node_uuid"], r["name"], r["target_node_uuid"]) == expected_key
    ]
    assert len(edges) == 1, "three near-duplicate pages must yield ONE canonical edge"
    edge = edges[0]
    assert len(edge["episodes"]) == 3, "provenance must union all three episodes"
    assert edge["valid_at"].date().isoformat() == "2022-01-01", (
        "valid_at must be the min explicit date across merged assertions"
    )
    assert result["edges"].count() == 1
