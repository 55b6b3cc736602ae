"""EpisodeType dispatch (message/json) parity tests.

Reference behavior: extraction path selected per episode.source
(node_operations.py:279-291), speaker-first rule for message content
(prompts/extract_nodes.py:96), EpisodeType contract (nodes.py:55-77).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from graphiti_spark.operators.ner import (
    extract_mentions_json_py,
    extract_mentions_message_py,
    mentions_stage,
)
from graphiti_spark.operators.triples import (
    extract_triples_json_py,
    extract_triples_message_py,
    triples_stage,
)
from graphiti_spark.operators.episodes import episodes_stage
from graphiti_spark.operators.extract_text import extract_text_stage
from graphiti_spark.synth import typed_pages_from_documents


def test_message_speaker_first_rule():
    text = "Alice Brown: I joined Acme Systems in 2021.\nBob Stone: Alice Brown visited Paris."
    names = [m[0] for m in extract_mentions_message_py(text)]
    # speakers extracted first per line, then utterance entities
    assert names[0] == "Alice Brown"
    assert "Acme Systems" in names
    assert "Bob Stone" in names
    # speaker mention positions point at the actor prefix
    first = extract_mentions_message_py(text)[0]
    assert text[first[1] : first[2]] == "Alice Brown"


def test_message_pronoun_resolves_to_speaker():
    text = "Alice Brown: I joined Acme Systems in 2021."
    triples = extract_triples_message_py(text)
    assert ("Alice Brown", "JOINED", "Acme Systems") in {(s, p, o) for s, p, o, *_ in triples}
    # explicit date picked up as valid_at
    t = [t for t in triples if t[0] == "Alice Brown"][0]
    assert t[4] == "2021"


def test_json_extraction_entities_and_triples():
    doc = {
        "name": "Acme Corp",
        "employer": "Globex Inc",
        "location": "Berlin",
        "since": "2020-01-01",
        "followers": 42,
        "projects": [{"title": "Berlin Initiative", "status": "active"}],
    }
    text = json.dumps(doc)
    names = {m[0] for m in extract_mentions_json_py(text)}
    assert {"Acme Corp", "Globex Inc", "Berlin"} <= names
    assert "2020-01-01" not in names  # date-like excluded
    spo = {(s, p, o) for s, p, o, *_ in extract_triples_json_py(text)}
    assert ("Acme Corp", "EMPLOYER", "Globex Inc") in spo
    assert ("Acme Corp", "LOCATION", "Berlin") in spo
    assert ("Berlin Initiative", "STATUS", "active") in spo
    # numeric field skipped (not an entity endpoint)
    assert not any(o == "42" for _, _, o in spo)


def test_json_malformed_falls_back():
    assert extract_triples_json_py("{not json") == []
    assert extract_mentions_json_py("Plain Text About Acme Corp.") != []


def test_typed_pipeline_stages(spark):
    """message/json corpora flow through episodes -> mentions/triples with
    per-row dispatch; P/R vs the generators' construction is exact."""
    pages = typed_pages_from_documents(spark, "/root/testdata/sf0.001", "message", limit=20)
    eps = episodes_stage(extract_text_stage(pages))
    assert {r["source"] for r in eps.select("source").distinct().collect()} == {"message"}
    mentions = mentions_stage(eps)
    triples = triples_stage(eps)
    # every episode's transcript names exactly two speakers; both must appear
    m_by_ep = (
        mentions.groupBy("episode_uuid").agg(F.collect_set("name").alias("names")).collect()
    )
    assert len(m_by_ep) == 20
    # the generator always emits 'I joined <Org> in 2021' -> JOINED triple
    joined = triples.filter(F.col("name") == "JOINED")
    assert joined.count() == 20
    assert {r[0] for r in joined.select(F.year("valid_at")).distinct().collect()} == {2021}

    jpages = typed_pages_from_documents(spark, "/root/testdata/sf0.001", "json", limit=20)
    jeps = episodes_stage(extract_text_stage(jpages))
    jtrip = triples_stage(jeps)
    preds = {r["name"] for r in jtrip.select("name").distinct().collect()}
    assert {"EMPLOYER", "LOCATION", "STATUS"} <= preds
    # since/followers are dates/numbers -> never edge endpoints
    assert jtrip.filter(F.col("obj_name").rlike(r"^\d+$")).count() == 0


def test_text_source_dispatch_identical(spark):
    """source='text' through the dispatch UDF is byte-identical to the
    direct path (locks the golden oracles)."""
    from graphiti_spark.operators.ner import extract_mentions_dispatch_py, extract_mentions_py

    text = "Alice Brown joined Acme Systems. Acme Systems acquired Globex."
    assert extract_mentions_dispatch_py(text, "text") == extract_mentions_py(text)
