"""Pronoun coreference (operators/coref.py): hand fixtures for offsets,
run grouping, recency resolution, unresolved pronouns, mention upgrade,
and Spark/DuckDB identity via coref_sql."""

from __future__ import annotations

import duckdb
import pytest

from graphiti_spark.operators.coref import (
    coref_mentions,
    coref_sql,
    resolve_pronouns,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Ana Bell joined Acme. She later led it."),
        (2, "He arrived. Ana met him."),
        (3, "Nothing pronominal here."),
        (4, "They shipped. Then Bo Li and Jo Wu met. She smiled."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_recency_resolution_hand_checked(docs):
    got = {
        (r["id"], r["pronoun"], r["pos"], r["antecedent"])
        for r in resolve_pronouns(docs).collect()
    }
    # doc 1: "She"@22 and "it"@36 both resolve to the nearest run "Acme"
    # (the recency heuristic by design, not gendered linking)
    assert (1, "she", 22, "Acme") in got
    assert (1, "it", 36, "Acme") in got
    # doc 2: document-initial "He" has no antecedent; "him" -> Ana
    assert (2, "he", 0, None) in got
    assert (2, "him", 20, "Ana") in got
    # doc 4: "They"@0 unresolved; "She" -> the LAST run "Jo Wu"
    # ("Then" is stoplisted and must not fuse into "Then Bo Li")
    assert (4, "they", 0, None) in got
    assert (4, "she", 40, "Jo Wu") in got
    assert len(got) == 6


def test_multitoken_run_is_single_candidate(spark):
    d = spark.createDataFrame(
        [(1, "Ana Bell Cole spoke. Afterwards she left.")], ["doc_id", "text"]
    )
    (row,) = resolve_pronouns(d).collect()
    assert row["antecedent"] == "Ana Bell Cole"


def test_coref_mentions_upgrade(spark, docs):
    mentions = spark.createDataFrame(
        [(1, "Acme", "u-acme"), (1, "Ana Bell", "u-ana"), (2, "Zed", "u-z")],
        ["episode_uuid", "name", "entity_uuid"],
    )
    got = {
        (r["episode_uuid"], r["entity_uuid"], r["name"], r["start_pos"])
        for r in coref_mentions(resolve_pronouns(docs), mentions).collect()
    }
    # doc 1's two pronouns both upgrade to the Acme entity; doc 2's "Ana"
    # antecedent has no matching mention row -> drops (precision rule)
    assert got == {(1, "u-acme", "Acme", 22), (1, "u-acme", "Acme", 36)}


def test_duckdb_twin_identity(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id INTEGER, text VARCHAR)")
    con.executemany(
        "INSERT INTO d VALUES (?, ?)", [tuple(r) for r in docs.collect()]
    )
    oracle = {tuple(r) for r in con.execute(coref_sql("d")).fetchall()}
    got = {
        (r["id"], r["pronoun"], r["pos"], r["antecedent"])
        for r in resolve_pronouns(docs).collect()
    }
    assert got == oracle
