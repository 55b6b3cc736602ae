"""Hearst hypernym extraction (operators/hearst.py): hand fixtures for
all four templates, list explosion, singularization rule, edge
aggregation, and Spark/DuckDB pattern identity via hearst_sql."""

from __future__ import annotations

import duckdb
import pytest

from graphiti_spark.operators.hearst import (
    extract_hypernyms,
    hearst_sql,
    hypernym_edges,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Large companies such as Acme, Bex Corp and Corda dominate."),
        (2, "He admired such languages as French, Latin or Basque."),
        (3, "Acme Labs and other startups moved fast."),
        (4, "Several cities, including Lyon and Porto, grew quickly."),
        (5, "We prefer frameworks, especially Spark."),
        (6, "Nothing taxonomic here at all."),
        (7, "such as nothing because no hypernym precedes"),
        (8, "Vendors such as IBM keep lowercase acronyms out."),  # IBM: no [a-z]+ run
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_all_templates_hand_checked(docs):
    got = {
        (r["id"], r["hyponym"], r["hypernym"], r["pattern"])
        for r in extract_hypernyms(docs).collect()
    }
    # template 1: list of three, conjunction normalized away
    assert (1, "Acme", "company", "such_as") in got
    assert (1, "Bex Corp", "company", "such_as") in got
    assert (1, "Corda", "company", "such_as") in got
    # template 2: "such X as", "or" list tail
    assert (2, "French", "language", "such_n_as") in got
    assert (2, "Latin", "language", "such_n_as") in got
    assert (2, "Basque", "language", "such_n_as") in got
    # template 3: list before "and other"
    assert (3, "Acme Labs", "startup", "other") in got
    # template 4: including / especially
    assert (4, "Lyon", "city", "including") in got
    assert (4, "Porto", "city", "including") in got
    assert (5, "Spark", "framework", "including") in got
    # no assertions from the negative pages
    assert not any(r[0] in (6, 7, 8) for r in got)
    assert len(got) == 10


def test_word_boundary_no_midword_hypernym(spark):
    # "Engines" (capitalized) must NOT backtrack into a bogus "ngines"
    # match, and "system stuff" must not yield "sys": \b anchors both ends.
    d = spark.createDataFrame(
        [
            (1, "Engines such as Flink win."),
            (2, "Flink and other system stuff helps."),
        ],
        ["doc_id", "text"],
    )
    assert extract_hypernyms(d).count() == 0


def test_singularize_ies_rule(spark):
    d = spark.createDataFrame(
        [(1, "Old agencies such as Tass reported it.")], ["doc_id", "text"]
    )
    (row,) = extract_hypernyms(d).collect()
    assert row["hypernym"] == "agency"


def test_hypernym_edges_aggregate(docs, spark):
    extra = spark.createDataFrame(
        [(9, "Firms such as Acme and other companies such as Acme grew.")],
        ["doc_id", "text"],
    )
    edges = {
        (r["hyponym"], r["hypernym"]): (r["n_pages"], r["n_assertions"], list(r["patterns"]))
        for r in hypernym_edges(
            extract_hypernyms(docs.unionByName(extra))
        ).collect()
    }
    # "Acme" IS_A "company" asserted on pages 1 and 9 (the 9-row twice:
    # once by such_as, once implicitly through "other companies"? no —
    # "Acme grew" follows, so only such_as matches twice on page 9)
    n_pages, n_assertions, patterns = edges[("Acme", "company")]
    assert n_pages == 2
    assert n_assertions >= 2
    assert "such_as" in patterns


def test_duckdb_twin_identity(docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    oracle = {
        tuple(r)
        for r in con.execute(hearst_sql("d")).fetchall()
    }
    got = {
        (r["id"], r["hyponym"], r["hypernym"], r["pattern"])
        for r in extract_hypernyms(docs).collect()
    }
    assert got == oracle
