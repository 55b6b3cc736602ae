"""N-Triples export/import (sinks/rdf.py): hand-built graph with every
escape-relevant character, grammar of emitted lines, and a full
serialize -> write.text -> read.text -> parse round-trip that recovers
the exact edge and label sets."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from graphiti_spark.sinks.rdf import (
    DEFAULT_BASE,
    RDFS_LABEL,
    edges_to_ntriples,
    parse_ntriples,
)


@pytest.fixture(scope="module")
def graph(spark):
    edges = spark.createDataFrame(
        [
            ("e1", "g", "u1", "u2", "WORKS AT"),
            ("e2", "g", "u2", "u3", "acquired-by!"),
            ("e3", "g", "u1", "u3", "KNOWS"),
        ],
        ["uuid", "group_id", "source_node_uuid", "target_node_uuid", "name"],
    )
    nodes = spark.createDataFrame(
        [
            ("u1", 'Quote " Back \\ slash'),
            ("u2", "Line\nBreak\rCR"),
            ("u3", "Plain"),
        ],
        ["uuid", "name"],
    )
    return edges, nodes


def test_ntriples_grammar_and_escapes(graph):
    edges, nodes = graph
    lines = {r["uuid"]: r["line"] for r in edges_to_ntriples(edges, nodes).collect()}
    assert lines["e1"] == (
        f"<{DEFAULT_BASE}entity/u1> <{DEFAULT_BASE}rel/works_at> "
        f"<{DEFAULT_BASE}entity/u2> ."
    )
    # punctuation collapses to single underscores in the predicate local part
    assert f"<{DEFAULT_BASE}rel/acquired_by_>" in lines["e2"]
    assert lines["u1"] == (
        f"<{DEFAULT_BASE}entity/u1> <{RDFS_LABEL}> "
        '"Quote \\" Back \\\\ slash" .'
    )
    assert "\\n" in lines["u2"] and "\n" not in lines["u2"]
    # every emitted line matches the single-statement N-Triples grammar
    nt = re.compile(r'^<[^>]+> <[^>]+> (<[^>]+>|"[^\n\r]*") \.$')
    for line in lines.values():
        assert nt.match(line), line


def test_roundtrip_through_text_files(spark, graph, tmp_path):
    edges, nodes = graph
    out = str(tmp_path / "nt")
    edges_to_ntriples(edges, nodes).select("line").write.mode("overwrite").text(out)
    parsed = parse_ntriples(spark.read.text(out), line_col="value")

    rels = {
        (r["subject"], r["predicate"], r["object"])
        for r in parsed.filter(~F.col("is_literal")).collect()
    }
    assert rels == {
        (
            f"{DEFAULT_BASE}entity/{s}",
            f"{DEFAULT_BASE}rel/{p}",
            f"{DEFAULT_BASE}entity/{t}",
        )
        for s, p, t in [
            ("u1", "works_at", "u2"),
            ("u2", "acquired_by_", "u3"),
            ("u1", "knows", "u3"),
        ]
    }
    labels = {
        (r["subject"], r["object"])
        for r in parsed.filter(F.col("is_literal")).collect()
    }
    # unescape restores the original names exactly, including the newline
    assert labels == {
        (f"{DEFAULT_BASE}entity/u1", 'Quote " Back \\ slash'),
        (f"{DEFAULT_BASE}entity/u2", "Line\nBreak\rCR"),
        (f"{DEFAULT_BASE}entity/u3", "Plain"),
    }


def test_comment_and_blank_lines_drop(spark):
    raw = spark.createDataFrame(
        [("# comment",), ("",), ("<http://a> <http://p> <http://b> .",)],
        ["line"],
    )
    got = parse_ntriples(raw).collect()
    assert len(got) == 1 and got[0]["object"] == "http://b"


def test_export_plan_is_map_only(graph):
    edges, nodes = graph
    plan = edges_to_ntriples(edges, nodes)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
