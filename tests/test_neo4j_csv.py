"""Neo4j bulk-import CSV export (sinks/neo4j_csv.py): quoting rules,
relation-type normalization, null handling, round-trip through Spark's
own CSV reader, map-only plan, and DuckDB twin identity."""

from __future__ import annotations

import duckdb
import pytest

from graphiti_spark.sinks.neo4j_csv import (
    NODE_HEADER,
    REL_HEADER,
    edges_to_neo4j_csv,
    graph_to_neo4j_csv,
    neo4j_csv_sql,
    nodes_to_neo4j_csv,
)

NODE_COLS = ["group_id", "mention_count", "name", "name_norm", "uuid"]
EDGE_COLS = [
    "fact",
    "group_id",
    "name",
    "source_node_uuid",
    "target_node_uuid",
    "uuid",
]


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("g1", 3, 'Acme "The Best" Corp', "acme the best corp", "n1"),
            ("g1", 1, "Bex, Inc", "bex inc", "n2"),
            ("g2", None, None, None, "n3"),
        ],
        NODE_COLS,
    )
    edges = spark.createDataFrame(
        [
            ("Acme hired Bex.", "g1", "hired by", "n1", "n2", "e1"),
            ('He said "go", twice', "g1", "SAYS-2x!", "n2", "n1", "e2"),
        ],
        EDGE_COLS,
    )
    return nodes, edges


def test_node_lines_hand_checked(graph):
    nodes, _ = graph
    lines = {r["uuid"]: r["line"] for r in nodes_to_neo4j_csv(nodes).collect()}
    # embedded quotes doubled, every field quoted, label constant
    assert lines["n1"] == '"n1","Acme ""The Best"" Corp","g1","3","Entity"'
    assert lines["n2"] == '"n2","Bex, Inc","g1","1","Entity"'
    # nulls render as empty quoted fields
    assert lines["n3"] == '"n3","","g2","","Entity"'


def test_rel_lines_type_normalized(graph):
    _, edges = graph
    lines = {r["uuid"]: r["line"] for r in edges_to_neo4j_csv(edges).collect()}
    assert lines["e1"] == '"n1","n2","HIRED_BY","e1","Acme hired Bex.","g1"'
    assert lines["e2"] == '"n2","n1","SAYS_2X_","e2","He said ""go"", twice","g1"'


def test_roundtrip_spark_csv_reader(graph, spark, tmp_path):
    """The emitted lines + header parse back through a standard RFC-4180
    CSV reader with the original field values intact."""
    nodes, _ = graph
    p = str(tmp_path / "nodes")
    body = nodes_to_neo4j_csv(nodes).select("line")
    header = spark.createDataFrame([(NODE_HEADER,)], ["line"])
    header.coalesce(1).unionAll(body).coalesce(1).write.text(p)
    # escape='"' selects RFC-4180 doubled-quote parsing (Spark's default
    # escape is backslash); neo4j-admin import reads doubling natively.
    back = spark.read.option("header", True).option("escape", '"').csv(p)
    assert back.columns == ["uuid:ID", "name", "group_id", "mention_count:long", ":LABEL"]
    got = {r["uuid:ID"]: r["name"] for r in back.collect()}
    assert got["n1"] == 'Acme "The Best" Corp'
    assert got["n2"] == "Bex, Inc"
    assert len(got) == 3
    assert REL_HEADER.startswith(":START_ID,:END_ID,:TYPE")


def test_map_only_plan(graph):
    nodes, edges = graph
    plan = graph_to_neo4j_csv(nodes, edges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duckdb_twin_identity(graph):
    nodes, edges = graph
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE n (group_id VARCHAR, mention_count BIGINT, name VARCHAR,"
        " name_norm VARCHAR, uuid VARCHAR)"
    )
    con.executemany(
        "INSERT INTO n VALUES (?, ?, ?, ?, ?)",
        [tuple(r) for r in nodes.collect()],
    )
    con.execute(
        "CREATE TABLE e (fact VARCHAR, group_id VARCHAR, name VARCHAR,"
        " source_node_uuid VARCHAR, target_node_uuid VARCHAR, uuid VARCHAR)"
    )
    con.executemany(
        "INSERT INTO e VALUES (?, ?, ?, ?, ?, ?)",
        [tuple(r) for r in edges.collect()],
    )
    oracle = {tuple(r) for r in con.execute(neo4j_csv_sql("n", "e")).fetchall()}
    got = {
        (r["kind"], r["uuid"], r["line"])
        for r in graph_to_neo4j_csv(nodes, edges).collect()
    }
    assert got == oracle
