"""Neo4j ``neo4j-admin database import`` CSV export of the canonical KG.

The reference's production sink IS Neo4j: nodes and edges land via Cypher
``MERGE`` statements (graphiti_core/models/edges/edge_db_queries.py,
graphiti_core/utils/bulk_utils.py:add_nodes_and_edges_bulk). At 10^12
documents per-row Cypher is not a bulk path — Neo4j's own answer is the
offline bulk importer, which consumes header-typed CSV shards
(https://neo4j.com/docs/operations-manual/current/tools/neo4j-admin/neo4j-admin-import/):

  nodes:         ``uuid:ID,name,group_id,mention_count:long,:LABEL``
  relationships: ``:START_ID,:END_ID,:TYPE,uuid,fact,group_id``

So a user of the reference can switch engines and still land the graph in
the same store: run the batch DAG here, export these frames with
``df.write.csv`` (one shard per partition — exactly the layout the
importer parallelizes over), and point ``neo4j-admin import`` at the
shards.

Formatting contract (importer default dialect): every field
double-quoted, embedded ``"`` doubled (RFC 4180); the line is built as
one codegen'd concat so the export is a *DataFrame of lines*, identical
through ``.write.text`` or collected assertions, and restatable in SQL
for the oracle.

Scale shape: map-only over both tables — zero shuffles, no collect;
output shard count = input partition count. Labels/types are constants
or derive from the edge's normalized relation name (uppercased, non-word
runs collapsed to ``_`` — Cypher relationship-type shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

NODE_HEADER = "uuid:ID,name,group_id,mention_count:long,:LABEL"
REL_HEADER = ":START_ID,:END_ID,:TYPE,uuid,fact,group_id"


def _csv_field(c: Column) -> Column:
    """RFC 4180 quoted field: embedded quotes doubled, then wrapped."""
    return F.concat(
        F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"')
    )


def _rel_type(c: Column) -> Column:
    """Relation name -> Neo4j relationship type: uppercase, runs outside
    [A-Z0-9_] collapse to '_' (the Cypher identifier shape the reference
    mints in edge_db_queries.py)."""
    return F.regexp_replace(F.upper(c), "[^A-Z0-9_]+", "_")


def nodes_to_neo4j_csv(nodes: DataFrame, label: str = "Entity") -> DataFrame:
    """(uuid, line) — one importer CSV line per canonical node, matching
    NODE_HEADER. Map-only; null-safe (nulls render as empty fields)."""
    line = F.concat_ws(
        ",",
        _csv_field(F.coalesce(F.col("uuid"), F.lit(""))),
        _csv_field(F.coalesce(F.col("name"), F.lit(""))),
        _csv_field(F.coalesce(F.col("group_id"), F.lit(""))),
        _csv_field(
            F.coalesce(F.col("mention_count").cast("string"), F.lit(""))
        ),
        _csv_field(F.lit(label)),
    )
    return nodes.select(F.col("uuid"), line.alias("line"))


def edges_to_neo4j_csv(edges: DataFrame) -> DataFrame:
    """(uuid, line) — one importer CSV line per canonical edge, matching
    REL_HEADER; :TYPE is the normalized relation name."""
    line = F.concat_ws(
        ",",
        _csv_field(F.coalesce(F.col("source_node_uuid"), F.lit(""))),
        _csv_field(F.coalesce(F.col("target_node_uuid"), F.lit(""))),
        _csv_field(_rel_type(F.coalesce(F.col("name"), F.lit("")))),
        _csv_field(F.coalesce(F.col("uuid"), F.lit(""))),
        _csv_field(F.coalesce(F.col("fact"), F.lit(""))),
        _csv_field(F.coalesce(F.col("group_id"), F.lit(""))),
    )
    return edges.select(F.col("uuid"), line.alias("line"))


def graph_to_neo4j_csv(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Union frame (kind, uuid, line) for single-pass inspection/tests;
    production writes the two frames to separate shard dirs plus the two
    one-line header files (NODE_HEADER / REL_HEADER)."""
    return (
        nodes_to_neo4j_csv(nodes)
        .select(F.lit("node").alias("kind"), "uuid", "line")
        .unionByName(
            edges_to_neo4j_csv(edges).select(
                F.lit("rel").alias("kind"), "uuid", "line"
            )
        )
    )


def _csv_field_sql(expr: str) -> str:
    return f"concat('\"', replace(coalesce({expr}, ''), '\"', '\"\"'), '\"')"


def neo4j_csv_sql(nodes_table: str, edges_table: str, label: str = "Entity") -> str:
    """DuckDB twin of graph_to_neo4j_csv (oracle helper): identical
    quoting, null handling, and relation-type normalization."""
    return f"""
        SELECT 'node' AS kind, uuid,
               concat({_csv_field_sql('uuid')}, ',',
                      {_csv_field_sql('name')}, ',',
                      {_csv_field_sql('group_id')}, ',',
                      {_csv_field_sql('CAST(mention_count AS VARCHAR)')}, ',',
                      {_csv_field_sql(f"'{label}'")}) AS line
        FROM {nodes_table}
        UNION ALL
        SELECT 'rel' AS kind, uuid,
               concat({_csv_field_sql('source_node_uuid')}, ',',
                      {_csv_field_sql('target_node_uuid')}, ',',
                      {_csv_field_sql("regexp_replace(upper(coalesce(name, '')), '[^A-Z0-9_]+', '_', 'g')")}, ',',
                      {_csv_field_sql('uuid')}, ',',
                      {_csv_field_sql('fact')}, ',',
                      {_csv_field_sql('group_id')}) AS line
        FROM {edges_table}
    """
