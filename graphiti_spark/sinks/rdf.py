"""N-Triples (RDF 1.1) export / import for the canonical KG tables.

A user of the reference exports their graph to standard tooling (SPARQL
stores, rdflib, LOD pipelines); Neo4j covers this with the n10s/neosemantics
plugin over the live store. Here the graph IS a pair of DataFrames, so the
export is a map-only serialization: every canonical edge becomes one
`<subj> <pred> <obj> .` line and every canonical node contributes
`rdfs:label` / mention-count literal lines — W3C N-Triples grammar
(https://www.w3.org/TR/n-triples/), one statement per line, UTF-8.

Scale shape: zero shuffles in either direction. Serialization is a
codegen'd concat over the edge/node partitions (writable with
``df.write.text`` straight from this frame, one shard per partition);
parsing is a codegen'd regexp over ``spark.read.text`` lines. At 10^12
documents both directions stream partition-local.

Determinism: IRIs are minted from the stable canonical uuids
(`<base>entity/<uuid>`) and predicate IRIs from the edge's normalized
relation name, so repeated exports of the same graph are byte-identical.

Reference parity: the reference materializes nodes/edges to Neo4j/FalkorDB
via Cypher (graphiti_core/models/edges/edge_db_queries.py,
graphiti_core/utils/bulk_utils.py:add_nodes_and_edges_bulk); RDF export is
the equivalent interchange surface for a DataFrame-native graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

DEFAULT_BASE = "http://graph.example/"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def _escape_literal(c: Column) -> Column:
    """N-Triples STRING_LITERAL_QUOTE escapes: backslash first, then the
    quote and the two mandatory control characters (ECHAR production)."""
    out = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    return F.replace(out, F.lit("\r"), F.lit("\\r"))


def _pred_local(c: Column) -> Column:
    """Relation name -> IRI-safe local part: lowercase, runs of anything
    outside [a-z0-9_] collapse to '_' (uuids/hex survive unchanged)."""
    return F.regexp_replace(F.lower(c), "[^a-z0-9_]+", "_")


def edges_to_ntriples(
    edges: DataFrame,
    nodes: DataFrame,
    base_iri: str = DEFAULT_BASE,
) -> DataFrame:
    """Serialize the canonical graph as N-Triples: (kind, uuid, line).

    - one relation statement per edge:
        <base>entity/<src> <base>rel/<name_local> <base>entity/<dst> .
    - one rdfs:label literal per node:
        <base>entity/<uuid> <rdfs:label> "<name>" .

    `kind` ('rel' | 'label') and the owning uuid ride along so the frame
    stays joinable/debuggable; `.select("line").write.text(...)` emits a
    spec-compliant document. Map-only over both inputs — no shuffle, no
    collect; partition count (= output shard count) is the inputs'.
    """
    ent = F.lit(base_iri + "entity/")
    rel_lines = edges.select(
        F.lit("rel").alias("kind"),
        F.col("uuid"),
        F.concat(
            F.lit("<"), ent, F.col("source_node_uuid"),
            F.lit("> <"), F.lit(base_iri + "rel/"), _pred_local(F.col("name")),
            F.lit("> <"), ent, F.col("target_node_uuid"),
            F.lit("> ."),
        ).alias("line"),
    )
    label_lines = nodes.select(
        F.lit("label").alias("kind"),
        F.col("uuid"),
        F.concat(
            F.lit("<"), ent, F.col("uuid"),
            F.lit("> <"), F.lit(RDFS_LABEL), F.lit('> "'),
            _escape_literal(F.col("name")),
            F.lit('" .'),
        ).alias("line"),
    )
    return rel_lines.unionByName(label_lines)


# One triple per line: subject IRI, predicate IRI, then either an object
# IRI or a quoted literal ('"' is not a legal IRI character, so the two
# branches cannot both match). RE2-safe (no backrefs/lookaround) so the
# DuckDB oracle can run the identical pattern.
_NT_IRI_OBJ = r"^<([^>]*)> <([^>]*)> <([^>]*)> \.$"
_NT_LIT_OBJ = r'^<([^>]*)> <([^>]*)> "(.*)" \.$'


def _unescape_literal(c: Column) -> Column:
    """Inverse of _escape_literal; '\\\\' decodes last so escaped
    backslashes cannot re-trigger the control decodes."""
    out = F.replace(c, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    out = F.replace(out, F.lit('\\"'), F.lit('"'))
    return F.replace(out, F.lit("\\\\"), F.lit("\\"))


def parse_ntriples(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse N-Triples lines back to (subject, predicate, object, is_literal).

    Object literals are unescaped; comment lines (#) and blanks drop.
    Map-only codegen regexps — the read side of the interchange round-trip
    (`spark.read.text(path)` feeds this directly at any scale).
    """
    c = F.col(line_col)
    iri_subj = F.regexp_extract(c, _NT_IRI_OBJ, 1)
    parsed = lines.select(
        F.when(iri_subj != "", iri_subj)
        .otherwise(F.regexp_extract(c, _NT_LIT_OBJ, 1))
        .alias("subject"),
        F.when(iri_subj != "", F.regexp_extract(c, _NT_IRI_OBJ, 2))
        .otherwise(F.regexp_extract(c, _NT_LIT_OBJ, 2))
        .alias("predicate"),
        F.when(iri_subj != "", F.regexp_extract(c, _NT_IRI_OBJ, 3))
        .otherwise(_unescape_literal(F.regexp_extract(c, _NT_LIT_OBJ, 3)))
        .alias("object"),
        (iri_subj == "").alias("is_literal"),
    )
    return parsed.filter(F.col("subject") != "")
