"""Declarative triple-pattern matching over the canonical edge table —
the SPARQL-BGP / Cypher-MATCH core as a DataFrame fold.

The reference exposes its graph through Cypher (driver queries in
graphiti_core/graph_queries.py build MATCH patterns over Neo4j); a
DataFrame-native graph answers the same basic-graph-pattern queries by
compiling the pattern into a chain of equi-joins — which is exactly what
a Cypher engine's BGP planner emits, except here Catalyst does the join
ordering/broadcasting.

A pattern is a list of (subject, predicate, object) terms; a term
starting with ``?`` is a variable, anything else a constant. Example:

    match_pattern(edges, [("?a", "SUPPORTS", "?x"),
                          ("?b", "SUPPORTS", "?x")])

binds (a, b, x) to co-support pairs. Variables repeated inside one
triple constrain equality; variables shared across triples become join
keys; a triple sharing no variable with the bindings so far produces a
cross product (legal BGP semantics — warned in the docstring because at
scale it is almost always a query bug).

Scale shape: each triple is one constant-pruned scan of the edge table
(predicate constants push down to the parquet/Iceberg scan), each shared
variable one hash equi-join on node uuids — uniform keys, AQE handles
sizing/broadcast. Multiplicity follows SPARQL BGP semantics (no implicit
DISTINCT); callers dedup when they need set semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _triple_frame(
    edges: DataFrame,
    s: str,
    p: str,
    o: str,
    src_col: str,
    rel_col: str,
    dst_col: str,
) -> DataFrame:
    d = edges.select(
        F.col(src_col).alias("_s"),
        F.col(rel_col).alias("_p"),
        F.col(dst_col).alias("_o"),
    )
    out_cols: dict[str, str] = {}
    for term, c in ((s, "_s"), (p, "_p"), (o, "_o")):
        if _is_var(term):
            v = term[1:]
            if not v:
                raise ValueError("empty variable name '?'")
            if v in out_cols:
                d = d.filter(F.col(out_cols[v]) == F.col(c))
            else:
                out_cols[v] = c
        else:
            d = d.filter(F.col(c) == F.lit(term))
    if not out_cols:
        # fully-ground triple: boolean existence, exposed as 0/1 rows.
        # limit(1) makes the marker count-preserving under crossJoin —
        # N duplicate edge rows matching the constants must gate, not
        # multiply, the bindings of the variable triples.
        return d.limit(1).select(F.lit(True).alias("_matched"))
    return d.select(*[F.col(c).alias(v) for v, c in out_cols.items()])


def match_pattern(
    edges: DataFrame,
    pattern: list[tuple[str, str, str]],
    src_col: str = "source_node_uuid",
    rel_col: str = "name",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Solve the basic graph pattern; returns one column per distinct
    variable. Triples are joined left-to-right on shared variables;
    disconnected triples cross-join (documented BGP semantics)."""
    if not pattern:
        raise ValueError("pattern must contain at least one triple")
    result: DataFrame | None = None
    for s, p, o in pattern:
        t = _triple_frame(edges, s, p, o, src_col, rel_col, dst_col)
        if result is None:
            result = t
            continue
        # A prior ground-triple marker has already gated the row count
        # (0 or 1 rows through limit(1)); drop the spent column before the
        # next join so two markers never collide as duplicate '_matched'
        # columns in a crossJoin.
        if "_matched" in result.columns and len(result.columns) > 1:
            result = result.drop("_matched")
        if set(result.columns) == {"_matched"} and set(t.columns) == {"_matched"}:
            # AND of two existence markers: 0/1-row crossJoin, one column out
            result = (
                result.crossJoin(t.withColumnRenamed("_matched", "_matched2"))
                .select(F.lit(True).alias("_matched"))
            )
            continue
        shared = sorted((set(result.columns) & set(t.columns)) - {"_matched"})
        if shared:
            result = result.join(t, shared)
        else:
            result = result.crossJoin(t)
    assert result is not None
    # _matched marker columns from ground triples collapse away
    keep = [c for c in result.columns if c != "_matched"]
    return result.select(*keep) if keep else result
