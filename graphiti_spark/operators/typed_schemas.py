"""Custom typed entity/edge attribute schemas + fact_type classification.

Reference behavior being restated:
 - callers pass Pydantic entity-type models; the LLM classifies each entity
   and fills the model's fields, which land in ``attributes`` and the type
   name in ``labels`` (node_operations.py:628-712, esp. 680-688),
 - ``resolve_extracted_edge`` classifies each fact into a caller-supplied
   edge-type registry; a non-DEFAULT ``fact_type`` replaces the edge name
   and typed attributes are extracted from the fact
   (edge_operations.py:458-574, esp. 522-540).

Deterministic Spark restatement: a type definition carries declarative
regex predicates (entity name / evidence text, predicate name / fact text)
and per-field regex extractors. Classification and extraction are pure
Column expressions (rlike + regexp_extract) — JVM-side, codegen-friendly,
no UDF: at 100 TB this stays a map over the nodes/edges tables with zero
shuffles. First matching type in registry order wins (the reference's LLM
returns exactly one type; registry order is the deterministic analog).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldDef:
    """One typed attribute: regex with ONE capture group over the source
    text (entity evidence/summary, or edge fact)."""

    name: str
    pattern: str
    cast: str = "string"  # informational; attributes map stores strings


@dataclass(frozen=True)
class EntityTypeDef:
    """Entity type: matches by entity-name regex and/or evidence regex."""

    name: str
    name_pattern: str | None = None
    evidence_pattern: str | None = None
    fields: tuple[FieldDef, ...] = ()


@dataclass(frozen=True)
class EdgeTypeDef:
    """Edge fact type: matches by predicate-name regex and/or fact regex."""

    name: str
    predicate_pattern: str | None = None
    fact_pattern: str | None = None
    fields: tuple[FieldDef, ...] = ()


@dataclass(frozen=True)
class TypeRegistry:
    entity_types: tuple[EntityTypeDef, ...] = ()
    edge_types: tuple[EdgeTypeDef, ...] = ()


_EMPTY_MAP_SQL = "cast(map() as map<string,string>)"


def _empty_map() -> Column:
    return F.expr(_EMPTY_MAP_SQL)


def _match_col(text_col: Column, pattern: str | None) -> Column:
    if pattern is None:
        return F.lit(True)
    return text_col.rlike(pattern)


def _merge_attr_maps(base: Column, extra: Column) -> Column:
    """Merge two string maps, extra wins on key conflicts. Spark's default
    mapKeyDedupPolicy=EXCEPTION makes naive concat throw on duplicates, so
    base keys shadowed by extra are dropped first."""
    kept = F.filter(
        F.map_keys(base), lambda k: ~F.array_contains(F.map_keys(extra), k)
    )
    keys = F.concat(kept, F.map_keys(extra))
    vals = F.concat(
        F.transform(kept, lambda k: F.element_at(base, k)), F.map_values(extra)
    )
    return F.map_from_arrays(keys, vals)


def apply_entity_types(
    nodes: DataFrame,
    registry: TypeRegistry,
    name_col: str = "name",
    evidence_col: str = "summary",
) -> DataFrame:
    """Classify entities and extract typed attributes (node_operations.py:
    680-688 restated).

    Adds/updates:
     - ``labels``: ['Entity', <TypeName>] for matched rows, ['Entity'] else
       (the reference stores labels(n) the same way, nodes.py:193-201),
     - ``attributes``: typed fields regex-extracted from the evidence text
       merged over the existing map (empty captures are omitted).
    """
    if not registry.entity_types:
        return nodes
    name_c = F.col(name_col)
    ev_c = F.coalesce(F.col(evidence_col), F.lit("")) if evidence_col in nodes.columns else F.lit("")

    type_col = F.lit(None).cast("string")
    for t in reversed(registry.entity_types):  # earlier defs win
        cond = _match_col(name_c, t.name_pattern) & _match_col(ev_c, t.evidence_pattern)
        type_col = F.when(cond, F.lit(t.name)).otherwise(type_col)
    out = nodes.withColumn("_etype", type_col)
    out = out.withColumn(
        "labels",
        F.when(
            F.col("_etype").isNotNull(), F.array(F.lit("Entity"), F.col("_etype"))
        ).otherwise(F.array(F.lit("Entity"))),
    )

    has_attrs = "attributes" in nodes.columns
    base_map = (
        F.coalesce(F.col("attributes"), _empty_map())
        if has_attrs
        else _empty_map()
    )
    typed_map = _empty_map()
    for t in registry.entity_types:
        pairs = []
        for fd in t.fields:
            val = F.regexp_extract(ev_c, fd.pattern, 1)
            pairs.append(F.when(val != "", F.struct(F.lit(fd.name).alias("k"), val.alias("v"))))
        if not pairs:
            continue
        entries = F.filter(F.array(*pairs), lambda s: s.isNotNull())
        cand = F.map_from_arrays(
            F.transform(entries, lambda s: s["k"]), F.transform(entries, lambda s: s["v"])
        )
        typed_map = F.when(F.col("_etype") == t.name, cand).otherwise(typed_map)
    out = out.withColumn("attributes", _merge_attr_maps(base_map, typed_map))
    return out.drop("_etype")


def apply_edge_types(
    edges: DataFrame,
    registry: TypeRegistry,
    predicate_col: str = "name",
    fact_col: str = "fact",
) -> DataFrame:
    """fact_type classification (edge_operations.py:522-540 restated).

    Adds ``fact_type`` (matched type name or 'DEFAULT'); a non-DEFAULT type
    REPLACES the edge name (resolved_edge.name = fact_type) and extracts the
    type's fields from the fact into an ``attributes`` map.
    """
    if not registry.edge_types:
        return edges
    pred_c = F.col(predicate_col)
    fact_c = F.coalesce(F.col(fact_col), F.lit(""))

    type_col = F.lit("DEFAULT")
    for t in reversed(registry.edge_types):
        cond = _match_col(pred_c, t.predicate_pattern) & _match_col(fact_c, t.fact_pattern)
        type_col = F.when(cond, F.lit(t.name)).otherwise(type_col)
    out = edges.withColumn("fact_type", type_col)
    out = out.withColumn(
        predicate_col,
        F.when(F.col("fact_type") != "DEFAULT", F.col("fact_type")).otherwise(pred_c),
    )

    typed_map = _empty_map()
    for t in registry.edge_types:
        pairs = []
        for fd in t.fields:
            val = F.regexp_extract(fact_c, fd.pattern, 1)
            pairs.append(F.when(val != "", F.struct(F.lit(fd.name).alias("k"), val.alias("v"))))
        if not pairs:
            continue
        entries = F.filter(F.array(*pairs), lambda s: s.isNotNull())
        cand = F.map_from_arrays(
            F.transform(entries, lambda s: s["k"]), F.transform(entries, lambda s: s["v"])
        )
        typed_map = F.when(F.col("fact_type") == t.name, cand).otherwise(typed_map)
    if "attributes" in edges.columns:
        base_map = F.coalesce(F.col("attributes"), _empty_map())
        out = out.withColumn("attributes", _merge_attr_maps(base_map, typed_map))
    else:
        out = out.withColumn("attributes", typed_map)
    return out
