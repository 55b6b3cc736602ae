"""Typed entity/edge schema registry tests (reference parity:
node_operations.py:680-688 entity attribute models; edge_operations.py:
522-540 fact_type classification)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators.typed_schemas import (
    EdgeTypeDef,
    EntityTypeDef,
    FieldDef,
    TypeRegistry,
    apply_edge_types,
    apply_entity_types,
)

REG = TypeRegistry(
    entity_types=(
        EntityTypeDef(
            name="Organization",
            name_pattern=r"(?:Systems|Corp|Inc)$",
            fields=(FieldDef("industry", r"operates in the (\w+) sector"),),
        ),
        EntityTypeDef(
            name="Person",
            evidence_pattern=r"\bborn\b|\bjoined\b",
            fields=(
                FieldDef("joined_year", r"joined .*? in (\d{4})"),
                FieldDef("birth_year", r"born in (\d{4})"),
            ),
        ),
    ),
    edge_types=(
        EdgeTypeDef(
            name="EMPLOYMENT",
            predicate_pattern=r"^(JOINED|HIRED|WORKS_AT)$",
            fields=(FieldDef("start_year", r"\b(\d{4})\b"),),
        ),
        EdgeTypeDef(name="ACQUISITION", fact_pattern=r"\bacquired\b"),
    ),
)


def test_entity_type_classification_and_fields(spark):
    nodes = spark.createDataFrame(
        [
            ("n1", "Acme Systems", "Acme Systems operates in the robotics sector"),
            ("n2", "Alice Brown", "Alice Brown joined Acme Systems in 2021"),
            ("n3", "Plain Thing", "nothing typed here"),
        ],
        "uuid string, name string, summary string",
    )
    out = {r["uuid"]: r for r in apply_entity_types(nodes, REG).collect()}
    assert out["n1"]["labels"] == ["Entity", "Organization"]
    assert out["n1"]["attributes"]["industry"] == "robotics"
    assert out["n2"]["labels"] == ["Entity", "Person"]
    assert out["n2"]["attributes"]["joined_year"] == "2021"
    assert "birth_year" not in out["n2"]["attributes"]  # empty capture omitted
    assert out["n3"]["labels"] == ["Entity"]
    assert out["n3"]["attributes"] == {}


def test_entity_type_round_trip_custom_type(spark):
    """A caller-supplied custom type round-trips through attributes
    (VERDICT r1 #7 done-criterion)."""
    reg = TypeRegistry(
        entity_types=(
            EntityTypeDef(
                name="City",
                evidence_pattern=r"\bpopulation\b",
                fields=(FieldDef("population", r"population (?:of )?([\d,]+)"),),
            ),
        )
    )
    nodes = spark.createDataFrame(
        [("c1", "Berlin", "Berlin has a population of 3,700,000", {"k": "v"})],
        "uuid string, name string, summary string, attributes map<string,string>",
    )
    row = apply_entity_types(nodes, reg).collect()[0]
    assert row["labels"] == ["Entity", "City"]
    assert row["attributes"]["population"] == "3,700,000"
    assert row["attributes"]["k"] == "v"  # existing attributes preserved


def test_edge_fact_type_replaces_name(spark):
    edges = spark.createDataFrame(
        [
            ("e1", "JOINED", "Alice Brown joined Acme Systems in 2021."),
            ("e2", "BOUGHT", "Globex acquired Initech."),
            ("e3", "LIKES", "Bob likes trains."),
        ],
        "uuid string, name string, fact string",
    )
    out = {r["uuid"]: r for r in apply_edge_types(edges, REG).collect()}
    # matched: name replaced by fact_type (edge_operations.py:524-525)
    assert out["e1"]["fact_type"] == "EMPLOYMENT" and out["e1"]["name"] == "EMPLOYMENT"
    assert out["e1"]["attributes"]["start_year"] == "2021"
    assert out["e2"]["fact_type"] == "ACQUISITION" and out["e2"]["name"] == "ACQUISITION"
    # unmatched: DEFAULT keeps the extracted predicate
    assert out["e3"]["fact_type"] == "DEFAULT" and out["e3"]["name"] == "LIKES"
    assert out["e3"]["attributes"] == {}


def test_registry_order_wins(spark):
    reg = TypeRegistry(
        entity_types=(
            EntityTypeDef(name="First", name_pattern=r"^X"),
            EntityTypeDef(name="Second", name_pattern=r"^X"),
        )
    )
    nodes = spark.createDataFrame([("u", "Xenon", "")], "uuid string, name string, summary string")
    assert apply_entity_types(nodes, reg).collect()[0]["labels"] == ["Entity", "First"]


def test_empty_registry_is_identity(spark):
    nodes = spark.createDataFrame([("u", "A", "")], "uuid string, name string, summary string")
    assert apply_entity_types(nodes, TypeRegistry()).columns == nodes.columns


def test_pipeline_with_registry(spark):
    """run_pipeline(registry=...) classifies final nodes/edges; resume key
    changes with the registry."""
    from graphiti_spark.plans.pipeline import run_pipeline
    from graphiti_spark.synth import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").limit(40)
    out = run_pipeline(spark, pages, registry=REG)
    nodes, edges = out["nodes"], out["edges"]
    assert "labels" in nodes.columns and "fact_type" in edges.columns
    orgs = nodes.filter(F.array_contains("labels", "Organization"))
    assert orgs.count() > 0  # synth corpus emits '<X> Systems' org names
    typed = edges.filter(F.col("fact_type") == "EMPLOYMENT")
    assert typed.count() > 0
    assert typed.filter(F.col("name") != "EMPLOYMENT").count() == 0
