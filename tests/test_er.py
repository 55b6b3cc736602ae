"""S5 — dedup threshold/guard scenario table (mirrors the reference's dedup
scenario harness, dedup_test_results_*.json, and
maintenance_dedupe_entities.py guards)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.ids import entity_uuid_py
from graphiti_spark.operators.er import candidate_pairs, entity_catalog, score_and_filter_pairs


def _resolve(spark, names: list[str]):
    """Run S5 over a synthetic mention set; return accepted normalized pairs."""
    rows = [(f"e{i}", "g", n) for i, n in enumerate(names)]
    mentions = spark.createDataFrame(rows, "episode_uuid string, group_id string, name string")
    from graphiti_spark.functions.normalize import normalize_entity_name_col

    mentions = mentions.withColumn("name_norm", normalize_entity_name_col("name")).withColumn(
        "entity_uuid",
        F.udf(lambda n: entity_uuid_py(n, "g"))("name"),
    )
    ents = entity_catalog(mentions)
    uuid_to_norm = {r["entity_uuid"]: r["name_norm"] for r in ents.collect()}
    accepted = score_and_filter_pairs(ents, candidate_pairs(ents)).collect()
    return {tuple(sorted((uuid_to_norm[r["uuid_a"]], uuid_to_norm[r["uuid_b"]]))) for r in accepted}


def test_scenarios(spark):
    got = _resolve(
        spark,
        [
            "Graphiti",
            "Graphitti",        # typo: fuzzy 0.94 -> duplicate
            "Claude",
            "Claude Code",      # compound-name guard -> NOT duplicate
            "Alice Smith",
            "Alice Smith-Jones",  # guard: token-superset -> NOT duplicate
            "International Business Machines Corp",
            "International Business Machines Corporation",  # multi-word jaccard/fuzzy -> duplicate
            "Apple",
            "Orange",           # unrelated -> NOT duplicate
        ],
    )
    assert ("graphiti", "graphitti") in got
    assert (
        "international_business_machines_corp",
        "international_business_machines_corporation",
    ) in got
    assert ("claude", "claude_code") not in got
    assert ("alice_smith", "alice_smith_jones") not in got
    assert ("apple", "orange") not in got


def test_exact_variants_share_uuid():
    # tier-1/2 exact resolution is free via deterministic identity.
    assert entity_uuid_py("CLAUDE", "g") == entity_uuid_py("claude", "g")


def test_blocking_df_cap(spark):
    # A token shared by more entities than the cap generates no candidates
    # through block 1 (skew hygiene); unrelated names stay unmatched.
    from graphiti_spark.config import PipelineConfig

    cfg = PipelineConfig(blocking_token_max_df=3)
    names = [f"Zeta{i} Common" for i in range(10)]  # 'common' df=10 > 3
    rows = [(f"e{i}", "g", n) for i, n in enumerate(names)]
    mentions = spark.createDataFrame(rows, "episode_uuid string, group_id string, name string")
    from graphiti_spark.functions.normalize import normalize_entity_name_col

    mentions = mentions.withColumn("name_norm", normalize_entity_name_col("name")).withColumn(
        "entity_uuid", F.udf(lambda n: entity_uuid_py(n, "g"))("name")
    )
    ents = entity_catalog(mentions)
    accepted = score_and_filter_pairs(ents, candidate_pairs(ents, cfg), cfg)
    assert accepted.count() == 0
