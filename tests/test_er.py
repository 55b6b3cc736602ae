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
            "International Business Machine",
            "International Business Machines",  # multi-word jaccard/fuzzy -> duplicate
            "Apple",
            "Orange",           # unrelated -> NOT duplicate
        ],
    )
    assert ("graphiti", "graphitti") in got
    assert (
        "international_business_machine",
        "international_business_machines",
    ) in got
    assert ("claude", "claude_code") not in got
    assert ("alice_smith", "alice_smith_jones") not in got
    assert ("apple", "orange") not in got


def test_exact_variants_share_uuid():
    # tier-1/2 exact resolution is free via deterministic identity.
    assert entity_uuid_py("CLAUDE", "g") == entity_uuid_py("claude", "g")
    # enhanced identity (uuid_utils.py:99-155 default): company indicators
    # drop and abbreviations expand BEFORE uuid5, so Corp/Corporation
    # variants are the same entity at extraction time — no ER pair needed.
    assert entity_uuid_py("International Business Machines Corp", "g") == entity_uuid_py(
        "International Business Machines Corporation", "g"
    )
    assert entity_uuid_py("Acme's Widgets", "g") == entity_uuid_py("Acme Widgets", "g")
    assert entity_uuid_py("Café Noir", "g") == entity_uuid_py("Cafe Noir", "g")
    assert entity_uuid_py("Dr. John Smith", "g") == entity_uuid_py("John Smith", "g")
    assert entity_uuid_py("Bob Dylan", "g") == entity_uuid_py("Robert Dylan", "g")
    # filtered-to-empty falls back to the ORIGINAL string, so 'Dr.' and 'Inc'
    # keep distinct identities instead of colliding on ''
    assert entity_uuid_py("Dr.", "g") != entity_uuid_py("Inc", "g")


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


def test_gate_follows_lowered_config(spark):
    """The difflib gate derives from the SAME config as the acceptance filter
    (ADVICE r1): with fuzzy_threshold lowered to 0.72, a pair whose
    SequenceMatcher ratio is ~0.73 (below the default 0.9, above 0.72) must
    be scored and accepted — the old baked-in 0.818 length-ratio gate would
    have left fuzzy=0.0 and dropped it."""
    import dataclasses
    import difflib

    from graphiti_spark.config import DEFAULT_CONFIG

    a, b = "northga", "northgate"  # char-3-gram LSH blocks them together
    ratio = difflib.SequenceMatcher(None, a, b).ratio()
    assert 0.72 <= ratio < 0.9  # mid-band: needs the config-derived gate
    # length ratio 7/9 = 0.778 sits between the lowered bound
    # 0.72/(2-0.72)=0.5625 and the default bound 0.9/(2-0.9)=0.818 — the old
    # baked-in gate would skip difflib entirely for this pair
    assert 0.5625 < min(len(a), len(b)) / max(len(a), len(b)) < 0.818
    cfg = dataclasses.replace(DEFAULT_CONFIG, fuzzy_threshold=0.72)

    rows = [("e1", "g", a), ("e2", "g", b)]
    mentions = spark.createDataFrame(rows, "episode_uuid string, group_id string, name string")
    from graphiti_spark.functions.normalize import normalize_entity_name_col

    mentions = mentions.withColumn("name_norm", normalize_entity_name_col("name")).withColumn(
        "entity_uuid", F.udf(lambda n: entity_uuid_py(n, "g"))("name")
    )
    ents = entity_catalog(mentions)
    accepted_low = score_and_filter_pairs(ents, candidate_pairs(ents, cfg), cfg).collect()
    assert len(accepted_low) == 1
    assert abs(accepted_low[0]["fuzzy"] - ratio) < 1e-9  # actually scored, not gated to 0
    # default config: same pair correctly rejected (ratio < 0.9)
    accepted_def = score_and_filter_pairs(ents, candidate_pairs(ents)).collect()
    assert not any(r["fuzzy"] >= 0.9 for r in accepted_def)


def test_distinct_name_scoring_fans_back_to_every_group(spark):
    # The scorer dedups to distinct (norm_a, norm_b) and joins scores back;
    # an identical candidate name pair occurring in MANY groups must yield
    # one accepted pair per group, scored identically (regression for the
    # distinct-then-join-back rewrite).
    from graphiti_spark.functions.normalize import normalize_entity_name_col

    rows = []
    for g in ("g1", "g2", "g3"):
        for i, n in enumerate(["Graphiti", "Graphitti"]):
            rows.append((f"e{g}{i}", g, n))
    mentions = spark.createDataFrame(rows, "episode_uuid string, group_id string, name string")
    mentions = mentions.withColumn("name_norm", normalize_entity_name_col("name")).withColumn(
        "entity_uuid",
        F.udf(lambda n, g: entity_uuid_py(n, g))("name", "group_id"),
    )
    ents = entity_catalog(mentions)
    accepted = score_and_filter_pairs(ents, candidate_pairs(ents)).collect()
    assert sorted(r["group_id"] for r in accepted) == ["g1", "g2", "g3"]
    assert len({(round(r["fuzzy"], 6), round(r["cosine"], 6)) for r in accepted}) == 1
