"""External-KB sameAs entity linking (operators/kb_link.py) — hand fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators.kb_link import alias_table, kb_alias_pairs, merge_kb_pairs


def _ents(spark, rows):
    return spark.createDataFrame(
        rows, "group_id string, entity_uuid string, name_norm string"
    )


def _aliases(spark, rows):
    return spark.createDataFrame(rows, "name string, kb_url string")


def test_kb_pairs_link_different_surface_forms(spark):
    """Two surface forms sharing a KB id pair up even with zero name
    similarity — the case token/LSH blocking cannot catch."""
    ents = _ents(
        spark,
        [
            ("g", "u1", "ibm"),
            ("g", "u2", "international_business_machines"),
            ("g", "u3", "zeta_corp"),
        ],
    )
    al = _aliases(
        spark,
        [
            ("IBM", "https://wd.example.org/Q37156"),
            ("International Business Machines", "https://wd.example.org/Q37156"),
            ("Zeta Corp", "https://wd.example.org/Q999"),
        ],
    )
    got = kb_alias_pairs(ents, al).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["uuid_a"], r["uuid_b"]) == ("u1", "u2")
    assert r["kb_url"] == "https://wd.example.org/Q37156"


def test_kb_pairs_group_scoped_and_df_capped(spark):
    """Pairs never cross group_id, and a hot KB id above max_df is dropped
    (blocker hygiene) instead of enumerated."""
    ents = _ents(
        spark,
        [("g1", "a", "x"), ("g2", "b", "x")]
        + [("g3", f"h{i}", f"hot{i}") for i in range(5)],
    )
    al = _aliases(
        spark,
        [("x", "https://wd.example.org/Q1")]
        + [(f"hot{i}", "https://wd.example.org/HOT") for i in range(5)],
    )
    # same name+kb in different groups -> no cross-group pair
    assert kb_alias_pairs(ents, al).filter(F.col("kb_url").endswith("Q1")).count() == 0
    # hot id: C(5,2)=10 pairs at cap>=5, zero below
    assert kb_alias_pairs(ents, al, max_df=5).count() == 10
    assert kb_alias_pairs(ents, al, max_df=4).count() == 0


def test_alias_table_from_jsonld_entities(spark):
    ents = spark.createDataFrame(
        [("u", 0, "Person", "Ada", None, ["k1", "k1", ""], None)],
        "url string, block_idx int, etype string, name string, "
        "entity_url string, same_as array<string>, works_for string",
    )
    got = alias_table(ents).collect()
    assert [(r["name"], r["kb_url"]) for r in got] == [("Ada", "k1")]


def test_merge_kb_pairs_sentinel_and_no_overwrite(spark):
    accepted = spark.createDataFrame(
        [("g", "u1", "u2", 0.93)],
        "group_id string, uuid_a string, uuid_b string, fuzzy double",
    )
    kb = spark.createDataFrame(
        [("g", "u1", "u2", "k"), ("g", "u1", "u9", "k2")],
        "group_id string, uuid_a string, uuid_b string, kb_url string",
    )
    got = {(r["uuid_a"], r["uuid_b"]): r["fuzzy"] for r in merge_kb_pairs(accepted, kb).collect()}
    assert got == {("u1", "u2"): 0.93, ("u1", "u9"): 1.0}


def test_duplicate_pairs_stage_with_kb_aliases(spark):
    """End-to-end through the ER stage: zero-name-similarity surface forms
    merge ONLY when sameAs assertions bind them, with the sentinel 1.0
    score; without aliases the scorer correctly keeps them apart."""
    from graphiti_spark.operators.er import duplicate_pairs_stage

    mentions = spark.createDataFrame(
        [
            ("g", "e1", "ep1", "IBM"),
            ("g", "e2", "ep2", "International Business Machines"),
        ],
        "group_id string, entity_uuid string, episode_uuid string, name string",
    )
    _, accepted = duplicate_pairs_stage(mentions)
    assert accepted.count() == 0

    al = _aliases(
        spark,
        [
            ("IBM", "https://wd.example.org/Q37156"),
            ("International Business Machines", "https://wd.example.org/Q37156"),
        ],
    )
    _, accepted = duplicate_pairs_stage(mentions, kb_aliases=al)
    rows = accepted.collect()
    assert len(rows) == 1
    assert rows[0]["fuzzy"] == 1.0
    assert {rows[0]["uuid_a"], rows[0]["uuid_b"]} == {"e1", "e2"}
