"""Entity salience (operators/salience.py): hand-computed scores on a
two-episode fixture — frequency damping, first-position bonus, top-k cut,
deterministic tie-break."""

from __future__ import annotations

import math

import pytest

from graphiti_spark.operators.salience import entity_salience


@pytest.fixture(scope="module")
def fixture(spark):
    # ep1 (100 chars): e_lead first at 0 with 2 mentions; e_freq 3 mentions
    # but first at 80; e_tail once at 90.
    mentions = spark.createDataFrame(
        [
            ("g", "ep1", "e_lead", 0),
            ("g", "ep1", "e_lead", 50),
            ("g", "ep1", "e_freq", 80),
            ("g", "ep1", "e_freq", 85),
            ("g", "ep1", "e_freq", 95),
            ("g", "ep1", "e_tail", 90),
            ("g", "ep2", "e_a", 10),
            ("g", "ep2", "e_b", 10),  # exact tie with e_a -> uuid order
        ],
        ["group_id", "episode_uuid", "entity_uuid", "start_pos"],
    )
    episodes = spark.createDataFrame(
        [("ep1", "x" * 100), ("ep2", "y" * 100)], ["uuid", "content"]
    )
    return mentions, episodes


def score(n, first, n_chars=100):
    return round(math.log(1 + n) + (1 - min(first / n_chars, 1.0)), 6)


def test_hand_computed_scores_and_order(fixture):
    mentions, episodes = fixture
    rows = {
        (r["episode_uuid"], r["entity_uuid"]): r
        for r in entity_salience(mentions, episodes).collect()
    }
    assert rows[("ep1", "e_lead")]["salience"] == pytest.approx(score(2, 0))
    assert rows[("ep1", "e_freq")]["salience"] == pytest.approx(score(3, 80))
    assert rows[("ep1", "e_tail")]["salience"] == pytest.approx(score(1, 90))
    # lead-position entity beats the more frequent footer entity
    assert rows[("ep1", "e_lead")]["rank"] == 1
    assert rows[("ep1", "e_freq")]["rank"] == 2
    assert rows[("ep1", "e_tail")]["rank"] == 3
    assert rows[("ep1", "e_lead")]["n_mentions"] == 2
    assert rows[("ep1", "e_freq")]["first_pos"] == 80


def test_tie_breaks_on_entity_uuid(fixture):
    mentions, episodes = fixture
    ep2 = {
        r["entity_uuid"]: r["rank"]
        for r in entity_salience(mentions, episodes).filter(
            "episode_uuid = 'ep2'"
        ).collect()
    }
    assert ep2 == {"e_a": 1, "e_b": 2}


def test_top_k_cut(fixture):
    mentions, episodes = fixture
    got = entity_salience(mentions, episodes, k=1).collect()
    assert {(r["episode_uuid"], r["entity_uuid"]) for r in got} == {
        ("ep1", "e_lead"),
        ("ep2", "e_a"),
    }


def test_first_pos_beyond_content_clamps(spark):
    # truncated episode content (cap at 100k chars): a mention whose
    # start_pos exceeds the stored length must clamp, not go negative
    mentions = spark.createDataFrame(
        [("g", "ep", "e", 500)], ["group_id", "episode_uuid", "entity_uuid", "start_pos"]
    )
    episodes = spark.createDataFrame([("ep", "z" * 100)], ["uuid", "content"])
    row = entity_salience(mentions, episodes).collect()[0]
    assert row["salience"] == pytest.approx(round(math.log(2), 6))
