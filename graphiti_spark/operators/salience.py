"""Per-episode entity salience: which canonical entities is a page ABOUT,
not merely mentioning?

The reference ranks by raw mention counts where it needs an
importance signal (episode_mentions_reranker,
graphiti_core/search/search_utils.py:990 — rerank = count of episode
co-mentions) and by graph centrality elsewhere. Salience is the
page-local version of that signal, and the two strongest published
features for it are mention frequency and FIRST-mention position
(Dunietz & Gillick 2014, "A New Entity Salience Task with Millions of
Training Examples" — their baseline: position of first mention beats
every other single feature). Score:

    salience = ln(1 + n_mentions) + pos_weight * (1 - first_pos / n_chars)

i.e. log-damped frequency plus a linear early-mention bonus (an entity
first named in the lead paragraph outranks one with the same count whose
first appearance is in the footer).

Downstream uses: per-page key-entity extraction for document tagging,
salience-weighted episodic edges, and corpus-curation signals ("keep
pages whose salient entities hit the allowlist").

Scale shape: one shuffle agg on (group, episode, entity), one equi-join
back to the episode table on episode_uuid (both sides already corpus-
partitioned; no skew — an episode's mention fan-out is page-bounded), and
a per-episode top-k window (partition key = episode, never global). The
corpus is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_salience(
    raw_mentions: DataFrame,
    episodes: DataFrame,
    k: int = 10,
    pos_weight: float = 1.0,
    round_dp: int = 6,
) -> DataFrame:
    """(group_id, episode_uuid, entity_uuid, n_mentions, first_pos,
    salience, rank) — the top-``k`` entities per episode by the
    frequency + first-position score above; ties break on entity_uuid
    for determinism."""
    per = raw_mentions.groupBy("group_id", "episode_uuid", "entity_uuid").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min("start_pos").alias("first_pos"),
    )
    ep_len = episodes.select(
        F.col("uuid").alias("episode_uuid"),
        F.greatest(F.length("content"), F.lit(1)).alias("_n_chars"),
    )
    scored = per.join(ep_len, "episode_uuid").withColumn(
        "salience",
        F.round(
            F.log(F.lit(1.0) + F.col("n_mentions"))
            + F.lit(pos_weight)
            * (F.lit(1.0) - F.least(F.col("first_pos") / F.col("_n_chars"), F.lit(1.0))),
            round_dp,
        ),
    )
    w = Window.partitionBy("group_id", "episode_uuid").orderBy(
        F.desc("salience"), "entity_uuid"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "group_id",
            "episode_uuid",
            "entity_uuid",
            "n_mentions",
            "first_pos",
            "salience",
            "rank",
        )
    )
