"""RelevanceScorer restated: batch heuristic scoring, weighted score fusion,
and the EMA + time-decay feedback loop over a persisted feedback table.

Reference: /root/reference/graphiti_core/relevance/scorer.py:47-352 and
relevance/models.py:36-88. The reference's per-memory asyncio flow is:
 - score each retrieved memory (LLM and/or keyword-Jaccard heuristic),
 - combine sources by renormalized weighted average,
 - fold the score into a per-memory MemoryFeedback record: EMA with
   alpha=0.3, usage_count += 1, last_accessed = now, exponential time
   decay with a configurable half-life; effective = avg * decay.

Spark restatement: every step is a column expression over (memories x
queries) DataFrames; the feedback store is a table keyed by memory_id,
updated with one join per scoring round and persisted with
``sinks.tables.upsert_table`` (the node-property writeback twin). The LLM
scoring path is the one deliberately absent piece: scoring here is the
reference's own heuristic (scorer.py:133-151), which it runs whenever
``enable_heuristic_scoring`` is on.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col

EMA_ALPHA = 0.3          # models.py:67 — weight of the newest score
DECAY_LN2 = 0.693        # models.py:83 — the reference hardcodes ln(2) as 0.693


def heuristic_relevance_col(query: str, content_col: Column | str, response_col: Column | None = None) -> Column:
    """The reference's heuristic score (scorer.py:133-151): 0.3 + 0.4 *
    Jaccard(query tokens, memory tokens); +0.2 (capped at 1.0) when the
    memory's first 50 chars appear in the agent response. Pure JVM
    expression — no UDF."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    q_toks = sorted({t for t in query.lower().split() if t})
    if not q_toks:
        return F.lit(0.5)
    qa = F.array(*[F.lit(t) for t in q_toks])
    mem = F.array_distinct(tokens_col(c))
    inter = F.size(F.array_intersect(mem, qa))
    union = F.size(F.array_union(mem, qa))
    score = F.when(union > 0, F.lit(0.3) + F.lit(0.4) * inter.cast("double") / union).otherwise(
        F.lit(0.5)
    )
    if response_col is not None:
        hit = F.coalesce(response_col, F.lit("")).contains(F.substring(c, 1, 50))
        score = F.when(hit, F.least(F.lit(1.0), score + F.lit(0.2))).otherwise(score)
    return score


def combine_scores_col(
    semantic: Column | None = None,
    keyword: Column | None = None,
    graph: Column | None = None,
    historical: Column | None = None,
    weights: tuple[float, float, float, float] = (0.4, 0.3, 0.2, 0.1),
) -> Column:
    """Weighted average with renormalization over the PRESENT sources and a
    [0, 1] clamp (scorer.py:combine_scores; default weights
    ScoringConfig:128-131). Null scores in a present column contribute the
    neutral 0.5 the reference would fall back to."""
    cols = [semantic, keyword, graph, historical]
    present = [(c, w) for c, w in zip(cols, weights) if c is not None]
    if not present:
        return F.lit(0.5)
    total = sum(w for _, w in present)
    combined = None
    for c, w in present:
        term = F.coalesce(c, F.lit(0.5)) * F.lit(w / total)
        combined = term if combined is None else combined + term
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), combined))


def empty_feedback(spark) -> DataFrame:
    return spark.createDataFrame(
        [],
        "memory_id string, avg_relevance double, usage_count long, "
        "last_accessed timestamp, decay_factor double",
    )


def update_feedback(
    feedback: DataFrame,
    new_scores: DataFrame,
    now_iso: str,
    half_life_days: float = 30.0,
) -> DataFrame:
    """One scoring round folded into the feedback table
    (scorer.update_memory_feedback + MemoryFeedback.add_score/apply_decay).

    ``new_scores``: (memory_id, score). Per matched memory: EMA
    avg = 0.3*new + 0.7*old (first score initializes), usage_count += 1,
    last_accessed = now, decay recomputed against ``now``; unmatched
    existing rows keep their stats but their decay still advances
    (apply_decay runs on access in the reference; recomputing it for all
    rows keeps `effective_score` monotone in idle time). Deterministic:
    ``now`` is an injected timestamp, never wall clock.

    Shape: ONE outer join keyed on memory_id — upsert the result with
    sinks.tables.upsert_table for the node-writeback analog.
    """
    now = F.to_timestamp(F.lit(now_iso))
    s = new_scores.select("memory_id", F.col("score").cast("double").alias("_new"))
    j = feedback.join(s, "memory_id", "full")
    scored = F.col("_new").isNotNull()
    had = F.col("avg_relevance").isNotNull()
    avg = (
        F.when(scored & had, F.lit(EMA_ALPHA) * F.col("_new") + F.lit(1 - EMA_ALPHA) * F.col("avg_relevance"))
        .when(scored, F.col("_new"))
        .otherwise(F.col("avg_relevance"))
    )
    last = F.when(scored, now).otherwise(F.col("last_accessed"))
    days_idle = (F.unix_micros(now) - F.unix_micros(last)).cast("double") / F.lit(86400.0 * 1e6)
    decay = F.when(last.isNull(), F.lit(1.0)).otherwise(
        F.exp(F.lit(-DECAY_LN2) * days_idle / F.lit(half_life_days))
    )
    return j.select(
        "memory_id",
        avg.alias("avg_relevance"),
        (F.coalesce(F.col("usage_count"), F.lit(0)) + F.when(scored, F.lit(1)).otherwise(F.lit(0))).alias("usage_count"),
        last.alias("last_accessed"),
        decay.alias("decay_factor"),
    )


def effective_score_col() -> Column:
    """avg_relevance * decay_factor (models.py:85-88)."""
    return F.coalesce(F.col("avg_relevance"), F.lit(0.0)) * F.coalesce(F.col("decay_factor"), F.lit(1.0))


def filter_relevant(feedback: DataFrame, min_threshold: float = 0.3) -> DataFrame:
    """Drop memories whose effective score fell below the retrieval
    threshold (ScoringConfig.min_relevance_threshold:102-106)."""
    return feedback.filter(effective_score_col() >= min_threshold)
