"""S5 — entity-resolution candidate generation + similarity verification.

Replaces the reference's O(n²)/LLM dedup with blocking + similarity joins:
 - exact dedup is FREE: entity uuid is uuid5(normalized name, group_id)
   (tier 1-2 of resolve_extracted_nodes, node_operations.py:364-433),
 - fuzzy/semantic candidates come from token blocking ∪ banded MinHash-LSH
   over char-3-grams (the Spark rewrite of bulk_utils.py:266-357 word-overlap
   ∪ embedding-cosine candidate generation),
 - verification applies the reference's scoring rules to candidate pairs only:
     * fuzzy ratio (difflib SequenceMatcher — node_operations.py:82-103),
     * max(fuzzy, 0.8·token-Jaccard)      (uuid_utils.py:158-196),
     * embedding cosine                   (bulk_utils.py:274 min_score 0.8),
     * COMPOUND-NAME GUARD: a name whose token set strictly contains the
       other's is NOT a duplicate ("claude" vs "claude code") —
       maintenance_dedupe_entities.py:139-158, the precision rule that keeps
       P ≥ 0.95.

Scale design (100 TB):
 - blocking tokens above a document-frequency cap are dropped (standard ER
   blocking hygiene; the reference caps fuzzy candidates at 50/group,
   node_operations.py:444-456) — this bounds the self-join fan-out and
   removes head-token skew ("google") before it reaches the shuffle,
 - both blocking joins are equi-joins on (group_id, key) — AQE splits any
   residual skewed partitions,
 - the expensive Python scorer (difflib) runs ONLY on surviving candidate
   pairs, Arrow-batched.
"""

from __future__ import annotations

import difflib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.functions.embeddings import dot_col, hashed_ngram_embedding_udf
from graphiti_spark.functions.hashing import minhash_cols


@F.pandas_udf(DoubleType())
def fuzzy_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """difflib SequenceMatcher.ratio on normalized names
    (node_operations.py:82-103 parity)."""
    return pd.Series(
        [difflib.SequenceMatcher(None, x or "", y or "").ratio() for x, y in zip(a, b)]
    )


def _char_ngrams_col(c, n: int):
    """Array of char n-grams of a string column (JVM-side, via sequence)."""
    padded = F.concat(F.lit("^"), c, F.lit("$"))
    ln = F.length(padded)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substr(padded, i, F.lit(n)))


def entity_catalog(mentions: DataFrame) -> DataFrame:
    """Distinct extraction-time entities with embeddings.

    mention_count is carried for skew diagnostics / hot-key salting decisions.
    """
    ents = (
        mentions.groupBy("group_id", "entity_uuid")
        .agg(
            F.min_by("name", "episode_uuid").alias("name"),
            F.first("name_norm").alias("name_norm"),
            F.count(F.lit(1)).alias("mention_count"),
        )
    )
    return ents.withColumn("name_embedding", hashed_ngram_embedding_udf("name_norm"))


def candidate_pairs(
    entities: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Blocked candidate pairs (uuid_a < uuid_b), token-block ∪ MinHash-LSH."""
    base = entities.select(
        "group_id",
        "entity_uuid",
        "name_norm",
        F.split("name_norm", "_").alias("toks"),
    )

    # --- block 1: shared normalized token, document-frequency capped ---
    # persist(): the exploded token table feeds the df-cap aggregate AND both
    # sides of the self-join — without the barrier each consumer re-explodes.
    tok = (
        base.select("group_id", "entity_uuid", F.explode("toks").alias("tok"))
        .filter(F.length("tok") >= 2)
        .persist()
    )
    tok_df = tok.groupBy("group_id", "tok").agg(F.count(F.lit(1)).alias("df"))
    tok = tok.join(
        tok_df.filter(F.col("df") <= config.blocking_token_max_df).select("group_id", "tok"),
        ["group_id", "tok"],
    )
    block1 = (
        tok.alias("a")
        .join(tok.alias("b"), ["group_id", "tok"])
        .filter(F.col("a.entity_uuid") < F.col("b.entity_uuid"))
        .select(
            "group_id",
            F.col("a.entity_uuid").alias("uuid_a"),
            F.col("b.entity_uuid").alias("uuid_b"),
        )
    )

    # --- block 2: banded MinHash-LSH over char-3-grams (catches typos with
    # no shared whole token: "graphiti" vs "graphitti"). Bands of r=1 row:
    # recall 1-(1-J)^b ≈ 0.9999 at J=0.7; precision is restored by the
    # verification scorer, and hot buckets (common minima like '^th') are
    # capped just like blocking tokens — bounded fan-out under skew. ---
    n_hashes = config.lsh_num_hash_tables
    grams = base.select(
        "group_id",
        "entity_uuid",
        *minhash_cols(_char_ngrams_col(F.col("name_norm"), config.lsh_ngram_size), n_hashes),
    )
    bands = [
        grams.select(
            "group_id",
            "entity_uuid",
            F.lit(i).alias("band"),
            F.col(f"mh{i}").alias("band_hash"),
        )
        for i in range(n_hashes)
    ]
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    # persist(): each of the 8 band branches re-evaluates the md5 minhash
    # family over the char-3-gram arrays; materializing the banded table once
    # stops the bucket-size aggregate and both self-join sides from paying
    # that 8x again.
    banded = banded.persist()
    bucket_sizes = banded.groupBy("group_id", "band", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    banded = banded.join(
        bucket_sizes.filter(F.col("bucket_n") <= config.blocking_token_max_df).select(
            "group_id", "band", "band_hash"
        ),
        ["group_id", "band", "band_hash"],
    )
    block2 = (
        banded.alias("a")
        .join(banded.alias("b"), ["group_id", "band", "band_hash"])
        .filter(F.col("a.entity_uuid") < F.col("b.entity_uuid"))
        .select(
            "group_id",
            F.col("a.entity_uuid").alias("uuid_a"),
            F.col("b.entity_uuid").alias("uuid_b"),
        )
    )

    return block1.unionByName(block2).dropDuplicates(["group_id", "uuid_a", "uuid_b"])


def score_and_filter_pairs(
    entities: DataFrame,
    pairs: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Verify candidates; emit accepted duplicate pairs with scores.

    Acceptance (reference parity, SURVEY.md §2.3):
      compound-name guard AND
      ( fuzzy ≥ 0.9                                  [node_operations.py:436]
        OR (both multi-word AND token-Jaccard ≥ 0.95) [maintenance_dedupe_entities.py:179-187]
        OR (cosine ≥ 0.92 AND fuzzy ≥ 0.8)            [maintenance :44 + bulk :274] )
    """
    e = entities.select(
        "group_id",
        "entity_uuid",
        "name_norm",
        "name_embedding",
        F.split("name_norm", "_").alias("toks"),
    )
    j = (
        pairs.join(
            e.select(
                "group_id",
                F.col("entity_uuid").alias("uuid_a"),
                F.col("name_norm").alias("norm_a"),
                F.col("name_embedding").alias("emb_a"),
                F.col("toks").alias("toks_a"),
            ),
            ["group_id", "uuid_a"],
        ).join(
            e.select(
                "group_id",
                F.col("entity_uuid").alias("uuid_b"),
                F.col("name_norm").alias("norm_b"),
                F.col("name_embedding").alias("emb_b"),
                F.col("toks").alias("toks_b"),
            ),
            ["group_id", "uuid_b"],
        )
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    # Compound-name guard: one token set strictly contains the other.
    a_in_b = (F.size(F.array_except("toks_a", "toks_b")) == 0) & (F.size("toks_a") < F.size("toks_b"))
    b_in_a = (F.size(F.array_except("toks_b", "toks_a")) == 0) & (F.size("toks_b") < F.size("toks_a"))
    la, lb = F.length("norm_a"), F.length("norm_b")
    # ONE narrow projection computes every JVM score, then persist() —
    # a materialization barrier. Without it, predicate pushdown substitutes
    # the 64-dim cosine aggregate into each branch of the downstream filter
    # (~8 re-evaluations measured, 4x the stage cost); with it, filters read
    # plain columns. This is also the natural stage-commit boundary for the
    # scored-candidates table at cluster scale.
    scored = j.select(
        "group_id",
        "uuid_a",
        "uuid_b",
        "norm_a",
        "norm_b",
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias("token_jaccard"),
        # name_embedding is L2-normalized at construction (embeddings.py), so
        # cosine == dot — one interpreted higher-order aggregate per pair
        # instead of three (higher-order fns bypass whole-stage codegen, so
        # this is the hot expression of the verify stage).
        dot_col("emb_a", "emb_b").alias("cosine"),
        (~(a_in_b | b_in_a)).alias("compound_guard"),
        (F.least(la, lb).cast("double") / F.greatest(la, lb)).alias("len_ratio"),
        ((F.size("toks_a") > 1) & (F.size("toks_b") > 1)).alias("multi_word"),
    ).persist()
    # Cheap JVM-side pre-filters before the Python scorer.
    # SequenceMatcher.ratio = 2M/(la+lb) with M <= min(la,lb), so
    # ratio >= t  =>  min(la,lb)/max(la,lb) >= t/(2-t):
    #   t=0.9 -> len_ratio >= 0.818 ; t=0.8 -> len_ratio >= 0.667.
    # And a ratio >= 0.9 alignment implies heavy char-3-gram overlap, so the
    # hashed-ngram cosine is well above 0.35. Only pairs that could still
    # reach an acceptance rule ever touch difflib — this bounds Python-side
    # work to a sliver of the candidate set at corpus scale.
    jac_path = F.col("multi_word") & (F.col("token_jaccard") >= config.maintenance_name_threshold)
    needs_fuzzy = ((F.col("len_ratio") >= 0.818) & (F.col("cosine") >= 0.35)) | (
        (F.col("cosine") >= config.maintenance_embedding_threshold)
        & (F.col("len_ratio") >= 0.667)
    )
    j = scored.filter(F.col("compound_guard") & (jac_path | needs_fuzzy))
    j = j.withColumn(
        "fuzzy",
        F.when(needs_fuzzy, fuzzy_ratio_udf("norm_a", "norm_b")).otherwise(F.lit(0.0)),
    )
    j = j.withColumn(
        "name_similarity", F.greatest(F.col("fuzzy"), F.col("token_jaccard") * 0.8)
    )
    accepted = j.filter(
        (F.col("fuzzy") >= config.fuzzy_threshold)
        | (F.col("multi_word") & (F.col("token_jaccard") >= config.maintenance_name_threshold))
        | (
            (F.col("cosine") >= config.maintenance_embedding_threshold)
            & (F.col("fuzzy") >= config.node_min_score)
        )
    )
    return accepted.select(
        "group_id", "uuid_a", "uuid_b", "fuzzy", "token_jaccard", "cosine", "name_similarity"
    )


def duplicate_pairs_stage(
    mentions: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> tuple[DataFrame, DataFrame]:
    """mentions -> (entity catalog, accepted duplicate pairs)."""
    ents = entity_catalog(mentions)
    pairs = candidate_pairs(ents, config)
    accepted = score_and_filter_pairs(ents, pairs, config)
    return ents, accepted
