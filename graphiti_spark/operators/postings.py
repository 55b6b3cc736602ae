"""Persisted blocking-key postings for incremental entity resolution.

The incremental ingest's candidate generation (plans/incremental.py) needs,
per batch, every catalog entity that shares a blocking key (normalized
token or name-MinHash band) with a new-batch entity. Recomputing the keys
inline re-tokenizes and re-minhashes the ENTIRE catalog every increment —
a full-width python-adjacent pass whose cost grows with the corpus, not
the batch (the reference pays the analog on every add_episode via its
fulltext index lookups, search/search_utils.py hybrid_node_search).

This module persists the keys once: a ``postings`` state table of

    (group_id, kind 'tok'|'band', key, entity_uuid, name_sig)

written append-only in per-batch dirs (same idempotent layout as
mentions_raw). ``name_sig = xxhash64(name_norm)`` stamps which catalog
name produced the row: representative names DRIFT as mentions accumulate
(entity_catalog takes the lexicographic min over all mentions), so an
entity's postings are re-emitted when its name changes and the stale rows
are invalidated AT READ TIME by an equi-join against the current catalog
on (entity_uuid, name_sig) — the parquet restatement of an Iceberg
equality delete; no rewrite, no tombstones (catalog rows are never
deleted, merged entities keep theirs).

Each increment writes postings for EVERY entity touched by the batch, not
just those whose names changed: the batch dir is content-addressed, so a
crashed-and-replayed batch rewrites the identical row set (idempotent),
whereas a changed-only write replayed after the catalog upsert landed
would see zero changes and clobber its own earlier rows. Touched-but-
unchanged rows duplicate rows from earlier batches; the read-time dedup
collapses them (on a real table format, periodic compaction reclaims the
storage).

Per-increment cost after this: computing keys is O(touched entities); the
candidate lookup is one columnar scan of postings behind a BROADCAST
semi-join on the new batch's keys (map-side, no shuffle of the postings
table; partition/bloom-prunable under a real table format), then
validation, dedup, df-capping and pair enumeration over the matched
members only — O(members of touched buckets), df-capped.

Equivalence contract: candidate_pairs_from_postings over correctly
maintained postings state returns EXACTLY the pairs of the inline
recompute (plans/incremental._incremental_candidate_pairs) — pinned by
tests/test_postings.py, including the name-drift case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.functions.hashing import minhash_cols
from graphiti_spark.operators.er import _char_ngrams_col
from graphiti_spark.session import plan_width

POSTING_COLS = ("group_id", "kind", "key", "pos", "entity_uuid", "name_sig")


def name_sig_col(name_norm) -> F.Column:
    """64-bit signature of the catalog name a postings row was derived from."""
    return F.xxhash64(name_norm)


def entity_postings(
    entities: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Blocking-key postings for catalog rows (group_id, entity_uuid, name_norm).

    Emits the SAME key population as the inline blockers in
    er.candidate_pairs / incremental._incremental_candidate_pairs:
      - kind='tok': normalized-name tokens of length >= 2,
      - kind='band': the banded name-MinHash over char n-grams, key
        "<band>:<hash>" (':' cannot merge distinct (band, hash) pairs —
        band is an int and hash a long, neither contains ':'). NULL band
        hashes (empty name_norm) are dropped exactly as the inline
        equi-join drops them.
    ``pos`` is the occurrence index WITHIN the name (token position / band
    index): the inline blocker counts bucket df over exploded rows, so a
    token repeated inside one name counts twice toward the cap — pos
    preserves that multiplicity across the read-time dedup that collapses
    cross-batch duplicate writes.
    Map-only: no shuffle, no UDF (minhash_cols is a column expression).
    """
    base = entities.select(
        "group_id",
        "entity_uuid",
        "name_norm",
        F.split("name_norm", "_").alias("toks"),
    )
    tok = (
        base.select(
            "group_id",
            "entity_uuid",
            F.lit("tok").alias("kind"),
            F.posexplode("toks").alias("pos", "key"),
            name_sig_col(F.col("name_norm")).alias("name_sig"),
        )
        .filter(F.length("key") >= 2)
    )
    n_hashes = config.lsh_num_hash_tables
    grams = base.select(
        "group_id",
        "entity_uuid",
        "name_norm",
        *minhash_cols(_char_ngrams_col(F.col("name_norm"), config.lsh_ngram_size), n_hashes),
    )
    band = (
        grams.select(
            "group_id",
            "entity_uuid",
            "name_norm",
            F.posexplode(F.array(*[F.col(f"mh{i}") for i in range(n_hashes)])).alias(
                "band", "band_hash"
            ),
        )
        .filter(F.col("band_hash").isNotNull())
        .select(
            "group_id",
            "entity_uuid",
            F.lit("band").alias("kind"),
            F.concat(F.col("band").cast("string"), F.lit(":"), F.col("band_hash").cast("string")).alias("key"),
            F.col("band").alias("pos"),
            name_sig_col(F.col("name_norm")).alias("name_sig"),
        )
    )
    return tok.unionByName(band).select(*POSTING_COLS)


def candidate_pairs_from_postings(
    postings_all: DataFrame,
    entities_all: DataFrame,
    post_touched: DataFrame,
    new_ids: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Candidate pairs (uuid_a < uuid_b) where >= 1 side is a new-batch entity.

    ``postings_all``: the postings state (all batches, stale rows included).
    ``entities_all``: the CURRENT catalog (post-refresh) — validation source.
    ``post_touched``: this batch's postings (current rows for every entity
    seen in the batch — whether or not their names changed), small.
    ``new_ids``: (group_id, entity_uuid) seen in this batch, small.

    Same df cap / >=2 members / >=1 new member filters and the same
    enumeration as incremental._incremental_candidate_pairs — the two are
    equivalence-tested against each other.
    """
    keys_touched = post_touched.select("group_id", "kind", "key").distinct()
    # Map-side: the postings scan survives only where a touched key matches.
    members = postings_all.join(F.broadcast(keys_touched), ["group_id", "kind", "key"], "left_semi")
    # Validate against current names: rows written for a superseded name have
    # a name_sig no current catalog row carries, and drop out here (stale
    # rows for entity X can't survive via another entity's row — the join is
    # on entity_uuid too). The catalog side is first semi-joined down to the
    # members' entity set so the validation join is broadcast-sized.
    member_ids = members.select("entity_uuid").distinct()
    cat_sigs = (
        entities_all.join(F.broadcast(member_ids), "entity_uuid", "left_semi")
        .select("entity_uuid", name_sig_col(F.col("name_norm")).alias("name_sig"))
    )
    live = members.join(F.broadcast(cat_sigs), ["entity_uuid", "name_sig"], "left_semi")
    # An A->B->A name flip leaves two identical live row SETS (both batches
    # wrote (X, A)); collapse before counting. pos keeps within-name key
    # multiplicity, so df still matches the inline recompute's exploded-row
    # count.
    live = live.dropDuplicates(["group_id", "kind", "key", "pos", "entity_uuid"])

    flagged = live.join(
        F.broadcast(new_ids.select("entity_uuid").withColumn("_is_new", F.lit(True))),
        "entity_uuid",
        "left",
    ).withColumn("_is_new", F.coalesce("_is_new", F.lit(False)))
    g = (
        flagged.groupBy("group_id", "kind", "key")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_set("entity_uuid")).alias("us"),
            F.sort_array(
                F.collect_set(F.when(F.col("_is_new"), F.col("entity_uuid")))
            ).alias("new_us"),
        )
        .filter(
            (F.col("df") <= config.blocking_token_max_df)
            & (F.size("us") >= 2)
            & (F.size("new_us") >= 1)
        )
    )
    g = g.repartition(plan_width(postings_all.sparkSession), "group_id", "kind", "key")
    return (
        g.select("group_id", "us", F.explode("new_us").alias("a"))
        .select("group_id", "a", F.explode("us").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            "group_id",
            F.least("a", "b").alias("uuid_a"),
            F.greatest("a", "b").alias("uuid_b"),
        )
        .dropDuplicates(["group_id", "uuid_a", "uuid_b"])
    )
