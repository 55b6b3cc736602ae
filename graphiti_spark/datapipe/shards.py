"""Deterministic training-shard layout + writer — the last mile of a
training-data pipeline: after curation (quality gates, dedup, sampling,
packing) the surviving corpus must land on disk as N balanced shards in a
pseudo-random document order, reproducibly, so a training run's data order
is a pure function of (corpus, salt, n_shards) and an interrupted job can
be re-run to byte-identical shards.

Shape at 100 TB:
 - shard assignment is a map-only hash expression (no sampling pass, no
   range-boundary collection, no driver state) — balanced in expectation
   by the 60-bit md5 key, and the manifest makes imbalance observable;
 - intra-shard order comes from a SECOND independent md5 key, so the
   layout is a real pseudo-shuffle (source/crawl order is decorrelated
   both across and within shards) without any corpus-wide sort: ONE hash
   exchange on shard_id, then sortWithinPartitions. A global orderBy
   would range-partition fine but pays a sampling pass and skew handling
   for no extra randomness;
 - `pos` ranks inside a shard only (window partitioned by the exchange
   key — never a corpus-wide single-partition window, same rule as
   sampling.pack_sequences);
 - parallelism during the write is n_shards tasks; size n_shards so a
   shard is O(executor-memory) (the usual 256 MB-1 GB training shard at
   web scale means n_shards in the tens of thousands — far above any
   cluster's core count, so no waves are wasted).

Reference anchor: the reference stores its graph in a database and has no
training-export surface; this module is part of the north-rule extension
(large-scale LLM-pipeline operations over the curated corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.hashing import md5_long_col
from graphiti_spark.functions.textstats import token_count_col


def shard_plan(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shards",
) -> DataFrame:
    """(doc_id, shard, pos, n_tokens): the deterministic layout.

    shard = md5(salt ':' id) % n_shards; pos = dense 0-based rank of
    md5('ord:' salt ':' id) within the shard (ties impossible: the rank key
    includes the id itself as a tiebreaker). Pure function of (ids, salt,
    n_shards) — independent of partitioning, input order, and parallelism.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sid = F.col(id_col).cast("string")
    keyed = docs.select(
        F.col(id_col),
        F.pmod(md5_long_col(F.concat(F.lit(f"{salt}:"), sid)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        md5_long_col(F.concat(F.lit(f"ord:{salt}:"), sid)).alias("_ord"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("_ord", id_col)
    return keyed.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).alias("pos"),
        "n_tokens",
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shards",
) -> DataFrame:
    """(shard, n_docs, n_tokens, content_hash): the per-shard audit row.

    content_hash = bit_xor of each member's md5_long(id ':' md5(text)) —
    order-independent (xor commutes) and overflow-free at any shard size
    (a running SUM of 60-bit hashes would overflow bigint beyond ~8 rows),
    so two independently produced layouts agree iff every shard holds the
    same (id, text) set; a verifier recomputes it from written shards
    without re-sorting. (Set, not multiset: ids are unique by contract —
    duplicate rows would xor-cancel.)
    """
    plan = shard_plan(docs, n_shards, id_col=id_col, text_col=text_col, salt=salt)
    member = plan.join(docs.select(id_col, text_col), id_col)
    row_h = md5_long_col(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.md5(F.col(text_col)))
    )
    return member.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.bit_xor(row_h).alias("content_hash"),
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shards",
) -> DataFrame:
    """Materialize the layout: parquet partitioned by shard, one file per
    shard, rows in `pos` order (parquet preserves within-file row order, so
    a reader streaming shard k sees the pseudo-shuffled order directly).
    Returns the manifest (also written to `<out_dir>/_manifest`).

    ONE exchange: repartition on the shard column (so writer task == shard)
    + sortWithinPartitions((shard,) pos). The plan column count stays small
    — the full doc row is carried through the single exchange exactly once.
    """
    plan = shard_plan(docs, n_shards, id_col=id_col, text_col=text_col, salt=salt)
    rows = docs.join(plan.select(id_col, "shard", "pos"), id_col)
    (
        rows.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    manifest = shard_manifest(docs, n_shards, id_col=id_col, text_col=text_col, salt=salt)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/_manifest")
    return manifest
