"""Persisted search indices + constraints — ``build_indices_and_constraints``
restated (/root/reference/graphiti_core/utils/maintenance/graph_data_operations.py:
33-119; index DDL in graph_queries.py:17-95).

The reference creates DB-side fulltext indices + uuid uniqueness
constraints once, then every search hits them. The Spark-native twin is a
PERSISTED POSTINGS TABLE: (term, id, tf) rows bucketed by a hash of the
term so a query's terms prune to a handful of partition directories —
the fulltext-index access path without a database. Document length stats
ride in a tiny side table. BM25 over the postings reproduces
``analytics.search.bm25_scores`` bit-for-bit while scanning only the query
vocabulary's buckets instead of the raw text column.

Uniqueness constraints become an explicit validation op (the reference's
CREATE CONSTRAINT ... IS UNIQUE analog): assert_unique raises with the
offending keys.

Scale: the postings build is one explode + groupBy (shuffled on the term
bucket, which also kills term skew: 'the' spreads over its bucket's
files); queries read ~terms/n_buckets of the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.analytics.search import BM25_B, BM25_K1
from graphiti_spark.functions.textstats import tokens_col


def build_text_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Write the postings index: <path>/postings (partitioned by term
    bucket) + <path>/stats (n_docs, avgdl). Doc lengths ride on the postings
    rows (dl column) — no separate doclen table, which would cost an extra
    full corpus scan per build and is read by nothing."""
    base = docs.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("_toks"))
    base = base.withColumn("dl", F.size("_toks"))
    postings = (
        base.select("id", "dl", F.explode("_toks").alias("term"))
        .groupBy("term", "id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.crc32("term"), F.lit(n_buckets)))
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/postings")
    # n_buckets rides in stats so the index is self-describing — readers
    # must compute term buckets with the SAME modulus the writer used.
    base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).withColumn("n_buckets", F.lit(n_buckets)).write.mode("overwrite").parquet(
        f"{path}/stats"
    )


def bm25_from_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    id_col: str = "id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    n_buckets: int | None = None,
) -> DataFrame:
    """BM25 over the persisted index — value-identical to
    ``search.bm25_scores`` on the source table, but the scan touches only
    the query terms' buckets (partition pruning on the bucket key; check
    PushedFilters/partition filters in .explain). ``n_buckets`` defaults to
    the value recorded in the index's stats (self-describing); passing a
    different modulus than the writer used would silently miss terms."""
    import zlib

    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        return spark.createDataFrame([], f"{id_col} string, score double")
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"] or 1.0)
    if n_buckets is None:
        n_buckets = int(stats["n_buckets"]) if "n_buckets" in stats.__fields__ else 64
    buckets = sorted({zlib.crc32(t.encode()) % n_buckets for t in terms})
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    df_by_term = postings.groupBy("term").agg(F.countDistinct("id").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        postings.join(F.broadcast(df_by_term), "term")
        .withColumn(
            "_term_score",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("id")
        .agg(F.sum("_term_score").alias("score"))
    )
    return scored.select(F.col("id").alias(id_col), "score")


def assert_unique(df: DataFrame, key: str = "uuid", sample: int = 5) -> None:
    """Uniqueness-constraint validation (CREATE CONSTRAINT ... IS UNIQUE
    analog, graph_queries.py:17-40): raises ValueError listing up to
    ``sample`` duplicated keys. One groupBy; short-circuits on first rows."""
    dups = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(sample)
        .collect()
    )
    if dups:
        keys = [r[key] for r in dups]
        raise ValueError(f"uniqueness constraint violated on '{key}': {keys}")


def _refresh_stage_meta(spark: SparkSession, stage_base: str) -> None:
    """After a group purge, re-commit the stage's manifest + lineage against
    the PRUNED data so a later resume sees accurate row counts instead of
    the pre-purge ones (stale manifests made resume treat pruned tables as
    fully committed — ADVICE r2)."""
    import json
    import os

    manifest_path = os.path.join(stage_base, "_manifest.json")
    data_path = os.path.join(stage_base, "data")
    if not os.path.exists(manifest_path):
        return
    with open(manifest_path) as f:
        manifest = json.load(f)
    if not os.path.isdir(data_path):
        os.remove(manifest_path)
        return
    out = spark.read.parquet(data_path)
    manifest["row_count"] = out.count()
    lineage_path = os.path.join(stage_base, "lineage")
    if os.path.isdir(lineage_path):
        (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("row_count"))
            .withColumn("stage", F.lit(manifest.get("stage")))
            .withColumn("config_hash", F.lit(manifest.get("config_hash")))
            .write.mode("overwrite")
            .parquet(lineage_path)
        )
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)


def clear_data(
    spark: SparkSession,
    output_dir: str,
    group_ids: list[str] | None = None,
) -> list[str]:
    """``clear_data`` parity (graph_data_operations.py:33-63: DETACH DELETE
    all nodes, or per group_id — the reference removes ALL of a group's
    data). On the parquet layout: remove every stage table under
    ``output_dir``; with ``group_ids``, purge those groups from EVERY stage:
    group_id-partitioned stages get a partition-directory delete (no rewrite
    of surviving data), non-partitioned stages carrying a ``group_id``
    column get a filtered staged-swap rewrite, and each touched stage's
    manifest/lineage is re-committed against the pruned data. Stages with
    no ``group_id`` column are global derivations (e.g. stats) and are left
    as-is. Returns removed/rewritten paths."""
    import glob
    import os
    import shutil
    import uuid as _uuid

    removed: list[str] = []
    if group_ids is None:
        for entry in sorted(glob.glob(os.path.join(output_dir, "*"))):
            shutil.rmtree(entry, ignore_errors=True)
            removed.append(entry)
        return removed
    for stage_base in sorted(glob.glob(os.path.join(output_dir, "*"))):
        data_path = os.path.join(stage_base, "data")
        if not os.path.isdir(data_path):
            continue
        part_dirs = [
            p
            for gid in group_ids
            for p in [os.path.join(data_path, f"group_id={gid}")]
            if os.path.isdir(p)
        ]
        is_partitioned = any(
            d.startswith("group_id=") for d in os.listdir(data_path)
        )
        if is_partitioned:
            for p in part_dirs:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
            _refresh_stage_meta(spark, stage_base)
            continue
        try:
            df = spark.read.parquet(data_path)
        except Exception:
            continue
        if "group_id" not in df.columns:
            continue
        pruned = df.filter(~F.col("group_id").isin(group_ids))
        if pruned.count() == df.count():
            continue  # no rows of these groups here
        tmp = f"{data_path}._staged_{_uuid.uuid4().hex[:8]}"
        pruned.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(data_path, ignore_errors=True)
        os.rename(tmp, data_path)
        removed.append(data_path)
        _refresh_stage_meta(spark, stage_base)
    return removed
