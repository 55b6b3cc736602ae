"""Integration test for the Iceberg `MERGE INTO` branch of
sinks/tables.upsert_table (VERDICT r3 #9).

The branch cannot execute in this sandbox — no iceberg-spark-runtime jar
ships with the environment — so the whole module skips with that reason.
On a machine where the jar is present (`pyspark/jars` or `$SPARK_HOME/
jars`), the test builds its OWN session with a local hadoop catalog
(`spark.sql.catalog.local = org.apache.iceberg.spark.SparkCatalog`),
routes upsert_table at a `local.db.*` table name (no "/" -> the Iceberg
branch, per tables.py), and verifies the same semantics the parquet path
is tested for: keyed upsert, in-batch dedup, keyed deletes, and the
per-call-unique temp views surviving concurrent upserts.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest


def _iceberg_jar() -> str | None:
    roots = []
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:  # pragma: no cover
        pass
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for r in roots:
        hits = glob.glob(os.path.join(r, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


pytestmark = pytest.mark.skipif(
    _iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar in pyspark/jars or $SPARK_HOME/jars "
    "(sandbox constraint; the parquet path is the tested twin — "
    "tests/test_upsert_and_community_update.py)",
)


@pytest.fixture(scope="module")
def iceberg_spark():
    """Own session: the shared fixture has no Iceberg catalog, and catalog
    confs are session-start-only."""
    from pyspark.sql import SparkSession

    warehouse = tempfile.mkdtemp(prefix="iceberg_wh_")
    s = (
        SparkSession.builder.master("local[4]")
        .appName("graphiti_spark_iceberg_it")
        .config("spark.jars", _iceberg_jar())
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s
    s.stop()
    shutil.rmtree(warehouse, ignore_errors=True)


def test_merge_into_upsert_and_delete(iceberg_spark):
    from graphiti_spark.sinks.tables import iceberg_available, upsert_table

    spark = iceberg_spark
    assert iceberg_available(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS local.db")
    spark.sql("DROP TABLE IF EXISTS local.db.nodes")
    spark.sql("CREATE TABLE local.db.nodes (uuid string, name string) USING iceberg")

    upsert_table(
        spark,
        spark.createDataFrame([("a", "one"), ("b", "two")], "uuid string, name string"),
        "local.db.nodes",
    )
    # second batch: updates a, inserts c, deletes b — and contains an
    # in-batch duplicate of c that dedupe_for_upsert must collapse
    upsert_table(
        spark,
        spark.createDataFrame(
            [("a", "ONE"), ("c", "three"), ("c", "three")], "uuid string, name string"
        ),
        "local.db.nodes",
        delete_keys=spark.createDataFrame([("b",)], "uuid string"),
    )
    got = {r["uuid"]: r["name"] for r in spark.table("local.db.nodes").collect()}
    assert got == {"a": "ONE", "c": "three"}


def test_concurrent_upserts_use_distinct_views(iceberg_spark):
    """The per-call uuid-suffixed temp views (tables.py) must keep two
    concurrent upserts from merging each other's source rows — the exact
    hazard ADVICE r3 flagged for the ThreadPoolExecutor rebuilds."""
    from concurrent.futures import ThreadPoolExecutor

    from graphiti_spark.sinks.tables import upsert_table

    spark = iceberg_spark
    spark.sql("DROP TABLE IF EXISTS local.db.t1")
    spark.sql("DROP TABLE IF EXISTS local.db.t2")
    spark.sql("CREATE TABLE local.db.t1 (uuid string, v string) USING iceberg")
    spark.sql("CREATE TABLE local.db.t2 (uuid string, v string) USING iceberg")

    def job(i: int):
        upsert_table(
            spark,
            spark.createDataFrame([(f"k{j}", f"t{i}") for j in range(50)], "uuid string, v string"),
            f"local.db.t{i}",
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(job, [1, 2]))
    for i in (1, 2):
        rows = spark.table(f"local.db.t{i}").collect()
        assert len(rows) == 50 and all(r["v"] == f"t{i}" for r in rows)
