"""Count-Min sketch (datapipe/sketches.py): invariants (row mass, one-
sided error, mergeability), heavy-hitter two-phase exactness, weighted
build, and DuckDB twin identity via cms_build_sql."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.sketches import (
    cms_build,
    cms_build_sql,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)

D, W = 3, 16


@pytest.fixture(scope="module")
def keys(spark):
    # zipf-ish: 'hot' x20, 'warm' x5, 20 singletons
    rows = (
        [("hot",)] * 20
        + [("warm",)] * 5
        + [(f"cold{i}",) for i in range(20)]
    )
    return spark.createDataFrame(rows, ["k"])


def test_row_mass_invariant(keys):
    # every hash row holds the full stream mass N = 45
    sketch = cms_build(keys, "k", depth=D, width=W)
    per_row = {r["row"]: r["m"] for r in sketch.groupBy("row").agg(F.sum("cnt").alias("m")).collect()}
    assert per_row == {d: 45 for d in range(D)}


def test_one_sided_error_and_exact_hot_key(keys):
    sketch = cms_build(keys, "k", depth=D, width=W)
    est = {
        r["key"]: r["est"]
        for r in cms_estimate(sketch, keys, "k", depth=D, width=W).collect()
    }
    exact = {"hot": 20, "warm": 5, **{f"cold{i}": 1 for i in range(20)}}
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k]  # never under-counts
    # with 45 items in 16 buckets the hot key may collide but stays >= 20
    assert est["hot"] >= 20


def test_mergeability(spark, keys):
    a = keys.limit(10)
    b = spark.createDataFrame([("hot",)] * 3 + [("new",)], ["k"])
    merged = cms_merge(
        cms_build(a, "k", depth=D, width=W), cms_build(b, "k", depth=D, width=W)
    )
    direct = cms_build(a.unionAll(b), "k", depth=D, width=W)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_heavy_hitters_two_phase(keys):
    got = {
        r["key"]: (r["est"], r["exact"])
        for r in cms_heavy_hitters(keys, "k", threshold=5, depth=D, width=W).collect()
    }
    # every truly-hot key survives with its exact count
    assert got["hot"][1] == 20
    assert got["warm"][1] == 5
    # any collision-selected extra carries an exact count below est
    for est, exact in got.values():
        assert est >= exact


def test_weighted_build(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 1)], ["k", "w"])
    sketch = cms_build(df, "k", depth=2, width=8, weight_col="w")
    est = {
        r["key"]: r["est"]
        for r in cms_estimate(sketch, df, "k", depth=2, width=8).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 1


def test_null_keys_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "k: string")
    sketch = cms_build(df, "k", depth=2, width=8)
    assert sketch.agg(F.sum("cnt")).collect()[0][0] == 4  # 2 rows x depth 2


def test_duckdb_twin_identity(keys):
    rows = [tuple(r) for r in keys.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    oracle = sorted(con.execute(cms_build_sql("t", "k", D, W)).fetchall())
    got = sorted(map(tuple, cms_build(keys, "k", depth=D, width=W).collect()))
    assert got == oracle
