"""Count-Min sketch (Cormode & Muthukrishnan 2005) over a key column:
the mergeable frequency summary behind hot-key / heavy-hitter detection
at corpus scale — "which entities / hosts / shingles are hot" answered
from a fixed ``depth x width`` table of counters instead of a full
distinct-key aggregate.

Why it matters at 10^12 documents: the exact per-key count table is as
large as the key space (billions of entities, shingles, URLs); the CMS
is ``depth*width`` counters TOTAL, independent of key cardinality —
small enough to broadcast back to every executor, where it gates skew
handling (salting the ER blocking buckets, splitting hot PageRank rows)
without a second full shuffle over the data.

Determinism: counter rows are md5-derived (``functions/hashing.
md5_long_col`` — the repo-wide portable hash), so the sketch is a pure
function of the data and the DuckDB oracle rebuilds it bit-for-bit.
Merging two sketches = summing counters cell-wise (the property that
makes it a distributed aggregate: partial sketches combine map-side).

Estimate guarantee (the paper's): ``est >= true`` always (counters only
over-count via collisions), and ``est <= true + eps*N`` with probability
``1 - delta`` for ``width = ceil(e/eps)``, ``depth = ceil(ln 1/delta)``.

Scale shape: build = one map-side explode of each key into ``depth``
(row, bucket) cells + one hash agg bounded by ``depth*width`` groups —
map-side combine absorbs hot keys entirely (a key seen 10^9 times
contributes ``depth`` cells, not 10^9). Estimate = broadcast join of the
(tiny) sketch to the queried keys + one min-agg per key. Nothing global,
no windows, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.hashing import md5_long_col, md5_long_sql


def _bucket(key_col, d: int, width: int):
    """Counter column for hash row d: md5_long('d<d>:' || key) % width."""
    return (
        md5_long_col(F.concat(F.lit(f"d{d}:"), F.col(key_col).cast("string")))
        % F.lit(width)
    ).alias("bucket")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), at most depth*width rows.
    ``weight_col`` generalizes from counts to summed weights (token
    counts, bytes). Null keys are skipped (they have no frequency)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = None
    base = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("k"), w.alias("w")
    )
    for d in range(depth):
        c = base.select(
            F.lit(d).alias("row"), _bucket("k", d, width), F.col("w")
        )
        cells = c if cells is None else cells.unionAll(c)
    return cells.groupBy("row", "bucket").agg(F.sum("w").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the same (depth, width)."""
    return (
        a.unionByName(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each input key: (key, est) with
    est = min over the depth counters. The sketch broadcasts (it is at
    most depth*width rows); the keyed side never shuffles."""
    probes = None
    base = keys.select(F.col(key_col).cast("string").alias("key")).dropDuplicates(
        ["key"]
    )
    for d in range(depth):
        p = base.select(
            "key", F.lit(d).alias("row"), _bucket("key", d, width)
        )
        probes = p if probes is None else probes.unionAll(p)
    joined = probes.join(
        F.broadcast(sketch), ["row", "bucket"], "left"
    ).select("key", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    return joined.groupBy("key").agg(F.min("cnt").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Keys whose CMS estimate reaches ``threshold``: (key, est, exact).
    One-sided: every truly-hot key survives (est >= exact); collision
    false-positives are then killed by the exact recount, which runs
    ONLY over the sketch-selected candidates — the two-phase hot-key
    pattern where the second pass touches a vanishing fraction of keys.
    """
    sketch = cms_build(df, key_col, depth, width)
    est = cms_estimate(sketch, df, key_col, depth, width).filter(
        F.col("est") >= threshold
    )
    exact = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .join(F.broadcast(est.select("key")), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return est.join(exact, "key").select("key", "est", "exact")


def cms_bucket_sql(key_expr: str, d: int, width: int) -> str:
    """DuckDB twin of _bucket (oracle helper)."""
    seeded = f"concat('d{d}:', {key_expr})"
    return f"{md5_long_sql(seeded)} % {width}"


def cms_build_sql(
    table: str,
    key_expr: str,
    depth: int = 4,
    width: int = 1024,
    weight_expr: str = "1",
) -> str:
    """DuckDB twin of cms_build (oracle helper)."""
    legs = " UNION ALL ".join(
        f"""SELECT {d} AS row, {cms_bucket_sql('k', d, width)} AS bucket, w
            FROM (SELECT CAST({key_expr} AS VARCHAR) AS k,
                         CAST({weight_expr} AS BIGINT) AS w
                  FROM {table} WHERE {key_expr} IS NOT NULL)"""
        for d in range(depth)
    )
    return f"""SELECT row, bucket, CAST(sum(w) AS BIGINT) AS cnt
               FROM ({legs}) GROUP BY row, bucket"""


def cms_heavy_hitters_sql(
    table: str,
    key_expr: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB twin of cms_heavy_hitters (oracle helper): rebuild the
    sketch, probe every distinct key, keep est >= threshold, recount
    exactly over the selected candidates."""
    probe_legs = " UNION ALL ".join(
        f"SELECT key, {d} AS row, {cms_bucket_sql('key', d, width)} AS bucket FROM keys"
        for d in range(depth)
    )
    return f"""
        WITH s AS ({cms_build_sql(table, key_expr, depth, width)}),
        keys AS (SELECT DISTINCT CAST({key_expr} AS VARCHAR) AS key
                 FROM {table} WHERE {key_expr} IS NOT NULL),
        probes AS ({probe_legs}),
        est AS (SELECT key, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
                FROM probes LEFT JOIN s USING (row, bucket) GROUP BY key),
        hot AS (SELECT * FROM est WHERE est >= {threshold}),
        ex AS (SELECT CAST({key_expr} AS VARCHAR) AS key, count(*) AS exact
               FROM {table}
               WHERE CAST({key_expr} AS VARCHAR) IN (SELECT key FROM hot)
               GROUP BY key)
        SELECT hot.key, hot.est, ex.exact FROM hot JOIN ex ON hot.key = ex.key
    """
