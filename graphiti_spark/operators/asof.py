"""Generic as-of (point-in-time) join — the temporal lookup primitive.

The reference resolves "state as of time T" point-wise: `retrieve_episodes`
scans backward from a reference time (graphiti_core/utils/maintenance/
graph_data_operations.py:150-180) and edge validity is checked against
`valid_at`/`invalid_at` per row (graphiti_core/search/search_filters.py
date comparators). The set-oriented restatement is an AS-OF JOIN: for every
left row, attach the most recent right row (same key, right_time <=
left_time). This is the workhorse for bi-temporal KG queries — "which order
/ fact / edge version was current when this event happened" — and Spark has
no built-in for it.

Implementation (Spark-first, ONE shuffle):
  Instead of a per-key loop or an exploding range join, tag both sides,
  UNION them, and hash-partition once on the join key ordered by
  (time, side): a running `last(right_col, ignorenulls=True)` window then
  carries each right row forward to every later left row in the same key —
  the classic sort-merge as-of formulation. Cost = one Exchange on the key +
  one in-partition sort, independent of time-range density; a range join
  (`l.ts >= r.ts`) would fan out O(|matches|) pairs before a per-key argmax
  re-shuffle, quadratic on hot keys. Skewed keys degrade to a big sort per
  partition, never a cross product.

Semantics (match DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`,
the oracle used by the driver):
  - backward join, inclusive: a right row at exactly left_time matches
    (right side sorts before left at equal timestamps),
  - LEFT join: unmatched left rows keep NULL right columns,
  - at most ONE right row per left row; if the right table has several rows
    at the same (key, time), `tie_break` picks the max deterministically
    (ASOF joins are otherwise ambiguous under such ties),
  - optional `tolerance`: a match older than this many seconds is nulled
    out (pandas.merge_asof's tolerance, absent from DuckDB — mirror it in
    the oracle with an explicit filter when used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tie_break: str | None = None,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with the same
    `on` key and right_time <= left_time (inclusive). Left rows are all
    preserved; unmatched rows carry NULL right columns.

    `right_cols`: right payload columns to attach (default: all but key +
    time). `right_time` itself is always attached (callers need the match
    age; `tolerance_sec` uses it). `tie_break`: right column whose MAX
    breaks (key, time) ties deterministically.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_time]]
    payload = list(dict.fromkeys(right_cols + [right_time]))  # ordered, unique

    r = right
    if tie_break is not None:
        w_dedup = Window.partitionBy(*keys, right_time).orderBy(
            F.col(tie_break).desc()
        )
        r = (
            r.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # Tagged union: right rows carry the payload, left rows carry NULLs that
    # the running window fills in. _side orders right (0) before left (1) at
    # equal timestamps => inclusive match.
    left_cols = [c for c in left.columns if c not in keys]
    r_tagged = r.select(
        *[F.col(k) for k in keys],
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    u = r_tagged.unionByName(l_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *keys,
        "_side",
        *left_cols,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in payload
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")

    if tolerance_sec is not None:
        age = F.col(left_time).cast("double") - F.col(f"_r_{right_time}").cast(
            "double"
        )
        stale = age > F.lit(float(tolerance_sec))
        for c in payload:
            out = out.withColumn(
                f"_r_{c}", F.when(stale, F.lit(None)).otherwise(F.col(f"_r_{c}"))
            )

    # final projection: left columns (keys included once) + right payload
    proj = [F.col(c) for c in left.columns]
    proj += [F.col(f"_r_{c}").alias(c) for c in payload]
    return out.select(*proj)
