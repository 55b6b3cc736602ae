"""Deterministic corpus sampling and sequence packing — the mixing stage
between curation and tokenization in a training-data pipeline.

Both ops are REPRODUCIBLE by construction (no RNG state, no
nondeterministic row order): re-running the job on the same corpus yields
byte-identical samples and packing assignments, which is what makes a
100 TB data recipe auditable.

`stratified_sample`
  Hash-gated Bernoulli sampling per stratum: a document is kept iff
  md5(salt:doc_id) mod 1e6 < rate*1e6. The per-stratum rate either comes
  from the caller or is derived from a token budget (rate = min(1,
  budget/stratum_tokens)). The gate is a pure column predicate — at scale
  it fuses into the scan; only the tiny per-stratum rate table shuffles
  (broadcast).

`pack_sequences`
  GPT-style concat-then-split packing: documents are laid out in doc_id
  order, token counts accumulated, and every document reports which
  fixed-length training sequences it lands in. The cumulative sum is the
  classic two-phase distributed prefix sum — per-bucket partial sums are
  tiny (one row per bucket) and broadcast back, so NO global single-
  partition window exists in the plan (the naive Window.orderBy over the
  whole corpus funnels 100 TB through one task; this shape never does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import token_count_col

_GATE_MOD = 1_000_000


def _hash_gate(id_col, salt: str) -> F.Column:
    """md5-derived uniform value in [0, 1e6) — same formula as the DuckDB
    twin (functions/hashing.md5_long pattern): first 60 bits of
    md5('<salt>:<id>') as a bigint."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h % _GATE_MOD


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    rates: dict[str, float] | None = None,
    token_budget_per_stratum: int | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample.

    Exactly one of ``rates`` (stratum -> keep fraction) or
    ``token_budget_per_stratum`` (derive each stratum's rate as
    min(1, budget / stratum_total_tokens)) must be given. Returns the
    surviving rows of ``docs`` plus their stratum rate (rounded 6dp).
    """
    if (rates is None) == (token_budget_per_stratum is None):
        raise ValueError("pass exactly one of rates / token_budget_per_stratum")
    spark = docs.sparkSession
    if rates is not None:
        rate_df = spark.createDataFrame(
            [(k, float(v)) for k, v in rates.items()], f"{strata_col} string, rate double"
        )
    else:
        totals = docs.groupBy(strata_col).agg(
            F.sum(token_count_col(F.col(text_col))).alias("_tok")
        )
        rate_df = totals.select(
            strata_col,
            F.round(
                F.least(F.lit(1.0), F.lit(float(token_budget_per_stratum)) / F.col("_tok")),
                6,
            ).alias("rate"),
        )
    gated = docs.join(F.broadcast(rate_df), strata_col, "inner")
    return gated.filter(
        _hash_gate(F.col(id_col), salt) < (F.col("rate") * _GATE_MOD).cast("bigint")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
) -> DataFrame:
    """Concat-then-split packing layout in ``id_col`` order.

    Per document: its token count, global start offset, and the range of
    fixed-length sequences it spans (a document may straddle a boundary —
    exactly what happens when training corpora are packed without padding).

    Distributed prefix sum: rows are bucketed by floor(id / bucket_size)
    (id order == (bucket, id) order for non-negative integer ids), the
    within-bucket running sum is a bucket-partitioned window, and bucket
    offsets are one tiny aggregate broadcast back — no global
    single-partition exchange anywhere in the plan.
    """
    i = F.col(id_col)
    base = docs.select(
        i,
        F.floor(i / bucket_size).alias("_bkt"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy("_bkt").orderBy(id_col)
    within = base.withColumn(
        "_cum_in_bkt", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    bkt_totals = (
        base.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_bkt_tok"))
        .withColumn(
            "_bkt_offset",
            F.coalesce(
                F.sum("_bkt_tok").over(
                    Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_bkt_offset")
    )
    out = within.join(F.broadcast(bkt_totals), "_bkt").select(
        id_col,
        "n_tokens",
        (F.col("_bkt_offset") + F.col("_cum_in_bkt")).alias("start_offset"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / seq_len).alias("start_seq"),
        F.floor(
            (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / seq_len
        ).alias("end_seq"),
    )
