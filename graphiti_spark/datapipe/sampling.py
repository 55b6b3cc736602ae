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


def unimax_allocation(
    lang_stats: DataFrame,
    budget: float,
    max_epochs: float = 1.0,
    lang_col: str = "lang",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """UniMax language-balanced budget allocation (Chung et al., ICLR 2023,
    "UniMax: Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): distribute a total token ``budget`` across
    languages as uniformly as possible, capping every language at
    ``max_epochs`` passes over its corpus — low-resource languages get fully
    capped, high-resource ones split the remainder evenly.

    The paper states it as a sequential loop (smallest corpus first); the
    loop has a water-filling closed form computed here in ONE window pass
    over the per-language stats table: with caps sorted ascending, the fill
    level candidate at row k is lvl_k = (budget - cum_cap_{k-1}) / (L-k+1),
    a row is capped iff cap_k <= lvl_k (the capped set is always a prefix —
    lvl is non-decreasing while capping), and theta = lvl at the first
    uncapped row. alloc = min(cap, theta).

    Scale shape: the stats table is one row per language (hundreds), so the
    single-partition window is O(languages), never O(corpus); the corpus
    itself is touched only by the map-only gate in `unimax_sample`.

    Returns (lang, n_tokens, cap, alloc, epochs, rate) — `epochs` =
    alloc/tokens (may exceed 1 when max_epochs > 1: repetition count),
    `rate` = min(1, epochs) (the subsample keep-rate), both rounded 6dp.
    """
    stats = lang_stats.select(
        F.col(lang_col).alias("lang"), F.col(tokens_col).cast("double").alias("n_tokens")
    ).withColumn("cap", F.round(F.lit(float(max_epochs)) * F.col("n_tokens"), 6))
    w = Window.orderBy("cap", "lang")
    wk = (
        stats.withColumn("_k", F.row_number().over(w))
        .withColumn(
            "_cum_prev",
            F.coalesce(
                F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            ),
        )
        .withColumn("_L", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn(
            "_lvl",
            (F.lit(float(budget)) - F.col("_cum_prev")) / (F.col("_L") - F.col("_k") + 1),
        )
        .withColumn("_capped", F.col("cap") <= F.col("_lvl"))
    )
    theta = wk.filter(~F.col("_capped")).agg(
        F.min_by("_lvl", "_k").alias("_theta")
    )
    return (
        wk.crossJoin(F.broadcast(theta))
        .select(
            "lang",
            "n_tokens",
            "cap",
            F.round(F.least("cap", F.coalesce("_theta", "cap")), 6).alias("alloc"),
        )
        .withColumn("epochs", F.round(F.col("alloc") / F.col("n_tokens"), 6))
        .withColumn("rate", F.round(F.least(F.lit(1.0), F.col("alloc") / F.col("n_tokens")), 6))
    )


def unimax_sample(
    docs: DataFrame,
    budget: float,
    max_epochs: float = 1.0,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "unimax",
) -> DataFrame:
    """Apply the UniMax allocation as a deterministic per-language Bernoulli
    subsample: the same md5 hash gate as `stratified_sample`, with rates from
    `unimax_allocation`. Map-only over the corpus (the rate table enters
    broadcast)."""
    stats = docs.groupBy(lang_col).agg(
        F.sum(token_count_col(F.col(text_col))).alias("n_tokens")
    )
    rates = unimax_allocation(stats, budget, max_epochs, lang_col=lang_col).select(
        F.col("lang").alias(lang_col), "rate"
    )
    gated = docs.join(F.broadcast(rates), lang_col, "inner")
    return gated.filter(
        _hash_gate(F.col(id_col), salt) < (F.col("rate") * _GATE_MOD).cast("bigint")
    )


def weighted_sample_k(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    salt: str = "v1",
    round_dp: int = 9,
) -> DataFrame:
    """Exact-size weighted sampling WITHOUT replacement, deterministic:
    Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    reservoir") — draw u ~ U(0,1) per row, keep the k rows with the largest
    key u^(1/w). One pass, embarrassingly parallel key computation, and the
    inclusion probability of each row is exactly its weight-proportional
    share, independent of data order or partitioning.

    u is md5-derived (the stratified_sample hash-gate convention, shifted
    into (0,1]), so the SAMPLE IS A PURE FUNCTION of (salt, id, weight) —
    reproducible across runs, engines, and cluster sizes, the property a
    training-data pipeline needs for auditable mixtures. Rows with weight
    <= 0 or NULL are never selected. With ``strata_col``, k rows are drawn
    per stratum (one window, partitioned by stratum).

    The A-ES key is order-equivalent to ln(u)/w (monotone transform),
    computed in log space to dodge underflow on tiny weights; ties (md5
    collisions aside, impossible at 60 bits) are broken by id for a total
    deterministic order. Scale shape: the selection is a per-stratum top-k
    window — with no strata it is a rank over ONE partition, so at corpus
    scale pass strata (or pre-aggregate) the same way any global top-k is
    sharded; keys and filters are all codegen, zero Python.
    """
    from pyspark.sql import Window

    u = (_hash_gate(F.col(id_col), salt) + 1.0) / 1_000_001.0  # (0, 1]
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, round_dp)  # maximize u^(1/w) == maximize ln(u)/w (ln u < 0)
    keyed = docs.filter(w.isNotNull() & (w > 0)).withColumn("_es_key", key)
    part = [strata_col] if strata_col else []
    win = Window.partitionBy(*part).orderBy(F.desc("_es_key"), F.asc(id_col))
    return (
        keyed.withColumn("_es_rank", F.row_number().over(win))
        .filter(F.col("_es_rank") <= k)
        .drop("_es_rank")
    )


def temperature_mixture_weights(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.3,
    size_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Temperature-scaled sampling mixture over groups (languages, domains,
    sources): the multilingual-pretraining convention (mBERT/XLM-R's
    exponential smoothing, alpha typically 0.3-0.7; alpha=1 reproduces the
    natural distribution, alpha=0 the uniform one):

        p_g = n_g^alpha / sum_h n_h^alpha

    Returns one row per group: n (docs or sum of ``size_col``), the natural
    share, the smoothed sampling weight p_g, and ``boost`` = p_g / share —
    the up/down-sampling factor a sampler applies per group (low-resource
    groups get boost > 1).

    Shape: ONE algebraic aggregation on the group key (map-side combine
    absorbs hot groups), then a broadcast 1-row crossJoin for the two
    normalizers — no window, no second shuffle; group cardinality is
    tiny (languages/domains), so the result itself broadcasts into
    whatever sampler consumes it."""
    n_expr = (
        F.count(F.lit(1)).cast("double")
        if size_col is None
        else F.sum(F.col(size_col)).cast("double")
    )
    per = docs.groupBy(F.col(group_col).alias("group")).agg(n_expr.alias("n"))
    tot = per.agg(
        F.sum("n").alias("_tot_n"),
        F.sum(F.pow("n", F.lit(float(alpha)))).alias("_tot_pa"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "group",
            "n",
            F.round(F.col("n") / F.col("_tot_n"), round_dp).alias("share"),
            F.round(
                F.pow("n", F.lit(float(alpha))) / F.col("_tot_pa"), round_dp
            ).alias("weight"),
            F.round(
                (F.pow("n", F.lit(float(alpha))) / F.col("_tot_pa"))
                / (F.col("n") / F.col("_tot_n")),
                round_dp,
            ).alias("boost"),
        )
    )
