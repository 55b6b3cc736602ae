"""DSIR-style data selection: hashed n-gram importance weights + deterministic
Gumbel top-k resampling (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", arXiv:2302.03169).

The published recipe for steering a raw web corpus toward a target
distribution (e.g. books/wiki) without training a classifier: fit two
bag-of-hashed-ngrams models — target and raw — and weight each raw document
by its log likelihood ratio, then resample with Gumbel top-k. Everything
here is the deterministic twin of that recipe:

 - features: unigram + bigram counts hashed into ``n_buckets`` via md5 (no
   murmur seed drift across engines — the DuckDB oracle reproduces buckets
   bit-for-bit);
 - bucket models: add-one smoothing over the full bucket space, so unseen
   buckets contribute log(1/(total+B)) instead of -inf;
 - resampling: Gumbel noise derived from md5(salt:doc_id) — the same
   hash-gate trick as `sampling.stratified_sample`, making the sample
   reproducible by construction (the paper draws i.i.d. Gumbels; a fixed
   hash IS an i.i.d. draw per id, just a pinned one).

Scale shape at 100 TB:
 - the gram explode is map-side (no shuffle); per-doc feature aggregation
   is one groupBy(doc_id, bucket) with map-side combine;
 - both bucket models aggregate to ``n_buckets`` rows (bounded, tiny) and
   re-enter via broadcast joins — the corpus never shuffles on the gram key;
 - the weight is one groupBy(doc_id); top-k is TakeOrderedAndProject.
Hot buckets (stopword grams land in few buckets) are absorbed by map-side
combine — the aggregation value space is bounded by n_buckets per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.datapipe.sampling import _GATE_MOD, _hash_gate
from graphiti_spark.functions.textstats import tokens_col


def _md5_bucket(gram: Column, n_buckets: int, salt: str) -> Column:
    """First 60 bits of md5('<salt>:<gram>') mod n_buckets — cross-engine
    reproducible (same formula as sampling._hash_gate)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), gram)), 1, 15), 16, 10
    ).cast("bigint")
    return h % n_buckets


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    salt: str = "dsir",
) -> DataFrame:
    """Long-format hashed bag-of-ngrams: (id, bucket, cnt) — unigram and
    bigram occurrences of the whitespace-lowercase token stream, md5-hashed
    into ``n_buckets``. Documents with no tokens emit no rows."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(toks, bigrams)
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .select("id", _md5_bucket(F.col("gram"), n_buckets, salt).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    salt: str = "dsir",
) -> DataFrame:
    """Per-raw-document DSIR weight: log p_target(doc) - log p_raw(doc)
    under add-one-smoothed hashed-ngram bag models.

    Returns (id, log_weight) — log_weight rounded to 6dp (erases float
    aggregation-order drift between partitionings/engines; the downstream
    top-k tie-breaks on id). Both bucket models are ``n_buckets``-row
    aggregates broadcast into the feature join; the raw corpus is the only
    big table and it shuffles exactly once (the groupBy(id))."""
    raw_feats = hashed_ngram_features(raw_docs, id_col, text_col, n_buckets, salt)
    tgt_feats = hashed_ngram_features(target_docs, id_col, text_col, n_buckets, salt)

    tgt_model = tgt_feats.groupBy("bucket").agg(F.sum("cnt").alias("t_cnt"))
    raw_model = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    tgt_total = tgt_feats.agg(F.sum("cnt").alias("t_total"))
    raw_total = raw_feats.agg(F.sum("cnt").alias("r_total"))

    b = float(n_buckets)
    contrib = F.col("cnt") * (
        F.log(F.coalesce(F.col("t_cnt"), F.lit(0)).cast("double") + 1.0)
        - F.log(F.col("t_total").cast("double") + b)
        - F.log(F.coalesce(F.col("r_cnt"), F.lit(0)).cast("double") + 1.0)
        + F.log(F.col("r_total").cast("double") + b)
    )
    return (
        raw_feats.join(F.broadcast(tgt_model), "bucket", "left")
        .join(F.broadcast(raw_model), "bucket", "left")
        .crossJoin(F.broadcast(tgt_total))
        .crossJoin(F.broadcast(raw_total))
        .groupBy("id")
        .agg(F.round(F.sum(contrib), 6).alias("log_weight"))
    )


def gumbel_key_col(id_col: Column, log_weight: Column, salt: str = "dsir-g") -> Column:
    """Deterministic Gumbel-top-k sampling key: log_weight + Gumbel(md5-
    uniform). u = (gate + 0.5) / 1e6 ∈ (0,1); g = -ln(-ln(u)). Rounded to
    6dp so cross-engine float drift cannot reorder near-ties (the caller
    tie-breaks on id)."""
    u = (_hash_gate(id_col, salt).cast("double") + 0.5) / float(_GATE_MOD)
    return F.round(log_weight - F.log(-F.log(u)), 6)


def dsir_sample(
    weights: DataFrame,
    k: int,
    id_col: str = "id",
    weight_col: str = "log_weight",
    salt: str = "dsir-g",
) -> DataFrame:
    """Gumbel top-k resampling without replacement: the k rows with the
    largest (log_weight + deterministic Gumbel) keys — a pinned-noise draw
    from the softmax over weights, reproducible by construction. Plan shape:
    one map + TakeOrderedAndProject (no full sort)."""
    key = gumbel_key_col(F.col(id_col), F.col(weight_col), salt)
    return (
        weights.withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )
