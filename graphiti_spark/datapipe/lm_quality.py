"""CCNet-style n-gram LM perplexity quality scoring (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data",
arXiv:1911.00359) with Stupid Backoff scoring (Brants et al. 2007, "Large
Language Models in Machine Translation") — the classic web-corpus quality
signal: train a small LM on target-quality text, score every corpus document
by perplexity, and split the corpus into head/middle/tail perplexity buckets.

CCNet uses a KenLM 5-gram; the web-scale scoring rule that needs no
normalization pass is Brants' Stupid Backoff, which we implement exactly at
bigram order (the published score, not a new invention):

    S(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1})   if bigram seen
                     = alpha * S(w_i)                         otherwise
    S(w_i)           = count(w_i) / N                         if unigram seen
                     = 1 / (N + V)                            OOV floor

with alpha = 0.4 (the paper's value). A document's score is the mean log10 S
over its token positions (position 1 has no context and takes the unigram
path without alpha); perplexity = 10^(-mean). The reference repo gates
quality per-episode with an LLM; this is the deterministic corpus-scale
stand-in, complementing `datapipe.dsir` (importance RATIO vs a target) with
an absolute target-LM fluency score.

Scale shape at 100 TB:
 - the LM is trained on the TARGET corpus only (CCNet trains on Wikipedia),
   so the model tables are Heaps-law bounded by the target, not the corpus;
   `min_count` prunes the bigram tail exactly like KenLM count cutoffs;
 - scoring is two broadcast joins (bigram, unigram) + one groupBy(doc_id):
   the 100 TB corpus never shuffles on a gram key and shuffles exactly once
   on doc_id (map-side combine on the mean);
 - bucket cutoffs are two scalars computed from the scored table (at corpus
   scale: from a `sampling.stratified_sample` slice) and re-enter broadcast,
   so bucketing is a map-only pass.

Cross-engine determinism: per-position scores are exact double divisions of
int64 counts; the per-doc mean is rounded to 6dp before ppl = 10^(-mean), so
the DuckDB oracle reproduces values bit-for-bit the same way `dsir_weights`
does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col

STUPID_BACKOFF_ALPHA = 0.4


def _pos_pairs(text_col: Column) -> Column:
    """array<struct<prev,cur>> of (context, token) per position; position 1
    has prev = NULL. Pure column expression (codegen, no Python)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    pairs = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
            F.element_at(toks, i).alias("cur"),
        ),
    )
    # empty docs yield an empty array (explode emits no rows for them)
    return F.when(n > 0, pairs).otherwise(
        F.array().cast("array<struct<prev:string,cur:string>>")
    )


def train_backoff_lm(
    target_docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> dict[str, DataFrame]:
    """Bigram Stupid-Backoff model from the target corpus.

    Returns three small DataFrames (model tables, broadcast at score time):
      unigrams: (cur, s_uni)        s_uni = count(w)/N   (MLE)
      bigrams:  (prev, cur, s_bi)   s_bi  = count(prev cur)/count(prev),
                                    pruned to count >= min_count
      totals:   (n_tokens, vocab)   one row — the OOV floor 1/(N+V)
    """
    from graphiti_spark.session import widen_if_narrow

    target_docs = widen_if_narrow(target_docs, text_col)
    pairs = target_docs.select(F.explode(_pos_pairs(F.col(text_col))).alias("pc"))
    pairs = pairs.select("pc.prev", "pc.cur").persist()
    uni_counts = pairs.groupBy("cur").agg(F.count(F.lit(1)).alias("c"))
    totals = uni_counts.agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    n_tok = F.col("n_tokens").cast("double")
    unigrams = uni_counts.crossJoin(F.broadcast(totals)).select(
        "cur", (F.col("c").cast("double") / n_tok).alias("s_uni")
    )
    bigrams = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cb"))
        .filter(F.col("cb") >= min_count)
        .join(uni_counts.select(F.col("cur").alias("prev"), "c"), "prev")
        .select(
            "prev", "cur", (F.col("cb").cast("double") / F.col("c")).alias("s_bi")
        )
    )
    # materialize the (small) model tables, then release the pair cache —
    # the er.py cache-release discipline (a leaked persist accumulates GC
    # pressure across repeated calls in one session)
    lm = {
        "unigrams": unigrams.localCheckpoint(eager=True),
        "bigrams": bigrams.localCheckpoint(eager=True),
        "totals": totals.localCheckpoint(eager=True),
    }
    pairs.unpersist()
    return lm


def lm_perplexity(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = STUPID_BACKOFF_ALPHA,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_tokens, avg_logprob, ppl) — mean log10 Stupid-Backoff score and
    perplexity per document; empty documents emit no row. avg_logprob is
    rounded to 6dp and ppl = round(10^(-avg_logprob), 4), making the value a
    pure function of the integer count tables (cross-engine stable)."""
    from graphiti_spark.session import widen_if_narrow

    hint = F.broadcast if broadcast_model else (lambda df: df)
    docs = widen_if_narrow(docs, id_col)
    pos = docs.select(
        F.col(id_col).alias("id"), F.explode(_pos_pairs(F.col(text_col))).alias("pc")
    ).select("id", "pc.prev", "pc.cur")
    floor = F.lit(1.0) / (
        F.col("n_tokens").cast("double") + F.col("vocab").cast("double")
    )
    s_uni_floor = F.coalesce(F.col("s_uni"), floor)
    score = (
        F.when(F.col("s_bi").isNotNull(), F.col("s_bi"))
        .when(F.col("prev").isNull(), s_uni_floor)
        .otherwise(F.lit(alpha) * s_uni_floor)
    )
    scored = (
        pos.join(hint(lm["bigrams"]), ["prev", "cur"], "left")
        .join(hint(lm["unigrams"]), "cur", "left")
        .crossJoin(hint(lm["totals"]))
        .select("id", F.log10(score).alias("lp"))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.round(F.pow(F.lit(10.0), -F.round(F.avg("lp"), 6)), 4).alias("ppl"),
    )


def ppl_buckets(
    scored: DataFrame,
    ppl_col: str = "ppl",
    probs: tuple[float, float] = (0.333333, 0.666667),
) -> DataFrame:
    """CCNet head/middle/tail split: two interpolated-percentile cutoffs over
    the scored table (rounded 6dp), then a broadcast map-only bucket compare
    — head = lowest-perplexity (most target-like) third. At corpus scale the
    cutoffs come from a deterministic sample (`sampling.stratified_sample`);
    the bucketing pass itself never shuffles."""
    cuts = scored.agg(
        F.round(F.expr(f"percentile({ppl_col}, {probs[0]})"), 6).alias("c1"),
        F.round(F.expr(f"percentile({ppl_col}, {probs[1]})"), 6).alias("c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        *scored.columns,
        F.when(F.col(ppl_col) <= F.col("c1"), F.lit("head"))
        .when(F.col(ppl_col) <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
