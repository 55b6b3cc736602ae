"""fastText-style trainable quality classifier as multinomial Naive Bayes
over word tokens (binary keep/drop), the public-pipeline quality gate shape:
GPT-3 (Brown et al. 2020, appendix A) and CCNet both gate Common Crawl with
a linear classifier trained to separate a high-quality seed (WebText /
Wikipedia) from raw crawl text. A linear bag-of-words classifier's score is
a per-token weight sum; multinomial NB gives those weights a closed form
(no SGD, so training is deterministic and restatable in SQL):

    log_odds(token) = ln((c_pos(t)+1) / (T_pos+V)) - ln((c_neg(t)+1) / (T_neg+V))
    score(doc)      = prior_log_odds + sum over tokens of log_odds(token)
    unseen token    -> ln((T_neg+V) / (T_pos+V))   (smoothing-only odds)

with c_cls(t) = token occurrences in class, T_cls = total occurrences,
V = vocabulary size after the min-df cut (df < min_df tokens are dropped
from training entirely — the fastText `-minCount` analogue that bounds the
model by the SEED's Heaps-law vocab, not the corpus).

Scale shape at 100 TB:
  - training touches only the labeled SEED (quality seeds are ≪ corpus);
    token counts are one groupBy(token) with map-side combine;
  - the model is a small (token, log_odds) dim + three scalars — it
    BROADCASTS to scoring;
  - scoring explodes corpus tokens, broadcast-joins the model, and
    aggregates once on doc_id (partial sums map-side): the corpus shuffles
    exactly once, on its own id key, never on a token key.

Cross-engine determinism: counts are int64; log_odds is a double expression
of int64 counts rounded to 6dp at the model boundary, and the per-doc sum is
rounded to 6dp — the DuckDB oracle (see __spark_entry__._q_nb_quality)
reproduces values exactly.

Reference parity: none (the reference gates quality per-episode with an
LLM); this is the deterministic corpus-scale stand-in alongside
datapipe/lm_quality.py (absolute fluency) and datapipe/dsir.py (importance
ratio vs a target).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col


@dataclass(frozen=True)
class NBModel:
    """Broadcastable binary-NB model: per-token log-odds + three scalars."""

    token_odds: DataFrame  # (token string, log_odds double)
    prior_log_odds: float  # ln(n_pos_docs / n_neg_docs)
    default_odds: float  # smoothing-only odds for unseen tokens
    vocab_size: int


def train_nb_classifier(
    seed: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> NBModel:
    """Train binary multinomial NB on a labeled seed.

    ``label_col`` must be boolean (True = positive/keep class). Tokens with
    document frequency < ``min_df`` in the seed are dropped from training
    (vocabulary AND totals), bounding the model size. Two scalar collects
    run at training time; both touch only the seed.
    """
    toks = seed.select(
        F.col(label_col).alias("_pos"),
        F.col(id_col).alias("_row"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    # One pass over the seed tokens: df (min-df cut) + per-class counts.
    counts = toks.groupBy("token").agg(
        F.count_distinct("_row").alias("df"),
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("c_neg"),
    )
    vocab = counts.filter(F.col("df") >= min_df).select("token", "c_pos", "c_neg")
    tot = vocab.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    t_pos, t_neg, v = int(tot["t_pos"] or 0), int(tot["t_neg"] or 0), int(tot["v"])
    docs_pos, docs_neg = (
        seed.agg(
            F.sum(F.when(F.col(label_col), 1).otherwise(0)),
            F.sum(F.when(F.col(label_col), 0).otherwise(1)),
        ).collect()[0]
    )
    if not docs_pos or not docs_neg:
        raise ValueError(
            f"seed must contain both classes (pos={docs_pos}, neg={docs_neg})"
        )
    if v == 0:
        raise ValueError(f"no token reaches min_df={min_df} in the seed")
    import math

    token_odds = vocab.select(
        "token",
        F.round(
            F.log((F.col("c_pos") + 1.0) / F.lit(float(t_pos + v)))
            - F.log((F.col("c_neg") + 1.0) / F.lit(float(t_neg + v))),
            6,
        ).alias("log_odds"),
    )
    return NBModel(
        token_odds=token_odds,
        prior_log_odds=round(math.log(int(docs_pos) / int(docs_neg)), 6),
        default_odds=round(math.log((t_neg + v) / (t_pos + v)), 6),
        vocab_size=v,
    )


def nb_classifier_scores(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: (id, n_tokens, log_odds, keep).

    Explode + broadcast join + one groupBy(id) — the corpus shuffles once on
    its own id with map-side partial sums; the model never shuffles.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token"))
    scored = (
        toks.join(F.broadcast(model.token_odds), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.lit(model.prior_log_odds)
                + F.sum(F.coalesce(F.col("log_odds"), F.lit(model.default_odds))),
                6,
            ).alias("log_odds"),
        )
    )
    return scored.withColumn("keep", F.col("log_odds") > 0)
