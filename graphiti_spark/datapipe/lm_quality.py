"""CCNet-style n-gram LM perplexity quality scoring (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data",
arXiv:1911.00359) with Stupid Backoff scoring (Brants et al. 2007, "Large
Language Models in Machine Translation") — the classic web-corpus quality
signal: train a small LM on target-quality text, score every corpus document
by perplexity, and split the corpus into head/middle/tail perplexity buckets.

CCNet uses a KenLM 5-gram; the web-scale scoring rule that needs no
normalization pass is Brants' Stupid Backoff, which we implement exactly at
parameterized order (the published score, not a new invention):

    S(w_i | w_{i-k+1..i-1}) = count(k-gram) / count(its (k-1)-gram context)
                              if the k-gram survives the count cutoff
                            = alpha * S(w_i | w_{i-k+2..i-1})  otherwise
    S(w_i)                  = count(w_i) / N   if unigram seen
                            = 1 / (N + V)      OOV floor

with alpha = 0.4 (the paper's value). Scoring at each token position starts
at the HIGHEST order its left context affords (position 1 has no context
and takes the unigram path without alpha; position 2 starts at bigram, ...)
and each unseen level multiplies alpha once on the way down — exactly
Brants' rule. `min_count` prunes every level >= 2, the KenLM-style count
cutoff (`--prune`) that bounds model-table size on web-scale targets.
A document's score is the mean log10 S over its token positions;
perplexity = 10^(-mean). The reference repo gates quality per-episode with
an LLM; this is the deterministic corpus-scale stand-in, complementing
`datapipe.dsir` (importance RATIO vs a target) with an absolute target-LM
fluency score. Default order stays 2 (the round-3 contract); order=3 is
oracle-verified, and the same shape extends to CCNet's 5.

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


def _ctx_cols(order: int) -> list[str]:
    """Context column names, nearest first: prev, prev2, ..., prev{order-1}."""
    return ["prev" if j == 1 else f"prev{j}" for j in range(1, order)]


def _level_name(k: int) -> str:
    return {1: "unigrams", 2: "bigrams", 3: "trigrams"}.get(k, f"{k}grams")


def _pos_ctx(text_col: Column, order: int) -> Column:
    """array<struct<prev..prev{order-1}, cur>> per token position; context
    slots left of the document start are NULL. Pure column expression
    (codegen, no Python). For order=2 this is the round-3 (prev, cur) pair."""
    toks = tokens_col(text_col)
    n = F.size(toks)

    def _mk(i):
        fields = [
            F.when(i > j, F.element_at(toks, i - j)).alias(name)
            for j, name in enumerate(_ctx_cols(order), start=1)
        ]
        return F.struct(*fields, F.element_at(toks, i).alias("cur"))

    pairs = F.transform(F.sequence(F.lit(1), n), _mk)
    # empty docs yield an empty array (explode emits no rows for them)
    typ = ",".join(f"{c}:string" for c in _ctx_cols(order) + ["cur"])
    return F.when(n > 0, pairs).otherwise(F.array().cast(f"array<struct<{typ}>>"))


def train_backoff_lm(
    target_docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    order: int = 2,
) -> dict[str, DataFrame]:
    """Stupid-Backoff model of the given `order` from the target corpus.

    Returns small DataFrames (model tables, broadcast at score time):
      unigrams: (cur, s_uni)                s_uni = count(w)/N   (MLE)
      bigrams:  (prev, cur, s2)             s_k = count(k-gram) /
      trigrams: (prev2, prev, cur, s3)            count((k-1)-gram context),
      ...                                   pruned to count >= min_count at
                                            every level k >= 2 (KenLM-style
                                            count cutoff)
      totals:   (n_tokens, vocab)           one row — the OOV floor 1/(N+V)
      order:    the trained order (int, not a DataFrame)

    The denominator of level k is the count of the context (k-1)-gram over
    ALL its occurrences in the token stream (including document-final ones)
    — Brants' f(w_{i-k+1..i}) / f(w_{i-k+1..i-1}) exactly. All count tables
    are Heaps-law bounded by the TARGET corpus and shrink further under
    `min_count`; nothing here touches the 100 TB raw side.
    """
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    from graphiti_spark.session import widen_if_narrow

    ctx = _ctx_cols(order)
    target_docs = widen_if_narrow(target_docs, text_col)
    pairs = target_docs.select(F.explode(_pos_ctx(F.col(text_col), order)).alias("pc"))
    pairs = pairs.select(*[f"pc.{c}" for c in ctx], "pc.cur").persist()
    # k-gram occurrence counts keyed as ENDING at a position: level k is
    # (prev{k-1}, ..., prev, cur) with prev{k-1} non-null. counts[k-1] keyed
    # this way doubles as level k's context-denominator table after a
    # one-slot shift (context's newest token prev -> the ending gram's cur).
    counts: dict[int, DataFrame] = {}
    for k in range(1, order + 1):
        keys = list(reversed(ctx[: k - 1])) + ["cur"]
        grams = pairs if k == 1 else pairs.filter(F.col(ctx[k - 2]).isNotNull())
        counts[k] = grams.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
    totals = counts[1].agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    n_tok = F.col("n_tokens").cast("double")
    unigrams = counts[1].crossJoin(F.broadcast(totals)).select(
        "cur", (F.col("c").cast("double") / n_tok).alias("s_uni")
    )
    lm: dict[str, DataFrame] = {
        "unigrams": unigrams.localCheckpoint(eager=True),
        "totals": totals.localCheckpoint(eager=True),
    }
    for k in range(2, order + 1):
        # shift the (k-1)-gram counts into context position: ending-gram
        # field cur -> prev, prev -> prev2, ... (nearest-first renumber)
        denom = counts[k - 1]
        renames = {"cur": "prev", **{ctx[j]: ctx[j + 1] for j in range(k - 2)}}
        denom = denom.select(
            *[F.col(old).alias(new) for old, new in renames.items()],
            F.col("c").alias("c_ctx"),
        )
        keys = list(reversed(ctx[: k - 1]))
        lm[_level_name(k)] = (
            counts[k]
            .filter(F.col("c") >= min_count)
            .join(denom, keys)
            .select(
                *keys,
                "cur",
                (F.col("c").cast("double") / F.col("c_ctx")).alias(f"s{k}"),
            )
            .localCheckpoint(eager=True)
        )
    # materialize the (small) model tables, then release the pair cache —
    # the er.py cache-release discipline (a leaked persist accumulates GC
    # pressure across repeated calls in one session)
    pairs.unpersist()
    lm["order"] = order  # type: ignore[assignment]
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
    pure function of the integer count tables (cross-engine stable).

    Scoring joins one broadcast model table per level (order-1 gram joins +
    the unigram join) and aggregates once on doc id — the corpus never
    shuffles on a gram key regardless of order."""
    from graphiti_spark.session import widen_if_narrow

    order = lm.get("order", 2)
    ctx = _ctx_cols(order)
    hint = F.broadcast if broadcast_model else (lambda df: df)
    docs = widen_if_narrow(docs, id_col)
    pos = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_pos_ctx(F.col(text_col), order)).alias("pc"),
    ).select("id", *[f"pc.{c}" for c in ctx], "pc.cur")
    floor = F.lit(1.0) / (
        F.col("n_tokens").cast("double") + F.col("vocab").cast("double")
    )
    s_uni_floor = F.coalesce(F.col("s_uni"), floor)
    # Brants' cascade, built bottom-up: score_at_level(1) = unigram/floor;
    # score_at_level(k) = s_k if seen else alpha * score_at_level(k-1); a
    # position scores at the highest level its context affords (context
    # availability is monotone, so the when-chain lands exactly there).
    score = s_uni_floor
    for k in range(2, order + 1):
        score = F.when(
            F.col(ctx[k - 2]).isNotNull(),
            F.coalesce(F.col(f"s{k}"), F.lit(alpha) * score),
        ).otherwise(score)
    scored = pos
    for k in range(2, order + 1):
        keys = list(reversed(ctx[: k - 1])) + ["cur"]
        scored = scored.join(hint(lm[_level_name(k)]), keys, "left")
    scored = (
        scored.join(hint(lm["unigrams"]), "cur", "left")
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
