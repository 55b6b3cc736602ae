"""Distributed BPE (byte-pair-encoding) vocabulary learning + corpus
segmentation — the tokenizer-training step of an LLM data pipeline
(Sennrich et al. 2016), re-expressed for Spark.

The scale trick: merges are learned over the DISTINCT-WORD FREQUENCY table,
never the corpus. Heaps' law bounds the distinct-word table at a tiny
fraction of a 10^12-document corpus (and it only shrinks relative to corpus
growth), so after ONE corpus-wide word count:
 - each merge step is one algebraic pair-count aggregation over the vocab
   table (weighted by word frequency — exactly equivalent to counting over
   the corpus) + one driver-side top-1 + one array fold applied to the
   vocab rows;
 - applying the learned segmentation back to the corpus is a broadcast join
   word -> final symbol sequence (the vocab table broadcasts; the corpus
   never shuffles).
The per-merge fold is an interpreted HOF lambda, but it runs on vocab rows
(words are short, the table is vocab-sized) — the hot corpus path stays
JVM-side map-only.

Determinism contract: ties on pair count break lexicographically on
(left, right); greedy left-to-right non-overlapping merge application (the
fold: "aaa" under merge (a,a) -> [aa, a]). No end-of-word marker — word
boundaries already exist, segmentation is per-word.

Reference anchor: the reference counts tokens for prompt budgeting
(graphiti_core token counting in llm_client); learned subword vocab is part
of the training-data surface the north rule adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus-wide whitespace/lowercase token
    convention. One algebraic aggregation — zipfian hot words collapse
    map-side."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_fold(left: str, right: str) -> F.Column:
    """Greedy left-to-right application of one merge to the `seq` column:
    fold symbols into a new array, collapsing [.., left] + right -> [..,
    left+right]. A just-created merged symbol can't chain (it no longer
    equals `left` — unless left+right == left, impossible for non-empty
    right), which is exactly the non-overlapping rule."""
    merged = left + right
    return F.aggregate(
        "seq",
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to `n_merges` BPE merges; returns (merges, word_seqs) where
    merges is [(left, right, pair_count)] in learned order and word_seqs is
    the vocab table (word, cnt, seq: array<string>) segmented under all
    learned merges. Stops early when the best remaining pair occurs fewer
    than `min_pair_count` times (weighted by word frequency)."""
    words = word_counts(docs, text_col).localCheckpoint(eager=True)
    # split keeps trailing empties (limit -1) — the (?!^) lookahead matches
    # at end-of-string too; drop them
    seqs = words.withColumn(
        "seq", F.filter(F.split("word", "(?!^)"), lambda s: s != "")
    ).localCheckpoint(eager=True)
    pair_arr = F.when(
        F.size("seq") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("seq") - 1),
            lambda i: F.struct(
                F.element_at("seq", i).alias("l"),
                F.element_at("seq", i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            seqs.select("cnt", F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.col("pc").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pc"] < min_pair_count:
            break
        left, right, pc = top[0]["l"], top[0]["r"], int(top[0]["pc"])
        merges.append((left, right, pc))
        seqs = seqs.withColumn("seq", _merge_fold(left, right)).localCheckpoint(
            eager=True
        )
    return merges, seqs


def bpe_segment_stats(
    docs: DataFrame,
    word_seqs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): corpus-side application of the
    learned segmentation. The corpus explodes to words map-side and joins
    the BROADCAST vocab table — no corpus shuffle on the word key, hot
    words hit the broadcast map. A word absent from the vocab (can't happen
    when the vocab was learned on the same corpus; can after incremental
    ingest) falls back to character count."""
    dw = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("word")
    )
    seg = word_seqs.select("word", F.size("seq").alias("n_sym"))
    joined = dw.join(F.broadcast(seg), "word", "left").withColumn(
        "n_sym", F.coalesce("n_sym", F.length("word"))
    )
    out = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sym").alias("n_bpe_tokens"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
        )
    )
