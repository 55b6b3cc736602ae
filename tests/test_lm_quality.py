"""Hand-computed Stupid-Backoff perplexity expectations (datapipe/lm_quality.py).

Training corpus (target): "a b a", "b a"
  unigram counts a:3 b:2  →  N=5, V=2, OOV floor = 1/7
  s_uni: a = 3/5 = 0.6, b = 2/5 = 0.4
  bigram counts (a,b):1 (b,a):2  →  s_bi: (a,b) = 1/3, (b,a) = 2/2 = 1.0
All expectations below are derived from these counts by hand (math module),
never from engine output.
"""

from __future__ import annotations

import math

import pytest

TARGET = [("t1", "a b a"), ("t2", "b a")]


def _score(spark, text: str, min_count: int = 1, order: int = 2):
    from graphiti_spark.datapipe.lm_quality import lm_perplexity, train_backoff_lm

    tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
    lm = train_backoff_lm(tgt, min_count=min_count, order=order)
    docs = spark.createDataFrame([("x", text)], "doc_id string, text string")
    rows = lm_perplexity(docs, lm).collect()
    return rows


def _expect(logs: list[float]):
    avg = round(sum(logs) / len(logs), 6)
    return avg, round(10.0 ** (-avg), 4)


def test_all_seen_bigram_path(spark):
    # "a b a": [uni(a)=0.6, bi(a,b)=1/3, bi(b,a)=1.0]
    rows = _score(spark, "a b a")
    avg, ppl = _expect([math.log10(0.6), math.log10(1 / 3), math.log10(1.0)])
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(ppl, abs=1e-9)


def test_oov_and_backoff_paths(spark):
    # "c a c": [floor=1/7, 0.4*uni(a), 0.4*floor] — OOV first position takes
    # the floor WITHOUT alpha; unseen bigrams back off WITH alpha.
    rows = _score(spark, "c a c")
    avg, ppl = _expect(
        [math.log10(1 / 7), math.log10(0.4 * 0.6), math.log10(0.4 / 7)]
    )
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(ppl, abs=1e-9)


def test_min_count_prunes_bigram(spark):
    # min_count=2 drops (a,b) (count 1) but keeps (b,a) (count 2):
    # "a b" → [uni(a)=0.6, 0.4*uni(b)=0.16]
    rows = _score(spark, "a b", min_count=2)
    avg, ppl = _expect([math.log10(0.6), math.log10(0.16)])
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(ppl, abs=1e-9)


def test_empty_doc_emits_no_row_and_fluent_beats_gibberish(spark):
    from graphiti_spark.datapipe.lm_quality import lm_perplexity, train_backoff_lm

    tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
    lm = train_backoff_lm(tgt)
    docs = spark.createDataFrame(
        [("fluent", "b a b a"), ("gibberish", "z q w v"), ("empty", "   ")],
        "doc_id string, text string",
    )
    got = {r["id"]: r for r in lm_perplexity(docs, lm).collect()}
    assert set(got) == {"fluent", "gibberish"}
    assert got["fluent"]["ppl"] < got["gibberish"]["ppl"]
    assert got["gibberish"]["ppl"] > 1.0  # scores are probabilities ≤ 1


def test_trigram_all_levels(spark):
    # order=3 counts from TARGET: trigram (a b a):1, s3(a | a b) = 1/1.
    # "a b a": [uni(a)=0.6, s2(b|a)=1/3, s3(a|a b)=1.0] — each position
    # scores at the highest order its context affords, no alpha when seen.
    rows = _score(spark, "a b a", order=3)
    avg, ppl = _expect([math.log10(0.6), math.log10(1 / 3), math.log10(1.0)])
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(ppl, abs=1e-9)


def test_trigram_backoff_one_alpha_per_level(spark):
    # "b a b": trigram (b a b) unseen -> alpha * s2(b|a) = 0.4 * (1/3);
    # position 2 starts at bigram (s2(a|b) = 1.0, seen, no alpha).
    rows = _score(spark, "b a b", order=3)
    avg, ppl = _expect([math.log10(0.4), math.log10(1.0), math.log10(0.4 / 3)])
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(ppl, abs=1e-9)


def test_trigram_oov_context_double_backoff(spark):
    # "c a b": pos1 OOV floor (no alpha); pos2 (c,a) bigram unseen ->
    # 0.4*uni(a); pos3 trigram (c a b) unseen -> 0.4 * s2(b|a) = 0.4/3.
    rows = _score(spark, "c a b", order=3)
    avg, ppl = _expect(
        [math.log10(1 / 7), math.log10(0.4 * 0.6), math.log10(0.4 / 3)]
    )
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(ppl, abs=1e-9)


def test_trigram_min_count_prunes_every_level(spark):
    # min_count=2 prunes trigram (a b a) (count 1) AND bigram (a b) (count
    # 1), keeps (b a) (count 2): "a b a" -> [uni(a)=0.6,
    # 0.4*uni(b)=0.16, alpha*s2(a|b)=0.4*1.0] — KenLM-style cutoff at
    # every level >= 2.
    rows = _score(spark, "a b a", min_count=2, order=3)
    avg, ppl = _expect([math.log10(0.6), math.log10(0.16), math.log10(0.4)])
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(ppl, abs=1e-9)


def test_bigram_unchanged_and_order_validation(spark):
    import pyspark.sql.functions as F

    from graphiti_spark.datapipe.lm_quality import train_backoff_lm

    tgt = spark.createDataFrame(TARGET, "doc_id string, text string")
    with pytest.raises(ValueError):
        train_backoff_lm(tgt, order=1)
    # order=3 on a 2-token doc: no trigram rows, but bigram/unigram tables
    # unchanged vs order=2 training
    lm2 = train_backoff_lm(tgt, order=2)
    lm3 = train_backoff_lm(tgt, order=3)
    b2 = {(r["prev"], r["cur"]): r["s2"] for r in lm2["bigrams"].collect()}
    b3 = {(r["prev"], r["cur"]): r["s2"] for r in lm3["bigrams"].collect()}
    assert b2 == b3
    assert lm3["trigrams"].filter(F.col("prev2").isNull()).count() == 0


def test_ppl_buckets_terciles(spark):
    from graphiti_spark.datapipe.lm_quality import ppl_buckets

    scored = spark.createDataFrame(
        [(str(i), float(i)) for i in range(1, 7)], "id string, ppl double"
    )
    got = {r["id"]: r["bucket"] for r in ppl_buckets(scored).collect()}
    # cutoffs over [1..6]: c1 = 2.666665, c2 = 4.333335 (hand-interpolated)
    assert got == {
        "1": "head",
        "2": "head",
        "3": "middle",
        "4": "middle",
        "5": "tail",
        "6": "tail",
    }


def test_order5_ccnet_shape(spark):
    """Order-5 (the order CCNet's KenLM uses). Train corpus = the scored
    document itself, "a b c d e a b c d e". Hand-derivation:
      pos 1  (no context):      s_uni(a) = 2/10 = 0.2
      pos 6  (ctx "b c d e"):   the context 4-gram occurs TWICE (positions
                                2-5 and 7-10) but only the first has a
                                continuation, so s5 = c5/c4 = 1/2 = 0.5
      all other positions:      unique seen context at their level -> 1.0
    avg_logprob = (log10(0.2) + log10(0.5)) / 10 = -0.1 exactly."""
    from graphiti_spark.datapipe.lm_quality import lm_perplexity, train_backoff_lm

    text = "a b c d e a b c d e"
    tgt = spark.createDataFrame([("t", text)], "doc_id string, text string")
    lm = train_backoff_lm(tgt, order=5)
    rows = lm_perplexity(
        spark.createDataFrame([("x", text)], "doc_id string, text string"), lm
    ).collect()
    avg = round((math.log10(0.2) + math.log10(0.5)) / 10, 6)
    assert rows[0]["n_tokens"] == 10
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(round(10.0 ** (-avg), 4), abs=1e-6)


def test_5gram_min_count_prunes_cascade(spark):
    """Order-5 with the KenLM-style cutoff min_count=2 (the
    lm_perplexity_5 oracle configuration). Target = "a b a b a":
      counts  uni a:3 b:2 | bi (a,b):2 (b,a):2 | tri (a,b,a):2 (b,a,b):1
              4g (a,b,a,b):1 (b,a,b,a):1 | 5g (a,b,a,b,a):1
      pruning (>=2) keeps both bigrams and tri (a,b,a); drops tri
      (b,a,b), both 4-grams, and the 5-gram.
    Scoring "a b a b a":
      pos1: uni(a) = 3/5
      pos2: s2(b|a) = 2/3
      pos3: s3(a|a b) = c(aba)/c(ab) = 2/2 = 1
      pos4: lvl4 pruned -> 0.4 * (lvl3 (b,a,b) pruned -> 0.4 * s2(a,b))
            = 0.4 * 0.4 * 2/3
      pos5: lvl5 pruned -> 0.4 * (lvl4 pruned -> 0.4 * s3(a|a b))
            = 0.4 * 0.4 * 1
    """
    from graphiti_spark.datapipe.lm_quality import lm_perplexity, train_backoff_lm

    text = "a b a b a"
    tgt = spark.createDataFrame([("t", text)], "doc_id string, text string")
    lm = train_backoff_lm(tgt, order=5, min_count=2)
    rows = lm_perplexity(
        spark.createDataFrame([("x", text)], "doc_id string, text string"), lm
    ).collect()
    logs = [
        math.log10(3 / 5),
        math.log10(2 / 3),
        math.log10(1.0),
        math.log10(0.4 * 0.4 * 2 / 3),
        math.log10(0.4 * 0.4),
    ]
    avg = round(sum(logs) / len(logs), 6)
    assert rows[0]["n_tokens"] == 5
    assert rows[0]["avg_logprob"] == pytest.approx(avg, abs=1e-9)
    assert rows[0]["ppl"] == pytest.approx(round(10.0 ** (-avg), 4), abs=1e-6)
