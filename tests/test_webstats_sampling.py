"""Hand-computed expectations for URL/domain analysis (datapipe/webstats.py)
and deterministic sampling / sequence packing (datapipe/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.sampling import pack_sequences, stratified_sample
from graphiti_spark.datapipe.webstats import (
    domain_stats,
    filter_blocked_domains,
    url_features,
)


def test_url_features_hand_computed(spark):
    rows = [
        (1, "https://news.sub.example.com/a/b/c?q=1#frag"),
        (2, "http://example.org"),
        (3, "https://localhost/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r for r in url_features(df).collect()}
    r = got[1]
    assert r["host"] == "news.sub.example.com"
    assert r["domain"] == "example.com"
    assert r["tld"] == "com"
    assert r["path"] == "/a/b/c"
    assert r["path_depth"] == 3
    assert got[2]["domain"] == "example.org" and got[2]["path_depth"] == 0
    assert got[3]["domain"] == "localhost"  # single label falls back to host


def test_canonical_url_hand_computed(spark):
    from graphiti_spark.datapipe.webstats import canonicalize_urls, url_dedup

    rows = [
        # scheme/host case, www, default port, fragment, trailing slash
        (1, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
        # same page, dressed differently -> same canonical
        (2, "https://example.com/a/b?a=1&fbclid=zzz&b=2"),
        # non-default port is KEPT
        (3, "https://example.com:8443/a"),
        # http default port dropped; empty path -> '/'
        (4, "http://example.com:80"),
        # only-tracking query vanishes entirely
        (5, "https://example.com/x?utm_campaign=c&gclid=g"),
        # ref/ref_src are tracking; 'refresh' is NOT (prefix must not over-match)
        (6, "https://example.com/y?refresh=1&ref=tw"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"] for r in canonicalize_urls(df).collect()}
    assert got[1] == "https://example.com/a/b?a=1&b=2"
    assert got[2] == "https://example.com/a/b?a=1&b=2"
    assert got[3] == "https://example.com:8443/a"
    assert got[4] == "http://example.com/"
    assert got[5] == "https://example.com/x"
    assert got[6] == "https://example.com/y?refresh=1"

    dedup = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert dedup["https://example.com/a/b?a=1&b=2"]["keep_doc_id"] == 1
    assert dedup["https://example.com/a/b?a=1&b=2"]["n_dups"] == 2
    assert len(dedup) == 5

    # strip_www=False preserves the www host verbatim (post-lowering)
    kept = canonicalize_urls(df, strip_www=False).collect()
    by_id = {r["doc_id"]: r["canonical_url"] for r in kept}
    assert by_id[1] == "https://www.example.com/a/b?a=1&b=2"


def test_domain_stats_and_blocklist(spark):
    rows = [
        (1, "https://a.example.com/1", "one two three"),  # 3 tokens
        (2, "https://b.example.com/2", "four five"),  # 2 tokens
        (3, "https://spam.biz/x", "junk junk junk junk junk"),  # 5 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    stats = {r["domain"]: r for r in domain_stats(df).collect()}
    assert stats["example.com"]["n_docs"] == 2
    assert stats["example.com"]["total_tokens"] == 5
    assert stats["example.com"]["token_share"] == 0.5
    assert stats["spam.biz"]["token_share"] == 0.5
    kept = filter_blocked_domains(df, ["spam.biz"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]
    assert kept.columns == ["doc_id", "url", "text"]  # original schema back


def _gate(salt: str, doc_id: int) -> int:
    return int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15], 16) % 1_000_000


def test_stratified_sample_matches_reference_hash(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", "w " * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = stratified_sample(df, rates={"en": 0.5, "de": 0.1})
    got = sorted(r["doc_id"] for r in out.collect())
    expect = sorted(
        i
        for i in range(200)
        if _gate("v1", i) < (500_000 if i % 2 == 0 else 100_000)
    )
    assert got == expect
    # determinism: second run identical
    assert sorted(r["doc_id"] for r in out.collect()) == expect
    # different salt -> different (still deterministic) sample
    other = sorted(
        r["doc_id"] for r in stratified_sample(df, rates={"en": 0.5, "de": 0.1}, salt="v2").collect()
    )
    assert other != expect


def test_stratified_sample_token_budget(spark):
    # en: 100 docs x 10 tokens = 1000; budget 100 -> rate 0.1
    # de: 100 docs x 10 tokens = 1000; same
    rows = [(i, "en" if i % 2 == 0 else "de", "w " * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = stratified_sample(df, token_budget_per_stratum=100)
    rates = {r["lang"]: r["rate"] for r in out.select("lang", "rate").distinct().collect()}
    assert rates == {"en": 0.1, "de": 0.1} or set(rates.values()) == {0.1}
    with pytest.raises(ValueError):
        stratified_sample(df)


def test_pack_sequences_hand_computed(spark):
    # doc_id: tokens -> offsets (id order): 0:3 @0, 1:4 @3, 2:5 @7, 3:2 @12
    rows = [(0, "a b c"), (1, "a b c d"), (2, "a b c d e"), (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pack_sequences(df, seq_len=5, bucket_size=2).collect()}
    assert (got[0]["start_offset"], got[0]["start_seq"], got[0]["end_seq"]) == (0, 0, 0)
    assert (got[1]["start_offset"], got[1]["start_seq"], got[1]["end_seq"]) == (3, 0, 1)
    assert (got[2]["start_offset"], got[2]["start_seq"], got[2]["end_seq"]) == (7, 1, 2)
    assert (got[3]["start_offset"], got[3]["start_seq"], got[3]["end_seq"]) == (12, 2, 2)


def test_pack_sequences_bucketing_invariant(spark):
    # layout must be identical whatever bucket_size is chosen
    rows = [(i, "t " * (1 + i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["start_offset"] for r in pack_sequences(df, bucket_size=4).collect()}
    b = {r["doc_id"]: r["start_offset"] for r in pack_sequences(df, bucket_size=1000).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# decontamination + paragraph dedup (datapipe/decontam.py)
# ---------------------------------------------------------------------------


def test_contamination_report_hand_computed(spark):
    from graphiti_spark.datapipe.decontam import contamination_report, ngram_decontaminate

    corpus = spark.createDataFrame(
        [
            # shares 3-grams "the quick fox" and "quick fox jumps" with eval
            (1, "see the quick fox jumps here"),
            # shares exactly one 3-gram "over lazy dogs"
            (2, "running over lazy dogs daily"),
            (3, "completely unrelated words only"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "the quick fox jumps"), (101, "walking over lazy dogs")],
        "doc_id long, text string",
    )
    rep = {
        r["doc_id"]: r["n_collisions"]
        for r in contamination_report(corpus, eval_set, n=3).collect()
    }
    assert rep == {1: 2, 2: 1}
    kept1 = ngram_decontaminate(corpus, eval_set, n=3, min_collisions=1)
    assert sorted(r["doc_id"] for r in kept1.collect()) == [3]
    kept2 = ngram_decontaminate(corpus, eval_set, n=3, min_collisions=2)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2, 3]


def test_paragraph_dedup_hand_computed(spark):
    from graphiti_spark.datapipe.decontam import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "p one\n\np two"),
            (2, "p two\n\np three\n\np one"),
            (3, "p two"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["deduped_text"] for r in paragraph_dedup(docs).collect()}
    # p one -> first in doc 1 pos 0; p two -> doc 1 pos 1; p three -> doc 2
    assert got == {1: "p one\n\np two", 2: "p three"}  # doc 3 emptied -> dropped


def test_paragraph_dedup_hot_paragraph(spark):
    from graphiti_spark.datapipe.decontam import paragraph_dedup

    rows = [(i, "boilerplate footer\n\nunique %d" % i) for i in range(100)]
    got = paragraph_dedup(spark.createDataFrame(rows, "doc_id long, text string"))
    texts = {r["doc_id"]: r["deduped_text"] for r in got.collect()}
    assert texts[0] == "boilerplate footer\n\nunique 0"
    assert all(texts[i] == "unique %d" % i for i in range(1, 100))


def test_unimax_allocation_water_filling(spark):
    """Hand case: caps [1,4,10], budget 9 → levels [3,4,4], first two capped,
    theta=4 → allocs [1,4,4] (sums to budget)."""
    from graphiti_spark.datapipe.sampling import unimax_allocation

    stats = spark.createDataFrame(
        [("a", 1.0), ("b", 4.0), ("c", 10.0)], "lang string, n_tokens double"
    )
    got = {r["lang"]: r for r in unimax_allocation(stats, budget=9.0).collect()}
    assert got["a"]["alloc"] == 1.0 and got["a"]["epochs"] == 1.0
    assert got["b"]["alloc"] == 4.0
    assert got["c"]["alloc"] == 4.0 and got["c"]["rate"] == 0.4
    assert sum(r["alloc"] for r in got.values()) == 9.0


def test_unimax_allocation_no_caps_and_all_caps(spark):
    from graphiti_spark.datapipe.sampling import unimax_allocation

    stats = spark.createDataFrame(
        [("a", 5.0), ("b", 6.0)], "lang string, n_tokens double"
    )
    # budget below every cap: even split, nobody capped
    got = {r["lang"]: r["alloc"] for r in unimax_allocation(stats, budget=4.0).collect()}
    assert got == {"a": 2.0, "b": 2.0}
    # budget above the total cap: everyone fully capped at max_epochs
    got = {r["lang"]: r for r in unimax_allocation(stats, budget=100.0, max_epochs=2.0).collect()}
    assert got["a"]["alloc"] == 10.0 and got["a"]["epochs"] == 2.0 and got["a"]["rate"] == 1.0
    assert got["b"]["alloc"] == 12.0


def test_unimax_sample_gate_matches_stratified_formula(spark):
    """The sample keeps exactly the md5-gated ids at the allocation's rate —
    cross-checked against an explicit python reimplementation of the gate."""
    import hashlib

    from pyspark.sql import functions as F

    from graphiti_spark.datapipe.sampling import unimax_allocation, unimax_sample
    from graphiti_spark.functions.textstats import token_count_col

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr", "w " * 10) for i in range(200)],
        "doc_id long, lang string, text string",
    )
    out = unimax_sample(docs, budget=1000.0, max_epochs=1.0)
    kept = {r["doc_id"] for r in out.collect()}
    stats = docs.groupBy("lang").agg(
        F.sum(token_count_col(F.col("text"))).alias("n_tokens")
    )
    rates = {
        r["lang"]: r["rate"]
        for r in unimax_allocation(stats, budget=1000.0).collect()
    }

    def gate(doc_id):
        h = int(hashlib.md5(f"unimax:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % 1_000_000

    n_kept = 0
    for i in range(200):
        lang = "en" if i % 2 == 0 else "fr"
        expect = gate(i) < int(rates[lang] * 1_000_000)
        assert (i in kept) == expect, (i, lang, rates[lang])
        n_kept += expect
    assert n_kept == len(kept) > 0


def test_weighted_sample_k_properties(spark):
    from graphiti_spark.datapipe.sampling import weighted_sample_k

    rows = [(i, "en", float(1 + (i % 7))) for i in range(200)] + [
        (900, "en", 0.0),  # weight 0: never selected
        (901, "en", None),  # NULL weight: never selected
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    got = weighted_sample_k(df, k=10, weight_col="w")
    ids = {r["doc_id"] for r in got.collect()}
    assert len(ids) == 10 and 900 not in ids and 901 not in ids

    # partitioning invariance: the sample is a pure function of (salt,id,w)
    ids2 = {r["doc_id"] for r in weighted_sample_k(df.repartition(13), k=10, weight_col="w").collect()}
    assert ids2 == ids
    # salt changes the draw
    ids3 = {r["doc_id"] for r in weighted_sample_k(df, k=10, weight_col="w", salt="v2").collect()}
    assert ids3 != ids

    # k >= eligible population returns every eligible row
    assert weighted_sample_k(df, k=500, weight_col="w").count() == 200


def test_weighted_sample_k_weight_bias(spark):
    """A-ES inclusion tracks weights: with half the rows at 50x the weight
    of the other half, a k=40-of-400 sample must be dominated by heavy rows
    (deterministic given the fixed salt — this asserts the measured draw)."""
    from graphiti_spark.datapipe.sampling import weighted_sample_k

    rows = [(i, 50.0 if i % 2 == 0 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample_k(df, k=40, weight_col="w").collect()
    heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert heavy >= 34  # expected ~39; far above the unweighted 20


def test_weighted_sample_k_per_stratum(spark):
    from graphiti_spark.datapipe.sampling import weighted_sample_k

    rows = [(i, "a" if i < 50 else "b", 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    got = weighted_sample_k(df, k=5, weight_col="w", strata_col="lang").collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["a"]) == 5 and len(by["b"]) == 5
    assert all(i < 50 for i in by["a"]) and all(i >= 50 for i in by["b"])


def test_domain_quality_stats_and_gate_hand_computed(spark):
    from graphiti_spark.datapipe.webstats import (
        domain_quality_gate,
        domain_quality_stats,
    )

    # spam.com: 3 docs, scores 0.1/0.2/0.3 -> mean 0.2 (condemnable at
    # min_docs=3); good.org: 3 docs mean 0.8; tiny.net: 1 low-score doc but
    # below the evidence floor, so it must PASS the gate.
    rows = [
        (1, "https://a.spam.com/x", 0.1),
        (2, "https://b.spam.com/y", 0.2),
        (3, "https://spam.com/z", 0.3),
        (4, "https://good.org/1", 0.7),
        (5, "https://good.org/2", 0.8),
        (6, "https://www.good.org/3", 0.9),
        (7, "https://tiny.net/only", 0.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, score double")
    docs = df.select("doc_id", "url")
    scores = df.select("doc_id", "score")

    stats = {r["domain"]: r for r in domain_quality_stats(docs, scores).collect()}
    assert stats["spam.com"]["n_docs"] == 3
    assert stats["spam.com"]["mean_score"] == pytest.approx(0.2)
    assert stats["good.org"]["mean_score"] == pytest.approx(0.8)
    assert stats["tiny.net"]["n_docs"] == 1

    kept = sorted(
        r["doc_id"]
        for r in domain_quality_gate(
            docs, scores, min_mean_score=0.5, min_docs=3
        ).collect()
    )
    assert kept == [4, 5, 6, 7]  # spam.com dropped; tiny.net passes the floor

    # evidence floor at 1 condemns tiny.net too
    kept1 = sorted(
        r["doc_id"]
        for r in domain_quality_gate(
            docs, scores, min_mean_score=0.5, min_docs=1
        ).collect()
    )
    assert kept1 == [4, 5, 6]


def test_domain_quality_gate_is_broadcast_anti_join(spark):
    from graphiti_spark.datapipe.webstats import domain_quality_gate

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com/p")).alias("url"),
    )
    scores = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 10 / 10.0).alias("score")
    )
    plan = domain_quality_gate(docs, scores, 0.45, min_docs=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_temperature_mixture_weights_hand_computed(spark):
    """alpha=0.5 over groups of 4 and 1 docs: weights 2/3 and 1/3, boosts
    (2/3)/(4/5) = 5/6 and (1/3)/(1/5) = 5/3; alpha=1 reproduces the
    natural shares; alpha=0 is uniform."""
    from pyspark.sql import functions as F

    from graphiti_spark.datapipe.sampling import temperature_mixture_weights

    docs = spark.createDataFrame(
        [(i, "en" if i < 4 else "de") for i in range(5)], "doc_id long, lang string"
    )
    got = {
        r["group"]: r
        for r in temperature_mixture_weights(docs, alpha=0.5).collect()
    }
    assert got["en"]["weight"] == round(2 / 3, 6)
    assert got["de"]["weight"] == round(1 / 3, 6)
    assert got["en"]["boost"] == round(5 / 6, 6)
    assert got["de"]["boost"] == round(5 / 3, 6)

    nat = {r["group"]: r for r in temperature_mixture_weights(docs, alpha=1.0).collect()}
    assert nat["en"]["weight"] == nat["en"]["share"] == 0.8
    uni = {r["group"]: r for r in temperature_mixture_weights(docs, alpha=0.0).collect()}
    assert uni["en"]["weight"] == uni["de"]["weight"] == 0.5
