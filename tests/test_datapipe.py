from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    fingerprint_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from graphiti_spark.datapipe.multimodal import (
    attach_payloads,
    decode_image_stub,
    extract_features,
    fake_features,
    frame_sample_plan,
)
from graphiti_spark.datapipe.simsearch import brute_force_topk, ivf_topk, lsh_bucketed_topk
from graphiti_spark.datapipe.textanalysis import (
    language_id,
    profile_documents,
    quality_filter,
    token_budget,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "der hund und die katze und der vogel nicht da"),
        (5, "completely different content about spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs(spark)).collect()
    groups = {r["canonical_id"]: r["dup_count"] for r in out}
    assert groups[1] == 2  # docs 1,2 identical
    assert sum(groups.values()) == 5


def test_fingerprint_dedup(spark):
    out = fingerprint_dedup(_docs(spark), k=4).collect()
    # first-4 + last-4 tokens: docs 1,2 identical; doc 3 differs in last token
    groups = {r["canonical_id"]: r["dup_count"] for r in out}
    assert groups[1] == 2


def test_minhash_lsh_finds_near_dup(spark):
    pairs = minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert all(a < b for a, b in got)
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_lsh_rows_per_band(spark):
    """r=2 banding: exact dups still pair (every band key matches); empty
    docs never pair (F.concat propagates the NULL signature — a concat_ws
    key would collapse all empty docs onto the same '' bucket)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, ""),
        (4, ""),
        (5, "unrelated words entirely here about engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.99, rows_per_band=2).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p or 4 in p for p in got)
    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, num_hashes=8, rows_per_band=3)


def test_set_similarity_join_exact(spark):
    """Prefix-filter AllPairs join: 100% recall at the threshold — output
    must EQUAL the brute-force all-pairs jaccard filter, unlike the
    sketch methods whose recall is probabilistic."""
    from graphiti_spark.datapipe.dedup import set_similarity_join

    rows = [
        (i, " ".join(f"w{j}" for j in range(20) if (i, j) != (i, i % 20)) + (f" extra{i % 5}" if i % 3 else ""))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in set_similarity_join(docs, threshold=0.8).collect()
    }
    # brute force ground truth
    toks = {i: set(t.split()) for i, t in rows}
    want = set()
    for a in range(30):
        for b in range(a + 1, 30):
            j = len(toks[a] & toks[b]) / len(toks[a] | toks[b])
            if j >= 0.8:
                want.add((a, b, round(j, 9)))
    assert got == want and want  # non-trivial and exactly equal


def test_simhash_pairs_near_dup(spark):
    pairs = simhash_pairs(_docs(spark), max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got  # identical docs -> hamming 0


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), n=2, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got


def test_embedding_cosine_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1]),
        (2, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.11]),
        (3, [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]) for r in embedding_cosine_pairs(df, threshold=0.99).collect()}
    assert out == {(1, 2)}


def test_embedding_cosine_pairs_bucket_cap_defuses_hot_sign_pattern(spark):
    """One hot sign pattern (anisotropic embeddings: most vectors share
    head-dim signs) must not fan out O(B^2): buckets over ``bucket_cap``
    are dropped from blocking, cold buckets still pair (VERDICT r2 #2)."""
    hot = [(i, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, float(i)]) for i in range(20)]
    cold = [
        (100, [-1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1]),
        (101, [-1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.11]),
    ]
    df = spark.createDataFrame(hot + cold, "vec_id long, embedding array<float>")
    out = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(df, threshold=0.5, bucket_cap=10).collect()
    }
    assert (100, 101) in out  # cold bucket unaffected
    assert not any(a < 100 and b < 100 for a, b in out)  # hot bucket dropped entirely


def test_dedup_caches_plumbing_unpersists(spark):
    """minhash_lsh_pairs / simhash_pairs hand their persist() handles to the
    caller via ``caches`` so repeated calls don't accumulate cached blocks
    (ADVICE r2)."""
    caches: list = []
    minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5, caches=caches).count()
    simhash_pairs(_docs(spark), max_hamming=3, caches=caches).count()
    assert len(caches) == 2 and all(c.storageLevel.useMemory for c in caches)
    for c in caches:
        c.unpersist()
    assert all(not c.storageLevel.useMemory for c in caches)


def test_brute_force_topk(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.8, 0.6]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = [r["vec_id"] for r in brute_force_topk(df, [1.0, 0.0], k=2).collect()]
    assert out == [1, 2]


def test_lsh_bucketed_matches_brute_force_on_probed(spark):
    rows = [(i, [float((i % 3) - 1) + 0.1, float(i % 5) / 5 - 0.3]) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [0.9, 0.2]
    bf = [r["vec_id"] for r in brute_force_topk(df, q, k=3).collect()]
    ann = [r["vec_id"] for r in lsh_bucketed_topk(df, q, k=3, bits=2).collect()]
    assert ann[0] == bf[0]  # nearest neighbor survives probing


def test_ivf_topk(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    out = [r["vec_id"] for r in ivf_topk(df, cents, [0.95, 0.05], k=2, n_probe=1).collect()]
    assert out == [1, 2]


def test_profile_and_quality(spark):
    prof = {r["doc_id"]: r for r in profile_documents(_docs(spark)).collect()}
    assert prof[1]["n_tokens"] == 9
    assert prof[1]["lang_pred"] == "en"
    assert prof[4]["lang_pred"] == "de"
    kept = {r["doc_id"] for r in quality_filter(_docs(spark), min_quality=0.2, min_tokens=5).collect()}
    assert 1 in kept


def test_language_id_scores(spark):
    out = {r["doc_id"]: r for r in language_id(_docs(spark)).collect()}
    assert out[4]["score_de"] > out[4]["score_en"]


def test_token_budget_grouped(spark):
    docs = _docs(spark).withColumn("lang", F.when(F.col("doc_id") == 4, "de").otherwise("en"))
    out = {r["lang"]: r["total_tokens"] for r in token_budget(docs, by="lang").collect()}
    assert out["de"] == 10 and out["en"] > 20


def test_multimodal_features_deterministic(spark):
    media = attach_payloads(_docs(spark))
    feats = extract_features(media).collect()
    assert len(feats) == 5
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id["1"]["features"] == fake_features("the quick brown fox jumps over the lazy dog".encode())
    assert by_id["1"]["n_bytes"] == 43
    # identical payloads -> identical features (docs 1 and 2)
    assert by_id["1"]["payload_md5"] == by_id["2"]["payload_md5"]


def test_multimodal_real_decode_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")
    media = attach_payloads(_docs(spark))
    with pytest.raises(Exception):  # NotImplementedError surfaces as task failure
        extract_features(media, use_real_decode=True).collect()


def test_frame_sample_plan_metadata_only(spark):
    media = attach_payloads(_docs(spark))
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r["sample_frames"][0] == 0 for r in rows)
    assert "payload" not in plan.columns


def test_semantic_dedup_hand_computed(spark):
    """SemDeDup: identical vectors always share a k-means cell (same argmax,
    same tie-break), so at threshold 0.99 each identical group keeps exactly
    its lexicographic-min id; the lone distinct vector survives regardless
    of which cell it lands in (no >=0.99 partner anywhere)."""
    from graphiti_spark.datapipe.dedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),  # dup of 2
        (4, [0.5, 0.5, 0.70710678, 0.0]),  # cos <= 0.71 to everything
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["doc_id"]: (r["canonical_id"], r["is_kept"]) for r in
           semantic_dedup(df, k=2, threshold=0.99, n_iter=2).collect()}
    assert out == {
        "0": ("0", True),
        "1": ("0", False),
        "2": ("2", True),
        "3": ("2", False),
        "4": ("4", True),
    }


def test_semantic_dedup_cell_cap_defuses_degenerate_clustering(spark):
    """cell_cap: with every vector forced into over-cap cells, no pairs are
    generated and everything is kept — bounded work under degenerate
    clustering, same hygiene as the sibling blockers."""
    from graphiti_spark.datapipe.dedup import semantic_dedup

    rows = [(i, [1.0, 0.0, float(i) * 1e-6, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, k=1, threshold=0.5, n_iter=1, cell_cap=2).collect()
    assert all(r["is_kept"] for r in out)
