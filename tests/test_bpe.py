"""Hand-computed BPE cases (the Sennrich et al. classic corpus). Derivations
in comments; nothing comes from engine output."""

from __future__ import annotations

from graphiti_spark.datapipe.bpe import bpe_segment_stats, learn_bpe, word_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _classic(spark):
    # the classic corpus: low x5, lower x2, newest x6, widest x3
    return _docs(
        spark,
        [
            (1, " ".join(["low"] * 5)),
            (2, " ".join(["lower"] * 2)),
            (3, " ".join(["newest"] * 6)),
            (4, " ".join(["widest"] * 3)),
        ],
    )


def test_word_counts(spark):
    got = {r["word"]: r["cnt"] for r in word_counts(_docs(spark, [(1, "a B b a a")])).collect()}
    assert got == {"a": 3, "b": 2}


def test_learn_bpe_classic_merge_order(spark):
    # Weighted pair counts, derived by hand:
    # round 1: (e,s)=9 ties (s,t)=9 -> lexicographic (e,s) wins -> "es"
    # round 2: (es,t)=9 -> "est"
    # round 3: (l,o)=7 -> "lo"
    # round 4: (lo,w)=7 -> "low"
    # round 5: (e,w)=6 ties (n,e)=6, (w,est)=6 -> (e,w) wins -> "ew"
    merges, seqs = learn_bpe(_classic(spark), n_merges=5)
    assert merges == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7), ("lo", "w", 7), ("e", "w", 6)]
    seg = {r["word"]: r["seq"] for r in seqs.collect()}
    assert seg["newest"] == ["n", "ew", "est"]
    assert seg["low"] == ["low"]
    assert seg["lower"] == ["low", "e", "r"]
    assert seg["widest"] == ["w", "i", "d", "est"]


def test_learn_bpe_min_pair_count_stops_early(spark):
    # corpus "a b": no word has 2 symbols... use "ab cd": pairs (a,b)=1,
    # (c,d)=1 — below min_pair_count=2, so no merges are learned.
    merges, seqs = learn_bpe(_docs(spark, [(1, "ab cd")]), n_merges=5, min_pair_count=2)
    assert merges == []
    assert {tuple(r["seq"]) for r in seqs.collect()} == {("a", "b"), ("c", "d")}


def test_merge_fold_is_nonoverlapping_left_to_right(spark):
    # "aaa" x2 so (a,a) reaches min count: (a,a)=4 -> merge to [aa, a];
    # next round (aa,a)=2 -> [aaa].
    merges, seqs = learn_bpe(_docs(spark, [(1, "aaa aaa")]), n_merges=1)
    assert merges == [("a", "a", 4)]
    assert [tuple(r["seq"]) for r in seqs.collect()] == [("aa", "a")]
    merges2, seqs2 = learn_bpe(_docs(spark, [(1, "aaa aaa")]), n_merges=2)
    assert merges2 == [("a", "a", 4), ("aa", "a", 2)]
    assert [tuple(r["seq"]) for r in seqs2.collect()] == [("aaa",)]


def test_bpe_segment_stats(spark):
    # after 5 classic merges: low->1 sym, lower->3, newest->3, widest->4.
    # doc: "low lower newest" -> n_words 3, n_bpe 1+3+3 = 7; unseen word
    # "zzz" falls back to char count 3.
    corpus = _classic(spark)
    _, seqs = learn_bpe(corpus, n_merges=5)
    docs = _docs(spark, [(10, "low lower newest"), (11, "zzz low"), (12, "")])
    got = {r["doc_id"]: r for r in bpe_segment_stats(docs, seqs).collect()}
    assert got[10]["n_words"] == 3 and got[10]["n_bpe_tokens"] == 7
    assert got[11]["n_words"] == 2 and got[11]["n_bpe_tokens"] == 4
    assert got[12]["n_words"] == 0 and got[12]["n_bpe_tokens"] == 0
