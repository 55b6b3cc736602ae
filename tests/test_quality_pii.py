"""Hand-computed expectations for the Gopher repetition/quality gate and the
PII masking ops (datapipe/quality.py, datapipe/pii.py).

Every expected number below is derived by hand in the comments — these are
semantic ground truth, not engine output pinned back on itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.pii import mask_pii, pii_stats
from graphiti_spark.datapipe.quality import gopher_quality_flags, repetition_profile


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_profile_hand_computed(spark):
    rows = [
        # lines [a, b, a, c] (empty dropped): 4 lines, 3 distinct ->
        # dup_line_frac = 1/4; chars 1+1+1+1=4 vs distinct 3 -> (4-3)/4
        (1, "a\nb\na\n\nc"),
        # lines [hello world, x, hello world]: 3 lines 2 distinct -> 1/3;
        # chars 11+1+11=23, distinct 12 -> 11/23 = 0.478261
        (2, "hello world\nx\nhello world"),
        # toks [a b a b a] -> bigrams [a b, b a, a b, b a]; counts tie 2-2,
        # tie-break largest gram -> 'b a', chars 2*3=6 over n_chars 9
        (3, "a b a b a"),
        # 6 tokens -> two 5-grams, distinct -> dup_5gram_frac 0
        (4, "q w e r t y"),
        # 6 equal tokens -> 5-grams [t t t t t] x2, 1 distinct -> 0.5
        (5, "t t t t t t"),
        (6, ""),  # empty: all zeros
    ]
    got = {
        r["doc_id"]: r
        for r in repetition_profile(_docs(spark, rows)).collect()
    }
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_frac"] == 0.25
    assert got[1]["dup_line_char_frac"] == 0.25
    assert got[2]["dup_line_frac"] == pytest.approx(0.333333)
    assert got[2]["dup_line_char_frac"] == pytest.approx(0.478261)
    assert got[3]["top_gram"] == "b a"
    assert got[3]["top_2gram_char_frac"] == pytest.approx(0.666667)
    assert got[4]["dup_5gram_frac"] == 0.0
    assert got[5]["dup_5gram_frac"] == 0.5
    assert got[6]["n_lines"] == 0
    assert got[6]["dup_line_frac"] == 0.0
    assert got[6]["top_2gram_char_frac"] == 0.0
    assert got[6]["top_gram"] is None


def test_gopher_flags_hand_computed(spark):
    # 60 distinct-ish words of mean length >=3, low repetition, and the
    # required stopwords ('the', 'of') -> keep
    good = "the of " + " ".join(f"word{i:03d}" for i in range(58))
    # 10 words -> fails ok_word_count only... but 'aaa aaa ...' repetition
    # also trips the 2-gram cap; use distinct words
    short = " ".join(f"tok{i}" for i in range(10))
    # 60 words but all identical -> top-2gram covers nearly all chars
    reps = " ".join(["dup"] * 60)
    # numeric words -> alpha fraction 0
    nums = " ".join(str(i) for i in range(100, 160))
    # stopword-free but otherwise fine doc -> ok_stopwords False
    nostop = "in " + " ".join(f"word{i:03d}" for i in range(59))
    # every 10th "word" is '###' -> symbol ratio 6/60 = 0.1 passes; 7 fails
    sym = "the of " + " ".join(
        "###" if i % 8 == 0 else f"w{i:05d}" for i in range(58)
    )
    rows = [(1, good), (2, short), (3, reps), (4, nums), (5, nostop), (6, sym)]
    got = {r["doc_id"]: r for r in gopher_quality_flags(_docs(spark, rows)).collect()}
    assert got[1]["keep"] is True
    assert got[1]["stopword_hits"] == 2
    assert got[2]["keep"] is False and got[2]["ok_word_count"] is False
    assert got[3]["keep"] is False and got[3]["ok_top_2gram"] is False
    assert got[3]["ok_dup_5gram"] is False
    assert got[4]["keep"] is False and got[4]["ok_alpha_words"] is False
    assert got[5]["keep"] is False and got[5]["ok_stopwords"] is False
    # sym doc: 8 '###' words = 24 '#' chars over 60 words = 0.4 > 0.1
    assert got[6]["ok_symbol_ratio"] is False and got[6]["symbol_word_ratio"] == 0.4
    # mean word len: good doc words are mostly 'wordNNN' = 7 chars
    assert got[1]["alpha_word_frac"] == 1.0


def test_gopher_line_shape_rules(spark):
    bullets = "\n".join(["- item %d" % i for i in range(9)] + ["prose line"])
    dots = "\n".join(["tail one...", "tail two…", "plain", "plain2"])
    rows = [(1, bullets), (2, dots)]
    got = {r["doc_id"]: r for r in gopher_quality_flags(_docs(spark, rows)).collect()}
    assert got[1]["bullet_line_frac"] == 0.9 and got[1]["ok_bullet_lines"] is True
    assert got[2]["ellipsis_line_frac"] == 0.5 and got[2]["ok_ellipsis_lines"] is False


PII_TEXT = (
    "mail john.doe@x.co or ADMIN+x@sub.example.org, server 10.0.0.1, "
    "call +1 415-555-0100 or (212) 555-0199, ssn 123-45-6789, "
    "card 4111 1111 1111 1111."
)

MASKED = (
    "mail <EMAIL> or <EMAIL>, server <IPV4>, "
    "call <PHONE> or <PHONE>, ssn <SSN>, "
    "card <CREDIT_CARD>."
)


def test_pii_stats_hand_computed(spark):
    got = pii_stats(_docs(spark, [(1, PII_TEXT), (2, "no pii here")])).collect()
    by_id = {r["doc_id"]: r for r in got}
    r = by_id[1]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"], r["n_ssn"], r["n_credit_card"]) == (
        2, 1, 2, 1, 1,
    )
    assert r["n_pii"] == 7
    assert by_id[2]["n_pii"] == 0


def test_mask_pii_exact_output(spark):
    got = mask_pii(_docs(spark, [(1, PII_TEXT)])).collect()[0]["masked_text"]
    assert got == MASKED


def test_mask_order_phone_never_eats_ip_or_ssn(spark):
    # if phone ran first, '415-555-0100' inside an email-free string with a
    # nearby IP could partially consume digits; assert the specific shapes
    # stay typed correctly
    text = "ip 192.168.100.200 ssn 987-65-4321 tel +44 207-946-0958"
    got = mask_pii(_docs(spark, [(1, text)])).collect()[0]["masked_text"]
    assert got == "ip <IPV4> ssn <SSN> tel <PHONE>"


def test_chunk_documents_hand_computed(spark):
    from graphiti_spark.datapipe.textanalysis import chunk_documents

    rows = [
        (1, "a b c d e f g h i j"),  # 10 toks; chunk 4, overlap 1 -> starts 1,4,7,10
        (2, "x y"),  # shorter than a window -> one chunk
        (3, ""),  # empty -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    )
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),
        (1, 2, "g h i j", 4),
        (1, 3, "j", 1),
        (2, 0, "x y", 2),
    ]
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_c4_clean_and_flags_hand_cases(spark):
    """Hand-derived C4 rule outcomes (quality.c4_clean_and_flags)."""
    from graphiti_spark.datapipe.quality import c4_clean_and_flags

    d1 = (
        "This is a good long sentence here.\n"
        "short line.\n"
        "No terminal punctuation here at all\n"
        "This javascript line has enough words here.\n"
        "Another proper long sentence right here!"
    )
    d2 = (
        "One decent sentence sits right here today.\n"
        "Two decent sentences sit right here today.\n"
        "Surely three decent sentences sit here today."
    )
    d3 = (
        "Good long sentence with lorem ipsum inside here.\n"
        "Another fine long sentence arrives right here.\n"
        "Yet another fine long sentence lands here."
    )
    d4 = (
        "Fine long sentence number one stands here.\n"
        "Fine long sentence number two stands here.\n"
        "obj = { x }"
    )
    docs = spark.createDataFrame(
        [("1", d1), ("2", d2), ("3", d3), ("4", d4)], "doc_id string, text string"
    )
    got = {r["id"]: r for r in c4_clean_and_flags(docs).collect()}

    # d1: lines 2 (short), 3 (no terminal), 4 (javascript) dropped;
    # cleaned text has 2 sentence marks -> page dropped on min_sentences
    assert got["1"]["n_lines"] == 5 and got["1"]["n_kept_lines"] == 2
    assert got["1"]["clean_text"] == (
        "This is a good long sentence here.\nAnother proper long sentence right here!"
    )
    assert got["1"]["n_sentences"] == 2 and not got["1"]["c4_kept"]

    # d2: all three survive -> kept
    assert got["2"]["n_kept_lines"] == 3 and got["2"]["c4_kept"]

    # d3: lorem ipsum kills the page even with 3 clean sentences
    assert got["3"]["n_kept_lines"] == 3 and got["3"]["has_lorem_ipsum"]
    assert not got["3"]["c4_kept"]

    # d4: curly-brace page flag from the ORIGINAL text; brace line also
    # fails the terminal-punctuation rule
    assert got["4"]["n_kept_lines"] == 2 and got["4"]["has_curly_brace"]
    assert not got["4"]["c4_kept"]


def test_dedup_lines_within_doc_keeps_first_occurrence(spark):
    from graphiti_spark.datapipe.quality import dedup_lines_within_doc

    docs = spark.createDataFrame(
        [
            ("1", "nav bar\nreal content one\nnav bar\nreal content two\nnav bar"),
            ("2", "only line"),
            ("3", ""),
        ],
        "doc_id string, text string",
    )
    got = {r["id"]: r for r in dedup_lines_within_doc(docs).collect()}
    assert got["1"]["n_lines"] == 5 and got["1"]["n_unique_lines"] == 3
    assert got["1"]["text_clean"] == "nav bar\nreal content one\nreal content two"
    assert got["1"]["removed_frac"] == 0.4
    assert got["2"]["text_clean"] == "only line" and got["2"]["removed_frac"] == 0.0
    assert got["3"]["n_lines"] == 0 and got["3"]["removed_frac"] == 0.0
