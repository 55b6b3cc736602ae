"""Property-based invariants (hypothesis) for the deterministic corpus ops.

Each property is checked against a plain-Python reference implementation on
randomized small inputs — a different axis of assurance than the
hand-computed cases (which pin specific values) and the DuckDB oracles
(which pin engine parity on the sf corpora).

One shared Spark session; hypothesis example counts are kept small because
every example is a Spark job (deadline disabled for the same reason).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "y2"]),
    min_size=0,
    max_size=12,
)
_texts = _words.map(" ".join)


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=10))
def test_pack_sequences_offsets_are_exact_prefix_sums(spark, texts):
    from graphiti_spark.datapipe.sampling import pack_sequences

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"])
        for r in pack_sequences(df, seq_len=7, bucket_size=3).collect()
    }
    off = 0
    for i, t in rows:
        n = len(t.split())
        assert got[i] == (n, off), (i, t, got[i], (n, off))
        off += n


@settings(**_SETTINGS)
@given(
    st.lists(_texts, min_size=1, max_size=10),
    st.integers(min_value=0, max_value=1_000_000).map(lambda x: x / 1_000_000),
)
def test_stratified_sample_matches_python_gate(spark, texts, rate):
    import hashlib

    from graphiti_spark.datapipe.sampling import stratified_sample

    rows = [(i, "en", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = sorted(
        r["doc_id"] for r in stratified_sample(df, rates={"en": rate}).collect()
    )
    gate = int(rate * 1_000_000)
    expect = sorted(
        i
        for i, _, _ in rows
        if int(hashlib.md5(f"v1:{i}".encode()).hexdigest()[:15], 16) % 1_000_000 < gate
    )
    assert got == expect


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.sampled_from(["pa", "pb", "pc", "pd"]), min_size=0, max_size=4), min_size=1, max_size=8))
def test_paragraph_dedup_matches_python_reference(spark, docs):
    from graphiti_spark.datapipe.decontam import paragraph_dedup

    rows = [(i, "\n\n".join(ps)) for i, ps in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["deduped_text"] for r in paragraph_dedup(df).collect()}

    seen: set[str] = set()
    expect: dict[int, str] = {}
    for i, ps in sorted(((i, ps) for i, ps in enumerate(docs))):
        kept = []
        for p in ps:
            if p and p not in seen:
                seen.add(p)
                kept.append(p)
        if kept:
            expect[i] = "\n\n".join(kept)
    assert got == expect


@settings(**_SETTINGS)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_repetition_dup_ngram_frac_matches_python(spark, texts):
    from graphiti_spark.datapipe.quality import repetition_profile

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dup_5gram_frac"]
        for r in repetition_profile(df).collect()
    }
    for i, t in rows:
        toks = t.split()
        grams = [" ".join(toks[j : j + 5]) for j in range(len(toks) - 4)]
        exp = round(1 - len(set(grams)) / len(grams), 6) if grams else 0.0
        assert abs(got[i] - exp) < 1e-9, (i, t)
