"""Measured recall bounds for the two documented approximations (VERDICT r3
item #5): SemDeDup's within-cell-only pair search, and repeated_span_dedup's
k-gram formulation of ExactSubstr. Each test computes the EXACT answer with
an independent driver-side reference implementation on a fixture corpus and
asserts the distributed approximation meets a measured, stated bound.

Recorded numbers (BASELINE.md "Approximation recall" section):
  - semantic_dedup prune recall vs brute-force cosine closure, planted
    clusters (221 vecs, 141 exact prunes): k=4 0.979, k=8 0.993, k=16 0.979;
    false prunes 0 at every k (precision 1.0 is structural, see below).
  - repeated_span_dedup removed-token set == greedy first-occurrence
    reference exactly (recall = precision = 1.0) on the webtext fixture;
    removal covers 78.3% of suffix-array-marked duplicated content (7787 of
    9946 tokens; the remainder is the retained canonical copy, by design).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


# ---------------------------------------------------------------------------
# SemDeDup: cross-cell recall vs brute-force cosine closure
# ---------------------------------------------------------------------------

_DIM, _N_GROUPS, _THRESH = 32, 80, 0.95


def _planted_cluster_vectors() -> dict[int, np.ndarray]:
    """221 unit vectors in 80 planted groups of 1-5 members; member m != 0
    is the group center nudged by a deterministic perturbation, so
    within-group cosines straddle the 0.95 threshold and the brute-force
    pair set is non-trivial (240 true pairs, 141 exact prunes)."""
    vecs: dict[int, np.ndarray] = {}
    vid = 0
    for g in range(_N_GROUPS):
        c = np.array([((_h(f"c{g}:{d}") % 2001) - 1000) / 1000.0 for d in range(_DIM)])
        c /= np.linalg.norm(c)
        for m in range(1 + _h(f"n{g}") % 5):
            p = np.array(
                [((_h(f"p{g}:{m}:{d}") % 2001) - 1000) / 1000.0 for d in range(_DIM)]
            )
            p /= np.linalg.norm(p)
            eps = 0.0 if m == 0 else 0.05 + 0.25 * ((_h(f"e{g}:{m}") % 100) / 100.0)
            v = c + eps * p
            vecs[vid] = v / np.linalg.norm(v)
            vid += 1
    return vecs


def _exact_prunes(vecs: dict[int, np.ndarray]) -> set[str]:
    """Brute-force all-pairs cosine >= threshold, transitive closure, then
    the keep_canonical rule: lexicographic-min id STRING survives."""
    ids = sorted(vecs)
    V = np.array([vecs[i] for i in ids])
    S = V @ V.T
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if S[i, j] >= _THRESH:
                ra, rb = find(str(ids[i])), find(str(ids[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {str(i) for i in ids if find(str(i)) != str(i)}


@pytest.mark.parametrize("k,min_recall", [(4, 0.97), (8, 0.97), (16, 0.97)])
def test_semdedup_prune_recall_vs_bruteforce(spark, k, min_recall):
    from graphiti_spark.datapipe.dedup import semantic_dedup

    vecs = _planted_cluster_vectors()
    exact = _exact_prunes(vecs)
    assert len(exact) > 100  # the fixture is non-trivial

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], schema
    )
    pruned = {
        r["doc_id"]
        for r in semantic_dedup(emb, k=k, threshold=_THRESH).filter("NOT is_kept").collect()
    }
    # Precision is structural, not statistical: within-cell cosines are
    # exact, so approx pairs are a subset of true pairs, approx components
    # refine exact components, and anything the refinement prunes has a
    # smaller true-connected id — every approx prune is an exact prune.
    assert pruned <= exact
    recall = len(pruned & exact) / len(exact)
    # measured: k=4 0.979, k=8 0.993, k=16 0.979 (float32 + k-means cell
    # boundaries); the paper's cross-cell trade is what the bound prices.
    assert recall >= min_recall, f"k={k}: recall {recall:.3f} < {min_recall}"


# ---------------------------------------------------------------------------
# repeated_span_dedup: k-gram form vs exact references
# ---------------------------------------------------------------------------


def _greedy_removed(doc_tokens: dict[int, list[str]], k: int) -> dict[int, set[int]]:
    """Independent exact implementation of the module contract — remove
    every token covered by a k-window whose content recurs corpus-wide,
    keeping the (doc, pos)-lexicographic-first occurrence — via a single
    in-order scan with a first-seen dict (vs the distributed
    agg + join + trailing-window-coverage plan)."""
    first: dict[tuple, tuple[int, int]] = {}
    counts: dict[tuple, int] = {}
    for d in sorted(doc_tokens):
        tk = doc_tokens[d]
        for p in range(len(tk) - k + 1):
            g = tuple(tk[p : p + k])
            counts[g] = counts.get(g, 0) + 1
            first.setdefault(g, (d, p))
    removed: dict[int, set[int]] = {d: set() for d in doc_tokens}
    for d in sorted(doc_tokens):
        tk = doc_tokens[d]
        for p in range(len(tk) - k + 1):
            g = tuple(tk[p : p + k])
            if counts[g] >= 2 and first[g] != (d, p):
                removed[d].update(range(p, p + k))
    return removed


def _suffix_array_duplicated(doc_tokens: dict[int, list[str]], k: int) -> dict[int, set[int]]:
    """True suffix-array ExactSubstr marking (Lee et al. 2021): build the
    suffix array of the token corpus (unique sentinels between docs), the
    LCP array (Kasai), and mark every position inside a repeated substring
    of length >= k — ALL occurrences, including the one a dedup would keep."""
    corpus: list[str] = []
    owner: list[tuple[int, int]] = []  # global pos -> (doc, pos)
    for d in sorted(doc_tokens):
        for p, t in enumerate(doc_tokens[d]):
            corpus.append(t)
            owner.append((d, p))
        corpus.append(f"\x00sent{d}")  # unique sentinel: repeats never span docs
        owner.append((-1, -1))
    n = len(corpus)
    sa = sorted(range(n), key=lambda i: corpus[i:])
    rank = [0] * n
    for r, i in enumerate(sa):
        rank[i] = r
    # Kasai LCP: lcp[r] = LCP(suffix sa[r], suffix sa[r+1])
    lcp = [0] * n
    h = 0
    for i in range(n):
        if rank[i] < n - 1:
            j = sa[rank[i] + 1]
            while i + h < n and j + h < n and corpus[i + h] == corpus[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    marked: dict[int, set[int]] = {d: set() for d in doc_tokens}
    for r in range(n):
        i = sa[r]
        m = max(lcp[r] if r < n - 1 else 0, lcp[r - 1] if r > 0 else 0)
        if m >= k:
            for q in range(i, i + m):
                d, p = owner[q]
                if d >= 0:
                    marked[d].add(p)
    return marked


def _fixture_corpus(spark) -> dict[int, list[str]]:
    """First 160 webtext docs (truncated to 80 tokens): real cross-doc
    boilerplate repeats, within-doc periodic repeats, planted near-dups."""
    from graphiti_spark.functions.textstats import tokens_col
    from graphiti_spark.synth import webtext_documents

    rows = (
        webtext_documents(spark, "/root/testdata/sf0.001")
        .filter("doc_id < 160")
        .select("doc_id", F.slice(tokens_col("text"), 1, 80).alias("tk"))
        .collect()
    )
    return {r["doc_id"]: list(r["tk"]) for r in rows}


def test_span_dedup_matches_independent_exact_reference(spark):
    from graphiti_spark.datapipe.spandedup import repeated_span_dedup
    from graphiti_spark.functions.textstats import tokens_col
    from graphiti_spark.synth import webtext_documents

    k = 8
    doc_tokens = _fixture_corpus(spark)
    exact = _greedy_removed(doc_tokens, k)
    n_exact = sum(len(s) for s in exact.values())
    assert n_exact > 500  # the boilerplate reuse makes this non-trivial

    docs = webtext_documents(spark, "/root/testdata/sf0.001").filter("doc_id < 160").select(
        "doc_id",
        F.concat_ws(" ", F.slice(tokens_col("text"), 1, 80)).alias("text"),
    )
    out = {
        r["doc_id"]: r
        for r in repeated_span_dedup(docs, k=k).collect()
    }
    impl_removed = 0
    for d, tk in doc_tokens.items():
        kept_exact = [t for p, t in enumerate(tk) if p not in exact[d]]
        assert out[d]["text_dedup"] == " ".join(kept_exact), f"doc {d} diverges"
        impl_removed += out[d]["n_removed"]
    # token-for-token identity => recall = precision = 1.0 vs the greedy
    # reference (recorded in BASELINE.md)
    assert impl_removed == n_exact


def test_span_dedup_vs_true_suffix_array_marking(spark):
    """Quantify the retained-copy share against the remove-ALL-copies
    suffix-array marking: everything the impl removes is genuinely inside
    >= k-token repeated content (precision 1.0), and removal covers most of
    that content — the uncovered remainder is the kept canonical copy."""
    k = 8
    doc_tokens = _fixture_corpus(spark)
    sa_marked = _suffix_array_duplicated(doc_tokens, k)
    greedy = _greedy_removed(doc_tokens, k)  # == impl per the test above
    n_marked = sum(len(s) for s in sa_marked.values())
    n_removed = sum(len(s) for s in greedy.values())
    assert n_marked > n_removed > 0
    for d in doc_tokens:
        assert greedy[d] <= sa_marked[d], f"doc {d}: removed a non-duplicated token"
    coverage = n_removed / n_marked
    # measured 0.783 on the fixture (7787 removed / 9946 marked: hot
    # boilerplate occurs many times so only 1/count is retained); the
    # bound prices the floor with headroom for fixture drift.
    assert coverage >= 0.6, f"duplicated-content removal coverage {coverage:.3f}"
