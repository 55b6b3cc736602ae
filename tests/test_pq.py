"""Product quantization (datapipe/simsearch.py): encode argmin +
ties-to-lower, training vs an independent NumPy reference, ADC distance
hand values, and recall sanity on clustered vectors."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from graphiti_spark.datapipe.simsearch import (
    brute_force_topk,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)


def test_encode_hand_values_and_tie(spark):
    books = [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [0.0, 0.0]]]
    df = spark.createDataFrame(
        [
            (1, [0.1, 0.1, 1.9, 2.0]),   # sub1 -> code 0, sub2 -> code 0
            (2, [0.9, 1.0, 0.1, 0.0]),   # sub1 -> code 1, sub2 -> code 1
            (3, [0.5, 0.5, 1.0, 1.0]),   # both subs equidistant -> code 0 (tie->lower)
        ],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: list(r["pq_codes"]) for r in pq_encode(df, books, 4).collect()}
    assert got[1] == [0, 0]
    assert got[2] == [1, 1]
    assert got[3] == [0, 0]


def _ref_train(rows, dim, m, ksub, n_iter, decimals=6):
    """Independent NumPy replication of the training contract."""
    ids = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    seeds = ids[:ksub]
    d = dim // m
    books = [
        [np.array(r[1][j * d : (j + 1) * d], dtype=np.float64) for r in seeds]
        for j in range(m)
    ]
    for _ in range(n_iter):
        new_books = []
        for j in range(m):
            groups = {}
            for rid, vec in rows:
                sub = np.array(vec[j * d : (j + 1) * d], dtype=np.float64)
                dists = [float(np.sum((sub - c) ** 2)) for c in books[j]]
                code = dists.index(min(dists))
                groups.setdefault(code, []).append(sub)
            nb = []
            for c in range(ksub):
                if c in groups:
                    nb.append(np.round(np.mean(groups[c], axis=0), decimals))
                else:
                    nb.append(books[j][c])
            new_books.append(nb)
        books = new_books
    return [[[float(x) for x in c] for c in b] for b in books]


def test_training_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = train_pq_codebooks(df, dim=8, m=2, ksub=4, n_iter=2)
    ref = _ref_train(rows, dim=8, m=2, ksub=4, n_iter=2)
    for j in range(2):
        for c in range(4):
            assert got[j][c] == pytest.approx(ref[j][c], abs=1e-9), (j, c)


def test_adc_hand_value(spark):
    books = [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [0.0, 0.0]]]
    df = spark.createDataFrame([(1, [0.0, 0.0, 2.0, 2.0])], ["vec_id", "embedding"])
    q = [1.0, 0.0, 2.0, 1.0]
    (row,) = pq_topk(df, books, q, k=1).collect()
    # vec encodes to codes [0, 0]; lut[0][0] = (1-0)^2 + 0 = 1;
    # lut[1][0] = 0 + (1-2)^2 = 1 -> adc = 2.0
    assert row["vec_id"] == 1
    assert row["adc_dist"] == pytest.approx(2.0)


def test_recall_on_clustered_vectors(spark):
    rng = np.random.RandomState(3)
    centers = rng.randn(4, 16) * 5
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.randn(16) * 0.1])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = train_pq_codebooks(df, dim=16, m=4, ksub=4, n_iter=2)
    q = [float(x) for x in centers[1]]
    exact = {r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()}
    approx = {r["vec_id"] for r in pq_topk(df, books, q, k=10).collect()}
    # cluster members are 0.1-sigma tight: PQ at 4x4 codes keeps most
    assert len(exact & approx) >= 6


def test_dim_must_divide(spark):
    df = spark.createDataFrame([(1, [0.0] * 6)], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        train_pq_codebooks(df, dim=6, m=4, ksub=2)


def test_ivf_pq_composition(spark):
    """IVF+PQ (simsearch.ivf_pq_topk): probing ALL cells reproduces plain
    PQ-ADC exactly; probing one cell returns only that cell's members;
    recall on tight clusters survives the composed index."""
    from graphiti_spark.datapipe.simsearch import (
        ivf_assign,
        ivf_pq_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16) * 5
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.randn(16) * 0.1])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = train_ivf_centroids(df, k=4, n_iter=2)
    books = train_pq_codebooks(df, dim=16, m=4, ksub=4, n_iter=2)
    q = [float(x) for x in centers[1]]

    # n_probe = all cells == plain ADC over the whole corpus
    full = [(r["vec_id"], r["adc_dist"]) for r in pq_topk(df, books, q, k=10).collect()]
    allp = [
        (r["vec_id"], r["adc_dist"])
        for r in ivf_pq_topk(df, cents, books, q, k=10, n_probe=4).collect()
    ]
    assert full == allp

    # n_probe=1: results are a subset of the best cell's members
    assigned = {r["vec_id"]: r["ivf_cell"] for r in ivf_assign(df, cents).collect()}
    one = ivf_pq_topk(df, cents, books, q, k=10, n_probe=1).collect()
    cells = {assigned[r["vec_id"]] for r in one}
    assert len(cells) == 1

    # recall vs exact cosine: the composed index must not lose recall
    # beyond what PQ quantization alone costs (cell routing is lossless
    # on these tight clusters — measured: plain-PQ recall == composed
    # recall at every n_probe for this seed)
    exact = {r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()}
    plain_pq = {r["vec_id"] for r in pq_topk(df, books, q, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_pq_topk(df, cents, books, q, k=10, n_probe=2).collect()}
    assert len(exact & approx) >= len(exact & plain_pq)
    assert len(exact & approx) >= 5
