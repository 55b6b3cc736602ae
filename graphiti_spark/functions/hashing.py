"""Deterministic cross-engine hashing: md5-derived 60-bit ints, MinHash, SimHash.

Why md5 and not xxhash/murmur: the correctness oracle (DuckDB) must reproduce
every hash bit-for-bit. Spark's ``conv(substr(md5(x),1,15),16,10)`` and
DuckDB's ``cast(concat('0x',substr(md5(x),1,15)) as bigint)`` agree exactly
(60 bits, always non-negative), so signatures computed by both engines match.

MinHash here is the blocking primitive for near-duplicate detection — the
Spark-native replacement for the reference's per-row LLM dedup candidate
generation (/root/reference/graphiti_core/utils/bulk_utils.py:266-357).
All of it is pure Column expressions: tokenize -> explode is avoided by using
higher-order functions (transform/aggregate) over the token array, keeping the
whole computation inside whole-stage codegen with zero shuffles.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _md5_long_py(s: str) -> int:
    """Python twin of md5_long_col: first 15 md5 hex chars as int (60 bits)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_long_col(col: Column | str) -> Column:
    """First 15 hex chars of md5 as a non-negative bigint (60 bits)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of md5_long_col."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def minhash_cols(tokens: Column | str, num_hashes: int, prefix: str = "mh") -> list[Column]:
    """MinHash signature over a token/shingle array column.

    Hash family i: h_i(t) = md5_long(concat('<i>:', t)); signature_i = min over
    tokens. Pure higher-order-function expression — evaluated row-local in the
    JVM, no shuffle, no UDF. At 100 TB this is the cheap map-side stage before
    the banded LSH self-join.
    """
    toks = F.col(tokens) if isinstance(tokens, str) else tokens

    def _seeded_hash(seed: str):
        return lambda t: F.conv(F.substring(F.md5(F.concat(F.lit(seed), t)), 1, 15), 16, 10).cast("long")

    out = []
    for i in range(num_hashes):
        hashed = F.transform(toks, _seeded_hash(f"{i}:"))
        out.append(F.array_min(hashed).alias(f"{prefix}{i}"))
    return out


def minhash_sql(tokens_expr: str, num_hashes: int, prefix: str = "mh") -> list[str]:
    """DuckDB twin: list_min(list_transform(tokens, t -> md5_long('<i>:'||t)))."""
    return [
        (
            f"list_min(list_transform({tokens_expr}, t -> "
            f"cast(concat('0x', substr(md5(concat('{i}:', t)), 1, 15)) as bigint))) as {prefix}{i}"
        )
        for i in range(num_hashes)
    ]


def minhash_sig_udf(num_hashes: int):
    """Arrow-batched MinHash signature: token array -> array<long> of
    ``num_hashes`` signatures, bit-identical to ``minhash_cols``.

    Why a pandas UDF and not the ``minhash_cols`` column expressions: Spark
    higher-order functions (transform + md5 per token) are interpreted per
    element, and the banded-LSH consumers evaluate the signature expression
    once per band branch — measured as the dominant cost of
    ``minhash_lsh_pairs`` (251.6s at sf0.1 in BENCH_r01). One Arrow transfer
    + hashlib over DISTINCT tokens computes all hashes in a single pass;
    the result is persisted/reused by callers. Empty/None token arrays yield
    all-NULL signatures, matching ``array_min`` over an empty array.

    Token->hash-family results are memoized in a per-worker dict that
    persists across Arrow batches: corpus token distributions are zipfian,
    so the head vocabulary ('the', 'and', boilerplate terms) re-hashes on
    nearly every row — the same insight as the ER distinct-name-pair
    rewrite (er.py). Bounded (cleared past ~2M entries) so a huge tail
    vocabulary cannot exhaust worker memory.
    """

    memo: dict[str, tuple] = {}  # closure state: lives for the task/worker

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(toks: pd.Series) -> pd.Series:
        out = []
        for arr in toks:
            if arr is None or len(arr) == 0:
                out.append([None] * num_hashes)
                continue
            if len(memo) > 2_000_000:
                memo.clear()
            rows = []
            for t in set(arr):
                hs = memo.get(t)
                if hs is None:
                    hs = tuple(_md5_long_py(f"{i}:{t}") for i in range(num_hashes))
                    memo[t] = hs
                rows.append(hs)
            out.append(list(map(min, zip(*rows))))
        return pd.Series(out)

    return _sig


def simhash_udf(bits: int = 32):
    """Arrow-batched SimHash: token array -> long fingerprint, bit-identical
    to ``simhash_col`` / ``simhash_sql``.

    Replaces the interpreted 32-pass ``aggregate()`` fold (each bit re-walked
    the md5-hashed token array; 447.4s at sf0.1 in BENCH_r01): one hashlib
    pass per distinct token, occurrence-weighted numpy bit-count fold for all
    bits at once. Token hashes are memoized across rows/batches (zipfian
    head vocabulary — see minhash_sig_udf), bounded at ~2M entries.
    """
    memo: dict[str, int] = {}  # closure state: lives for the task/worker

    @F.pandas_udf(LongType())
    def _fp(toks: pd.Series) -> pd.Series:
        import numpy as np

        shifts = np.arange(bits, dtype=np.uint64)
        out = np.zeros(len(toks), dtype=np.int64)
        for i, arr in enumerate(toks):
            if arr is None or len(arr) == 0:
                continue
            if len(memo) > 2_000_000:
                memo.clear()
            # duplicates contribute once per occurrence -> weight by count
            counts: dict[str, int] = {}
            for t in arr:
                counts[t] = counts.get(t, 0) + 1
            hlist = []
            for t in counts:
                h = memo.get(t)
                if h is None:
                    h = _md5_long_py(t)
                    memo[t] = h
                hlist.append(h)
            hs = np.array(hlist, dtype=np.uint64)
            w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            bitmat = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            sums = ((2 * bitmat - 1) * w[:, None]).sum(axis=0)
            out[i] = int(((sums > 0).astype(np.uint64) << shifts).sum())
        return pd.Series(out)

    return _fp


def simhash_col(tokens: Column | str, bits: int = 32) -> Column:
    """SimHash fingerprint over a token array (document near-dup sketch).

    For each bit b: sum over tokens of (+1 if bit set in md5_long(token) else
    -1); fingerprint bit b = 1 iff sum > 0. Expressed with aggregate() +
    shiftleft — all JVM-side. 32 bits keeps every intermediate in a long and
    stays DuckDB-expressible.

    NOTE: interpreted per element per bit — kept as the readable spec /
    cross-check; the hot path uses ``simhash_udf`` (identical output).
    """
    toks = F.col(tokens) if isinstance(tokens, str) else tokens
    hashed = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))

    def _bit_acc(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    fp = F.lit(0).cast("long")
    for b in range(bits):
        bitsum = F.aggregate(hashed, F.lit(0).cast("long"), _bit_acc(b))
        fp = fp + F.when(bitsum > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return fp


def simhash_sql(tokens_expr: str, bits: int = 32) -> str:
    """DuckDB twin of simhash_col."""
    h = "cast(concat('0x', substr(md5(t), 1, 15)) as bigint)"
    terms = []
    for b in range(bits):
        bitsum = (
            f"list_sum(list_transform({tokens_expr}, t -> "
            f"case when ({h} >> {b}) & 1 = 1 then 1 else -1 end))"
        )
        terms.append(f"(case when {bitsum} > 0 then cast({2**b} as bigint) else 0 end)")
    return "(" + " + ".join(terms) + ")"
