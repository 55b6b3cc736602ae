"""Crawl-frontier "seen URL" filtering with a Bloom prefilter — the
canonical pattern for incremental crawling at 10^12-URL scale (every
production crawler from Mercator (Heydon & Najork 1999) on maintains a
URL-seen structure; storage systems use Bloom filters the same way to
short-circuit exact membership checks).

Problem shape: CANDIDATES (newly harvested links, billions per batch)
must be reduced to the subset not already in CRAWLED (the historical URL
set, up to trillions). A plain left-anti join shuffles BOTH sides on the
url key; the Bloom prefilter instead decides "definitely unseen" for the
majority of candidates map-side, so only the maybe-seen sliver (true
seens + the filter's false-positive rate) pays the exact anti-join.

Representation: an explicit hashed bit-set. The filter is the DISTINCT
set of probe positions hash_i(url) mod m over the crawled side — at most
``m_bits`` rows (the filter's bits), independent of |crawled|, so it
BROADCASTS. Membership is k chained broadcast LEFT joins (one per probe)
and a null-check AND — entirely map-side, no shuffle touches the
candidate table until the surviving sliver. fpp ≈ (1 - e^(-k·n/m))^k,
the textbook bound; size ``m_bits`` ≈ 10 bits/key for ~1% at k=2.

Correctness is EXACT, not probabilistic: a Bloom filter has no false
negatives, so prefilter-then-anti-join returns byte-identically the
anti-join result — the filter only prunes shuffle volume. That is why
this operator can carry a plain SQL oracle (NOT EXISTS) even though the
intermediate is probabilistic.

The same helper serves decontamination by id, re-crawl scheduling, and
any "subtract a trillion-row set from a billion-row set" step.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probe(key: Column, i: int, m_bits: int) -> Column:
    return F.pmod(F.xxhash64(F.concat(key, F.lit(f"#bloom{i}"))), F.lit(m_bits))


def bloom_unseen(
    candidates: DataFrame,
    crawled: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k: int = 2,
) -> DataFrame:
    """Rows of ``candidates`` whose ``key_col`` is NOT in ``crawled`` —
    exactly `candidates LEFT ANTI JOIN crawled`, executed as a broadcast
    Bloom prefilter + exact anti-join on the maybe-seen sliver."""
    key = F.col(key_col)
    bits = reduce(
        lambda a, b: a.unionByName(b),
        [
            crawled.select(_probe(key, i, m_bits).alias("bit"))
            for i in range(k)
        ],
    ).dropDuplicates()

    probed = candidates
    checks = []
    for i in range(k):
        marker = f"_hit{i}"
        probed = (
            probed.withColumn(f"_p{i}", _probe(key, i, m_bits))
            .join(
                F.broadcast(bits.select(F.col("bit").alias(f"_p{i}"),
                                        F.lit(True).alias(marker))),
                f"_p{i}",
                "left",
            )
            .drop(f"_p{i}")
        )
        checks.append(F.col(marker).isNotNull())
    maybe_flag = reduce(lambda a, b: a & b, checks)
    probed = probed.withColumn("_maybe", maybe_flag).drop(
        *[f"_hit{i}" for i in range(k)]
    )

    definitely_new = probed.filter(~F.col("_maybe")).drop("_maybe")
    survivors = probed.filter(F.col("_maybe")).drop("_maybe").join(
        crawled.select(key_col).dropDuplicates(), key_col, "left_anti"
    )
    return definitely_new.unionByName(survivors)


def politeness_plan(
    frontier: DataFrame,
    url_col: str = "url",
    slots_per_wave: int = 1,
    priority_col: str | None = None,
) -> DataFrame:
    """Assign frontier URLs to crawl WAVES under per-host politeness: at
    most ``slots_per_wave`` fetches per host per wave — the scheduling
    layer every polite crawler (and RFC 9309's crawl-delay spirit) needs
    between "what to fetch" (bloom_unseen + robots gate) and the fetch
    fleet itself.

    Returns (url, host, wave) with wave = 0-based; within a host, URLs
    order by ``priority_col`` descending when given (e.g. host PageRank
    or frontier depth) else by URL ascending — deterministic either way.

    Scale shape: one window partitioned BY HOST (the crawl's natural
    key; a host's queue is bounded by its own URL count, so the window
    never sees the corpus) + one integer division. Wave k's fetch list
    is then a pushdown-able ``wave = k`` predicate. Hot hosts with
    millions of queued URLs produce many waves, not a hot partition —
    the row set per (host, wave) is capped at slots_per_wave.
    """
    if slots_per_wave < 1:
        raise ValueError(f"slots_per_wave must be >= 1, got {slots_per_wave}")
    from pyspark.sql import Window

    from graphiti_spark.datapipe.webstats import host_col

    order = (
        [F.desc(priority_col), F.asc(url_col)]
        if priority_col
        else [F.asc(url_col)]
    )
    w = Window.partitionBy("host").orderBy(*order)
    return (
        frontier.withColumn("host", host_col(F.col(url_col)))
        .withColumn(
            "wave",
            ((F.row_number().over(w) - 1) / slots_per_wave).cast("long"),
        )
        .select(url_col, "host", "wave")
    )
