"""Corpus-scale document deduplication: exact, fingerprint, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine.

These are the training-data-pipeline counterparts of the entity-level ER in
operators/er.py — same blocking-then-verify shape, applied to whole
documents. The reference's analog is its non-LLM dedup tier
(/root/reference/graphiti_core/utils/bulk_utils.py:266-357 word-overlap/
cosine candidates; maintenance_dedupe_entities.py:41-253 thresholds).

Scale design (100 TB):
 - every exact/sketch method is a map (pure column exprs, codegen) + ONE
   groupBy/self-join shuffle on a short key (hash, band bucket, shingle),
 - LSH band buckets and shingle blocks are frequency-capped before the
   self-join: a bucket with B members fans out O(B^2) pairs, so hot buckets
   (boilerplate-heavy near-identical pages) are the skew to defuse,
 - verification (exact Jaccard / cosine) runs only on surviving pairs.

Every function returns a DataFrame and has an exact DuckDB SQL twin used by
the correctness oracle (functions/hashing.py builds cross-engine md5-derived
hashes for this reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.hashing import (
    md5_long_col,
    minhash_cols,
    minhash_sig_udf,
    simhash_col,
    simhash_udf,
)
from graphiti_spark.functions.textstats import tokens_col


def _exact_jaccard_col(toks_a, toks_b) -> F.Column:
    """Exact set-Jaccard over two DISTINCT-token array columns, JVM-side:
    |a intersect b| / (|a| + |b| - |a intersect b|). No union materialization
    (the BENCH_r01 trap was array_intersect PLUS array_union on full arrays;
    the union size is arithmetic once intersection is known) and no Arrow
    transfer (the round-2 pandas memo verify was right for 25-token docs but
    ships both full token arrays per candidate pair — on webtext-shaped
    133-token docs that transfer dominated: 2.09M candidates verified in
    ~50s via Arrow vs 5.6s with this expression, identical 289 emitted
    pairs). Inputs MUST be set-semantics arrays (array_distinct output)."""
    a = F.col(toks_a) if isinstance(toks_a, str) else toks_a
    b = F.col(toks_b) if isinstance(toks_b, str) else toks_b
    inter = F.size(F.array_intersect(a, b))
    denom = F.size(a) + F.size(b) - inter
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by md5(text): (content_md5, canonical_id =
    min id, dup_count). The in-batch uuid dedup of the reference
    (bulk_utils.py:181-213) at document granularity."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def fingerprint_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """Near-head/tail fingerprint groups (functions/textstats.fingerprint_col):
    md5 over first-k + last-k tokens — catches boilerplate-wrapped copies
    whose middles differ. Same one-shuffle groupBy shape as exact_dedup."""
    from graphiti_spark.functions.textstats import fingerprint_col

    return (
        docs.select(F.col(id_col), fingerprint_col(F.col(text_col), k).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_hashes: int = 8
) -> DataFrame:
    """Per-document MinHash signature over word tokens (map-only, no shuffle).

    One Arrow-batched UDF pass (bit-identical to the ``minhash_cols``
    column-expression spec; see minhash_sig_udf for why)."""
    sig = minhash_sig_udf(num_hashes)
    sigged = docs.select(F.col(id_col), sig(tokens_col(text_col)).alias("_sig"))
    return sigged.select(
        F.col(id_col),
        *[F.element_at("_sig", i + 1).alias(f"mh{i}") for i in range(num_hashes)],
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    jaccard_threshold: float = 0.7,
    bucket_cap: int = 1000,
    rows_per_band: int = 1,
    caches: list | None = None,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH + exact-Jaccard verify.

    ``b = num_hashes // rows_per_band`` bands of ``r = rows_per_band``
    signatures each: candidate collision probability 1-(1-J^r)^b; precision
    restored by the exact token-Jaccard verification. Returns
    (id_a, id_b, jaccard) with id_a < id_b. Bucket frequency cap bounds
    worst-case fan-out under skew (boilerplate pages hashing identically).

    Pick ``rows_per_band`` from the threshold: r=1 maximizes recall at low
    thresholds, but every chance token collision becomes a candidate pair —
    at sf0.1 the r=1 candidate set was 1.84M pairs for 6,197 emitted pairs
    (J>=0.95), and the exact verify dominated the runtime. r=2 at J>=0.95
    keeps per-band-survivor recall at 1-(1-0.9025)^4 = 99.991% while
    halving candidates on the synthetic corpus (1.84M -> 0.90M measured;
    on realistic webtext, where random-pair Jaccard is ~0 instead of this
    corpus' ~0.7, the cut is ~1/J_random per band, orders of magnitude).
    The DuckDB oracle twin mirrors the banding, so Spark and oracle stay
    bit-identical either way.

    RECALL CONTRACT: the bucket cap DROPS over-cap buckets, so pairs whose
    every colliding band lands in a hot bucket are not emitted — this is
    deliberate: hot buckets are boilerplate clusters whose all-pairs output
    is itself O(B^2) and useless for dedup (connected_components over the
    emitted pairs still groups them through sub-cap buckets). On the
    degenerate sf0.1 synthetic corpus (31-token vocabulary, every doc a
    random ~25-token subset, 191K "true" J>=0.95 pairs purely by chance)
    the cap binds everywhere and emitted pairs are a ~3% sample; on real
    webtext the cap binds only on boilerplate. Raise ``bucket_cap`` for
    completeness, at quadratic cost in the hot-bucket size.

    ``caches``: optional sink for the persisted signature handle — the
    caller unpersists it once the result is materialized (er.py pattern:
    left cached, repeated dedup calls in one session accumulate blocks and
    GC re-copies the live set every cycle).
    """
    if num_hashes % rows_per_band:
        raise ValueError("num_hashes must be divisible by rows_per_band")
    # ONE Arrow-batched signature pass, persisted: every downstream consumer
    # (band unpivot, bucket-size agg, both self-join sides, the verify joins)
    # reads the materialized signatures instead of re-running the hash family.
    sig = minhash_sig_udf(num_hashes)
    sigs = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokens_col(text_col)).alias("_tokset"),
        sig(tokens_col(text_col)).alias("_sig"),
    ).persist()
    if caches is not None:
        caches.append(sigs)
    # posexplode unpivots all bands in one pass (no b-way union re-evaluation).
    # Band key for r>1 joins the band's r signature values with ':' — a plain
    # string concat both engines compute identically (Spark F.concat and
    # DuckDB || both propagate NULL, so empty docs' all-NULL signatures never
    # collide, exactly like the r=1 NULL band_hash; concat_ws would collapse
    # them all onto "").
    if rows_per_band == 1:
        bands = sigs.select("_id", F.posexplode("_sig").alias("band", "band_hash"))
    else:
        n_bands = num_hashes // rows_per_band

        def _band_key(i: int):
            parts: list = []
            for j in range(rows_per_band):
                if j:
                    parts.append(F.lit(":"))
                parts.append(
                    F.element_at("_sig", i * rows_per_band + j + 1).cast("string")
                )
            return F.concat(*parts)

        keys = F.array(*[_band_key(i) for i in range(n_bands)])
        bands = sigs.select("_id", F.posexplode(keys).alias("band", "band_hash"))
    sizes = bands.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    bands = bands.join(
        sizes.filter(F.col("n") <= bucket_cap).select("band", "band_hash"),
        ["band", "band_hash"],
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_hash"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    toks = sigs.select("_id", "_tokset")
    j = (
        cand.join(toks.select(F.col("_id").alias("id_a"), F.col("_tokset").alias("toks_a")), "id_a")
        .join(toks.select(F.col("_id").alias("id_b"), F.col("_tokset").alias("toks_b")), "id_b")
    )
    # JVM exact verify on surviving candidates only (see _exact_jaccard_col).
    j = j.withColumn("jaccard", _exact_jaccard_col("toks_a", "toks_b"))
    return j.filter(F.col("jaccard") >= jaccard_threshold).select("id_a", "id_b", "jaccard")


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-document SimHash (map-only). Near-dups = small Hamming distance;
    at scale, group by bit-slices (4x8-bit keys) and compare within buckets.

    Computed by one Arrow-batched UDF (bit-identical to the ``simhash_col``
    column-expression spec — see simhash_udf for the cost argument)."""
    fp = simhash_udf(bits)
    return docs.select(F.col(id_col), fp(tokens_col(text_col)).alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    slices: int = 4,
    slice_cap: int = 1000,
    caches: list | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: slice the fingerprint into `slices` bands
    (pigeonhole: hamming <= slices-1 guarantees one identical slice; with
    max_hamming < slices recall is exact), block on (slice_idx, slice_val),
    verify exact Hamming distance via xor bit_count.

    ``slice_cap``: frequency cap on (slice_idx, slice_val) buckets — a hot
    slice value (boilerplate-heavy corpora collapse to a few fingerprints)
    fans out O(B^2) candidate pairs; buckets above the cap are dropped from
    blocking, bounding worst-case shuffle fan-out at corpus scale (same
    hygiene as ``bucket_cap`` in the MinHash path).

    ``caches``: optional sink for the persisted fingerprint handle — caller
    unpersists after materializing (see minhash_lsh_pairs)."""
    fp = (
        simhash_fingerprints(docs, id_col, text_col, bits)
        .withColumnRenamed(id_col, "_id")
        .persist()  # fingerprint UDF runs once, not once per self-join side
    )
    if caches is not None:
        caches.append(fp)
    width = bits // slices
    mask = (1 << width) - 1
    # one pass: explode precomputed (slice_idx, slice_val) structs
    sliced = fp.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("slice_idx"),
                        F.shiftright("simhash", s * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("slice_val"),
                    )
                    for s in range(slices)
                ]
            )
        ).alias("_sl"),
    ).select("_id", "simhash", "_sl.slice_idx", "_sl.slice_val")
    bucket_sizes = sliced.groupBy("slice_idx", "slice_val").agg(
        F.count(F.lit(1)).alias("n")
    )
    sliced = sliced.join(
        bucket_sizes.filter(F.col("n") <= slice_cap).select("slice_idx", "slice_val"),
        ["slice_idx", "slice_val"],
    )
    cand = (
        sliced.alias("a")
        .join(sliced.alias("b"), ["slice_idx", "slice_val"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def set_similarity_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    prefix_df_cap: int = 100_000,
    caches: list | None = None,
) -> DataFrame:
    """EXACT token-set similarity self-join via the prefix filter
    (AllPairs/PPJoin family — Bayardo et al. WWW'07; the classic
    set-similarity-join used by production dedup systems).

    Unlike the MinHash/SimHash sketches, this has 100% RECALL at the
    threshold: a pair with J(a,b) >= t MUST share at least one token in
    each side's prefix of the (global-df, token)-sorted token list, where
    prefix length = |d| - ceil(t*|d|) + 1. Prefix tokens are the RAREST
    tokens of each doc, so candidate volume tracks true-pair volume on
    natural corpora (rare-token postings are short). Returns
    (id_a, id_b, jaccard) with id_a < id_b, J >= t — the same contract as
    minhash_lsh_pairs but exact.

    Scale shape: one token-df aggregate, one prefix-postings self-join on
    the token key, a size-ratio prune (J >= t forces min(|a|,|b|) >=
    t*max(|a|,|b|)), then the memoized exact verify on survivors only.
    ``prefix_df_cap`` guards the degenerate corpus where even prefix
    tokens are ubiquitous (the synthetic 31-token vocabulary): a prefix
    posting longer than the cap is dropped — on such data the sketch
    methods' bucket caps bind equally, and completeness is explicitly
    traded for bounded fan-out (documented recall contract, logged by the
    caller at 100 TB).

    The DuckDB oracle twin reproduces the (df, token) ordering, ceil
    prefix arithmetic, size prune, and verification bit-for-bit.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokens_col(text_col)).alias("_tokset"),
    ).withColumn("_n", F.size("_tokset"))
    toks = toks.filter(F.col("_n") > 0).persist()
    if caches is not None:
        caches.append(toks)
    posting = toks.select("_id", "_n", F.explode("_tokset").alias("tok"))
    df_tbl = posting.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # global (df, token) rank — ties broken lexicographically so both
    # engines pick identical prefixes
    ranked = posting.join(df_tbl, "tok")
    w = Window.partitionBy("_id").orderBy("df", "tok")
    prefix_len = (F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1).cast("int")
    prefix = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select("_id", "_n", "tok", "df")
        .filter(F.col("df") <= prefix_df_cap)
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a._id") < F.col("b._id"))
        # size prune: J >= t forces min(|a|,|b|) >= t * max(|a|,|b|)
        .filter(
            F.least(F.col("a._n"), F.col("b._n"))
            >= F.lit(threshold) * F.greatest(F.col("a._n"), F.col("b._n"))
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    t = toks.select("_id", "_tokset")
    j = (
        cand.join(
            t.select(F.col("_id").alias("id_a"), F.col("_tokset").alias("toks_a")), "id_a"
        ).join(
            t.select(F.col("_id").alias("id_b"), F.col("_tokset").alias("toks_b")), "id_b"
        )
    )
    j = j.withColumn("jaccard", _exact_jaccard_col("toks_a", "toks_b"))
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    block_df_cap: int = 200,
) -> DataFrame:
    """Word n-gram shingle Jaccard near-dup pairs with shared-shingle blocking.

    Blocking is EXACT for threshold > 0 (J > 0 implies >=1 shared shingle),
    unlike LSH — this is the reference's word-overlap candidate rule
    (bulk_utils.py:290-308) lifted to documents. Shingles above the df cap
    are dropped from blocking only (not from verification), bounding fan-out.
    """
    toks = docs.select(F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks"))
    sh = toks.withColumn(
        "_shingles",
        F.array_distinct(
            F.transform(
                # greatest(...,1): Spark sequence(1,0) DESCENDS, so an
                # under-length doc must still get a [1] index (one short
                # shingle) rather than a reversed range.
                F.sequence(F.lit(1), F.greatest(F.size("_toks") - (n - 1), F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice("_toks", i, n)),
            )
        ),
    ).select("_id", "_shingles")
    ex = sh.select("_id", F.explode("_shingles").alias("shingle"))
    df_cap = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ex = ex.join(df_cap.filter(F.col("df") <= block_df_cap).select("shingle"), "shingle")
    cand = (
        ex.alias("a")
        .join(ex.alias("b"), "shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    j = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    j = j.withColumn(
        "jaccard", F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Close the dedup loop: near-dup PAIRS -> per-document keep/drop verdict.

    Every pair family above (exact groups aside) emits (id_a, id_b) edges;
    an actual dedup pass must then pick ONE survivor per near-dup CLUSTER —
    the transitive closure of the pairs, not the pairs themselves (a~b, b~c
    must drop two of three even if a~c was never emitted). This runs the
    same large-star/small-star connected components used for entity
    canonicalization (operators/components.py, the distributed twin of the
    reference's UnionFind, bulk_utils.py:449-486) over the document pair
    list and returns one row PER INPUT DOCUMENT:

        (doc_id string, canonical_id string, is_kept boolean)

    canonical_id = lexicographically smallest id string in the component
    (identical to the entity uuid_map rule); singletons are their own
    canonical and are kept. Downstream: `docs.join(out.filter("is_kept"),
    id_col)` is the deduplicated corpus.

    Scale shape: CC is O(log^2 n) one-shuffle rounds on the PAIR list (tiny
    vs the corpus); the final attach is one broadcast-size left join — the
    uuid_map remap pattern (non-identity rows only are shuffled).
    """
    p = pairs.select(
        F.col("id_a").cast("string").alias("uuid_a"),
        F.col("id_b").cast("string").alias("uuid_b"),
    )
    from graphiti_spark.operators.components import connected_components

    cc = connected_components(p)  # (uuid, canonical_uuid), non-identity only
    d = docs.select(F.col(id_col).cast("string").alias("doc_id"))
    out = d.join(cc.withColumnRenamed("uuid", "doc_id"), "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("canonical_uuid", "doc_id").alias("canonical_id"),
        (F.coalesce("canonical_uuid", "doc_id") == F.col("doc_id")).alias("is_kept"),
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe_dims: int = 8,
    bucket_cap: int = 1000,
) -> DataFrame:
    """Embedding near-dup pairs (cosine >= threshold) with sign-LSH blocking.

    Block key = sign pattern of the first n_probe_dims components (a
    random-hyperplane LSH with axis-aligned planes — deterministic, and
    SQL-twin-able). For threshold >= 0.95 the sign pattern of near-identical
    vectors matches on all-but-noise dims, so candidates recall ~1; the
    brute-force variant in simsearch.py is the exactness baseline.

    Skew hygiene (same as every sibling blocker): the self-join fans out
    O(B^2) pairs per sign bucket, and real embedding distributions are
    anisotropic — most vectors share head-dimension signs, so one hot
    pattern can hold a large corpus fraction. ``bucket_cap`` drops sign
    buckets with more than that many members from blocking, bounding
    worst-case fan-out at cap^2/2 pairs per bucket regardless of corpus
    size. Size ``n_probe_dims`` with the corpus (2^dims buckets): ~8 for
    <=1e6 vectors, 16-24 at web scale, so expected bucket population stays
    near n/2^dims and under the cap for all but pathological skew.
    """
    from graphiti_spark.functions.embeddings import cosine_col

    sig = F.concat_ws(
        "",
        *[
            F.when(F.element_at(F.col(vec_col), i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_probe_dims)
        ],
    )
    e = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), sig.alias("_sig"))
    sizes = e.groupBy("_sig").agg(F.count(F.lit(1)).alias("n"))
    e = e.join(sizes.filter(F.col("n") <= bucket_cap).select("_sig"), "_sig")
    cand = (
        e.alias("a")
        .join(e.alias("b"), "_sig")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._v").alias("va"),
            F.col("b._v").alias("vb"),
        )
    )
    out = cand.withColumn("cosine", cosine_col("va", "vb")).filter(
        F.col("cosine") >= threshold
    )
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    removal — cluster the embedding space, find cosine near-dups WITHIN each
    cluster only, keep one survivor per duplicate component. The published
    recipe for pruning web corpora where lexical sketches (MinHash/SimHash
    above) miss paraphrase-level duplication.

    Composition of existing, independently-oracled primitives:
      1. ``train_ivf_centroids`` — deterministic Lloyd k-means (md5-ordered
         seeds, rounded means; simsearch.py) — no RNG, SQL-twin-able.
      2. ``ivf_assign`` — cell = argmax cosine, ties to the lower cell.
      3. within-cell self-join at cosine >= threshold. This is the SemDeDup
         approximation that makes all-pairs tractable: candidate fan-out is
         bounded by cell population (~n/k), not corpus size, and cells are
         embarrassingly parallel. Cross-cell near-dups are out of contract
         (the paper's own recall trade).
      4. ``keep_canonical`` — transitive closure over the pair list
         (large-star/small-star CC), lexicographic-min id survives.

    ``cell_cap``: the same skew hygiene as every sibling blocker — a
    degenerate clustering (most mass in one cell: uniform embeddings, bad
    k) would fan out O(cap^2) per cell; over-cap cells are dropped from
    pair generation, bounding worst-case work regardless of corpus size.
    At web scale size k so n/k stays under the cap (the paper uses
    k ~ sqrt(n)); the k-means train cost is one shuffle per Lloyd round.

    Returns (doc_id string, canonical_id string, is_kept boolean), one row
    per input embedding — `is_kept = false` rows are the prune set.
    """
    from graphiti_spark.datapipe.simsearch import ivf_assign, train_ivf_centroids
    from graphiti_spark.functions.embeddings import cosine_col
    from graphiti_spark.session import widen_if_narrow

    embeddings = widen_if_narrow(embeddings, id_col)
    cents = train_ivf_centroids(
        embeddings, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    assigned = ivf_assign(embeddings, cents, id_col=id_col, vec_col=vec_col)
    a = assigned.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "ivf_cell"
    )
    sizes = a.groupBy("ivf_cell").agg(F.count(F.lit(1)).alias("n"))
    a = a.join(sizes.filter(F.col("n") <= cell_cap).select("ivf_cell"), "ivf_cell")
    # Blocked within-cell pair join: a plain self-join on ivf_cell has only
    # k distinct keys, so the expensive cosine stage is capped at k tasks no
    # matter how many cores exist. Hashing members into n_blocks sub-blocks
    # and joining on (cell, block_i, block_j) with i <= j enumerates every
    # unordered pair exactly once across k·B(B+1)/2 keys — the pair SET (and
    # every cosine value) is identical to the unblocked join.
    n_blocks = 8
    a = a.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(n_blocks)).cast("int")
    )
    xs = a.select(
        "ivf_cell",
        F.col("_id").alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("_blk").alias("_ki"),
        F.explode(F.sequence("_blk", F.lit(n_blocks - 1))).alias("_kj"),
    )
    ys = a.select(
        "ivf_cell",
        F.col("_id").alias("_idb"),
        F.col("_v").alias("_vb"),
        F.explode(F.sequence(F.lit(0), "_blk")).alias("_ki"),
        F.col("_blk").alias("_kj"),
    )
    pairs = (
        xs.join(ys, ["ivf_cell", "_ki", "_kj"])
        # same-block matches appear in both orientations (and as self-pairs):
        # keep the id_a < id_b one; cross-block matches appear exactly once.
        .filter((F.col("_ki") != F.col("_kj")) | (F.col("_ida") < F.col("_idb")))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            cosine_col(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return keep_canonical(embeddings, pairs.select("id_a", "id_b"), id_col=id_col)


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.8,
    block_df_cap: int = 200,
) -> DataFrame:
    """Broder CONTAINMENT near-dup pairs: the asymmetric complement of
    ngram_jaccard_pairs. Containment of A in B is |A∩B| / |A| over the
    n-gram shingle sets (Broder 1997, "On the resemblance and containment
    of documents") — the detector for the case Jaccard structurally
    misses: a short article embedded verbatim inside a much longer page
    (syndication with added chrome, quote-heavy aggregators, boilerplate
    wrappers). There J = |A|/|B| can be arbitrarily small while
    containment(A in B) = 1.

    Returns (id_a, id_b, cont_a_in_b, cont_b_in_a, jaccard) for pairs
    where max(cont_a_in_b, cont_b_in_a) >= threshold; id_a < id_b. The
    directional scores tell downstream policy which side is the subset
    (drop the wrapper, keep the article — or vice versa).

    Scale shape: identical to ngram_jaccard_pairs — shared-shingle
    blocking (exact for threshold > 0: containment > 0 implies a shared
    shingle) with a df cap on blocking shingles, then exact verification
    on candidates only. One extra column per pair, same shuffles.
    """
    toks = docs.select(F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks"))
    sh = toks.withColumn(
        "_shingles",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("_toks") - (n - 1), F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice("_toks", i, n)),
            )
        ),
    ).select("_id", "_shingles")
    ex = sh.select("_id", F.explode("_shingles").alias("shingle"))
    df_cap = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ex = ex.join(df_cap.filter(F.col("df") <= block_df_cap).select("shingle"), "shingle")
    cand = (
        ex.alias("a")
        .join(ex.alias("b"), "shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    j = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    na, nb = F.size("sh_a"), F.size("sh_b")
    out = j.select(
        "id_a",
        "id_b",
        F.when(na > 0, inter / na).otherwise(F.lit(0.0)).alias("cont_a_in_b"),
        F.when(nb > 0, inter / nb).otherwise(F.lit(0.0)).alias("cont_b_in_a"),
        F.when(na + nb - inter > 0, inter / (na + nb - inter))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )
    return out.filter(
        F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold
    )
