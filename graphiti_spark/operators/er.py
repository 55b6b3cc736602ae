"""S5 — entity-resolution candidate generation + similarity verification.

Replaces the reference's O(n²)/LLM dedup with blocking + similarity joins:
 - exact dedup is FREE: entity uuid is uuid5(normalized name, group_id)
   (tier 1-2 of resolve_extracted_nodes, node_operations.py:364-433),
 - fuzzy/semantic candidates come from token blocking ∪ banded MinHash-LSH
   over char-3-grams (the Spark rewrite of bulk_utils.py:266-357 word-overlap
   ∪ embedding-cosine candidate generation),
 - verification applies the reference's scoring rules to candidate pairs only:
     * fuzzy ratio (difflib SequenceMatcher — node_operations.py:82-103),
     * max(fuzzy, 0.8·token-Jaccard)      (uuid_utils.py:158-196),
     * embedding cosine                   (bulk_utils.py:274 min_score 0.8),
     * COMPOUND-NAME GUARD: a name whose token set strictly contains the
       other's is NOT a duplicate ("claude" vs "claude code") —
       maintenance_dedupe_entities.py:139-158, the precision rule that keeps
       P ≥ 0.95.

Scale design (100 TB):
 - blocking tokens above a document-frequency cap are dropped (standard ER
   blocking hygiene; the reference caps fuzzy candidates at 50/group,
   node_operations.py:444-456) — this bounds the self-join fan-out and
   removes head-token skew ("google") before it reaches the shuffle,
 - both blocking joins are equi-joins on (group_id, key) — AQE splits any
   residual skewed partitions,
 - the expensive Python scorer (difflib) runs ONLY on surviving candidate
   pairs, Arrow-batched.
"""

from __future__ import annotations

import difflib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.functions.embeddings import hashed_ngram_embedding_udf
from graphiti_spark.functions.hashing import minhash_cols
from graphiti_spark.session import plan_width, session_pandas_udf


@session_pandas_udf(DoubleType())
def fuzzy_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """difflib SequenceMatcher.ratio on normalized names
    (node_operations.py:82-103 parity)."""
    return pd.Series(
        [difflib.SequenceMatcher(None, x or "", y or "").ratio() for x, y in zip(a, b)]
    )


_SCORE_SCHEMA = StructType(
    [
        StructField("token_jaccard", DoubleType()),
        StructField("cosine", DoubleType()),
        StructField("fuzzy", DoubleType()),
        StructField("compound_guard", BooleanType()),
        StructField("multi_word", BooleanType()),
    ]
)


def make_score_pair_udf(config: PipelineConfig = DEFAULT_CONFIG, embed_fn=None):
    """Build the Arrow-batched pair scorer with gates DERIVED from config.

    ``embed_fn`` is the real-model injection point for the ER cosine gate
    (README "Plugging in real models"): a batch callable
    ``list[str] -> (n, d) ndarray`` of L2-NORMALIZED vectors, invoked inside
    the Arrow batch exactly where a sentence-transformer's ``model.encode``
    would run (load the model lazily at first call so each worker pays the
    load once). Default None keeps the built-in hashed-3-gram embedding.
    Contract: pure function of the name list (same input -> same vectors
    across retries/workers, or resumed stages diverge), unit-norm rows
    (cosine is computed as a plain dot), and batch-friendly (called once
    per Arrow batch over the distinct unseen names, not per pair).

    Why one UDF instead of column expressions: Spark's higher-order functions
    (zip_with/aggregate for cosine, array_intersect for Jaccard) are
    interpreted per element — measured 130s + 51s for 7.2M x 64-dim pairs vs
    ~2s for a numpy einsum. One UDF = one Arrow transfer, vectorized dot,
    and difflib gated INSIDE the batch by the length-ratio bound.

    The scorer takes ONLY the two normalized names. The hashed-ngram
    embedding is itself a pure function of the name, so shipping the two
    64-dim float arrays per pair through the dropDuplicates shuffle and the
    Arrow channel cost far more than the scoring itself (measured sf0.1:
    distinct 28.9s -> 3s, scorer 45.9s -> 5s after moving the embedding
    in-UDF). Per-name embeddings are memoized per worker (zipfian name
    reuse) and round-tripped through float32, because the entity catalog
    stores ArrayType(FloatType) — cosine stays bit-identical to the
    previous catalog-fed path.

    The difflib gate is sound, not heuristic: SequenceMatcher.ratio(a, b) =
    2*matches/(len(a)+len(b)) <= 2*min/(min+max), so ratio >= t requires
    min/max >= t/(2-t). difflib therefore runs only when one of the two
    acceptance rules that read `fuzzy` (score_and_filter_pairs) could still
    fire: ratio bound for fuzzy >= fuzzy_threshold, or (cosine >=
    maintenance_embedding_threshold AND ratio bound for fuzzy >=
    node_min_score). Constants come from the SAME config the acceptance
    filter uses — a lowered threshold loosens the gate with it.

    Semantics identical to the reference scorers:
     - token Jaccard over '_'-token sets       (uuid_utils.py:158-196)
     - cosine == dot (embeddings L2-normalized at construction)
     - SequenceMatcher.ratio                    (node_operations.py:82-103)
     - compound-name guard: one token set strictly contains the other
       (maintenance_dedupe_entities.py:139-158)
    """
    lr_fuzzy = config.fuzzy_threshold / (2.0 - config.fuzzy_threshold)
    lr_min = config.node_min_score / (2.0 - config.node_min_score)
    cos_gate = config.maintenance_embedding_threshold

    emb_memo: dict = {}  # per-worker: name -> float32-rounded embedding

    @F.pandas_udf(_SCORE_SCHEMA)
    def score_pair_udf(norm_a: pd.Series, norm_b: pd.Series) -> pd.DataFrame:
        import numpy as np

        from graphiti_spark.functions.embeddings import hashed_ngram_embedding_py

        a_list = [x or "" for x in norm_a]
        b_list = [x or "" for x in norm_b]
        if embed_fn is not None:
            # one model call per Arrow batch over the distinct UNSEEN names
            unseen = [s for s in dict.fromkeys(a_list + b_list) if s not in emb_memo]
            if unseen:
                if len(emb_memo) > 1_000_000:
                    emb_memo.clear()
                    unseen = list(dict.fromkeys(a_list + b_list))
                vecs = np.asarray(embed_fn(unseen), dtype=np.float64)
                for s, v in zip(unseen, vecs):
                    emb_memo[s] = v

        def _emb(name):
            v = emb_memo.get(name)
            if v is None:
                if len(emb_memo) > 1_000_000:
                    emb_memo.clear()
                # float32 round-trip = the catalog's ArrayType(FloatType)
                # storage, so cosine matches the materialized-column path bit
                # for bit.
                v = (
                    np.asarray(hashed_ngram_embedding_py(name), dtype=np.float32)
                    .astype(np.float64)
                )
                emb_memo[name] = v
            return v

        n = len(a_list)
        cos = np.zeros(n)
        jac = np.zeros(n)
        fuzzy = np.zeros(n)
        guard = np.empty(n, dtype=bool)
        multi = np.empty(n, dtype=bool)
        for i in range(n):
            a, b = a_list[i], b_list[i]
            cos[i] = float(np.dot(_emb(a), _emb(b)))
            ta, tb = set(a.split("_")), set(b.split("_"))
            inter = len(ta & tb)
            union = len(ta | tb)
            jac[i] = inter / union if union else 0.0
            guard[i] = not ((ta < tb) or (tb < ta))
            multi[i] = len(ta) > 1 and len(tb) > 1
            la, lb = len(a), len(b)
            if la and lb:
                ratio = min(la, lb) / max(la, lb)
                # difflib only when an acceptance rule could still need it
                if ratio >= lr_fuzzy or (cos[i] >= cos_gate and ratio >= lr_min):
                    fuzzy[i] = difflib.SequenceMatcher(None, a, b).ratio()
        return pd.DataFrame(
            {
                "token_jaccard": jac,
                "cosine": cos,
                "fuzzy": fuzzy,
                "compound_guard": guard,
                "multi_word": multi,
            }
        )

    return score_pair_udf


def _char_ngrams_col(c, n: int):
    """Array of char n-grams of a string column (JVM-side, via sequence)."""
    padded = F.concat(F.lit("^"), c, F.lit("$"))
    ln = F.length(padded)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substr(padded, i, F.lit(n)))


def entity_catalog(
    mentions: DataFrame, external_embeddings: DataFrame | None = None
) -> DataFrame:
    """Distinct extraction-time entities with embeddings.

    mention_count is carried for skew diagnostics / hot-key salting decisions.

    ``external_embeddings`` is the real-model injection point for the
    SEARCH/candidate surface (README "Plugging in real models"): a
    ``(entity_uuid, name_embedding array<float>)`` table — e.g. the output
    of a sentence-transformer batch job — joined in place of the built-in
    hashed-3-gram stand-in. Contract: one row per entity_uuid; vectors are
    defensively L2-normalized here (every cosine downstream assumes unit
    norm); entities absent from the table fall back to the deterministic
    built-in so the catalog stays total. Determinism caveat: resume/replay
    reproducibility then depends on the SUPPLIED table being stable — pin a
    model version and persist the embedding table next to the stage ledger.
    """
    from graphiti_spark.functions.ids import identity_normalize_udf

    # name_norm here is the IDENTITY norm (enhanced, uuid_utils.py:99-155) of
    # the representative name: mentions sharing a uuid can carry different
    # surface forms ("Acme Corp"/"Acme" both normalize to "acme"), so the
    # catalog recomputes the norm from the deterministic representative
    # instead of F.first-ing an arbitrary mention's basic norm.
    ents = (
        mentions.groupBy("group_id", "entity_uuid")
        .agg(
            # lexicographic (episode_uuid, name) min: deterministic even when
            # one episode mentions two surface forms of the same identity
            # (min_by alone is implementation-defined on ties)
            F.min(F.struct("episode_uuid", "name"))["name"].alias("name"),
            F.count(F.lit(1)).alias("mention_count"),
        )
    )
    # Catalog rows are few and small, so AQE coalesces the post-groupBy
    # shuffle to 1-3 partitions — which would run the two python UDFs below
    # on 1-3 cores at any parallelism level (measured: a flat ~31 s
    # s5_entities at local[2] AND local[8]). Explicit hash repartition (AQE
    # leaves it alone) restores UDF-stage parallelism.
    width = plan_width(mentions.sparkSession)
    ents = ents.repartition(width, "group_id", "entity_uuid").withColumn(
        "name_norm", identity_normalize_udf("name")
    )
    ents = ents.withColumn("name_embedding", hashed_ngram_embedding_udf("name_norm"))
    if external_embeddings is not None:
        ext = external_embeddings.select(
            "entity_uuid", F.col("name_embedding").alias("_ext_emb")
        )
        norm = F.sqrt(
            F.aggregate(
                "_ext_emb", F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")
            )
        )
        ents = (
            ents.join(ext, "entity_uuid", "left")
            .withColumn(
                "name_embedding",
                F.when(
                    F.col("_ext_emb").isNotNull() & (norm > 0),
                    F.transform("_ext_emb", lambda v: (v / norm).cast("float")),
                ).otherwise(F.col("name_embedding")),
            )
            .drop("_ext_emb")
        )
    return ents


def _bucket_pairs(rows: DataFrame, key_cols: list[str], cap) -> DataFrame:
    """(key..., entity_uuid) rows -> distinct (group_id, uuid_a, uuid_b)
    pairs per bucket, uuid_a < uuid_b, buckets above `cap` MEMBERS dropped.

    ONE aggregation per blocker: groupBy(bucket) collects the member set and
    counts occurrences in the same pass, then enumerates i<j pairs with a
    JVM array expression. Replaces the previous bucket-size-join +
    self-join formulation — same output, but one shuffle instead of three
    (size agg, join back, self-join) and no cached table scanned twice.
    Measured at sf0.01/local[32]: block1+block2 53s -> ~4s, identical pairs.
    The `cap` contract is unchanged: occurrence count per bucket (block1
    tokens can repeat within a name; LSH rows are unique per entity)."""
    g = (
        rows.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_set("entity_uuid")).alias("us"),
        )
        .filter((F.col("df") <= cap) & (F.size("us") >= 2))
    )
    # Hash-repartition the bucket table to full width BEFORE enumerating:
    # aggregated buckets are tiny in BYTES, so AQE's size-based coalescing
    # folds the post-groupBy shuffle to 1-3 partitions and the (CPU-heavy)
    # enumeration runs on 1-3 cores at ANY parallelism level — measured as a
    # ~constant 280 s s5 stage at local[2] AND local[8] (sf0.1 x4). Explicit
    # repartition is exempt from AQE coalescing; same trick as the scorer's
    # distinct-name repartition below.
    width = plan_width(rows.sparkSession)
    g = g.repartition(width, *key_cols)
    # sorted members -> i<j enumeration by construction: element i pairs with
    # the slice AFTER it. Two chained codegen'd generators (explode of
    # sequence, then explode of slice) instead of one interpreted
    # flatten/transform lambda tree: per-element lambda eval is interpreted
    # (the minhash lesson), and the old single flatten materialized the whole
    # C(n,2) struct array per bucket row — multi-MB young-gen allocations
    # that drove 14-48 s GC pauses under pinned cores.
    n = F.size("us")
    return (
        g.select("group_id", "us", F.explode(F.sequence(F.lit(1), n - 1)).alias("i"))
        .select(
            "group_id",
            F.element_at("us", F.col("i")).alias("uuid_a"),
            F.explode(
                F.slice("us", F.col("i") + F.lit(1), F.size("us") - F.col("i"))
            ).alias("uuid_b"),
        )
    )


def candidate_pairs(
    entities: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    caches: list | None = None,
) -> DataFrame:
    """Blocked candidate pairs (uuid_a < uuid_b), token-block ∪ MinHash-LSH.

    Each blocker is a single groupBy-and-enumerate pass (`_bucket_pairs`);
    nothing needs persisting, so ``caches`` is accepted for signature
    stability but left empty. Buckets above ``blocking_token_max_df``
    members are dropped — bounded fan-out under skew; worst case per bucket
    is cap² array cells enumerated JVM-side, never a shuffled cross join."""
    base = entities.select(
        "group_id",
        "entity_uuid",
        "name_norm",
        F.split("name_norm", "_").alias("toks"),
    )

    # --- block 1: shared normalized token, document-frequency capped ---
    tok = base.select(
        "group_id", "entity_uuid", F.explode("toks").alias("tok")
    ).filter(F.length("tok") >= 2)
    block1 = _bucket_pairs(tok, ["group_id", "tok"], config.blocking_token_max_df)

    # --- block 2: banded MinHash-LSH over char-3-grams (catches typos with
    # no shared whole token: "graphiti" vs "graphitti"). Bands of r=1 row:
    # recall 1-(1-J)^b ≈ 0.9999 at J=0.7; precision is restored by the
    # verification scorer, and hot buckets (common minima like '^th') are
    # capped just like blocking tokens — bounded fan-out under skew. ---
    n_hashes = config.lsh_num_hash_tables
    grams = base.select(
        "group_id",
        "entity_uuid",
        *minhash_cols(_char_ngrams_col(F.col("name_norm"), config.lsh_ngram_size), n_hashes),
    )
    # posexplode of the signature array unpivots all bands in one pass (the
    # former 8-way unionByName re-planned the minhash family per band).
    # NULL signatures (empty name_norm) are dropped exactly as the previous
    # equi-join on band_hash dropped them (NULL never equi-joins) — without
    # the filter, groupBy would treat NULL as a real bucket value.
    banded = grams.select(
        "group_id",
        "entity_uuid",
        F.posexplode(F.array(*[F.col(f"mh{i}") for i in range(n_hashes)])).alias(
            "band", "band_hash"
        ),
    ).filter(F.col("band_hash").isNotNull())
    block2 = _bucket_pairs(
        banded, ["group_id", "band", "band_hash"], config.blocking_token_max_df
    )

    return block1.unionByName(block2).dropDuplicates(["group_id", "uuid_a", "uuid_b"])


def score_and_filter_pairs(
    entities: DataFrame,
    pairs: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    caches: list | None = None,
    embed_fn=None,
) -> DataFrame:
    """Verify candidates; emit accepted duplicate pairs with scores.

    Acceptance (reference parity, SURVEY.md §2.3):
      compound-name guard AND
      ( fuzzy ≥ 0.9                                  [node_operations.py:436]
        OR (both multi-word AND token-Jaccard ≥ 0.95) [maintenance_dedupe_entities.py:179-187]
        OR (cosine ≥ 0.92 AND fuzzy ≥ 0.8)            [maintenance :44 + bulk :274] )
    """
    # Broadcast hint on the entity side: the candidate table is O(entities x
    # avg-block-size) — always the big side — so broadcasting the catalog
    # keeps it from shuffling. Valid while the catalog fits executor memory
    # (~300B/entity -> ~3GB per 10^7 entities); beyond that, drop the hint
    # and let AQE pick a shuffled hash join on the same key. Only the two
    # name strings travel — the scorer derives the embedding in-UDF
    # (make_score_pair_udf), so the 64-dim arrays never enter the broadcast,
    # the distinct shuffle, or the Arrow channel.
    e = F.broadcast(entities.select("group_id", "entity_uuid", "name_norm"))
    # Two consumers traverse the candidate-pair lineage below (the distinct
    # name-pair branch and the score join-back) — cache the slim uuid-pair
    # table once so the blocking self-joins don't run twice. ~60 B/row; the
    # pipeline unpersists it as soon as S5 commits.
    pairs = pairs.persist()
    if caches is not None:
        caches.append(pairs)
    j = (
        pairs.join(
            e.select(
                "group_id",
                F.col("entity_uuid").alias("uuid_a"),
                F.col("name_norm").alias("norm_a"),
            ),
            ["group_id", "uuid_a"],
        ).join(
            e.select(
                "group_id",
                F.col("entity_uuid").alias("uuid_b"),
                F.col("name_norm").alias("norm_b"),
            ),
            ["group_id", "uuid_b"],
        )
    )
    # Score each DISTINCT (norm_a, norm_b) string pair ONCE, then join the
    # scores back to the uuid pairs. Every score component is a pure function
    # of the two normalized names (the embedding is itself derived from the
    # norm), and name distributions are zipfian — the same candidate name
    # pair recurs across thousands of groups at corpus scale (measured
    # sf0.1x12: 14.4M candidate pairs but ~1.2M distinct name pairs, i.e.
    # 12x less difflib). Exactness is unaffected; only duplicated work goes.
    #
    # One Arrow-batched scorer pass: numpy dot (embeddings are L2-normalized,
    # so cosine == dot), Python-set Jaccard + compound guard, difflib gated
    # INSIDE the batch by config-derived length-ratio bounds
    # (make_score_pair_udf). The earlier pure-Column version paid 130s of
    # interpreted zip_with/aggregate + 51s of array_intersect on 7.2M pairs.
    #
    # The explicit width repartition matters twice: the distinct table is
    # small in BYTES but python-CPU-heavy per row, so AQE's size-based
    # coalescing would fold it into 1-2 partitions and run the scorer on 1-2
    # cores. Hash repartition (deterministic, unlike round-robin) spreads it.
    score_pair_udf = make_score_pair_udf(config, embed_fn=embed_fn)
    width = plan_width(pairs.sparkSession)
    distinct_names = (
        j.select("norm_a", "norm_b")
        .dropDuplicates(["norm_a", "norm_b"])
        .repartition(width, "norm_a", "norm_b")
    )
    name_scores = distinct_names.select(
        "norm_a",
        "norm_b",
        score_pair_udf("norm_a", "norm_b").alias("s"),
    ).select("norm_a", "norm_b", "s.*")
    # Materialization barrier on the (small) distinct-scores table: without
    # it, predicate pushdown would inline the scored columns into every
    # filter branch, and ArrowEvalPython is never short-circuited by when().
    name_scores = name_scores.persist()
    if caches is not None:
        caches.append(name_scores)
    scored = j.select("group_id", "uuid_a", "uuid_b", "norm_a", "norm_b").join(
        name_scores, ["norm_a", "norm_b"]
    )
    accepted = scored.filter(
        F.col("compound_guard")
        & (
            (F.col("fuzzy") >= config.fuzzy_threshold)
            | (F.col("multi_word") & (F.col("token_jaccard") >= config.maintenance_name_threshold))
            | (
                (F.col("cosine") >= config.maintenance_embedding_threshold)
                & (F.col("fuzzy") >= config.node_min_score)
            )
        )
    )
    accepted = accepted.withColumn(
        "name_similarity", F.greatest(F.col("fuzzy"), F.col("token_jaccard") * 0.8)
    )
    return accepted.select(
        "group_id", "uuid_a", "uuid_b", "fuzzy", "token_jaccard", "cosine", "name_similarity"
    )


def duplicate_pairs_stage(
    mentions: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    embed_fn=None,
    external_embeddings: DataFrame | None = None,
    kb_aliases: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """mentions -> (entity catalog, accepted duplicate pairs).

    ``embed_fn`` / ``external_embeddings``: real-model injection points for
    the pair-scorer cosine and the catalog's name_embedding column
    respectively — see make_score_pair_udf / entity_catalog.

    ``kb_aliases``: optional (name, kb_url) sameAs assertions (e.g.
    structured_data.jsonld_entities -> kb_link.alias_table). Entities whose
    declared KB ids coincide are merged with a sentinel score of 1.0 even
    at zero name similarity — the declared-identity tier that sits ABOVE
    the fuzzy/embedding scorer, exactly as the reference's explicit
    duplicate_of edges outrank LLM judgment (edge_operations.py
    build_duplicate_of_edges)."""
    ents = entity_catalog(mentions, external_embeddings=external_embeddings)
    pairs = candidate_pairs(ents, config)
    accepted = score_and_filter_pairs(ents, pairs, config, embed_fn=embed_fn)
    if kb_aliases is not None:
        from graphiti_spark.functions.ids import identity_normalize_udf
        from graphiti_spark.operators.kb_link import kb_alias_pairs, merge_kb_pairs

        kb = kb_alias_pairs(
            ents,
            kb_aliases,
            max_df=config.blocking_token_max_df,
            normalize=identity_normalize_udf,
        )
        accepted = merge_kb_pairs(accepted, kb.select("group_id", "uuid_a", "uuid_b"))
    return ents, accepted
