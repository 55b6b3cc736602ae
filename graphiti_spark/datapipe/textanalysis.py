"""Document-level text analysis over the corpus: language ID, quality
scoring, token accounting, fingerprints — the profiling stage a training-data
pipeline runs between extraction and dedup.

Thin DataFrame operators over the pure column functions in
functions/textstats.py (each of which has an exact DuckDB SQL twin for the
correctness oracle). Everything here is a map-only scan stage: no shuffle,
whole-stage codegen end-to-end, safe to run inline with the S1 text
extraction pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import (
    bpe_ish_token_count_col,
    fingerprint_col,
    lang_id_col,
    lang_score_cols,
    quality_score_col,
    token_count_col,
    tokens_col,
)


def profile_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document profile: sizes, token counts, quality, lang."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count_col(c).alias("n_tokens"),
        bpe_ish_token_count_col(c).alias("n_bpe_tokens"),
        quality_score_col(c).alias("quality"),
        lang_id_col(c).alias("lang_pred"),
        fingerprint_col(c).alias("fingerprint"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, per-language marker scores, argmax prediction)."""
    return docs.select(
        F.col(id_col),
        *lang_score_cols(F.col(text_col)),
        lang_id_col(F.col(text_col)).alias("lang_pred"),
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 10,
) -> DataFrame:
    """C4/Gopher-style keep-list: quality and length gates as pushdown-able
    predicates over the profile columns."""
    c = F.col(text_col)
    return (
        docs.withColumn("quality", quality_score_col(c))
        .withColumn("n_tokens", token_count_col(c))
        .filter((F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens))
        .select(F.col(id_col), "quality", "n_tokens")
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window chunking: (id, chunk_id, chunk_text, n_tokens) with
    ``chunk_tokens``-token windows advancing by ``chunk_tokens - overlap``
    — the retrieval/episode-splitting prep step. Map-only (HOF build +
    posexplode), no shuffle; empty documents yield no rows; a document
    shorter than one window yields exactly one chunk.

    Deterministic window starts: 1, 1+stride, ... while start <= n_tokens
    (so the final, possibly short tail window is kept)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    chunks = F.when(
        F.size(toks) > 0,
        F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens))),
    ).otherwise(F.array().cast("array<string>"))
    out = docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
    return out.withColumn(
        "n_tokens", F.size(F.split(F.col("chunk_text"), r"\s+"))
    )


def token_budget(docs: DataFrame, text_col: str = "text", by: str | None = None) -> DataFrame:
    """Corpus token accounting, optionally grouped (e.g. by lang/source) —
    the budgeting query behind sampling weights."""
    c = F.col(text_col)
    base = docs.withColumn("_tok", token_count_col(c)).withColumn(
        "_bpe", bpe_ish_token_count_col(c)
    )
    keys = [by] if by else []
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.sum("_bpe").alias("total_bpe_tokens"),
    )
    return agg.orderBy(*keys) if keys else agg


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Collocation / phrase mining via pointwise mutual information over
    adjacent token pairs (Church & Hanks 1990; the word2phrase pass of
    Mikolov et al. 2013 is the same statistic with a discount):

        pmi(a,b) = ln( (c_ab / N_b) / ((c_a / N_u) * (c_b / N_u)) )

    with c_ab = adjacent-pair count, N_b = total pair positions, c_a/c_b =
    token occurrence counts, N_u = total tokens. Pairs below ``min_count``
    are dropped BEFORE the statistics join — the count cutoff is what keeps
    the surviving pair table Heaps-bounded instead of vocab². Returns
    (w1, w2, pair_count, pmi) for every surviving pair.

    Scale shape at 100 TB: pair and unigram counts are each ONE algebraic
    groupBy with map-side combine (hot pairs collapse before the exchange);
    the min-count cut shrinks the pair table to phrase-candidate size, and
    the two unigram joins key on a vocab-sized table — the corpus itself is
    touched exactly twice, map-only plus the two count shuffles. The same
    shape as lm_quality's bigram training, reused for mining instead of
    scoring."""
    toks = docs.select(tokens_col(F.col(text_col)).alias("_tk"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("_tk") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_tk") - 1),
                    lambda i: F.struct(
                        F.element_at("_tk", i).alias("w1"),
                        F.element_at("_tk", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array()),
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = toks.select(F.explode("_tk").alias("w"))
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_b = pairs.agg(F.count(F.lit(1)).alias("_nb"))
    n_u = uni.agg(F.count(F.lit(1)).alias("_nu"))
    out = (
        pair_counts.join(uni_counts.withColumnsRenamed({"w": "w1", "c": "_ca"}), "w1")
        .join(uni_counts.withColumnsRenamed({"w": "w2", "c": "_cb"}), "w2")
        .crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_u))
    )
    return out.select(
        "w1",
        "w2",
        "pair_count",
        F.round(
            F.log(
                (F.col("pair_count") / F.col("_nb"))
                / ((F.col("_ca") / F.col("_nu")) * (F.col("_cb") / F.col("_nu")))
            ),
            round_dp,
        ).alias("pmi"),
    )


def tfidf_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Per-document top-k salient terms by smoothed TF-IDF:

        idf(t)   = ln((N + 1) / (df_t + 1)) + 1
        score    = tf(t, d) * idf(t)

    Ties broken by token ascending so the top-k set is deterministic.
    Tokens with document frequency < ``min_df`` never enter the DF table
    (they score as pure rarities and are almost always typos at corpus
    scale) — they are excluded from keywords entirely.

    The keyword stage a KG pipeline uses for entity salience: which terms
    characterize a page beyond its extracted entities.

    Scale shape: per-doc TF is one groupBy on (doc, token) with map-side
    combine; DF is one groupBy on token; the DF table joins back on the
    token key (vocab-sized, Heaps-bounded). The final top-k is a window
    partitioned BY DOCUMENT — parallel across docs, never a global sort."""
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * (F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                round_dp,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )


TEXTRANK_STOP = frozenset(
    """the a an and or but of to in on at for with from by is are was were be
    been being as it its this that these those we you they he she his her
    their our your not no do does did done will would can could has have had
    into over under about after before between during than then there here
    when where what who how why all any some such only also very more most
    other same so if because while each few many much own out up down""".split()
)


def textrank_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    n_iter: int = 5,
    damping: float = 0.85,
    k: int = 5,
    min_len: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Per-document TextRank keywords (Mihalcea & Tarau 2004): PageRank
    over the within-document word co-occurrence graph — the graph-based
    dual of tfidf_keywords (no corpus statistics: a term is salient when
    the document's own structure keeps pointing at it).

    Graph per document: vertices = content-word types (stopwords and
    tokens shorter than ``min_len`` dropped), undirected edges between
    types co-occurring within ``window`` positions of the FILTERED token
    sequence (the paper's setup). Rank iterates

        r(v) <- (1 - d) + d * sum_{u ~ v} r(u) / deg(u)

    (the paper's unnormalized form, r0 = 1) for ``n_iter`` rounds with
    per-round rounding to 9 dp and output rounding to ``round_dp`` — the
    personalized-PageRank oracle convention: the 9 dp intermediate pin
    keeps double drift out of the fixpoint while staying far from the
    output's half-way boundaries.
    Returns (id, token, rank, score) — top-k per document, score
    descending, token-ascending tiebreak. Isolated vertices (no
    co-occurrence edge) receive no mass and settle at 1 - d.

    Scale shape: pair generation is array-side (two shifted zips per
    window offset — no self-join, no per-token explode before the pair
    explode); everything else is groupBy/join keyed on (doc, word) —
    parallel across documents, iterations shared across the whole corpus
    in one distributed fixpoint. The top-k window partitions BY DOCUMENT.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("id"),
        F.filter(
            tokens_col(F.col(text_col)),
            lambda t: (F.length(t) >= min_len)
            & ~t.isin(*TEXTRANK_STOP),
        ).alias("_toks"),
    )
    pair_legs = []
    for off in range(1, window + 1):
        # guard: Spark sequence(1, 0) DESCENDS (and element_at at index 0
        # throws), so under-length docs must yield an empty pair array
        pair_arr = F.when(
            F.size("_toks") > off,
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - off),
                lambda i: F.struct(
                    F.element_at("_toks", i).alias("wa"),
                    F.element_at("_toks", i + off).alias("wb"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<wa:string,wb:string>>"))
        pair_legs.append(
            base.select("id", F.explode(pair_arr).alias("p")).select(
                "id", F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb")
            )
        )
    pairs = pair_legs[0]
    for leg in pair_legs[1:]:
        pairs = pairs.unionAll(leg)
    und = (
        pairs.filter(F.col("wa") != F.col("wb"))
        .select(
            "id",
            F.least("wa", "wb").alias("wa"),
            F.greatest("wa", "wb").alias("wb"),
        )
        .dropDuplicates(["id", "wa", "wb"])
    )
    adj = und.unionAll(
        und.select("id", F.col("wb").alias("wa"), F.col("wa").alias("wb"))
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("id", "wa").agg(F.count(F.lit(1)).alias("deg"))
    nodes = base.select("id", F.explode(F.array_distinct("_toks")).alias("token"))
    ranks = nodes.withColumn("r", F.lit(1.0))
    for _ in range(n_iter):
        per_src = ranks.join(
            deg.select(
                F.col("id").alias("id"),
                F.col("wa").alias("token"),
                "deg",
            ),
            ["id", "token"],
        ).select("id", "token", (F.col("r") / F.col("deg")).alias("c"))
        contrib = (
            per_src.join(
                adj.select("id", F.col("wa").alias("token"), "wb"),
                ["id", "token"],
            )
            .select("id", F.col("wb").alias("token"), "c")
            .groupBy("id", "token")
            .agg(F.sum("c").alias("in_c"))
        )
        ranks = (
            nodes.join(contrib, ["id", "token"], "left")
            .select(
                "id",
                "token",
                F.round(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("in_c", F.lit(0.0)),
                    9,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    w = Window.partitionBy("id").orderBy(F.desc("r"), F.asc("token"))
    return (
        ranks.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "token", "rank", F.round("r", round_dp).alias("score"))
    )
