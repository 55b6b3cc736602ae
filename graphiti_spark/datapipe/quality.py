"""Gopher-style repetition signals and quality gates over the corpus.

The repetition family from the Gopher data pipeline (Rae et al. 2021,
"Scaling Language Models", appendix A1.1 — public) as declarative DataFrame
ops, plus the composite keep/drop gate. These run between extraction and
dedup in a training-data pipeline; at 100 TB the shapes matter:

  - line metrics and the duplicate-n-gram fraction are PURE higher-order
    functions over per-row arrays — map-only, whole-stage codegen, zero
    shuffle, safe to fuse with the S1 extraction scan;
  - the top-n-gram metric needs a per-(doc, gram) count, which no per-row
    HOF can express linearly — it is the one keyed aggregation here:
    explode -> groupBy(doc_id, gram) with map-side combine, then one
    window by doc_id. Both keys are ~uniform (doc_id is unique; grams are
    zipfian but the combine collapses them before the exchange), so the
    stage scales linearly with corpus size.

Metric definitions (each has an exact DuckDB twin in __spark_entry__):

  dup_line_frac       1 - distinct_lines / lines  (occurrence view)
  dup_line_char_frac  chars in duplicate line occurrences BEYOND the first
                      / total line chars — the dedup-savings view (Gopher
                      counts all occurrences of duplicated lines; this
                      variant is chosen because it is computable map-only)
  top_ngram_char_frac occurrences(most frequent word n-gram) * its char
                      length / total text chars; ties broken by the
                      lexicographically LARGEST gram (deterministic)
  dup_ngram_frac      1 - distinct_ngrams / total_ngrams (occurrence view
                      of Gopher's duplicate-n-gram character fraction)

Reference parity: the reference repo has no training-data quality stage;
this family is part of the large-scale-pipeline surface the graft adds
(SURVEY.md datapipe section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col, word_ngrams_col

# single shared n-gram definition (functions/textstats.py) — the short-doc
# guard lives in exactly one place
_ngrams_col = word_ngrams_col


def _lines_col(text) -> F.Column:
    """Non-empty '\\n'-split lines (no trim — byte-exact twin in DuckDB)."""
    return F.filter(F.split(text, r"\n"), lambda x: x != "")


def _sum_len(arr) -> F.Column:
    return F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))


def repetition_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngram_n: int = 2,
    dup_ngram_n: int = 5,
) -> DataFrame:
    """Per-document repetition signals (see module docstring for the exact
    metric definitions). One map-only pass + one keyed agg for the top-gram."""
    c = F.col(text_col)
    lines = _lines_col(c)
    toks = tokens_col(c)
    grams_dup = _ngrams_col(toks, dup_ngram_n)

    base = docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        F.size(lines).alias("n_lines"),
        F.round(
            F.when(
                F.size(lines) > 0,
                1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                _sum_len(lines) > 0,
                (_sum_len(lines) - _sum_len(F.array_distinct(lines)))
                / _sum_len(lines).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_char_frac"),
        F.round(
            F.when(
                F.size(grams_dup) > 0,
                1.0 - F.size(F.array_distinct(grams_dup)) / F.size(grams_dup),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias(f"dup_{dup_ngram_n}gram_frac"),
        _ngrams_col(toks, top_ngram_n).alias("_grams_top"),
    )

    # top-n-gram char fraction: the one keyed aggregation (explode ->
    # count per (doc, gram) with map-side combine -> per-doc argmax).
    counts = (
        base.select(id_col, F.explode_outer("_grams_top").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cnt"), F.desc("gram")
    )
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col("gram").isNotNull())
        .select(
            id_col,
            F.col("gram").alias("top_gram"),
            (F.col("cnt") * F.length("gram")).alias("_top_chars"),
        )
    )
    out = (
        base.drop("_grams_top")
        .join(top, id_col, "left")
        .withColumn(
            f"top_{top_ngram_n}gram_char_frac",
            F.round(
                F.when(
                    F.col("n_chars") > 0,
                    F.coalesce(F.col("_top_chars"), F.lit(0))
                    / F.col("n_chars").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .drop("_top_chars")
    )
    return out


# Gopher's "required word" list: a document must contain >= 2 of these.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.80,
    max_dup_line_frac: float = 0.30,
    max_top_2gram_char_frac: float = 0.20,
    max_dup_5gram_frac: float = 0.15,
    max_symbol_word_ratio: float = 0.10,
    max_bullet_line_frac: float = 0.90,
    max_ellipsis_line_frac: float = 0.30,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Composite Gopher keep/drop gate: per-rule booleans + the AND.

    The thresholds are the published Gopher defaults (word-count window,
    mean word length 3-10, >=80% words with an alphabetic character,
    symbol-to-word ratio <=0.1 for '#'/'...', <=90% bullet-started and
    <=30% ellipsis-ended lines, >=2 of the 8 required stopwords,
    repetition caps); each rule is its own column so a pipeline can audit
    WHY a document dropped — the filter itself is a pushdown-able
    predicate over this profile.
    """
    toks = tokens_col(F.col(text_col))
    c = F.col(text_col)
    lines = _lines_col(c)
    n_symbols = (
        (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit(""))))
        + F.regexp_count(c, F.lit(r"\.\.\.|…"))
    )
    bullet_lines = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    ellipsis_lines = F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$")))
    stop_hits = F.size(
        F.filter(
            F.array_distinct(toks),
            lambda t: t.isin(*GOPHER_STOPWORDS),
        )
    )
    words = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        F.round(
            F.when(F.size(toks) > 0, _sum_len(toks) / F.size(toks).cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / F.size(toks).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("alpha_word_frac"),
        F.round(
            F.when(F.size(toks) > 0, n_symbols / F.size(toks).cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("symbol_word_ratio"),
        F.round(
            F.when(F.size(lines) > 0, bullet_lines / F.size(lines).cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("bullet_line_frac"),
        F.round(
            F.when(F.size(lines) > 0, ellipsis_lines / F.size(lines).cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("ellipsis_line_frac"),
        stop_hits.alias("stopword_hits"),
    )
    rep = repetition_profile(docs, id_col=id_col, text_col=text_col)
    prof = words.join(
        rep.select(id_col, "dup_line_frac", "top_2gram_char_frac", "dup_5gram_frac"),
        id_col,
    )
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "ok_symbol_ratio": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "ok_bullet_lines": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "ok_ellipsis_lines": F.col("ellipsis_line_frac") <= max_ellipsis_line_frac,
        "ok_stopwords": F.col("stopword_hits") >= min_stopword_hits,
        "ok_dup_lines": F.col("dup_line_frac") <= max_dup_line_frac,
        "ok_top_2gram": F.col("top_2gram_char_frac") <= max_top_2gram_char_frac,
        "ok_dup_5gram": F.col("dup_5gram_frac") <= max_dup_5gram_frac,
    }
    out = prof
    keep = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def c4_clean_and_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style line cleaning + page gate (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning", §2.2 — the filters that built C4 from
    Common Crawl), complementing the Gopher gate above with the OTHER
    published rule family:

      line level (the retained text is rebuilt from surviving lines):
        - keep only lines whose trimmed form ends in terminal punctuation
          (. ! ? " '),
        - with at least ``min_line_words`` whitespace words,
        - not containing the word "javascript" (case-insensitive);
      page level (flags; `c4_kept` is their conjunction):
        - at least ``min_sentences`` sentence terminators in the cleaned
          text,
        - no "lorem ipsum" (case-insensitive),
        - no curly brace '{' anywhere in the original text.

    (C4 also drops pages on a word blocklist and dedups three-sentence
    spans; the blocklist is deployment policy — supply it via
    `webstats.domain_blocklist_filter`'s pattern — and span dedup is
    `spandedup.span_dedup` / `decontam.paragraph_dedup`.)

    Everything is a per-row higher-order function over the line split —
    map-only, codegen, zero shuffle, fusable with the extraction scan.

    Returns (id, n_lines, n_kept_lines, n_sentences, has_lorem_ipsum,
    has_curly_brace, c4_kept, clean_text).
    """
    lines = _lines_col(F.col(text_col))
    trimmed = F.transform(lines, lambda ln: F.trim(ln))
    kept = F.filter(
        trimmed,
        lambda ln: ln.rlike(r"""[.!?"']$""")
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda t: t != "")) >= min_line_words)
        & ~F.lower(ln).rlike(r"\bjavascript\b"),
    )
    clean = F.concat_ws("\n", kept)
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), 0))
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_curly = F.col(text_col).contains("{")
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_curly.alias("has_curly_brace"),
        (
            (n_sent >= min_sentences) & ~has_lorem & ~has_curly
        ).alias("c4_kept"),
        clean.alias("clean_text"),
    )


def dedup_lines_within_doc(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document line dedup, keeping the FIRST occurrence of each line
    (the RefinedWeb / CCNet line-wise correction for boilerplate that repeats
    inside one page: cookie banners, nav blocks, share footers).

    A line survives iff its first occurrence index is its own index —
    expressed as a pure per-row higher-order filter (map-only, zero shuffle,
    fusable with the scan). Per-row cost is O(lines²) in the worst case via
    array_position; web pages are short in lines (the Gopher line metrics
    above bound the same quantity), so this stays cheap and embarrassingly
    parallel at corpus scale.

    Returns (id, n_lines, n_unique_lines, removed_frac, text_clean).
    """
    lines = _lines_col(F.col(text_col))
    firsts = F.filter(lines, lambda x, i: F.array_position(lines, x) == i + 1)
    n, nu = F.size(lines), F.size(firsts)
    return docs.select(
        F.col(id_col).alias("id"),
        n.alias("n_lines"),
        nu.alias("n_unique_lines"),
        F.when(n > 0, F.round((n - nu) / n.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("removed_frac"),
        F.concat_ws("\n", firsts).alias("text_clean"),
    )
