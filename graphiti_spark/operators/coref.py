"""Deterministic pronoun coreference: resolve third-person pronouns to
the nearest preceding capitalized-name run in the same document — the
recency heuristic that anchors classical coref stacks (the Hobbs-distance
baseline; CoreNLP's `dcoref` precedence rules).

The reference's LLM extraction resolves pronouns implicitly: "Alice
joined Acme. She runs it." yields edges for Alice, not "She"
(extract_nodes prompt forbids pronoun entities — prompts/extract_nodes.py:
92-109 via node_operations.py:234-342). A deterministic engine recovers
the high-precision core of that behavior explicitly: every third-person
pronoun is attributed to the most recent name mention to its left, and
the resolved rows can then join the mention table by surface name to
boost entity mention counts / episodic edges.

Everything is JVM-side (split + per-document windows — no Python UDF),
and every rule is restatable in SQL, so the DuckDB oracle executes the
byte-identical logic (`coref_sql`).

Algorithm per document:
  1. tokenize on single whitespace (`\\s`), keeping exact char offsets
     via a per-document prefix sum (each separator is exactly 1 char);
  2. candidate antecedent runs = maximal sequences of capitalized
     ``[A-Z][a-z]+`` tokens (trailing punctuation stripped) that are not
     pronouns/stopwords — "Ana Bell" is one candidate named "Ana Bell";
  3. pronoun occurrences = tokens whose cleaned lowercase form is a
     third-person pronoun;
  4. resolution = last candidate run ending strictly before the pronoun
     (``last_value IGNORE NULLS`` over the position-ordered union).

Scale shape: one explode (page-bounded), per-document windows only (the
partition key is the document id — the natural corpus partitioning, no
global window anywhere), one shuffle on id. At 10^12 pages this runs
inside the extraction wave; cost is O(tokens) per page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Third-person pronouns (subject/object/possessive).
PRONOUNS = (
    "he she it they him her them his hers its their theirs himself "
    "herself itself themselves"
).split()

# Capitalized tokens that are never antecedent candidates: pronoun
# capitalizations are excluded structurally (clean form is a pronoun);
# these are common sentence starters.
_STOPWORDS = (
    "the a an this that these those and but or so then however meanwhile "
    "later today yesterday tomorrow finally still next afterward afterwards several "
    "some many when where after before during"
).split()

_CLEAN = r"[^A-Za-z]"  # strip non-letters for the cleaned token form
_CAP = r"^[A-Z][a-z]+[.,;:!?]*$"  # capitalized word + optional trailing punct


def resolve_pronouns(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pronoun, pos, antecedent) — one row per third-person pronoun
    occurrence; `pos` is the exact character offset of the pronoun token,
    `antecedent` the nearest preceding candidate name (null when the
    pronoun opens the document with no name before it)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\s")).alias("tpos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("tpos")
    toks = (
        toks.withColumn(
            "off",
            F.coalesce(
                F.sum(F.length("tok") + F.lit(1)).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("clean", F.regexp_replace("tok", _CLEAN, ""))
        .withColumn("lclean", F.lower("clean"))
        .withColumn("is_pron", F.col("lclean").isin(PRONOUNS))
        .withColumn(
            "is_cand",
            F.col("tok").rlike(_CAP)
            & ~F.col("is_pron")
            & ~F.col("lclean").isin(_STOPWORDS),
        )
    )
    # maximal candidate runs: run starts where a candidate follows a
    # non-candidate; run_id = running count of starts (candidates only)
    toks = toks.withColumn(
        "run_start",
        F.col("is_cand") & ~F.coalesce(F.lag("is_cand").over(w), F.lit(False)),
    ).withColumn(
        "run_id",
        F.sum(F.col("run_start").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = (
        toks.filter("is_cand")
        .groupBy("id", "run_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("tpos", "clean"))
                    ),
                    lambda s: s["clean"],
                ),
                " ",
            ).alias("name"),
            F.max("tpos").alias("tpos"),
        )
        .select("id", "tpos", F.lit(None).cast("string").alias("pronoun"), "name")
    )
    prons = toks.filter("is_pron").select(
        "id",
        "tpos",
        F.col("lclean").alias("pronoun"),
        F.lit(None).cast("string").alias("name"),
    )
    ev = runs.unionByName(prons)
    # pronoun tokens order after a run ending at the same tpos is
    # impossible (a token is either pronoun or candidate), so tpos alone
    # orders the timeline.
    wev = Window.partitionBy("id").orderBy("tpos")
    resolved = ev.withColumn(
        "antecedent",
        F.last("name", ignorenulls=True).over(
            wev.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).filter(F.col("pronoun").isNotNull())
    # join exact char offsets back from the token table
    offs = toks.filter("is_pron").select("id", "tpos", "off")
    return resolved.join(offs, ["id", "tpos"]).select(
        "id", "pronoun", F.col("off").alias("pos"), "antecedent"
    )


def coref_mentions(
    resolved: DataFrame,
    mentions: DataFrame,
    episode_col: str = "episode_uuid",
) -> DataFrame:
    """Upgrade resolved pronouns to entity mentions: join the antecedent
    surface name against the episode's own mention names, yielding
    (episode_uuid, entity_uuid, name, start_pos) rows ready to union into
    the mention table (mention-count boosts, episodic edges). Pronouns
    whose antecedent never appears as a real mention in that episode drop
    out — precision over recall. One hash join keyed on (episode, name)."""
    m = mentions.select(
        F.col(episode_col).alias("id"),
        F.col("name"),
        F.col("entity_uuid"),
    ).dropDuplicates(["id", "name", "entity_uuid"])
    return resolved.filter(F.col("antecedent").isNotNull()).join(
        m, (resolved["id"] == m["id"]) & (resolved["antecedent"] == m["name"])
    ).select(
        m["id"].alias(episode_col),
        "entity_uuid",
        F.col("antecedent").alias("name"),
        F.col("pos").alias("start_pos"),
    )


def coref_sql(table: str, id_expr: str = "doc_id", text_expr: str = "text") -> str:
    """DuckDB twin of resolve_pronouns (oracle helper): identical
    tokenization, offsets, run grouping, and last-ignore-nulls window."""
    prons = ", ".join(f"'{p}'" for p in PRONOUNS)
    stops = ", ".join(f"'{s}'" for s in _STOPWORDS)
    return f"""
        WITH t0 AS (
          SELECT {id_expr} AS id, string_split_regex({text_expr}, '\\s') AS ls
          FROM {table}),
        tok AS (
          SELECT id,
            unnest(list_transform(range(1, len(ls) + 1),
              i -> {{'tpos': i - 1, 'tok': ls[i]}}), recursive := true)
          FROM t0),
        t1 AS (
          SELECT id, tpos, tok,
            coalesce(sum(length(tok) + 1) OVER (PARTITION BY id ORDER BY tpos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
            regexp_replace(tok, '[^A-Za-z]', '', 'g') AS clean
          FROM tok),
        t2 AS (
          SELECT *, lower(clean) AS lclean,
            lower(clean) IN ({prons}) AS is_pron,
            (regexp_matches(tok, '^[A-Z][a-z]+[.,;:!?]*$')
             AND lower(clean) NOT IN ({prons})
             AND lower(clean) NOT IN ({stops})) AS is_cand
          FROM t1),
        t3 AS (
          SELECT *,
            (is_cand AND NOT coalesce(lag(is_cand) OVER
               (PARTITION BY id ORDER BY tpos), false)) AS run_start
          FROM t2),
        t4 AS (
          SELECT *,
            sum(CASE WHEN run_start THEN 1 ELSE 0 END) OVER
              (PARTITION BY id ORDER BY tpos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
          FROM t3),
        runs AS (
          SELECT id, run_id, string_agg(clean, ' ' ORDER BY tpos) AS name,
                 max(tpos) AS tpos
          FROM t4 WHERE is_cand GROUP BY id, run_id),
        ev AS (
          SELECT id, tpos, CAST(NULL AS VARCHAR) AS pronoun, name FROM runs
          UNION ALL
          SELECT id, tpos, lclean AS pronoun, CAST(NULL AS VARCHAR) AS name
          FROM t4 WHERE is_pron),
        res AS (
          SELECT id, tpos, pronoun,
            last_value(name IGNORE NULLS) OVER (PARTITION BY id ORDER BY tpos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS antecedent
          FROM ev)
        SELECT res.id, res.pronoun, CAST(t4.off AS BIGINT) AS pos, res.antecedent
        FROM res JOIN t4 ON res.id = t4.id AND res.tpos = t4.tpos
        WHERE res.pronoun IS NOT NULL
    """
