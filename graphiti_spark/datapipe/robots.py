"""robots.txt (REP / RFC 9309) crawl-policy application at corpus scale.

The page-level gate (operators/extract_text.filter_noindex) honors each
page's OWN meta directive; this module honors the HOST's policy file — the
other half of what "respect robots" means for a Common-Crawl-style corpus
(CC itself crawls per REP; a derived pipeline re-applies the rules when
policies tightened after the crawl).

Documented REP subset (deterministic, both engines run it identically):
  - only the ``User-agent: *`` group applies (a rule belongs to the
    NEAREST preceding user-agent line);
  - ``Allow:`` / ``Disallow:`` path-prefix rules, case-insensitive field
    names, ``#`` comments stripped, empty ``Disallow:`` dropped (it means
    allow-everything per spec);
  - no ``*``/``$`` wildcards inside rule paths (rules containing them are
    kept as literal prefixes);
  - decision per URL path: longest matching rule wins, Allow wins ties,
    no matching rule (or no robots.txt for the host) = allowed — the
    Google/RFC precedence rule.

Scale shape: parsing explodes each policy file into lines and resolves
group membership with a per-host window — robots files are KB-sized, so
the window partition is tiny and the single shuffle key is ``host``.
Application is ONE hash equi-join on host (never a cross join; rule
count per host is small) + one max-struct aggregation per URL for the
longest-match decision. At 10^12 pages the pages side shuffles once on
host (or not at all if already host-partitioned from the crawl layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UA_RE = r"(?i)^user-agent:\s*(.*)$"
_RULE_TYPE_RE = r"(?i)^(allow|disallow):"
_RULE_PATH_RE = r"(?i)^(?:allow|disallow):\s*(.*)$"
_HOST_RE = r"^https?://([^/?#]+)"
_PATH_RE = r"^https?://[^/?#]+([^?#]*)"


def robots_rules(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """Parse each host's robots.txt into the wildcard-agent rule set:
    (host, rule_type 'allow'|'disallow', path_prefix, rule_len)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    ).withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
    ua = F.when(
        F.col("line").rlike(r"(?i)^user-agent:"),
        F.trim(F.regexp_extract("line", _UA_RE, 1)),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_group = lines.withColumn("_ua", ua).withColumn(
        "cur_ua", F.last("_ua", ignorenulls=True).over(w)
    )
    rules = (
        with_group.filter(F.col("cur_ua") == "*")
        .withColumn(
            "rule_type", F.lower(F.regexp_extract("line", _RULE_TYPE_RE, 1))
        )
        .withColumn("path_prefix", F.trim(F.regexp_extract("line", _RULE_PATH_RE, 1)))
        .filter((F.col("rule_type") != "") & (F.col("path_prefix") != ""))
        .select(
            "host",
            "rule_type",
            "path_prefix",
            F.length("path_prefix").alias("rule_len"),
        )
        .dropDuplicates(["host", "rule_type", "path_prefix"])
    )
    return rules


def apply_robots(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Append ``robots_allowed`` per page: longest matching prefix rule
    under the host's wildcard group decides; Allow wins length ties; no
    match or no rules for the host = allowed."""
    keyed = pages.withColumn(
        "_host", F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    ).withColumn("_path", F.regexp_extract(F.col(url_col), _PATH_RE, 1))
    hits = (
        keyed.select(F.col(url_col).alias("_u"), "_host", "_path")
        .join(rules.withColumnRenamed("host", "_host"), "_host")
        .filter(F.col("_path").startswith(F.col("path_prefix")))
        .groupBy("_u")
        .agg(
            F.max(
                F.struct(
                    F.col("rule_len"),
                    (F.col("rule_type") == "allow").cast("int").alias("is_allow"),
                )
            ).alias("best")
        )
        .select("_u", (F.col("best.is_allow") == 1).alias("_hit_allowed"))
    )
    return (
        keyed.join(hits, keyed[url_col] == hits["_u"], "left")
        .withColumn("robots_allowed", F.coalesce("_hit_allowed", F.lit(True)))
        .drop("_u", "_hit_allowed", "_host", "_path")
    )


def filter_robots_disallowed(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Keep only pages the host policy allows (the corpus-curation gate)."""
    return apply_robots(pages, rules, url_col).filter("robots_allowed").drop(
        "robots_allowed"
    )
