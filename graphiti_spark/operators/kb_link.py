"""External-KB entity linking: schema.org ``sameAs`` aliases as ER evidence.

The reference resolves duplicates by LLM judgment over blocked candidates
(graphiti_core/utils/maintenance/node_operations.py tier dispatch); a web
corpus carries a stronger signal for free — pages DECLARE entity identity
by linking their JSON-LD entities to external KBs (Wikidata/DBpedia-style
``sameAs`` URLs, harvested by operators/structured_data.py). Two surface
forms that share a KB id are the same real-world entity regardless of name
distance — exactly the pairs token/LSH blocking can never catch
("IBM" vs "International Business Machines").

Scale shape: the alias table is a harvest over the corpus (potentially
billions of rows) — NEVER broadcast; both joins below are hash equi-joins
on (name_norm) / (group_id, kb_url), and pair enumeration reuses the ER
blockers' single-agg bucket enumerator with the same document-frequency
cap, so a hot KB id (every page linking "United States") is dropped rather
than enumerated into a cap² blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.normalize import normalize_entity_name_col
from graphiti_spark.operators.er import _bucket_pairs


def alias_table(jsonld_ents: DataFrame) -> DataFrame:
    """(name, kb_url) alias assertions from parsed JSON-LD entities
    (structured_data.jsonld_entities output): one row per declared
    sameAs link, deduplicated. Map-only + one distinct."""
    return (
        jsonld_ents.filter(F.col("same_as").isNotNull())
        .select("name", F.explode("same_as").alias("kb_url"))
        .filter(F.col("kb_url") != "")
        .dropDuplicates(["name", "kb_url"])
    )


def kb_alias_pairs(
    entities: DataFrame,
    aliases: DataFrame,
    max_df: int = 50,
    normalize=None,
) -> DataFrame:
    """Duplicate-entity pairs via shared external-KB ids:
    (group_id, uuid_a, uuid_b, kb_url), uuid_a < uuid_b.

    entities: the ER catalog (group_id, entity_uuid, name_norm —
    operators/er.entity_catalog). aliases: (name, kb_url) from
    ``alias_table``. An entity matches an alias when the alias's
    normalized surface form equals the entity's name_norm; entities
    sharing a kb_url within a group then pair up (df-capped bucket
    enumeration — the blocker hygiene rule). The kb_url rides along as
    provenance, mirroring how every reference edge keeps its episodes.

    ``normalize`` maps the alias surface form to the SAME norm space the
    entity catalog uses — pass functions.ids.identity_normalize_udf when
    joining against er.entity_catalog (whose name_norm is the enhanced
    identity norm); the default is the basic column normalizer."""
    norm_fn = normalize if normalize is not None else normalize_entity_name_col
    al = (
        aliases.select(norm_fn(F.col("name")).alias("name_norm"), "kb_url")
        .filter(F.col("name_norm") != "")
        .dropDuplicates(["name_norm", "kb_url"])
    )
    hits = (
        entities.select("group_id", "entity_uuid", "name_norm")
        .join(al, "name_norm")
        .select("group_id", "kb_url", "entity_uuid")
        .dropDuplicates(["group_id", "kb_url", "entity_uuid"])
    )
    pairs = _bucket_pairs(hits, ["group_id", "kb_url"], max_df)
    # _bucket_pairs drops the bucket key; re-derive provenance by joining
    # each member back to its kb_url (broadcast-size per group in practice,
    # but expressed as a hash join — correct at any scale).
    a_side = hits.select(
        "group_id", F.col("entity_uuid").alias("uuid_a"), "kb_url"
    )
    return (
        pairs.join(a_side, ["group_id", "uuid_a"])
        .join(
            hits.select(
                "group_id", F.col("entity_uuid").alias("uuid_b"), "kb_url"
            ),
            ["group_id", "uuid_b", "kb_url"],
        )
        .select("group_id", "uuid_a", "uuid_b", "kb_url")
        .dropDuplicates(["group_id", "uuid_a", "uuid_b", "kb_url"])
    )


def merge_kb_pairs(
    accepted: DataFrame, kb_pairs: DataFrame
) -> DataFrame:
    """Union KB-declared pairs into the scored duplicate-pair set with a
    sentinel score of 1.0 (declared identity outranks any similarity):
    columns align with er.score_and_filter_pairs output. Pairs already
    accepted by the scorer keep their scored row (anti-join), so adding
    KB evidence never changes existing rows — only adds the pairs name
    similarity missed."""
    extra = (
        kb_pairs.select("group_id", "uuid_a", "uuid_b")
        .dropDuplicates(["group_id", "uuid_a", "uuid_b"])
        .join(
            accepted.select("group_id", "uuid_a", "uuid_b"),
            ["group_id", "uuid_a", "uuid_b"],
            "left_anti",
        )
    )
    for c in accepted.columns:
        if c not in {"group_id", "uuid_a", "uuid_b"}:
            dt = dict(accepted.dtypes)[c]
            extra = extra.withColumn(
                c,
                F.lit(1.0).cast(dt) if dt in ("double", "float") else F.lit(None).cast(dt),
            )
    return accepted.unionByName(extra.select(*accepted.columns))
