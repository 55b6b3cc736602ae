"""KG-embedding training-data preparation: (head, relation, tail) positives
plus deterministic corrupted negatives — the TransE-family input format
(Bordes et al. 2013, "Translating Embeddings for Modeling Multi-Relational
Data"; same example shape feeds DistMult/ComplEx/RotatE).

The reference attaches learned embeddings to nodes and edges through its
embedder clients (graphiti_core/embedder/client.py) but trains nothing on
the graph itself; once a graph is CONSTRUCTED at corpus scale, the natural
next consumer is a KG-embedding trainer, and its input is exactly this
table. Everything here is derivable from the canonical edge list alone.

Negative sampling is the "filtered" protocol (Bordes' corrupted-triple
sampling with known-positive removal): for each positive and slot
i < n_negatives, corrupt head or tail (md5-chosen side) by replacing it
with the entity at a md5-derived index in the uuid-ordered entity catalog,
then anti-join the corrupted triples against the positive set so no
labeled-negative is actually true. md5 on the triple key makes every
sample a pure function of the graph — re-runs and retries emit identical
examples (the property all the sampling ops in this package pin).

Scale shape (10^12-document graph, |E| edges, |V| entities):
 - positives: one dropDuplicates shuffle on the triple key;
 - the entity index is a distributed prefix-sum — rank within a
   uuid-prefix bucket (a per-bucket window, 4096 buckets) plus broadcast
   bucket offsets, NEVER a global single-partition window; uuid order ==
   (bucket, uuid) order because the bucket is a prefix of the uuid;
 - negatives: a map-side explode, one shuffle join on the uniformly
   distributed entity index (no skew by construction), and one
   anti-join on the triple key. Nothing is driver-side except the
   |V| scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.hashing import md5_long_col

# 3-hex-char uuid prefix: 4096 buckets. At 10^9 entities that is ~250k
# entities per bucket window — fine for a per-bucket row_number; widen the
# prefix for larger catalogs.
_BUCKET_LEN = 3


def entity_index(edges: DataFrame) -> DataFrame:
    """Dense 0-based index over the distinct endpoint uuids in uuid order:
    (uuid, ent_idx). Equivalent to row_number() OVER (ORDER BY uuid) - 1,
    computed without a global ordering exchange (see module docstring)."""
    ents = (
        edges.select(F.col("source_node_uuid").alias("uuid"))
        .unionByName(edges.select(F.col("target_node_uuid").alias("uuid")))
        .dropDuplicates()
        .withColumn("_bkt", F.substring("uuid", 1, _BUCKET_LEN))
    )
    within = ents.withColumn(
        "_rank", F.row_number().over(Window.partitionBy("_bkt").orderBy("uuid"))
    )
    offsets = (
        ents.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_off")
    )
    return within.join(F.broadcast(offsets), "_bkt").select(
        "uuid", (F.col("_off") + F.col("_rank") - 1).cast("long").alias("ent_idx")
    )


def kg_embedding_examples(
    edges: DataFrame,
    n_negatives: int = 2,
    salt: str = "kgneg",
) -> DataFrame:
    """(head, relation, tail, label, neg_slot) training examples.

    label 1 rows are the distinct positive triples (neg_slot = -1);
    label 0 rows are their corrupted copies, ``n_negatives`` per positive
    MINUS any corruption that collides with a known positive (the filtered
    protocol — so the negative count per positive may be < n_negatives,
    never a mislabel). Corruption side and replacement index both derive
    from md5(triple, slot, salt): deterministic, uniform over the catalog.
    """
    pos = edges.select(
        F.col("source_node_uuid").alias("head"),
        F.col("name").alias("relation"),
        F.col("target_node_uuid").alias("tail"),
    ).dropDuplicates()

    idx = entity_index(edges)
    n_entities = idx.count()  # scalar only; the catalog itself never collects

    slots = pos.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(n_negatives)])).alias("neg_slot")
    )
    key = F.concat_ws("\x1f", "head", "relation", "tail", "neg_slot", F.lit(salt))
    picked = slots.select(
        "*",
        (md5_long_col(F.concat(key, F.lit(":side"))) % 2 == 0).alias("_corrupt_tail"),
        F.pmod(md5_long_col(F.concat(key, F.lit(":idx"))), F.lit(n_entities)).alias(
            "ent_idx"
        ),
    )
    corrupted = picked.join(idx, "ent_idx").select(
        F.when(F.col("_corrupt_tail"), F.col("head")).otherwise(F.col("uuid")).alias("head"),
        "relation",
        F.when(F.col("_corrupt_tail"), F.col("uuid")).otherwise(F.col("tail")).alias("tail"),
        "neg_slot",
    )
    negatives = corrupted.join(pos, ["head", "relation", "tail"], "left_anti")

    return pos.select(
        "head", "relation", "tail", F.lit(1).alias("label"), F.lit(-1).alias("neg_slot")
    ).unionByName(
        negatives.select(
            "head", "relation", "tail", F.lit(0).alias("label"), "neg_slot"
        )
    )
