"""Point/list lookups with uuid-cursor pagination.

Parity targets (citations into /root/reference):
 - EpisodicNode.get_by_uuid(s)/get_by_group_ids (graphiti_core/nodes.py:291-379),
 - EntityNode.get_by_uuid(s)/get_by_group_ids (:514-588),
 - EntityEdge.get_by_uuid(s)/get_by_group_ids/get_by_node_uuid (edges.py:402-497).

Cursor pagination follows the reference's `WHERE uuid < $cursor ORDER BY
uuid DESC LIMIT n` shape. All of these compile to filter + TakeOrdered —
point lookups prune partitions/row groups when the table is laid out by the
filter column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_by_uuid(table: DataFrame, uuid: str) -> DataFrame:
    return table.filter(F.col("uuid") == uuid)


def get_by_uuids(table: DataFrame, uuids: list[str]) -> DataFrame:
    return table.filter(F.col("uuid").isin(uuids))


def get_by_group_ids(
    table: DataFrame,
    group_ids: list[str],
    limit: int | None = None,
    uuid_cursor: str | None = None,
) -> DataFrame:
    """nodes.py:334-379 shape: group filter, optional `uuid < cursor`,
    ORDER BY uuid DESC LIMIT n."""
    df = table.filter(F.col("group_id").isin(group_ids))
    if uuid_cursor is not None:
        df = df.filter(F.col("uuid") < uuid_cursor)
    df = df.orderBy(F.desc("uuid"))
    if limit is not None:
        df = df.limit(limit)
    return df


def get_edges_by_node_uuid(edges: DataFrame, node_uuid: str) -> DataFrame:
    """edges.py:480-497: RELATES_TO rows touching the node on either side."""
    return edges.filter(
        (F.col("source_node_uuid") == node_uuid) | (F.col("target_node_uuid") == node_uuid)
    )


def episode_mentioned_entities(
    mentions: DataFrame, episode_uuids: list[str]
) -> DataFrame:
    """Entities mentioned by the given episodes (the hydration fetch the
    bulk path does per episode, graphiti.py:716-754) — one semi-join."""
    return mentions.filter(F.col("episode_uuid").isin(episode_uuids)).select(
        "episode_uuid", "entity_uuid"
    )
