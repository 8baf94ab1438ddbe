"""CDC-style latest-state compaction: reduce an append-only event /
change stream to one current row per entity — the standard "state
table from changelog" pass (and the batch analog of streaming
``dropDuplicates`` with latest-wins semantics).

The reference's analog is the upsert sink (insertion_dataware.sql:
47-80, ``ON CONFLICT DO UPDATE``) which keeps last-write state per
business key; this operator derives the same state from the raw
history instead of maintaining it transactionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table


def latest_state(
    df: DataFrame, keys: list[str], order_cols: list[str], payload: list[str]
) -> DataFrame:
    """One row per ``keys``: the payload of the row with the largest
    ``order_cols`` tuple, plus the change count.

    Spelled as ``max_by(struct(payload), struct(order))`` — a single
    hash aggregation with map-side partial combine, so the shuffle
    carries one candidate row per (partition, key), not the full
    history. The window spelling (`row_number` = 1) sorts entire
    partitions and cannot partially aggregate — strictly worse at
    100 TB; `max_by` is the compaction shape that scales.
    """
    return df.groupBy(*keys).agg(
        F.max_by(
            F.struct(*payload), F.struct(*order_cols)
        ).alias("__last"),
        F.count("*").alias("n_changes"),
    ).select(*keys, "__last.*", "n_changes")


def q_events_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state per user from the events changelog: the latest
    event (ts desc, event_id desc tie-break) wins.

    Rows without an entity key carry no state: ``user_id IS NOT NULL``
    on both engines (round-8 — a NULL in the BIGINT key column is also
    unrepresentable under the driver comparator)."""
    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    out = latest_state(
        events,
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        payload=["event_id", "event_type", "ts", "value"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
        "n_changes",
    ).orderBy("user_id")


ORACLE_CDC_LATEST = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
  WHERE user_id IS NOT NULL
)
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       ts AS last_ts,
       value AS last_value,
       CAST(n_changes AS BIGINT) AS n_changes
FROM ranked WHERE rn = 1
ORDER BY user_id
"""


QUERIES = {
    "events_cdc_latest": q_events_cdc_latest,
}

ORACLES = {
    "events_cdc_latest": ORACLE_CDC_LATEST,
}
