"""As-of (point-in-time) join — an operator Spark's DataFrame API
lacks natively, expressed as a composition of built-in ops.

``asof_join(left, right, ...)`` attaches to every left row the most
recent right row for the same key with ``right.ts < left.ts``
(strictly-prior semantics, the time-travel-safe default: a fact never
sees attributes written at its own timestamp). The classic uses are
event-to-last-state joins (trade→latest-quote, purchase→last-view,
reading→last-calibration) and slowly-changing-dimension lookups.

Plan shape — union + keyed window, NOT a join:

- The naive range join (``l.key = r.key AND r.ts < l.ts`` + a
  per-left-row max) explodes to O(|matches|) intermediate rows before
  collapsing; skewed keys make it quadratic.
- Instead both sides are UNIONED into one stream tagged by side, and
  one window per key, ordered by (ts, side), carries the latest right
  payload forward (``last_value(..., ignoreNulls=True)``). Cost: one
  shuffle on the key, zero row expansion, O(n log n) in the partition
  — the same plan the sessionizer uses, and it survives 100 TB
  because a key's rows stream through one sorted pass. Ordering right
  rows AFTER left rows at equal ts implements the strict
  ``<`` (an equal-ts right row is not yet visible to the left row).

The DuckDB oracle is the native ``ASOF JOIN`` (strict ``>``), so the
semantics are pinned cross-engine. Ties among right rows at the same
(key, ts) would be ambiguous in both engines; the fixture has none
(asserted in the data check) and real deployments disambiguate with a
sequence column appended to the ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import read_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "prior_",
) -> DataFrame:
    """Inner as-of join: left rows paired with the latest
    strictly-prior right row per ``key``; left rows with no prior
    right row are dropped (inner semantics). Right payload columns
    arrive prefixed."""
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, ts_col)]
    r = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.struct(F.col(ts_col).alias("__rts"), *[F.col(c) for c in payload_cols]).alias(
            "__r"
        ),
    )
    l = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns if c not in (key, ts_col)],
    )
    unioned = l.unionByName(r.select(*l.columns[:4]), allowMissingColumns=True)
    # Strict <: at equal ts the right row sorts AFTER (__side 1 > 0),
    # so the left row's frame (unbounded..current) cannot see it.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = (
        carried.filter((F.col("__side") == 0) & F.col("__last_r").isNotNull())
        .select(
            key,
            ts_col,
            *[c for c in left.columns if c not in (key, ts_col)],
            F.col(f"__last_r.__rts").alias(f"{prefix}{ts_col}"),
            *[F.col(f"__last_r.{c}").alias(f"{prefix}{c}") for c in payload_cols],
        )
    )
    return out


def q_events_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event joined to the user's most recent
    strictly-prior view event (attribution shape): prior event id and
    the purchase→view latency in exact microseconds."""
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(purchases, views, key="user_id", payload_cols=["event_id"])
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("prior_event_id"),
        (F.unix_micros("ts") - F.unix_micros("prior_ts")).alias("gap_us"),
    ).orderBy("event_id")


ORACLE_ASOF = """
SELECT a.event_id, a.user_id, a.ts,
       b.event_id AS prior_event_id,
       epoch_us(a.ts) - epoch_us(b.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id AND a.ts > b.ts
ORDER BY a.event_id
"""


QUERIES = {
    "events_asof_purchase_view": q_events_asof_purchase_view,
}

ORACLES = {
    "events_asof_purchase_view": ORACLE_ASOF,
}
