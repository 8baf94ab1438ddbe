"""Pipeline observability: a one-pass health report over the corpus
tables — the monitoring query a production pipeline schedules after
every ingest (row counts, key-column null rates, key ranges,
duplicate-key counts).

Scale shape: one scan + one tiny aggregate per table (each agg is a
handful of scalar aggregates — map-side partial, 1-row result), then
a union of the per-table rows. Nothing shuffles more than the final
5-row frame; adding a table adds one scan, never a join.

Reference anchor: the reference enforces health declaratively
(NOT NULL, unique business keys, FKs — creationdatwareh.sql:14-109);
Spark enforces none of these, so the engine surfaces the same
invariants as a queryable report instead (SURVEY §1.2).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

# (table, key column, value column whose null-rate matters)
_HEALTH_TABLES = [
    ("documents", "doc_id", "text"),
    ("events", "event_id", "props"),
    ("embeddings", "vec_id", "embedding"),
    ("orders", "o_orderkey", "o_totalprice"),
    ("customer", "c_custkey", "c_name"),
]


def health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per monitored table: row count, distinct/duplicate key
    counts, key range, and the payload column's null count."""
    parts = []
    for name, key, payload in _HEALTH_TABLES:
        t = read_table(spark, sf_dir, name)
        parts.append(
            t.agg(
                F.lit(name).alias("table_name"),
                F.count("*").alias("n_rows"),
                F.countDistinct(key).alias("n_distinct_keys"),
                (F.count(key) - F.countDistinct(key)).alias("n_dup_keys"),
                F.sum(F.col(key).isNull().cast("int")).alias("n_null_keys"),
                F.min(key).cast("long").alias("min_key"),
                F.max(key).cast("long").alias("max_key"),
                F.sum(F.col(payload).isNull().cast("int")).alias("n_null_payload"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("table_name")


def q_corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return health_report(spark, sf_dir)


def _one(name: str, key: str, payload: str) -> str:
    return f"""
  SELECT '{name}' AS table_name,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT {key}) AS n_distinct_keys,
         COUNT({key}) - COUNT(DISTINCT {key}) AS n_dup_keys,
         CAST(SUM(CASE WHEN {key} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys,
         CAST(MIN({key}) AS BIGINT) AS min_key,
         CAST(MAX({key}) AS BIGINT) AS max_key,
         CAST(SUM(CASE WHEN {payload} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_payload
  FROM {name}"""


ORACLE_HEALTH = (
    "SELECT * FROM (\n"
    + "\n  UNION ALL\n".join(_one(n, k, p) for n, k, p in _HEALTH_TABLES)
    + "\n) ORDER BY table_name"
)


_N_BINS = 20


def value_histogram(events: DataFrame, n_bins: int = _N_BINS) -> DataFrame:
    """Equi-width histogram of ``events.value``: data-driven [min, max]
    range split into ``n_bins`` buckets (the last bucket closed so the
    max lands inside it) — the profiling query behind every BI
    distribution widget and outlier triage.

    Scale shape: the 1-row min/max aggregate broadcasts into a cross
    join (the J4 scalar pattern), then one hash aggregation on a
    bounded key domain (n_bins) — two scans total, no wide shuffle.
    Bucket arithmetic is shared IEEE ops (sub/div/floor/least) so both
    engines bin identically; requires max > min (holds for any
    non-degenerate corpus — a constant column has no histogram).
    """
    vals = events.filter(F.col("value").isNotNull()).select("value")
    stats = vals.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
    bucket = F.least(
        F.floor((F.col("value") - F.col("mn")) / width), F.lit(n_bins - 1)
    ).cast("int")
    return (
        vals.crossJoin(F.broadcast(stats))
        .select(
            bucket.alias("bucket_id"),
            (F.col("mn") + bucket * width).alias("bucket_lo"),
            (F.col("mn") + (bucket + 1) * width).alias("bucket_hi"),
            "value",
        )
        .groupBy("bucket_id", "bucket_lo", "bucket_hi")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            round_half_up(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bucket_id")
    )


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(read_table(spark, sf_dir, "events"))


ORACLE_HISTOGRAM = f"""
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
st AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM v),
b AS (
  SELECT CAST(LEAST(FLOOR((value - mn) / ((mx - mn) / {float(_N_BINS)!r})),
                    {_N_BINS - 1}) AS INT) AS bucket_id,
         mn, mx, value
  FROM v CROSS JOIN st
)
SELECT bucket_id,
       mn + bucket_id * ((mx - mn) / {float(_N_BINS)!r}) AS bucket_lo,
       mn + (bucket_id + 1) * ((mx - mn) / {float(_N_BINS)!r}) AS bucket_hi,
       COUNT(*) AS n_values,
       {sql_round_half_up("SUM(value)", 2)} AS sum_value
FROM b
GROUP BY bucket_id, mn, mx
ORDER BY bucket_id
"""


def join_key_skew_profile(
    fact: DataFrame, key: str = "l_suppkey", top_n: int = 10
) -> DataFrame:
    """Frequency profile of a join key: the top hot keys with their
    row share — the diagnostic run BEFORE choosing a skew mitigation
    (functions/skew.py salting, AQE skew-join thresholds). A hot key
    holding >1/n_partitions of the rows is the straggler predictor.

    Scale shape: one hash aggregation on the key (map-side combined),
    a 1-row total broadcast into the share division, TakeOrdered for
    the top-n — no sort of the full key distribution.
    """
    counts = fact.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = fact.agg(
        F.count(F.lit(1)).alias("total_rows"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key_value",
            "n_rows",
            round_half_up(
                F.col("n_rows") / F.col("total_rows") * 100.0, 4
            ).alias("share_pct"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key_value"))
        .limit(top_n)
    )


def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return join_key_skew_profile(read_table(spark, sf_dir, "lineitem"))


ORACLE_SKEW_PROFILE = f"""
WITH c AS (
  SELECT l_suppkey AS key_value, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
),
t AS (SELECT COUNT(*) AS total_rows FROM lineitem)
SELECT key_value, n_rows,
       {sql_round_half_up("n_rows / total_rows * 100.0", 4)} AS share_pct
FROM c CROSS JOIN t
ORDER BY n_rows DESC, key_value ASC
LIMIT 10
"""


QUERIES = {
    "corpus_health_report": q_corpus_health_report,
    "events_value_histogram": q_events_value_histogram,
    "join_key_skew_profile": q_join_key_skew_profile,
}

ORACLES = {
    "corpus_health_report": ORACLE_HEALTH,
    "events_value_histogram": ORACLE_HISTOGRAM,
    "join_key_skew_profile": ORACLE_SKEW_PROFILE,
}
