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


QUERIES = {
    "corpus_health_report": q_corpus_health_report,
}

ORACLES = {
    "corpus_health_report": ORACLE_HEALTH,
}
