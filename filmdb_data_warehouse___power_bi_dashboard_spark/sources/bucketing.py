"""Bucketed (co-located) storage — the technique that amortizes the
big-fact shuffle across repeated joins at cluster scale.

``bucketBy(n, key)`` hash-partitions rows into a fixed number of
bucket FILES at write time; a join between two tables bucketed the
same way on the join key needs NO exchange at read time — Spark's
bucketed scan reports the hash distribution to the planner and the
join runs bucket-against-bucket. For a 100 TB fact joined every day
against the same dimensions/sibling facts, this turns the dominant
shuffle into a one-time write cost (the reference's analog is the
warehouse's clustered primary keys, e.g. datawarehouse
creation_dataware.sql's fact_paiement PK).

The plan property is asserted in tests/test_plans.py: with broadcast
disabled, a same-bucketing equi-join shows a SortMergeJoin with zero
``Exchange`` operators.

Bucket-count sizing at scale: buckets are per-table global (not
per-partition), so pick n_buckets ~ total_size / target_file_size and
keep it a multiple of the cluster's parallelism; both sides of a
co-located join must agree exactly on (n_buckets, bucket cols).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed on
    ``bucket_cols`` (optionally sorted within buckets, which also
    removes the per-bucket sort from later sort-merge joins)."""
    writer = (
        df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
