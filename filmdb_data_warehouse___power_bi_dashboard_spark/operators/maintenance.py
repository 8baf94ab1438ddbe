"""Warehouse-maintenance audits as gate-registered operators.

``sources.sinks.delete_by_keys`` (GDPR erasure) and
``compact_small_files`` were pytest-only until round 11; a data-
erasure path deserves driver-hashed evidence, so
``warehouse_delete_report`` runs a REAL erasure — stage a copy of the
orders table, delete every order of the requested customers through
the production ``delete_by_keys`` (broadcast anti-join +
stage-and-swap), then audit the REWRITTEN parquet — and reports a
one-row summary the DuckDB oracle replays relationally: row counts
before/removed/kept, the kept-side money total (content
preservation), and the residual count of erased keys still present,
which a correct erasure leaves at exactly 0. A broken delete (rows
surviving, payload mutated, over-deletion) diverges from the oracle's
relational complement and goes hash-red.

Scale notes: the erasure-request key list broadcasts (erasure batches
are tiny next to the table); the audit is two scans of the rewritten
table (count + sum, and a broadcast semi-join for the residual). At
100 TB both the rewrite and the audit narrow to the partition
directories holding the affected keys — the changed-partition pattern
documented on delete_by_keys itself.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table
from ..sources.sinks import delete_by_keys

# Erasure request: every 97th customer asks to be forgotten —
# deterministic, non-empty at every fixture SF, and replayable in SQL.
_ERASE_MOD = 97


def warehouse_delete_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row erasure audit (see module docstring). The staged table
    copy and its backup live in a temp dir removed in ``finally``; the
    report's five scalars are collected (1 row, domain-bounded) before
    cleanup so the returned DataFrame owns its data."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    keys = customer.where(
        F.pmod(F.col("c_custkey"), F.lit(_ERASE_MOD)) == 0
    ).select(F.col("c_custkey").alias("o_custkey"))

    work = tempfile.mkdtemp(prefix="gdpr-delete-")
    path = os.path.join(work, "orders")
    try:
        orders.write.mode("overwrite").parquet(path)
        rows_before = spark.read.parquet(path).count()
        rows_removed = delete_by_keys(spark, path, keys, "o_custkey")
        after = spark.read.parquet(path)
        # o_totalprice is DOUBLE — sum exact integer cents (the
        # nation_revenue_trend floor device) so the total is
        # order-independent across partial-agg orders and engines;
        # COALESCE covers the fully-erased (empty kept side) corpus.
        cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        kept_agg = after.agg(
            F.count(F.lit(1)).alias("rows_kept"),
            F.coalesce(F.sum(cents), F.lit(0)).alias("kept_cents"),
        ).collect()[0]
        residual = after.join(F.broadcast(keys), "o_custkey", "left_semi").count()
        return spark.createDataFrame(
            [
                (
                    rows_before,
                    rows_removed,
                    kept_agg["rows_kept"],
                    residual,
                    kept_agg["kept_cents"] / 100.0,
                )
            ],
            "rows_before long, rows_removed long, rows_kept long, "
            "residual_erased_rows long, kept_total_price double",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_warehouse_delete_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warehouse_delete_report(spark, sf_dir)


# The oracle replays the erasure relationally on the source table: the
# kept side is the complement of the request keys, and a CORRECT
# physical erasure leaves zero residual rows — the literal 0 is the
# specification the Spark-side measurement must hit.
ORACLE_DELETE_REPORT = f"""
WITH erased AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0
),
kept AS (
  SELECT * FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM erased)
)
SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS rows_before,
       CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM kept)
            AS BIGINT) AS rows_removed,
       CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS rows_kept,
       CAST(0 AS BIGINT) AS residual_erased_rows,
       CAST(COALESCE((SELECT SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                      FROM kept), 0) AS DOUBLE) / 100.0 AS kept_total_price
"""


QUERIES = {
    "warehouse_delete_report": q_warehouse_delete_report,
}

ORACLES = {
    "warehouse_delete_report": ORACLE_DELETE_REPORT,
}
