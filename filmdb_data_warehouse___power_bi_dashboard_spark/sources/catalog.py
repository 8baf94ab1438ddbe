"""Source catalog: schema-pinned parquet readers + session views.

Analog of the reference's two-catalog layout (source filmdb vs
warehouse, bridged by dblink — sql/datawarehouse/
insertion_dataware.sql:4-10): here "source" and "warehouse" are
separate parquet roots and the federation hop disappears — Spark
reads both directly (SURVEY.md §2.1 S4).

Scans stay declarative (`spark.read.parquet`) so Catalyst gets
predicate pushdown, column pruning, and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS_RAW, SOURCE_TABLES


def convert_event_ts(df: DataFrame) -> DataFrame:
    """ns-int64 → µs timestamp with exact integer division (a double
    division would lose precision above 2^53 ns)."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def _pin_session_semantics(spark: SparkSession) -> None:
    """Pin the session confs that change RESULT VALUES, at read time.

    Registered queries run under the CALLER's session (the driver's
    correctness gate builds its own SparkSession), so any conf that
    affects semantics — timestamp→date bucketing via the session
    timezone above all — must be (re)asserted on the session actually
    executing the query, not just in our own factory (session.py).
    Both confs are runtime-settable; failures are swallowed because a
    session that forbids them is one that already has them right or
    will fail loudly at read.
    """
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one source table with its declared schema.

    Passing the explicit schema (instead of relying on parquet footer
    inference) both documents the contract and fails fast on drift —
    the reference's `AS t(col type, ...)` discipline
    (insertion_dataware.sql:69-72).
    """
    _pin_session_semantics(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Stored as TIMESTAMP(NANOS): read raw int64, convert.
        return convert_event_ts(spark.read.schema(EVENTS_RAW).parquet(path))
    schema = SOURCE_TABLES.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_source_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    names = names or list(SOURCE_TABLES)
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each source table as a temp view so the SQL API form
    of every query (SURVEY.md §3.2 requires both forms) works:
    ``spark.sql("SELECT ... FROM lineitem ...")``.
    """
    for name, df in load_source_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
