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
from pyspark.sql import types as T

from ..schemas import EVENTS, SOURCE_TABLES


def convert_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events `ts` column to the EVENTS contract
    (TimestampType, UTC session) regardless of how the runtime decoded
    the on-disk column:

    - ``long``: raw int64 nanoseconds (older runtimes reading
      TIMESTAMP(NANOS) under ``spark.sql.legacy.parquet.nanosAsLong``)
      → exact integer division to µs (double division would lose
      precision above 2^53 ns), then ``timestamp_micros``.
    - ``timestamp_ntz``: native decode of a naive timestamp → cast;
      under the pinned UTC session this reinterprets the same
      wall-clock instant the naive-timestamp oracle sees.
    - ``timestamp``: already the contract; cast is a no-op.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))


def _pin_session_semantics(spark: SparkSession) -> None:
    """Pin the session confs that change RESULT VALUES, at read time.

    Registered queries run under the CALLER's session (the driver's
    correctness gate builds its own SparkSession), so any conf that
    affects semantics — timestamp→date bucketing via the session
    timezone above all — must be (re)asserted on the session actually
    executing the query, not just in our own factory (session.py).
    The set is verified by read-back: a session that silently ignored
    the pin would produce wrong-but-plausible results downstream.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = spark.conf.get("spark.sql.session.timeZone")
    if got != "UTC":
        raise RuntimeError(
            f"session timezone pin did not take effect (got {got!r}); "
            "timestamp→date bucketing would drift from the oracle"
        )


def events_disk_schema(spark: SparkSession, path: str) -> T.StructType:
    """Footer-probe: the schema THIS runtime decodes events.parquet as.

    The events table's `ts` has drifted across environments — stored
    as TIMESTAMP(NANOS) int64 on some, plain timestamp[us] on others —
    and Spark's decode of TIMESTAMP(NANOS) changed in 4.x. Rather than
    pin one on-disk shape, probe the footer (metadata-only, no data
    read) and let `convert_event_ts` branch on what came back.
    """
    return spark.read.parquet(path).schema


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
        # ts decode drifts by runtime/file version: footer-probe, then
        # normalize to the EVENTS contract (see convert_event_ts).
        df = convert_event_ts(spark.read.parquet(path))
        return df.select(*[F.col(f.name).cast(f.dataType) for f in EVENTS.fields])
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
