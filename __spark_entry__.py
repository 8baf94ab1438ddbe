"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``filmdb_data_warehouse___power_bi_dashboard_spark``;
this module only adapts its registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Top-10 parts by revenue — the reference's
    "Top 10 films par revenu", README.md:91-99) on sf0.001, through
    the registry so the canonical output contract (decimal→double
    final projection) applies here too."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import registry

    return registry()["top_parts_by_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query; keys missing here
    (non-SQL-expressible ops) get the driver's rows-only check."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import oracles

    return oracles()
