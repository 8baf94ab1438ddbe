"""Known-pitfall regression tests (SURVEY §5.5): the semantic traps
where a naive Spark spelling silently diverges from the reference.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.functions.ranking import (
    ntile_from_rank,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.functions.scalar import (
    date_key,
    interval_days,
    months_since,
)


def test_interval_days_counts_elapsed_not_boundaries(spark):
    """Postgres EXTRACT(DAY FROM a-b) counts elapsed whole days;
    datediff counts midnight crossings. 23:00 → next-day 01:00 is
    0 elapsed days but 1 boundary (SURVEY §2.8 F6)."""
    df = spark.createDataFrame(
        [
            (
                datetime.datetime(2022, 3, 1, 23, 0),
                datetime.datetime(2022, 3, 2, 1, 0),
            )
        ],
        "a timestamp, b timestamp",
    )
    row = df.select(
        interval_days("b", "a").alias("elapsed"),
        F.datediff(F.col("b").cast("date"), F.col("a").cast("date")).alias("boundaries"),
    ).collect()[0]
    assert row["elapsed"] == 0
    assert row["boundaries"] == 1


def test_months_since_is_calendar_aware(spark):
    df = spark.createDataFrame(
        [(datetime.date(2022, 3, 31), datetime.date(2022, 1, 31))], "a date, b date"
    )
    assert df.select(months_since("a", "b").alias("m")).collect()[0]["m"] == 2


def test_date_key_formula(spark):
    df = spark.createDataFrame([(datetime.date(2022, 7, 9),)], "d date")
    assert df.select(date_key("d").alias("k")).collect()[0]["k"] == 20220709


def test_ntile_formula_matches_spark_ntile(spark):
    """ntile_from_rank must reproduce NTILE(k) exactly, including the
    uneven-remainder distribution (n=7, k=5 → sizes 2,2,1,1,1)."""
    from pyspark.sql import Window

    n, k = 7, 5
    df = spark.range(1, n + 1).withColumnRenamed("id", "v")
    w = Window.orderBy("v")
    rows = df.select(
        "v",
        F.ntile(k).over(w).alias("ntile"),
        F.row_number().over(w).alias("rn"),
    ).collect()
    for r in rows:
        formula = (
            df.sparkSession.range(1)
            .select(ntile_from_rank(F.lit(r["rn"]), n, k).alias("b"))
            .collect()[0]["b"]
        )
        assert formula == r["ntile"], (r["rn"], formula, r["ntile"])


def test_string_agg_is_order_deterministic(spark, sf_small):
    """collect_set order is nondeterministic; the engine always wraps
    it in sort_array (SURVEY §2.4 A8) — two runs must agree string-
    for-string."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
        q_brand_type_list,
    )

    a = [r["types"] for r in q_brand_type_list(spark, sf_small).collect()]
    b = [r["types"] for r in q_brand_type_list(spark, sf_small).collect()]
    assert a == b
