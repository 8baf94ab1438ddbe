"""Property-based checks (SURVEY §5.4).

The cross-engine determinism of ``round_half_up`` rests on one claim:
``floor(x*10^s + 0.5)/10^s`` computed as IEEE-754 doubles gives the
same bits in every engine. Python's float IS an IEEE double, so
hypothesis can fuzz the claim against DuckDB directly — no Spark
session needed (Spark executes the identical op sequence).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=300, deadline=None)
@given(
    x=st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ),
    scale=st.integers(min_value=0, max_value=6),
)
def test_round_half_up_formula_matches_duckdb(duck, x, scale):
    factor = float(10**scale)
    py = math.floor(x * factor + 0.5) / factor
    (db,) = duck.execute(
        f"SELECT FLOOR(CAST(? AS DOUBLE) * {factor!r} + 0.5) / {factor!r}", [x]
    ).fetchone()
    assert py == db or (math.isnan(py) and math.isnan(db)), (x, scale, py, db)


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.decimals(
            min_value=-10**9, max_value=10**9, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=20,
    )
)
def test_decimal_sum_order_independent(duck, vals):
    """Money flows through DecimalType because decimal addition is
    exact and order-independent — the property the engine's value-hash
    parity depends on."""
    forward = sum(vals)
    backward = sum(reversed(vals))
    assert forward == backward
    (db,) = duck.execute(
        "SELECT CAST(SUM(CAST(v AS DECIMAL(18,2))) AS VARCHAR) FROM (SELECT unnest(?) AS v)",
        [[str(v) for v in vals]],
    ).fetchone()
    assert float(db) == float(forward)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=5),
            st.text(alphabet="abc", min_size=0, max_size=2),
        ),
        min_size=1,
        max_size=60,
    ),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_global_row_number_matches_reference_on_random_data(spark, rows, n_parts):
    """Property: for ANY dataset and partition count, the distributed
    rank equals ROW_NUMBER() OVER the same total order (rows are
    deduplicated so the order is total)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.ranking import (
        global_row_number,
    )

    uniq = sorted(set(rows))
    df = spark.createDataFrame(uniq, "x int, y int, s string").repartition(3)
    order = ["x", "y", "s"]
    got = {
        (r["x"], r["y"], r["s"]): r["rn"]
        for r in global_row_number(df, order, num_partitions=n_parts).collect()
    }
    want = {
        (r["x"], r["y"], r["s"]): r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*[F.col(c) for c in order]))
        ).collect()
    }
    assert got == want
