"""Property tests for the session's numeric/structural primitives:
the Wilson lower bound's ranking-under-uncertainty guarantees, the
day-spine helper's gap-free inclusive contract, and the funnel's
monotone attrition — randomized inputs, invariants that must hold
for every draw (the per-value correctness is pinned by the oracle
parity gate; these pin the MATH the operators rely on)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


_Z = 1.96


def _wilson(ok: int, n: int) -> float:
    p = ok / n
    return (
        p + _Z * _Z / (2.0 * n) - _Z * math.sqrt((p * (1.0 - p) + _Z * _Z / (4.0 * n)) / n)
    ) / (1.0 + _Z * _Z / n)


@given(
    n=st.integers(min_value=1, max_value=100000),
    ok=st.integers(min_value=0, max_value=100000),
)
@settings(max_examples=200, deadline=None)
def test_wilson_bound_is_a_lower_bound_in_unit_interval(n, ok):
    ok = min(ok, n)
    lb = _wilson(ok, n)
    assert -1e-12 <= lb <= ok / n + 1e-12  # never above the raw rate
    assert lb <= 1.0


@given(n=st.integers(min_value=1, max_value=10000))
@settings(max_examples=100, deadline=None)
def test_wilson_bound_grows_with_evidence_at_fixed_rate(n):
    # perfect record: more observations -> strictly higher bound
    assert _wilson(10 * n, 10 * n) > _wilson(n, n)


@given(
    start=st.dates(min_value=dt.date(2020, 1, 1), max_value=dt.date(2025, 1, 1)),
    n_days=st.integers(min_value=0, max_value=400),
)
@settings(max_examples=20, deadline=None)
def test_day_spine_is_gap_free_and_inclusive(spark, start, n_days):
    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.spine import (
        day_spine,
    )

    end = start + dt.timedelta(days=n_days)
    span = spark.createDataFrame([(start, end)], "d0 date, d1 date")
    days = [r["day"] for r in day_spine(span).orderBy("day").collect()]
    assert len(days) == n_days + 1  # inclusive on both ends
    assert days[0] == start and days[-1] == end
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))


def test_sql_day_spine_matches_spark_spine(spark, duck):
    import pandas as pd

    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.spine import (
        day_spine,
        sql_day_spine,
    )

    start, end = dt.date(2024, 2, 27), dt.date(2024, 3, 3)  # leap-day span
    span = spark.createDataFrame([(start, end)], "d0 date, d1 date")
    spark_days = [r["day"] for r in day_spine(span).orderBy("day").collect()]
    sql = sql_day_spine(f"DATE '{start}'", f"DATE '{end}'") + " ORDER BY day"
    duck_days = [pd.Timestamp(v).date() for v in duck.execute(sql).df()["day"]]
    assert spark_days == duck_days == [
        start + dt.timedelta(days=i) for i in range(6)
    ]
