"""Golden gate: every registered query must match its DuckDB oracle at
sf0.001 (fast) — the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.queries import oracles, registry

from .oracle_harness import compare, duck_connection

_REG = registry()
_ORACLES = oracles()
_WITH_ORACLE = sorted(n for n in _REG if n in _ORACLES)


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duck_connection(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_small, duck, name):
    df = _REG[name](spark, sf_small)
    ok, msg = compare(df, duck, _ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_all_queries_have_entries():
    assert len(_REG) >= 20
