"""Local twin of the driver's correctness gate.

Round-3 calibration: the driver compares Spark ``collect()`` rows
against the oracle result materialized as a PANDAS frame (duckdb
``.df()``), stringified, columns sorted by name, rows compared as an
order-insensitive multiset. That comparator — reproduced here —
matched all 46 known pass/fail bits of CORRECTNESS_r02 (the previous
round's fetchall-based, 6-decimal-rounding harness could not see the
difference and reported green on 24 driver-red queries).

Strictness choices, each at least as strict as any plausible driver:

- values compared by ``str()`` of the exact object each side yields
  (no rounding, no truncation);
- a float NaN on the pandas side is NOT equal to a Spark-side None
  (so results must avoid NULL numeric outputs entirely — any query
  emitting one fails this compare);
- date and datetime compare through ``pd.Timestamp`` (the driver
  treats a DATE and its midnight timestamp as equal — measured:
  etl_dim_date/etl_dim_mois pass with duckdb's datetime64 dates);
- result dtypes are additionally audited: any DECIMAL / HUGEINT /
  nullable-int-materialized-as-float column in either engine's output
  is an error even when values match today (trailing-zero luck is
  scale-dependent).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Driver-equivalent stringification. Exact: no rounding."""
    if v is None:
        return None
    if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
        return str(pd.Timestamp(v))
    if isinstance(v, (bytes, bytearray)):
        # Spark collect yields bytearray, duckdb/pandas bytes; value-
        # identical content must compare equal on both sides.
        return bytes(v).hex()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"  # deliberately != None
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in idx) for r in rows]
    # None-safe total order: NULLs sort before any string.
    return sorted(normed, key=lambda t: tuple(("", "") if v is None else ("v", v) for v in t))


_BANNED_DUCK = ("DECIMAL", "HUGEINT")


def _audit_types(spark_df, res_description, d_pdf) -> str | None:
    """Scale-independent representation audit (see module docstring)."""
    for name, dtype in spark_df.dtypes:
        if dtype.startswith("decimal"):
            return f"spark column {name!r} is {dtype}: outputs must cast decimals to double"
    duck_types = {d[0]: str(d[1]).upper() for d in res_description}
    for name, t in duck_types.items():
        if any(b in t for b in _BANNED_DUCK):
            return f"oracle column {name!r} is {t}: CAST it (AS DOUBLE / AS BIGINT)"
    s_types = dict(spark_df.dtypes)
    for name in d_pdf.columns:
        if str(d_pdf[name].dtype).startswith("float") and s_types.get(name) in (
            "int",
            "bigint",
            "smallint",
            "tinyint",
        ):
            return (
                f"oracle column {name!r} materializes as float (NULLs in an int "
                f"column?) while spark yields {s_types.get(name)}"
            )
    return None


def compare(spark_df, con, oracle_sql: str) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle_sql)
    d_cols = [d[0] for d in res.description]
    description = res.description
    d_pdf = res.df()
    d_rows = [tuple(row) for row in d_pdf.itertuples(index=False, name=None)]
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    audit = _audit_types(spark_df, description, d_pdf)
    if audit:
        return False, f"type audit: {audit}"
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        return False, f"values differ; first diffs (spark vs duck): {diffs}"
    return True, "ok"
