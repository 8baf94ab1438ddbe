"""Scalar expression helpers shared by ETL, queries, and metrics.

Each helper encodes a semantic the reference relies on
(SURVEY.md §2.8), expressed as built-in Column expressions so they
stay inside whole-stage codegen — no Python UDFs on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import MONEY


def money(col: Column | str) -> Column:
    """Cast to the engine's money decimal.

    The reference declares all money as numeric(p,2)
    (sql/datawarehouse/creationdatwareh.sql:83,109). Decimal keeps
    SUM exact and order-independent — a double SUM differs between
    engines by summation order, which would break value-hash parity.
    Decimal is internal-only: registered query OUTPUTS are cast to
    double in their final projection (:func:`decimals_to_double`).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def net_revenue(price: Column | str = "l_extendedprice", discount: Column | str = "l_discount") -> Column:
    """Line revenue = extendedprice * (1 - discount), as money."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    return (money(p) * (F.lit(1) - d.cast(MONEY))).cast(MONEY)


def date_key(col: Column | str) -> Column:
    """yyyymmdd smart integer key: EXTRACT(YEAR)*10000 + MONTH*100 + DAY
    (sql/datawarehouse/insertion_dataware.sql:27,175)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def interval_days(later: Column | str, earlier: Column | str) -> Column:
    """Whole elapsed days between two timestamps.

    Postgres `EXTRACT(DAY FROM a - b)` counts *elapsed whole days* of
    the interval — NOT `datediff`, which counts midnight boundaries
    (sql/vues.sql:226; SURVEY.md §2.8 F6). floor((unix(a)-unix(b))/86400).
    """
    a = F.col(later) if isinstance(later, str) else later
    b = F.col(earlier) if isinstance(earlier, str) else earlier
    return F.floor((a.cast("long") - b.cast("long")) / F.lit(86400)).cast("int")


def round_half_up(col: Column, scale: int) -> Column:
    """Cross-engine-deterministic rounding of a double ratio.

    Spark's ``F.round(double, s)`` goes through ``Double.toString``
    (shortest decimal repr) then HALF_UP, while DuckDB rounds the
    binary value — ties at the round digit diverge (e.g.
    303879.91/8 = 37984.98875 → Spark .9888, DuckDB .9887). Instead
    both the Spark side (this helper) and the DuckDB oracle
    (``sql_round_half_up``) compute floor(x*10^s + 0.5)/10^s with the
    identical IEEE-754 op sequence, so the resulting doubles are
    bit-identical across engines. (Semantics: half-toward-+inf.)
    """
    factor = float(10**scale)
    return F.floor(col.cast("double") * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def sql_round_half_up(expr: str, scale: int) -> str:
    """DuckDB twin of :func:`round_half_up` — same IEEE op sequence."""
    factor = float(10**scale)
    return f"FLOOR(CAST(({expr}) AS DOUBLE) * {factor!r} + 0.5) / {factor!r}"


def decimals_to_double(df):
    """Canonicalize a result frame for cross-engine comparison: cast
    every DecimalType column to double in a final projection.

    Money math stays decimal-exact all the way through aggregation,
    windows, and ranking — only the *returned* values are converted,
    so the cast is applied exactly once per value and never
    re-aggregated. decimal→double is correctly rounded on Spark
    (BigDecimal.doubleValue), DuckDB, and Python; measured bit-equal
    across all three on 119,944 corpus values. Exactness holds while
    the scaled unscaled-value fits in 2^53 (≈9e13 cents) — beyond
    that the conversion is still deterministic per engine but no
    longer injective, which is why ranking/tie-breaking upstream of
    this projection always runs on the decimal, never the double.

    Why: pandas materializations of DECIMAL differ between engines
    (duckdb ``.df()`` → float64, Spark collect → ``Decimal`` with
    scale-padded str form '1.50' vs '1.5'), which breaks any
    stringified value comparison even when values are identical.
    Emitting IEEE doubles on both sides makes every downstream
    representation (str, repr, pandas, Arrow) bit-identical.
    """
    from pyspark.sql.types import DecimalType

    fields = df.schema.fields
    if not any(isinstance(f.dataType, DecimalType) for f in fields):
        return df
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, DecimalType)
            else F.col(f.name)
            for f in fields
        ]
    )


def months_since(later: Column | str, earlier: Column | str) -> Column:
    """Whole calendar months between two dates — Postgres
    `age(a,b)` year*12+month semantics (sql/datawarehouse/
    requetes_clees.sql:159-160). months_between is calendar-aware."""
    a = F.col(later) if isinstance(later, str) else later
    b = F.col(earlier) if isinstance(earlier, str) else earlier
    return F.floor(F.months_between(a, b)).cast("int")
