"""The shared day-spine idiom: a gap-free calendar from a 1-row
(min, max) aggregate via ``explode(sequence(...))`` — the S7
date-spine generator every completeness-sensitive operator rides
(gap filling, backlog sweep-line, zero-filled correlation/trend/CUSUM
series). One definition keeps the Spark spelling and the DuckDB
oracle twin engine-consistent; drift between hand-copied spines is a
cross-engine hash bug waiting to happen (date-vs-timestamp casts,
inclusive bounds, empty-input behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def day_spine(span: DataFrame, d0: str = "d0", d1: str = "d1", *, keep: tuple[str, ...] = ()) -> DataFrame:
    """Explode a 1-row ``(d0, d1)`` span frame into one row per day,
    inclusive on both ends. ``keep`` carries extra span columns
    through (e.g. the origin day for index arithmetic)."""
    return span.select(
        F.explode(F.sequence(d0, d1, F.expr("interval 1 day"))).alias("day"),
        *keep,
    )


def sql_day_spine(d0_expr: str, d1_expr: str, extra: str = "") -> str:
    """The DuckDB twin of :func:`day_spine`: generate_series is
    timestamp-valued over dates, so the CAST back to DATE is part of
    the contract (a timestamp day minus a date is an INTERVAL, which
    breaks integer day arithmetic). ``extra`` appends carried columns
    (e.g. ", d0")."""
    return (
        f"SELECT CAST(unnest(generate_series({d0_expr}, {d1_expr},"
        f" INTERVAL 1 DAY)) AS DATE) AS day{extra}"
    )
