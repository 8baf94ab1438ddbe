"""Cohort retention over ``events`` and per-source duplication rates
over ``documents`` — the two remaining observability shapes a
training-data / product-analytics warehouse runs weekly: "do users
come back" (the retention triangle every BI tool renders) and "which
source is feeding us copies" (the curation signal that feeds the
mix-weight down-weighting in operators/quality.py).

Both are pure DataFrame compositions — no UDFs, no iteration — and
both aggregate to small outputs (weeks x offsets, resp. |sources|
rows), so the only wide shuffles are on natural keys (user_id /
fingerprint / source) with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

# ---------------------------------------------------------------------------
# Weekly cohort retention (events)
# ---------------------------------------------------------------------------


def retention_matrix(events: DataFrame) -> DataFrame:
    """Classic retention triangle: users are cohorted by the week of
    their FIRST event; for every (cohort_week, week_offset) cell,
    count the distinct cohort users active that week and the share of
    the cohort they represent. Offset 0 is the cohort size by
    construction (every user is active in their first week).

    Scale shape: first-touch is one map-side-combined MIN per user;
    the user's (week, cohort) activity pairs come from a distinct on
    (user, week) BEFORE the join, so the join carries one row per
    user-week, not per event; the cell aggregation shuffles on the
    (cohort, offset) composite — bounded by weeks², tiny. The cohort
    size rejoins via a broadcast of the offset-0 slice (|weeks| rows).

    Analog: the reference's client-activity views (v_clients_actifs_
    12mois, vues.sql:180-189) count a single trailing window; the
    triangle generalizes it to all (cohort, age) cells.
    """
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = (
        events.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
        )
        .distinct()
    )
    cells = (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff("week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        # active is distinct on (user, week) and first is unique per
        # user, so each user appears at most once per cell — a plain
        # count equals COUNT(DISTINCT user_id) without the extra
        # distinct-aggregation phase.
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    size = cells.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            round_half_up(
                F.col("n_active").cast("double") / F.col("cohort_size") * 100.0,
                4,
            ).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def q_events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_matrix(read_table(spark, sf_dir, "events"))


ORACLE_RETENTION = f"""
WITH first AS (
  SELECT user_id, date_trunc('week', CAST(MIN(ts) AS DATE)) AS cohort_week
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS week
  FROM events
),
cells AS (
  SELECT f.cohort_week,
         (a.week - f.cohort_week) // 7 AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM active a JOIN first f ON a.user_id = f.user_id
  GROUP BY 1, 2
),
size AS (
  SELECT cohort_week, n_active AS cohort_size FROM cells WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
       {sql_round_half_up(
           "CAST(c.n_active AS DOUBLE) / s.cohort_size * 100.0", 4
       )} AS retention_pct
FROM cells c JOIN size s ON c.cohort_week = s.cohort_week
ORDER BY c.cohort_week, c.week_offset
"""


# ---------------------------------------------------------------------------
# Per-source duplication rates (documents)
# ---------------------------------------------------------------------------


def dup_ratio_by_source(docs: DataFrame) -> DataFrame:
    """Per-source share of documents that are (canonical-fingerprint)
    duplicates of an earlier document — "duplicate" means the doc is
    NOT the minimum-id member of its fingerprint group, the same
    keep-first rule the dedup pipeline applies, so this report states
    exactly what dedup_exact/fingerprint dedup would delete, broken
    down by the source that contributed it.

    Scale shape: one shuffle on the 16-byte fingerprint for the
    keeper MIN, a second on the fingerprint to rejoin (both sides
    keys+id only — text never shuffles; the md5 is computed in the
    scan projection), and a final map-side-combined rollup on
    ``source``.
    """
    from .text import fingerprints

    fp = fingerprints(docs).join(docs.select("doc_id", "source"), "doc_id")
    keeper = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keeper_doc_id"))
    flagged = fp.join(keeper, "fingerprint").select(
        "source", (F.col("doc_id") != F.col("keeper_doc_id")).alias("is_dup")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
        )
        .select(
            "source",
            "n_docs",
            "n_dups",
            round_half_up(
                F.col("n_dups").cast("double") / F.col("n_docs") * 100.0, 4
            ).alias("dup_pct"),
        )
        .orderBy("source")
    )


def q_text_dup_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ratio_by_source(read_table(spark, sf_dir, "documents"))


def _dup_ratio_oracle() -> str:
    from .text import _SQL_FP

    return f"""
WITH fp AS (
  SELECT doc_id, source,
         {_SQL_FP}
           AS fingerprint
  FROM documents
),
k AS (SELECT fingerprint, MIN(doc_id) AS keeper_doc_id FROM fp GROUP BY 1)
SELECT fp.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN fp.doc_id <> k.keeper_doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dups,
       {sql_round_half_up(
           "CAST(SUM(CASE WHEN fp.doc_id <> k.keeper_doc_id THEN 1 ELSE 0 END)"
           " AS DOUBLE) / COUNT(*) * 100.0",
           4,
       )} AS dup_pct
FROM fp JOIN k ON fp.fingerprint = k.fingerprint
GROUP BY fp.source
ORDER BY fp.source
"""


ORACLE_DUP_RATIO = _dup_ratio_oracle()


QUERIES = {
    "events_retention_matrix": q_events_retention_matrix,
    "text_dup_ratio_by_source": q_text_dup_ratio_by_source,
}

ORACLES = {
    "events_retention_matrix": ORACLE_RETENTION,
    "text_dup_ratio_by_source": ORACLE_DUP_RATIO,
}
