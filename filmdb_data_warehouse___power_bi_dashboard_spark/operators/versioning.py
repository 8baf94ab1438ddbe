"""Corpus snapshot diff: CDC between two dataset versions.

Training corpora are versioned artifacts; every serious pipeline
answers "what changed between v1 and v2" (how many documents were
added / removed / edited, per source, and how the volume moved)
before retraining on the new snapshot — the Delta Lake
change-data-feed / lakeFS diff operation, expressed as engine-level
algebra: a FULL OUTER hash join of the two snapshots on the primary
key, each row classified added / removed / changed / unchanged by
null-side and null-safe content comparison, then a per-source
conditional aggregate.

The two versions are derived deterministically from the fixture so
the DuckDB oracle can rebuild both sides bit-for-bit: membership in
each snapshot is a 60-bit md5 bucket over the doc_id (~90 % of
documents per snapshot, independently, so both join sides and all
four diff classes are non-empty), and a second bucket marks ~25 % of
documents as edited in v2 (text suffixed, char count moved). In
production both frames are parquet snapshot reads; the derivation
replaces ONE projection each, none of the join or report shape.

Classification is by ACTUAL null-safe text comparison (``IS DISTINCT
FROM``), not by replaying the edit flag — the operator must detect
edits, not assume them.

Scale shape (100 TB story): one full-outer shuffle hash join on the
snapshot PK — and when both snapshots are written bucketed by that
key (sources/bucketing.py), the join is co-located and shuffle-free,
which is how a daily 100 TB diff stays cheap; the per-source report
is a map-side-combined conditional aggregate onto |sources| keys.
Nothing quadratic, no driver collect, raw text scanned once per side.

Reference anchor: SURVEY §2.11 extension; the reference's closest
surface is the idempotent re-load semantics of its ETL
(insertion_dataware.sql ON CONFLICT), which answers "apply the new
snapshot" but not "describe the change" — this operator is the
describe half.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table
from .dedup import h60, sql_h60

_V1_SALT = "snap1-v1"
_V2_SALT = "snap2-v1"
_EDIT_SALT = "edit-v1"
_KEEP_PCT = 90  # each snapshot holds ~90% of the base docs
_EDIT_MOD = 4  # ~25% of v2's docs carry an edit
_EDIT_SUFFIX = " [rev2]"


def _bucket(salt: str) -> Column:
    return F.pmod(
        h60(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )


def snapshot_diff(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Per-source CDC report between two snapshots of the documents
    table (columns doc_id, source, text, n_chars).

    Returns one row per source seen in either snapshot:
    (``source``, ``n_added``, ``n_removed``, ``n_changed``,
    ``n_unchanged``, ``chars_v1``, ``chars_v2``, ``chars_delta``) —
    all BIGINT, ordered by source. ``changed`` means present in both
    with text differing under null-safe comparison.
    """
    a = v1.select(
        F.col("doc_id").alias("a_id"),
        F.col("source").alias("a_source"),
        F.col("text").alias("a_text"),
        F.col("n_chars").alias("a_chars"),
    )
    b = v2.select(
        F.col("doc_id").alias("b_id"),
        F.col("source").alias("b_source"),
        F.col("text").alias("b_text"),
        F.col("n_chars").alias("b_chars"),
    )
    joined = a.join(b, a.a_id == b.b_id, "full_outer")
    cls = (
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("removed"))
        .when(~F.col("a_text").eqNullSafe(F.col("b_text")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    tagged = joined.select(
        F.coalesce("a_source", "b_source").alias("source"),
        cls.alias("cls"),
        F.coalesce(F.col("a_chars").cast("long"), F.lit(0)).alias("chars_v1"),
        F.coalesce(F.col("b_chars").cast("long"), F.lit(0)).alias("chars_v2"),
    )

    def n(label: str) -> Column:
        return F.sum(F.when(F.col("cls") == label, 1).otherwise(0)).cast("long")

    return (
        tagged.groupBy("source")
        .agg(
            n("added").alias("n_added"),
            n("removed").alias("n_removed"),
            n("changed").alias("n_changed"),
            n("unchanged").alias("n_unchanged"),
            F.sum("chars_v1").cast("long").alias("chars_v1"),
            F.sum("chars_v2").cast("long").alias("chars_v2"),
            (F.sum("chars_v2") - F.sum("chars_v1")).cast("long").alias("chars_delta"),
        )
        .orderBy("source")
    )


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    v1 = docs.where(_bucket(_V1_SALT) < _KEEP_PCT)
    edited = F.pmod(
        h60(F.concat(F.lit(_EDIT_SALT + ":"), F.col("doc_id").cast("string"))),
        F.lit(_EDIT_MOD),
    ) == 0
    v2 = docs.where(_bucket(_V2_SALT) < _KEEP_PCT).select(
        "doc_id",
        "source",
        F.when(edited, F.concat(F.col("text"), F.lit(_EDIT_SUFFIX)))
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(edited, F.col("n_chars") + len(_EDIT_SUFFIX))
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    return snapshot_diff(v1, v2)


def _sql_bucket(salt: str) -> str:
    expr = sql_h60(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    return f"{expr} % 100"


ORACLE_SNAPSHOT_DIFF = f"""
WITH base AS (
  SELECT doc_id, source, text, n_chars FROM documents WHERE text IS NOT NULL
),
v1 AS (
  SELECT * FROM base WHERE {_sql_bucket(_V1_SALT)} < {_KEEP_PCT}
),
v2 AS (
  SELECT doc_id, source,
         CASE WHEN {sql_h60(f"'{_EDIT_SALT}:' || CAST(doc_id AS VARCHAR)")}
                   % {_EDIT_MOD} = 0
              THEN text || '{_EDIT_SUFFIX}' ELSE text END AS text,
         CASE WHEN {sql_h60(f"'{_EDIT_SALT}:' || CAST(doc_id AS VARCHAR)")}
                   % {_EDIT_MOD} = 0
              THEN n_chars + {len(_EDIT_SUFFIX)} ELSE n_chars END AS n_chars
  FROM base WHERE {_sql_bucket(_V2_SALT)} < {_KEEP_PCT}
),
tagged AS (
  SELECT COALESCE(a.source, b.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.text IS DISTINCT FROM b.text THEN 'changed'
              ELSE 'unchanged' END AS cls,
         COALESCE(CAST(a.n_chars AS BIGINT), 0) AS chars_v1,
         COALESCE(CAST(b.n_chars AS BIGINT), 0) AS chars_v2
  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT source,
       CAST(SUM(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged,
       CAST(SUM(chars_v1) AS BIGINT) AS chars_v1,
       CAST(SUM(chars_v2) AS BIGINT) AS chars_v2,
       CAST(SUM(chars_v2) - SUM(chars_v1) AS BIGINT) AS chars_delta
FROM tagged
GROUP BY source
ORDER BY source
"""


QUERIES = {"corpus_snapshot_diff": q_corpus_snapshot_diff}
ORACLES = {"corpus_snapshot_diff": ORACLE_SNAPSHOT_DIFF}
