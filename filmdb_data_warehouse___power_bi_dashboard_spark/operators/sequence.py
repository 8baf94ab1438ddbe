"""Sequential pattern mining: frequent event-type trigrams per session.

Process-mining / behavioral-analytics staple: which 3-step event
sequences actually happen, how often, and across how many users? The
same aggregate feeds next-event prediction features, funnel discovery
(the top trigrams ARE the de-facto funnels), and anomaly screening
(a burst of a never-before-seen sequence). For LLM-agent telemetry it
is the action-trace n-gram table.

Sequences are counted WITHIN sessions (the gap-based session
definition shared with streaming.jobs.sessionize_batch — 30-minute
inactivity break) so a user's Monday and Friday visits don't
concatenate into a fake path. Session numbering, then trigram
formation, are both window functions PARTITIONED BY user (and then
(user, session)) — parallel across users, never a global sort; the
pattern count is one map-side-combined aggregate onto pattern keys
(bounded by |event_type|³, tiny).

Determinism: window order is (ts, event_id) — a unique total order —
and the final ordering (n_occurrences DESC, pattern) is unique, so
the top-K frontier is bit-identical across engines. Counts are
BIGINTs; no floats anywhere.

Scale shape (100 TB story): two window passes over user-partitioned
data (the sessionize shuffle is reused by the trigram window — same
partition key, Catalyst plans one exchange), one aggregate onto a
constant-cardinality key space. At 1000 executors this is
embarrassingly parallel per user; skewed power-users bound the
worst task by their own event count, not the table's.

Reference anchor: SURVEY §2.11 extension over `events`; nearest
reference surface is the rental→return event ordering implicit in
vues.sql's retard views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import read_table

_GAP_MINUTES = 30  # shared session definition (streaming.jobs._GAP_MINUTES)
_TOP_K = 25
_SEP = ">"


def session_trigrams(events: DataFrame, gap_minutes: int = _GAP_MINUTES) -> DataFrame:
    """Top event-type trigrams within gap-based sessions.

    Returns (``pattern``, ``n_occurrences``, ``n_users``) ordered by
    (n_occurrences DESC, pattern), limited to ``_TOP_K``. A trigram is
    three CONSECUTIVE events of one session (sliding, overlapping —
    the standard n-gram convention); sessions shorter than 3 events
    contribute nothing via the non-null LEAD guard.
    """
    # NULL event_type guard: concat_ws would silently SKIP a null leg
    # while the oracle's `||` nulls the whole pattern — drop such rows
    # identically on both sides instead (none in the fixture; the
    # guard is for arbitrary inputs).
    ev = events.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("double")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(epoch - F.lag(epoch, 1).over(w) > float(gap_minutes * 60), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.withColumn("session_no", F.sum("new_session").over(w))
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    tri = sessions.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(ws).alias("e2"),
        F.lead("event_type", 2).over(ws).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        tri.select(
            "user_id",
            F.concat_ws(_SEP, "e1", "e2", "e3").alias("pattern"),
        )
        .groupBy("pattern")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "pattern")
        .limit(_TOP_K)
    )


def q_events_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_trigrams(read_table(spark, sf_dir, "events"))


ORACLE_SEQUENCE_PATTERNS = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
sessions AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM flagged
),
tri AS (
  SELECT user_id,
         event_type AS e1,
         LEAD(event_type, 1) OVER
           (PARTITION BY user_id, session_no ORDER BY ts, event_id) AS e2,
         LEAD(event_type, 2) OVER
           (PARTITION BY user_id, session_no ORDER BY ts, event_id) AS e3
  FROM sessions
)
SELECT e1 || '{_SEP}' || e2 || '{_SEP}' || e3 AS pattern,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM tri
WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n_occurrences DESC, pattern
LIMIT {_TOP_K}
"""


QUERIES = {"events_sequence_patterns": q_events_sequence_patterns}
ORACLES = {"events_sequence_patterns": ORACLE_SEQUENCE_PATTERNS}
