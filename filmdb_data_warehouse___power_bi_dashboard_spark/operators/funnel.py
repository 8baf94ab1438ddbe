"""Event-sequence analytics over ``events``: ordered conversion
funnels and per-user date-spine gap filling — the two event-table
workloads every warehouse dashboard adds on top of plain aggregation
(the reference's closest analog is the weekday-profile view,
vues.sql:308-316, which profiles volume but has no ordering or
completeness semantics).

Scale design:
- The funnel never joins raw events to raw events: each stage reduces
  to a per-user MIN(ts) aggregate FIRST (map-side combined), and the
  stage chaining joins those per-user 1-row frames — shuffle volume
  is O(|users|) per stage, not O(|events|).
- Gap filling builds the day spine from a 1-row min/max aggregate
  (explode(sequence(...)) — the S7 date-spine generator) and
  cross-joins it to the DISTINCT user set; the left join back to
  daily counts is a broadcast of the spine side at any realistic
  horizon (days × users on the build side only when users are few —
  Catalyst picks hash join on (user_id, day) otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel(events: DataFrame, stages: tuple[str, ...] = FUNNEL_STAGES) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage k when an
    event of type ``stages[k]`` exists STRICTLY AFTER the user's
    first qualifying event of stage k-1 (first-touch chaining — the
    standard funnel definition; re-orderings like purchase-then-view
    do not count).

    Output: one row per stage with the user count and the conversion
    percentage relative to stage 1.
    """
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        ev = events.filter(F.col("event_type") == stage).select("user_id", "ts")
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(prev.withColumnRenamed("t", "t_prev"), "user_id")
                .filter(F.col("ts") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        reached.append(cur)
        prev = cur
    counts = [df.agg(F.count(F.lit(1)).alias("n")) for df in reached]
    rows = None
    for i, (stage, cnt) in enumerate(zip(stages, counts)):
        labeled = cnt.select(
            F.lit(i + 1).alias("stage_no"),
            F.lit(stage).alias("stage"),
            F.col("n").alias("n_users"),
        )
        rows = labeled if rows is None else rows.unionByName(labeled)
    base = counts[0].select(F.col("n").alias("n_base"))
    return (
        rows.crossJoin(F.broadcast(base))
        .select(
            "stage_no",
            "stage",
            "n_users",
            round_half_up(
                F.col("n_users") / F.col("n_base") * 100.0, 4
            ).alias("pct_of_first"),
        )
        .orderBy("stage_no")
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(read_table(spark, sf_dir, "events"))


ORACLE_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY 1
),
stacked AS (
  SELECT 1 AS stage_no, 'view' AS stage, COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase', COUNT(*) FROM s3
)
SELECT stage_no, stage, n_users,
       {sql_round_half_up("n_users / (SELECT n_users FROM stacked WHERE stage_no = 1) * 100.0", 4)}
         AS pct_of_first
FROM stacked
ORDER BY stage_no
"""


def gap_filled_daily(events: DataFrame) -> DataFrame:
    """Per-user daily event counts with ZERO-FILLED gaps over the
    corpus's full [min_day, max_day] span — the completeness shape
    every retention/heatmap visual needs (a missing day must render
    as 0, not disappear).

    Keyless (NULL user_id) events are dropped on both engines
    (round-8): a NULL "user" is not an entity to gap-fill, and a NULL
    in the BIGINT key column is unrepresentable under the driver
    comparator. The day SPAN is still computed over all events so the
    spine doesn't shift when a keyless event is the min/max.
    """
    from ..functions.spine import day_spine

    span = events.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    spine = day_spine(span)
    keyed = events.filter(F.col("user_id").isNotNull())
    users = keyed.select("user_id").distinct()
    daily = (
        keyed.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        users.crossJoin(F.broadcast(spine))
        .join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("user_id", "day")
    )


def q_events_gap_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gap_filled_daily(read_table(spark, sf_dir, "events"))


ORACLE_GAP_FILLED = """
WITH span AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
),
spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span
),
users AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
)
SELECT u.user_id, s.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
FROM users u CROSS JOIN spine s
LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day
ORDER BY u.user_id, s.day
"""


def transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered pair of event types, how often does
    the second IMMEDIATELY follow the first in some user's timeline,
    and what fraction of the first type's transitions does that
    represent (``p_next`` — row-stochastic over ``from_type``).

    The canonical session-behavior model behind "users who view
    usually click next" dashboards and next-event prediction
    baselines.

    Scale shape: ONE window partitioned by ``user_id`` (the natural
    shuffle key — millions of small partitions, never a global sort)
    computes LEAD; the pair aggregation map-side combines onto at
    most |types|^2 keys, and the row-normalizing second window runs
    on that k x k frame, not on raw events. Ordering inside a user is
    (ts, event_id) — a total order, so LEAD is deterministic under
    recomputation.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        round_half_up(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(row_tot),
            6,
        ).alias("p_next"),
    ).orderBy("from_type", "to_type")


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transition_matrix(read_table(spark, sf_dir, "events"))


ORACLE_TRANSITIONS = f"""
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       {sql_round_half_up(
           "CAST(n_transitions AS DOUBLE)"
           " / SUM(n_transitions) OVER (PARTITION BY from_type)",
           6,
       )} AS p_next
FROM c ORDER BY from_type, to_type
"""


def conversion_latency(
    events: DataFrame, from_stage: str = "view", to_stage: str = "purchase"
) -> DataFrame:
    """Time-to-convert distribution: for every user who reaches
    ``to_stage`` strictly after their first ``from_stage`` event
    (the funnel's chaining rule), measure first-touch-to-conversion
    latency and report exact percentiles — the "how long does the
    funnel take" companion to the stage-count funnel above.

    Exactness: latency is an integer MICROSECOND delta
    (``unix_micros`` ↔ DuckDB ``date_diff('microsecond', …)``) —
    second-truncating first (unix_timestamp) would disagree with a
    boundary-counting diff whenever timestamps carry sub-second
    parts, which this corpus's do. The only floating ops are the
    percentile interpolation (the Spark ``percentile`` ↔ DuckDB
    ``quantile_cont`` pairing health.robust_value_stats pinned) and
    the final /1e6 reporting divisions.

    Scale shape: two per-user MIN aggregates and one per-user join —
    shuffle O(|users|); the final stats are ONE scalar aggregate
    (exact percentile over the converted-user latencies: sorted
    within a single reduce only over |converted users| values; at
    larger scale swap percentile_approx).
    """
    first = (
        events.filter(F.col("event_type") == from_stage)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    conv = (
        events.filter(F.col("event_type") == to_stage)
        .join(first, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"), F.min("t0").alias("t0"))
    )
    lat = conv.select(
        (F.unix_micros("t1") - F.unix_micros("t0")).alias("us")
    )
    # Zero converters would emit one row of NULL numeric stats — the
    # gate contract bans NULL numerics, so the degenerate case emits
    # ZERO rows instead (the oracle's HAVING mirrors this).
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        round_half_up(F.min("us") / 1000000.0, 4).alias("min_s"),
        round_half_up(F.expr("percentile(us, 0.5)") / 1000000.0, 4).alias("p50_s"),
        round_half_up(F.expr("percentile(us, 0.9)") / 1000000.0, 4).alias("p90_s"),
        round_half_up(
            F.sum("us").cast("double") / F.count(F.lit(1)) / 1000000.0, 4
        ).alias("avg_s"),
        round_half_up(F.max("us") / 1000000.0, 4).alias("max_s"),
    ).filter(F.col("n_converted") > 0)


def q_events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_latency(read_table(spark, sf_dir, "events"))


ORACLE_CONVERSION_LATENCY = f"""
WITH first AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
conv AS (
  SELECT e.user_id, MIN(e.ts) AS t1, MIN(f.t0) AS t0
  FROM events e JOIN first f ON e.user_id = f.user_id AND e.ts > f.t0
  WHERE e.event_type = 'purchase' GROUP BY 1
),
lat AS (
  SELECT date_diff('microsecond', t0, t1) AS us FROM conv
)
SELECT COUNT(*) AS n_converted,
       {sql_round_half_up("MIN(us) / 1000000.0", 4)} AS min_s,
       {sql_round_half_up("quantile_cont(us, 0.5) / 1000000.0", 4)} AS p50_s,
       {sql_round_half_up("quantile_cont(us, 0.9) / 1000000.0", 4)} AS p90_s,
       {sql_round_half_up(
           "CAST(CAST(SUM(us) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0", 4
       )} AS avg_s,
       {sql_round_half_up("MAX(us) / 1000000.0", 4)} AS max_s
FROM lat
HAVING COUNT(*) > 0
"""


def hour_of_week_profile(events: DataFrame) -> DataFrame:
    """The 7x24 activity heatmap plus each cell's chi-square
    uniformity term ((observed − expected)² / expected against the
    uniform 1/168 baseline) — the seasonality diagnostic behind
    load-aware scheduling and bot detection (a genuinely uniform
    traffic source is as suspicious as a single-hour spike). The
    reference's weekday-profile view (vues.sql:308-316) is the
    day-level cut of the same surface.

    All 168 cells are emitted (zero-filled via a generated dow×hour
    spine) so the uniformity terms cover silent hours too. Counts
    are exact integers; expected = n/168 and the chi² term are the
    only floating ops, identical trees on both engines.

    Scale shape: ONE map-side-combined groupBy over a 168-key
    domain; the spine is a literal 168-row cross join of two
    generated sequences.
    """
    from ..runtime import track_persist

    spark = events.sparkSession
    # cells feeds BOTH the spine join and the total aggregate — persist
    # once so the events scan + 168-key agg runs a single time
    # (PERF.md Lesson 20: any frame feeding >=2 downstream aggregates).
    cells = track_persist(
        events.groupBy(
            # ISO day-of-week (1=Mon..7=Sun) on BOTH engines:
            # Spark dayofweek() is 1=Sun — use the ISO formula.
            (((F.dayofweek("ts") + 5) % 7) + 1).alias("dow"),
            F.hour("ts").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .persist()
    )
    spine = spark.range(1, 8).select(F.col("id").alias("dow")).crossJoin(
        spark.range(0, 24).select(F.col("id").alias("hour"))
    )
    total = cells.agg(F.sum("n_events").alias("n_total"))
    e = F.col("n_total").cast("double") / 168.0
    dev = F.col("n_events").cast("double") - e
    return (
        spine.join(cells, ["dow", "hour"], "left")
        .select("dow", "hour", F.coalesce("n_events", F.lit(0)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n_events",
            round_half_up(e, 4).alias("expected"),
            round_half_up(dev * dev / e, 4).alias("chi2_term"),
        )
        .orderBy("dow", "hour")
    )


def q_events_hour_of_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hour_of_week_profile(read_table(spark, sf_dir, "events"))


ORACLE_HOUR_OF_WEEK = f"""
WITH cells AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT d.dow, h.hour
  FROM (SELECT unnest(range(1, 8)) AS dow) d
  CROSS JOIN (SELECT unnest(range(0, 24)) AS hour) h
),
tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n_total FROM cells),
filled AS (
  SELECT s.dow, s.hour, CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
  FROM spine s LEFT JOIN cells c ON s.dow = c.dow AND s.hour = c.hour
)
SELECT dow, hour, n_events,
       {sql_round_half_up("CAST(n_total AS DOUBLE) / 168.0", 4)} AS expected,
       {sql_round_half_up(
           "(CAST(n_events AS DOUBLE) - CAST(n_total AS DOUBLE) / 168.0)"
           " * (CAST(n_events AS DOUBLE) - CAST(n_total AS DOUBLE) / 168.0)"
           " / (CAST(n_total AS DOUBLE) / 168.0)",
           4,
       )} AS chi2_term
FROM filled CROSS JOIN tot
ORDER BY dow, hour
"""


QUERIES = {
    "events_funnel": q_events_funnel,
    "events_gap_filled_daily": q_events_gap_filled_daily,
    "events_transition_matrix": q_events_transition_matrix,
    "events_conversion_latency": q_events_conversion_latency,
    "events_hour_of_week": q_events_hour_of_week,
}

ORACLES = {
    "events_funnel": ORACLE_FUNNEL,
    "events_gap_filled_daily": ORACLE_GAP_FILLED,
    "events_transition_matrix": ORACLE_TRANSITIONS,
    "events_conversion_latency": ORACLE_CONVERSION_LATENCY,
    "events_hour_of_week": ORACLE_HOUR_OF_WEEK,
}
