"""Pipeline observability: a one-pass health report over the corpus
tables — the monitoring query a production pipeline schedules after
every ingest (row counts, key-column null rates, key ranges,
duplicate-key counts).

Scale shape: one scan + one tiny aggregate per table (each agg is a
handful of scalar aggregates — map-side partial, 1-row result), then
a union of the per-table rows. Nothing shuffles more than the final
5-row frame; adding a table adds one scan, never a join.

Reference anchor: the reference enforces health declaratively
(NOT NULL, unique business keys, FKs — creationdatwareh.sql:14-109);
Spark enforces none of these, so the engine surfaces the same
invariants as a queryable report instead (SURVEY §1.2).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..functions.spine import sql_day_spine
from ..sources.catalog import read_table

# (table, key column, value column whose null-rate matters)
_HEALTH_TABLES = [
    ("documents", "doc_id", "text"),
    ("events", "event_id", "props"),
    ("embeddings", "vec_id", "embedding"),
    ("orders", "o_orderkey", "o_totalprice"),
    ("customer", "c_custkey", "c_name"),
]


def health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per monitored table: row count, distinct/duplicate key
    counts, key range, and the payload column's null count."""
    parts = []
    for name, key, payload in _HEALTH_TABLES:
        t = read_table(spark, sf_dir, name)
        parts.append(
            t.agg(
                F.lit(name).alias("table_name"),
                F.count("*").alias("n_rows"),
                F.countDistinct(key).alias("n_distinct_keys"),
                (F.count(key) - F.countDistinct(key)).alias("n_dup_keys"),
                F.sum(F.col(key).isNull().cast("int")).alias("n_null_keys"),
                F.min(key).cast("long").alias("min_key"),
                F.max(key).cast("long").alias("max_key"),
                F.sum(F.col(payload).isNull().cast("int")).alias("n_null_payload"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("table_name")


def q_corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return health_report(spark, sf_dir)


def _one(name: str, key: str, payload: str) -> str:
    return f"""
  SELECT '{name}' AS table_name,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT {key}) AS n_distinct_keys,
         COUNT({key}) - COUNT(DISTINCT {key}) AS n_dup_keys,
         CAST(SUM(CASE WHEN {key} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys,
         CAST(MIN({key}) AS BIGINT) AS min_key,
         CAST(MAX({key}) AS BIGINT) AS max_key,
         CAST(SUM(CASE WHEN {payload} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_payload
  FROM {name}"""


ORACLE_HEALTH = (
    "SELECT * FROM (\n"
    + "\n  UNION ALL\n".join(_one(n, k, p) for n, k, p in _HEALTH_TABLES)
    + "\n) ORDER BY table_name"
)


_N_BINS = 20


def value_histogram(events: DataFrame, n_bins: int = _N_BINS) -> DataFrame:
    """Equi-width histogram of ``events.value``: data-driven [min, max]
    range split into ``n_bins`` buckets (the last bucket closed so the
    max lands inside it) — the profiling query behind every BI
    distribution widget and outlier triage.

    Scale shape: the 1-row min/max aggregate broadcasts into a cross
    join (the J4 scalar pattern), then one hash aggregation on a
    bounded key domain (n_bins) — two scans total, no wide shuffle.
    Bucket arithmetic is shared IEEE ops (sub/div/floor/least) so both
    engines bin identically; requires max > min (holds for any
    non-degenerate corpus — a constant column has no histogram).
    """
    vals = events.filter(F.col("value").isNotNull()).select("value")
    stats = vals.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
    bucket = F.least(
        F.floor((F.col("value") - F.col("mn")) / width), F.lit(n_bins - 1)
    ).cast("int")
    return (
        vals.crossJoin(F.broadcast(stats))
        .select(
            bucket.alias("bucket_id"),
            (F.col("mn") + bucket * width).alias("bucket_lo"),
            (F.col("mn") + (bucket + 1) * width).alias("bucket_hi"),
            "value",
        )
        .groupBy("bucket_id", "bucket_lo", "bucket_hi")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            round_half_up(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bucket_id")
    )


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(read_table(spark, sf_dir, "events"))


ORACLE_HISTOGRAM = f"""
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
st AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM v),
b AS (
  SELECT CAST(LEAST(FLOOR((value - mn) / ((mx - mn) / {float(_N_BINS)!r})),
                    {_N_BINS - 1}) AS INT) AS bucket_id,
         mn, mx, value
  FROM v CROSS JOIN st
)
SELECT bucket_id,
       mn + bucket_id * ((mx - mn) / {float(_N_BINS)!r}) AS bucket_lo,
       mn + (bucket_id + 1) * ((mx - mn) / {float(_N_BINS)!r}) AS bucket_hi,
       COUNT(*) AS n_values,
       {sql_round_half_up("SUM(value)", 2)} AS sum_value
FROM b
GROUP BY bucket_id, mn, mx
ORDER BY bucket_id
"""


# ---------------------------------------------------------------------------
# Distribution drift (PSI) — the monitoring op a production pipeline
# runs BETWEEN anomaly detection (single-series spikes) and retraining
# decisions: has this month's value DISTRIBUTION moved vs last month?
# ---------------------------------------------------------------------------

_DRIFT_BINS = 10


def value_drift_psi(events: DataFrame, n_bins: int = _DRIFT_BINS) -> DataFrame:
    """Week-over-week Population Stability Index of ``value``.

    PSI(w) = Σ_bins (p_b − q_b) · ln(p_b / q_b), p = this week's bin
    share, q = previous week's, over GLOBAL equi-width bins (shared
    edges keep weeks comparable) with add-one (Laplace) smoothing so
    empty bins contribute finitely. Conventional reading: < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted.

    Cross-engine exactness (the corr/trend/CUSUM discipline): the only
    transcendental is ln, integer-scaled at the source —
    ``floor(ln(ratio)·1e6)`` — and the (p−q) difference is carried as
    an EXACT integer numerator over the common denominator
    (T_w+B)(T_prev+B). The fold is widened to DECIMAL(38,0) (HUGEINT
    in the oracle): num_p ≈ (c+1)(T'+B) is quadratic in weekly event
    counts, so at production scale the per-term product
    (num_p−num_q)·l_mu exceeds 2^63 — BIGINT would wrap silently in
    Spark and raise in DuckDB. One IEEE division + round at the very
    end (denominator multiplied in double: its bigint product also
    overflows first). A constant-valued week range (mx == mn) maps
    every row to bucket 0 instead of dividing by a zero width, so both
    engines agree on PSI = 0 rather than NaN-vs-error. Scale shape:
    one scan to bin (1-row min/max broadcast), then everything runs on
    the |weeks|×n_bins aggregate — the LAG window partitions by bucket
    over weeks, never over events. (Week, not month: both engines
    truncate to the ISO Monday; the test corpus spans one month but
    five ISO weeks.)
    """
    ev = events.filter(F.col("value").isNotNull()).select(
        F.date_trunc("week", "ts").cast("date").alias("semaine"), "value"
    )
    stats = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
    bucket = F.when(F.col("mx") <= F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("mn")) / width), F.lit(n_bins - 1)
        )
    ).cast("int")
    counts = (
        ev.crossJoin(F.broadcast(stats))
        .groupBy("semaine", bucket.alias("bucket_id"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    spine = (
        counts.select("semaine")
        .distinct()
        .select(
            "semaine",
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bucket_id"),
        )
    )
    full = (
        spine.join(counts, ["semaine", "bucket_id"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)).cast("long"))
    )
    tot = full.groupBy("semaine").agg(F.sum("c").alias("t"))
    full = full.join(F.broadcast(tot), "semaine")
    w = Window.partitionBy("bucket_id").orderBy("semaine")
    lagged = (
        full.withColumn("cp", F.lag("c").over(w))
        .withColumn("tp", F.lag("t").over(w))
        .where(F.col("cp").isNotNull())
    )
    B = F.lit(n_bins).cast("long")
    num_p = (F.col("c") + 1).cast("decimal(19,0)") * (F.col("tp") + B).cast(
        "decimal(19,0)"
    )
    num_q = (F.col("cp") + 1).cast("decimal(19,0)") * (F.col("t") + B).cast(
        "decimal(19,0)"
    )
    l_mu = F.floor(F.log(num_p.cast("double") / num_q.cast("double")) * 1e6).cast(
        "long"
    )
    term = (num_p - num_q) * l_mu.cast("decimal(9,0)")
    return (
        lagged.groupBy("semaine", "t", "tp")
        .agg(F.sum(term).alias("__s"), F.sum("c").alias("n_events"))
        .select(
            "semaine",
            F.col("n_events"),
            round_half_up(
                F.col("__s").cast("double")
                / ((F.col("t") + B).cast("double") * (F.col("tp") + B).cast("double"))
                / 1e6,
                6,
            ).alias("psi"),
        )
        .orderBy("semaine")
    )


def q_events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_drift_psi(read_table(spark, sf_dir, "events"))


ORACLE_VALUE_DRIFT = f"""
WITH v AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS semaine, value
  FROM events WHERE value IS NOT NULL
),
st AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM v),
binned AS (
  SELECT semaine,
         CAST(CASE WHEN mx <= mn THEN 0
              ELSE LEAST(FLOOR((value - mn) / ((mx - mn) / {float(_DRIFT_BINS)!r})),
                         {_DRIFT_BINS - 1}) END AS INT) AS bucket_id
  FROM v CROSS JOIN st
),
counts AS (
  SELECT semaine, bucket_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM binned GROUP BY 1, 2
),
spine AS (
  SELECT m.semaine, g.bucket_id
  FROM (SELECT DISTINCT semaine FROM counts) m
  CROSS JOIN (SELECT unnest(generate_series(0, {_DRIFT_BINS - 1})) AS bucket_id) g
),
filled AS (
  SELECT s.semaine, s.bucket_id, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
  FROM spine s LEFT JOIN counts c
    ON c.semaine = s.semaine AND c.bucket_id = s.bucket_id
),
tot AS (SELECT semaine, CAST(SUM(c) AS BIGINT) AS t FROM filled GROUP BY 1),
joined AS (
  SELECT f.semaine, f.bucket_id, f.c, tot.t,
         LAG(f.c) OVER (PARTITION BY f.bucket_id ORDER BY f.semaine) AS cp,
         LAG(tot.t) OVER (PARTITION BY f.bucket_id ORDER BY f.semaine) AS tp
  FROM filled f JOIN tot ON tot.semaine = f.semaine
),
terms AS (
  SELECT semaine, t, tp, c,
         CAST(c + 1 AS HUGEINT) * (tp + {_DRIFT_BINS}) AS num_p,
         CAST(cp + 1 AS HUGEINT) * (t + {_DRIFT_BINS}) AS num_q
  FROM joined WHERE cp IS NOT NULL
),
scaled AS (
  SELECT semaine, t, tp, c,
         CAST(FLOOR(ln(CAST(num_p AS DOUBLE) / CAST(num_q AS DOUBLE)) * 1e6)
              AS BIGINT) * (num_p - num_q) AS term
  FROM terms
)
SELECT semaine,
       CAST(SUM(c) AS BIGINT) AS n_events,
       {sql_round_half_up(
           "CAST(SUM(term) AS DOUBLE)"
           f" / (CAST(t + {_DRIFT_BINS} AS DOUBLE) * CAST(tp + {_DRIFT_BINS} AS DOUBLE))"
           " / 1e6",
           6)} AS psi
FROM scaled
GROUP BY semaine, t, tp
ORDER BY semaine
"""


def join_key_skew_profile(
    fact: DataFrame, key: str = "l_suppkey", top_n: int = 10
) -> DataFrame:
    """Frequency profile of a join key: the top hot keys with their
    row share — the diagnostic run BEFORE choosing a skew mitigation
    (functions/skew.py salting, AQE skew-join thresholds). A hot key
    holding >1/n_partitions of the rows is the straggler predictor.

    Scale shape: one hash aggregation on the key (map-side combined),
    a 1-row total broadcast into the share division, TakeOrdered for
    the top-n — no sort of the full key distribution.
    """
    counts = fact.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = fact.agg(
        F.count(F.lit(1)).alias("total_rows"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key_value",
            "n_rows",
            round_half_up(
                F.col("n_rows") / F.col("total_rows") * 100.0, 4
            ).alias("share_pct"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key_value"))
        .limit(top_n)
    )


def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return join_key_skew_profile(read_table(spark, sf_dir, "lineitem"))


ORACLE_SKEW_PROFILE = f"""
WITH c AS (
  SELECT l_suppkey AS key_value, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
),
t AS (SELECT COUNT(*) AS total_rows FROM lineitem)
SELECT key_value, n_rows,
       {sql_round_half_up("n_rows / total_rows * 100.0", 4)} AS share_pct
FROM c CROSS JOIN t
ORDER BY n_rows DESC, key_value ASC
LIMIT 10
"""


def robust_value_stats(events: DataFrame) -> DataFrame:
    """Winsorized (clipped) robust statistics of ``events.value`` per
    event type: p05/p95 bounds, then mean and population stddev of the
    values clipped to those bounds — the outlier-resistant profile a
    curation pipeline trusts over raw moments.

    Exactness: values are scaled to integer cents (floor(v*100+0.5) —
    exact in both engines), so every SUM is an order-independent
    BIGINT; the only floating ops are the percentile interpolation and
    the final mean/variance divisions, identical IEEE sequences in
    Spark's ``percentile`` and DuckDB's ``quantile_cont``.

    Scale shape: two grouped aggregations over a bounded key domain
    (event types) joined back by broadcast — percentiles are exact
    (sort within group); at larger group cardinality swap in the
    approx-sketch twin (approx_month_profile's percentile_approx).
    """
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = events.filter(F.col("value").isNotNull()).select(
        "event_type", cents.alias("vc")
    )
    bounds = base.groupBy("event_type").agg(
        F.expr("percentile(vc, 0.05)").alias("p05"),
        F.expr("percentile(vc, 0.95)").alias("p95"),
    )
    clipped = (
        base.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            "p05",
            "p95",
            F.least(F.greatest(F.col("vc").cast("double"), F.col("p05")), F.col("p95")).alias("w"),
        )
    )
    # w is a double holding either an exact integer (clipped to vc) or
    # the interpolated bound — sum order still matters in principle,
    # so accumulate the two parts separately: exact BIGINT sums of the
    # interior values, counts of rows pinned to each bound.
    # A row pinned to a bound counts in exactly ONE bucket: when the
    # distribution is degenerate (p05 == p95, e.g. a constant column)
    # every row equals both bounds — double-counting them would double
    # the mean and drive the variance negative.
    agg = clipped.groupBy("event_type", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("w") == F.col("p05"), 1).otherwise(0)).alias("n_lo"),
        F.sum(
            F.when(
                (F.col("w") == F.col("p95")) & (F.col("p95") != F.col("p05")), 1
            ).otherwise(0)
        ).alias("n_hi"),
        F.sum(
            F.when(
                (F.col("w") != F.col("p05")) & (F.col("w") != F.col("p95")),
                F.col("w").cast("long"),
            ).otherwise(F.lit(0))
        ).alias("s_mid"),
        F.sum(
            F.when(
                (F.col("w") != F.col("p05")) & (F.col("w") != F.col("p95")),
                F.col("w").cast("long") * F.col("w").cast("long"),
            ).otherwise(F.lit(0))
        ).alias("s2_mid"),
    )
    s1 = F.col("s_mid") + F.col("n_lo") * F.col("p05") + F.col("n_hi") * F.col("p95")
    s2 = (
        F.col("s2_mid")
        + F.col("n_lo") * F.col("p05") * F.col("p05")
        + F.col("n_hi") * F.col("p95") * F.col("p95")
    )
    mean = s1 / F.col("n")
    var = s2 / F.col("n") - mean * mean
    return agg.select(
        "event_type",
        "n",
        round_half_up(F.col("p05") / 100.0, 4).alias("p05_value"),
        round_half_up(F.col("p95") / 100.0, 4).alias("p95_value"),
        round_half_up(mean / 100.0, 4).alias("winsor_mean"),
        round_half_up(F.sqrt(var) / 100.0, 4).alias("winsor_std"),
    ).orderBy("event_type")


def q_robust_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return robust_value_stats(read_table(spark, sf_dir, "events"))


ORACLE_ROBUST_STATS = f"""
WITH base AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT event_type,
         quantile_cont(vc, 0.05) AS p05,
         quantile_cont(vc, 0.95) AS p95
  FROM base GROUP BY 1
),
clipped AS (
  SELECT b.event_type, p05, p95,
         LEAST(GREATEST(CAST(vc AS DOUBLE), p05), p95) AS w
  FROM base b JOIN bounds USING (event_type)
),
agg AS (
  SELECT event_type, p05, p95,
         COUNT(*) AS n,
         SUM(CASE WHEN w = p05 THEN 1 ELSE 0 END) AS n_lo,
         SUM(CASE WHEN w = p95 AND p95 <> p05 THEN 1 ELSE 0 END) AS n_hi,
         CAST(SUM(CASE WHEN w <> p05 AND w <> p95 THEN CAST(w AS BIGINT) ELSE 0 END) AS BIGINT) AS s_mid,
         CAST(SUM(CASE WHEN w <> p05 AND w <> p95 THEN CAST(w AS BIGINT) * CAST(w AS BIGINT) ELSE 0 END) AS BIGINT) AS s2_mid
  FROM clipped GROUP BY 1, 2, 3
)
SELECT event_type, n,
       {sql_round_half_up("p05 / 100.0", 4)} AS p05_value,
       {sql_round_half_up("p95 / 100.0", 4)} AS p95_value,
       {sql_round_half_up("(s_mid + n_lo * p05 + n_hi * p95) / n / 100.0", 4)} AS winsor_mean,
       {sql_round_half_up(
           "sqrt((s2_mid + n_lo * p05 * p05 + n_hi * p95 * p95) / n"
           " - ((s_mid + n_lo * p05 + n_hi * p95) / n)"
           " * ((s_mid + n_lo * p05 + n_hi * p95) / n)) / 100.0", 4)} AS winsor_std
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Exponential time-decay aggregation (recency-weighted measures)
# ---------------------------------------------------------------------------

_HALF_LIFE_DAYS = 7.0
_LN2 = 0.6931471805599453  # repr(math.log(2.0)) — shared literal


def time_decay_agg(
    events: DataFrame, half_life_days: float = _HALF_LIFE_DAYS
) -> DataFrame:
    """Recency-weighted rollup per event type: each event's value is
    discounted by 2^(-age/half_life) where age is measured from the
    corpus's newest timestamp — the decayed sums BI freshness scores,
    trending widgets and feature-store recency features are built on.

    Determinism contract: ages are exact BIGINT microsecond deltas
    (``unix_micros`` / ``epoch_us`` — no sub-second truncation), the
    per-row decayed weight is rounded onto a 1e-6 integer grid before
    the sum, and both sums reduce in exact BIGINT arithmetic —
    partition-order independent, bit-stable across engines.

    Scale shape: a 1-row max(ts) aggregate broadcast into a cross join
    (J4 scalar pattern), then ONE map-side-combined hash aggregation on
    the bounded event_type domain. Two scans, no wide shuffle; at 100 TB
    the reference timestamp would come from the ingest watermark instead
    of a corpus max, removing the first scan entirely.
    """
    hl = float(half_life_days)
    base = events.filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
    ref = base.agg(F.max("ts").alias("ref_ts"))
    age_days = (
        F.unix_micros(F.col("ref_ts")) - F.unix_micros(F.col("ts"))
    ).cast("double") / F.lit(86400000000.0)
    decay = F.exp(F.lit(-_LN2) * age_days / F.lit(hl))
    w6 = F.floor(F.col("value") * decay * 1e6 + F.lit(0.5)).cast("long")
    v6 = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    return (
        base.crossJoin(F.broadcast(ref))
        .select("event_type", w6.alias("w"), v6.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(F.sum("v").cast("double") / F.lit(1e6), 4).alias(
                "sum_value"
            ),
            round_half_up(F.sum("w").cast("double") / F.lit(1e6), 4).alias(
                "decayed_sum"
            ),
        )
        .orderBy("event_type")
    )


def q_events_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_decay_agg(read_table(spark, sf_dir, "events"))


ORACLE_TIME_DECAY = f"""
WITH base AS (
  SELECT event_type, ts, value FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
),
ref AS (SELECT MAX(ts) AS ref_ts FROM base),
w AS (
  SELECT event_type,
         CAST(FLOOR(value * exp({-_LN2!r}
                * (CAST(epoch_us(ref_ts) - epoch_us(ts) AS DOUBLE)
                   / 86400000000.0) / {_HALF_LIFE_DAYS!r})
                * 1000000.0 + 0.5) AS BIGINT) AS w,
         CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM base CROSS JOIN ref
)
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_round_half_up("CAST(SUM(v) AS DOUBLE) / 1000000.0", 4)} AS sum_value,
       {sql_round_half_up("CAST(SUM(w) AS DOUBLE) / 1000000.0", 4)} AS decayed_sum
FROM w
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# MAD-based daily anomaly detection
# ---------------------------------------------------------------------------

_MAD_K = 3.0
_MAD_CONSISTENCY = 1.4826  # normal-consistency constant for MAD->sigma


def anomaly_days(events: DataFrame, k: float = _MAD_K) -> DataFrame:
    """Days whose total event value deviates from the median by more
    than ``k`` robust sigmas (MAD · 1.4826) — the outlier-day monitor
    a pipeline runs before trusting a day's data for training or
    reporting. Median/MAD instead of mean/stddev so one bad day
    can't mask itself by inflating the threshold (the failure mode
    of daily_zscore's moments on contaminated data).

    Exactness: daily totals are integer cents (exact BIGINT sums);
    median and MAD are exact percentile interpolations over the
    ~|days| aggregate, and the robust z is a fixed IEEE op sequence.
    A zero MAD (constant series) flags nothing rather than dividing
    by zero.

    Scale shape: ONE map-side-combined groupBy(day); the median/MAD
    pass runs over |days| rows (one scalar aggregate, broadcast
    back); nothing else touches raw events.
    """
    from ..runtime import track_persist

    # daily feeds three jobs (median, MAD, final output) — persist
    # the |days|-row aggregate so raw events scan exactly once.
    daily = track_persist(
        events.filter(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "cents"
            )
        )
        .persist()
    )
    med = daily.agg(F.expr("percentile(cents, 0.5)").alias("med"))
    with_med = daily.crossJoin(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("cents").cast("double") - F.col("med"))
    )
    mad = with_med.agg(F.expr("percentile(abs_dev, 0.5)").alias("mad"))
    return (
        with_med.crossJoin(F.broadcast(mad))
        .filter(
            (F.col("mad") > 0.0)
            & (F.col("abs_dev") > F.lit(k) * F.lit(_MAD_CONSISTENCY) * F.col("mad"))
        )
        .select(
            "day",
            round_half_up(F.col("cents") / 100.0, 4).alias("day_value"),
            round_half_up(F.col("med") / 100.0, 4).alias("median_value"),
            round_half_up(
                F.col("abs_dev") / (F.lit(_MAD_CONSISTENCY) * F.col("mad")), 4
            ).alias("robust_z"),
        )
        .orderBy("day")
    )


def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_days(read_table(spark, sf_dir, "events"))


ORACLE_ANOMALY_DAYS = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
med AS (SELECT quantile_cont(cents, 0.5) AS med FROM daily),
dev AS (
  SELECT day, cents, med, abs(CAST(cents AS DOUBLE) - med) AS abs_dev
  FROM daily CROSS JOIN med
),
mad AS (SELECT quantile_cont(abs_dev, 0.5) AS mad FROM dev)
SELECT day,
       {sql_round_half_up("cents / 100.0", 4)} AS day_value,
       {sql_round_half_up("med / 100.0", 4)} AS median_value,
       {sql_round_half_up(f"abs_dev / ({_MAD_CONSISTENCY!r} * mad)", 4)} AS robust_z
FROM dev CROSS JOIN mad
WHERE mad > 0.0 AND abs_dev > {_MAD_K * _MAD_CONSISTENCY!r} * mad
ORDER BY day
"""
# ^ k·consistency pre-multiplied in Python: DuckDB would otherwise
# evaluate 3.0 * 1.4826 as EXACT decimals (4.4478) — a potentially
# different double than Spark's fold of the two double literals.


# ---------------------------------------------------------------------------
# CUSUM change-point detection (structural shift, not point outliers)
# ---------------------------------------------------------------------------


def changepoint_day(events: DataFrame) -> DataFrame:
    """The single most likely LEVEL-SHIFT day in the daily value
    series, by the classic CUSUM statistic: the day t maximizing
    |Σ_{i≤t} x_i − t·x̄| — where the cumulative deviation from the
    global mean peaks, the series most plausibly changed regime.
    Complements events_anomaly_days: MAD flags isolated spikes, CUSUM
    finds persistent shifts that no single day makes anomalous.

    Exactness: |S_t − t·S_n/n| is rescaled by n to
    |n·S_t − t·S_n| — ALL integer arithmetic (daily cents sums, their
    cumulative sum, and two products), so the argmax is exact and the
    only floating op is the final reporting division. A float
    cumulative sum would be accumulation-order-dependent; the integer
    one is not.

    The daily series is ZERO-FILLED over the full day span: a
    skipped empty day would compress the t index and hide the most
    interesting regime change of all — activity stopping. Same
    bias argument as the trend/correlation spines.

    Overflow bound (same Σt·y hazard trend.py documents): the
    statistic needs n_days · S_n < 2^63 where S_n is the TOTAL cents;
    e.g. 1e12 cents/day over 10 years (S_n ≈ 3.7e15, product ≈
    1.3e19) crosses it — and Spark's non-ANSI BIGINT wraps silently
    while DuckDB errors. Past the horizon, pre-scale the unit
    (dollars instead of cents) before calling.

    Scale shape: one map-side-combined groupBy(day); the spine join
    and cumulative window run over the bounded |days| aggregate (the
    documented exception); the argmax is a 1-row TakeOrdered. Ties
    break toward the earliest day.
    """
    from ..functions.spine import day_spine
    from ..runtime import track_persist

    observed = events.filter(F.col("value").isNotNull()).select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    per_day = observed.groupBy("day").agg(F.sum("c").alias("cents"))
    span = observed.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    daily = track_persist(
        day_spine(span)
        .join(per_day, "day", "left")
        .select("day", F.coalesce("cents", F.lit(0)).alias("cents"))
        .persist()
    )
    totals = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("cents").alias("s_n")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        daily.withColumn("s_t", F.sum("cents").over(w))
        .withColumn("t", F.row_number().over(Window.orderBy("day")))
        .crossJoin(F.broadcast(totals))
        .select(
            "day",
            "n_days",
            (
                F.abs(
                    F.col("n_days") * F.col("s_t") - F.col("t") * F.col("s_n")
                )
            ).alias("cusum_scaled"),
        )
    )
    return (
        scored.orderBy(F.desc("cusum_scaled"), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            round_half_up(
                F.col("cusum_scaled").cast("double")
                / F.col("n_days")
                / 100.0,
                4,
            ).alias("cusum_peak"),
        )
    )


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changepoint_day(read_table(spark, sf_dir, "events"))


_SQL_SPINE = sql_day_spine("d0", "d1")

ORACLE_CHANGEPOINT = f"""
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM per_day),
spine AS ({_SQL_SPINE} FROM span),
daily AS (
  SELECT s.day, CAST(COALESCE(p.cents, 0) AS BIGINT) AS cents
  FROM spine s LEFT JOIN per_day p ON p.day = s.day
),
tot AS (
  SELECT COUNT(*) AS n_days, CAST(SUM(cents) AS BIGINT) AS s_n FROM daily
),
scored AS (
  SELECT day, n_days,
         abs(n_days * CAST(SUM(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             - ROW_NUMBER() OVER (ORDER BY day) * s_n) AS cusum_scaled
  FROM daily CROSS JOIN tot
)
SELECT day AS changepoint_day,
       {sql_round_half_up(
           "CAST(cusum_scaled AS DOUBLE) / n_days / 100.0", 4
       )} AS cusum_peak
FROM scored
ORDER BY cusum_scaled DESC, day ASC
LIMIT 1
"""


_KS_RECENT_DAYS = 7
_KS_SCALE = 1_000_000
_KS_CRIT_95 = 1.358  # two-sample KS critical coefficient at alpha=0.05


def ks_drift(events: DataFrame, recent_days: int = _KS_RECENT_DAYS) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift test: the last
    ``recent_days`` of events vs everything before.

    PSI (events_value_drift) needs binning by construction; KS is the
    binning-free classic — but its exact form needs the max over a
    GLOBAL cumulative distribution, which at corpus scale means a
    global sort. The scalable spelling, used here: evaluate the ECDFs
    on the integer value grid floor(value) — a BOUNDED set of
    evaluation points — so the cumulative pass runs on a frame of at
    most |value range| rows (≤ ~600 on the fixture; a design
    parameter, not data-sized). On that grid the statistic is EXACT
    integer arithmetic:

        D = max over grid points g of |R(g)·n_ref − F(g)·n_recent|
            / (n_recent·n_ref)

    with R/F the cumulative counts. The grid coarseness is part of the
    output contract: the statistic is named ``d_stat_grid`` because it
    is the exact KS statistic OF THE FLOORED DISTRIBUTIONS, which lower-
    bounds (can understate) the continuous-value KS statistic when a
    shift happens entirely inside a unit-wide bin — the price of a
    bounded evaluation grid. A caller needing the exact continuous
    statistic must accept a distinct-value-sized (data-sized) cumsum
    frame; at corpus scale that is the wrong default, so the grid form
    is the published one. The numerator is widened to
    DECIMAL(38,0)/HUGEINT (c·n products overflow BIGINT at production
    scale — the events_value_drift lesson); the single max row is
    converted to double once for the reported statistic. The 95 %
    critical value 1.358·√((n₁+n₂)/(n₁·n₂)) is computed from the same
    integers by identical IEEE ops on both engines.

    Returns ONE row: (``n_recent``, ``n_ref``, ``d_stat_grid``,
    ``ks_crit_95``, ``drift``). Scale shape: one scan with a
    broadcast 1-row max-ts frame, map-side-combined groupBy onto the
    bounded grid, the cumsum window on the tiny grid frame, one max.
    """
    ev = events.where(F.col("value").isNotNull()).select("ts", "value")
    mx = ev.agg(F.max("ts").alias("mx"))
    tagged = ev.crossJoin(F.broadcast(mx)).select(
        (F.col("ts") >= F.expr(f"mx - INTERVAL {recent_days} DAYS")).alias("recent"),
        F.floor("value").cast("int").alias("g"),
    )
    grid = tagged.groupBy("g").agg(
        F.sum(F.when(F.col("recent"), 1).otherwise(0)).cast("long").alias("c_r"),
        F.sum(F.when(~F.col("recent"), 1).otherwise(0)).cast("long").alias("c_f"),
    )
    w = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grid.select(
        F.sum("c_r").over(w).alias("cum_r"),
        F.sum("c_f").over(w).alias("cum_f"),
    )
    totals = grid.agg(
        F.sum("c_r").cast("long").alias("n_recent"),
        F.sum("c_f").cast("long").alias("n_ref"),
    )
    num = cum.crossJoin(F.broadcast(totals)).select(
        "n_recent",
        "n_ref",
        F.abs(
            F.col("cum_r").cast("decimal(38,0)") * F.col("n_ref")
            - F.col("cum_f").cast("decimal(38,0)") * F.col("n_recent")
        ).alias("num"),
    )
    d = (
        F.col("max_num").cast("double")
        / (F.col("n_recent").cast("double") * F.col("n_ref").cast("double"))
    )
    crit = _KS_CRIT_95 * F.sqrt(
        (F.col("n_recent") + F.col("n_ref")).cast("double")
        / (F.col("n_recent").cast("double") * F.col("n_ref").cast("double"))
    )
    return (
        num.groupBy("n_recent", "n_ref")
        .agg(F.max("num").alias("max_num"))
        .select(
            "n_recent",
            "n_ref",
            round_half_up(d, 6).alias("d_stat_grid"),
            round_half_up(crit, 6).alias("ks_crit_95"),
            (d > crit).alias("drift"),
        )
    )


def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_drift(read_table(spark, sf_dir, "events"))


ORACLE_KS_DRIFT = f"""
WITH ev AS (
  SELECT ts, value FROM events WHERE value IS NOT NULL
),
mx AS (SELECT MAX(ts) AS mx FROM ev),
tagged AS (
  SELECT (ts >= mx - INTERVAL {_KS_RECENT_DAYS} DAYS) AS recent,
         CAST(FLOOR(value) AS INT) AS g
  FROM ev CROSS JOIN mx
),
grid AS (
  SELECT g,
         CAST(SUM(CASE WHEN recent THEN 1 ELSE 0 END) AS BIGINT) AS c_r,
         CAST(SUM(CASE WHEN recent THEN 0 ELSE 1 END) AS BIGINT) AS c_f
  FROM tagged GROUP BY g
),
totals AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS n_recent,
         CAST(SUM(c_f) AS BIGINT) AS n_ref
  FROM grid
),
cum AS (
  SELECT SUM(c_r) OVER (ORDER BY g
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_r,
         SUM(c_f) OVER (ORDER BY g
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_f
  FROM grid
),
m AS (
  SELECT t.n_recent, t.n_ref,
         MAX(ABS(CAST(c.cum_r AS HUGEINT) * t.n_ref
                 - CAST(c.cum_f AS HUGEINT) * t.n_recent)) AS max_num
  FROM cum c CROSS JOIN totals t
  GROUP BY t.n_recent, t.n_ref
)
SELECT n_recent, n_ref,
       {sql_round_half_up(
           "CAST(max_num AS DOUBLE)"
           " / (CAST(n_recent AS DOUBLE) * CAST(n_ref AS DOUBLE))", 6)}
         AS d_stat_grid,
       {sql_round_half_up(
           f"{_KS_CRIT_95!r} * sqrt(CAST(n_recent + n_ref AS DOUBLE)"
           " / (CAST(n_recent AS DOUBLE) * CAST(n_ref AS DOUBLE)))", 6)}
         AS ks_crit_95,
       (CAST(max_num AS DOUBLE)
          / (CAST(n_recent AS DOUBLE) * CAST(n_ref AS DOUBLE)))
         > ({_KS_CRIT_95!r} * sqrt(CAST(n_recent + n_ref AS DOUBLE)
              / (CAST(n_recent AS DOUBLE) * CAST(n_ref AS DOUBLE)))) AS drift
FROM m
"""


QUERIES = {
    "corpus_health_report": q_corpus_health_report,
    "events_time_decay": q_events_time_decay,
    "events_value_histogram": q_events_value_histogram,
    "events_value_drift": q_events_value_drift,
    "join_key_skew_profile": q_join_key_skew_profile,
    "robust_value_stats": q_robust_value_stats,
    "events_anomaly_days": q_events_anomaly_days,
    "events_changepoint": q_events_changepoint,
    "events_ks_drift": q_events_ks_drift,
}

ORACLES = {
    "corpus_health_report": ORACLE_HEALTH,
    "events_time_decay": ORACLE_TIME_DECAY,
    "events_value_histogram": ORACLE_HISTOGRAM,
    "events_value_drift": ORACLE_VALUE_DRIFT,
    "join_key_skew_profile": ORACLE_SKEW_PROFILE,
    "robust_value_stats": ORACLE_ROBUST_STATS,
    "events_anomaly_days": ORACLE_ANOMALY_DAYS,
    "events_changepoint": ORACLE_CHANGEPOINT,
    "events_ks_drift": ORACLE_KS_DRIFT,
}
