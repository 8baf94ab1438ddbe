"""Statistical modeling in pure DataFrame algebra: Pearson
correlation between daily event-type volumes and least-squares trend
slopes of daily revenue per nation — the "is this metric moving and
with what" layer above the descriptive reports.

Neither uses the engines' built-in ``corr``/``regr_slope``
aggregates: their internal accumulation orders differ between Spark
and DuckDB (streaming covariance updates), so the results are only
approximately equal. Instead both operators accumulate the five
classic power sums (n, Σx, Σy, Σxy, Σx², Σy²) as EXACT integers
(counts / day indexes / 1e-4-dollar revenue units — all
order-independent BIGINT sums), convert once to double, and evaluate
the closed-form formulas as the same IEEE expression tree on both
engines — bit-identical before the final rounding.

Scale shape (both): one map-side-combined aggregate onto a bounded
key domain (event types x days, nations x days), a zero-fill against
a generated spine (missing day = genuinely zero events/revenue — a
correlation or slope over only-observed days is biased), and a final
aggregate onto |type pairs| resp. |nations| keys. Nothing wide
touches raw facts twice.

Overflow note: Σxy as BIGINT is exact while Σ_t t·y_t < 2^63; with
day index t < n and daily values ≤ Y units that bound is
n²·Y/2 < 9.2e18 — e.g. Y = 1e12 units (1e8 dollars/day) holds to
n ≈ 4,300 days (~12 years), Y = 1e14 only to ~430 days. Past the
horizon, pre-scale y's unit (dollars instead of 1e-4 dollars) —
Spark's non-ANSI BIGINT overflow WRAPS silently, it does not error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..functions.spine import day_spine, sql_day_spine
from ..runtime import track_persist
from ..sources.catalog import read_table
from .dedup import h60

# ---------------------------------------------------------------------------
# Pearson correlation between daily event-type volumes
# ---------------------------------------------------------------------------


def type_volume_correlation(events: DataFrame) -> DataFrame:
    """For every pair of event types, the Pearson correlation of
    their ZERO-FILLED daily counts — "do purchases move with views"
    across the corpus' day span.

    Pairs with a constant series (zero variance) are excluded — the
    correlation is undefined and emitting NULL would violate the
    gate's no-NULL-numerics contract.
    """
    base = events.select(F.to_date("ts").alias("day"), "event_type")
    daily = base.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    span = base.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    types = base.select("event_type").distinct()
    # filled feeds BOTH legs of the pair self-join — persist the
    # |days|x|types| frame so raw events scan once, not per leg.
    filled = track_persist(
        day_spine(span)
        .crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
        .persist()
    )
    a = filled.select(
        "day", F.col("event_type").alias("type_a"), F.col("n").alias("xa")
    )
    b = filled.select(
        "day", F.col("event_type").alias("type_b"), F.col("n").alias("xb")
    )
    sums = (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("xa").alias("sx"),
            F.sum("xb").alias("sy"),
            F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
            F.sum(F.col("xa") * F.col("xa")).alias("sx2"),
            F.sum(F.col("xb") * F.col("xb")).alias("sy2"),
        )
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov_n = nd * F.col("sxy").cast("double") - sx * sy
    var_x = nd * F.col("sx2").cast("double") - sx * sx
    var_y = nd * F.col("sy2").cast("double") - sy * sy
    return (
        sums.filter((var_x > 0.0) & (var_y > 0.0))
        .select(
            "type_a",
            "type_b",
            "n_days",
            round_half_up(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias(
                "pearson_r"
            ),
        )
        .orderBy("type_a", "type_b")
    )


def q_events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return type_volume_correlation(read_table(spark, sf_dir, "events"))


_SQL_CORR_COV = (
    "(CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_SQL_CORR_VX = (
    "(CAST(n_days AS DOUBLE) * CAST(sx2 AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_SQL_CORR_VY = (
    "(CAST(n_days AS DOUBLE) * CAST(sy2 AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
)

ORACLE_TYPE_CORRELATION = f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS day, event_type FROM events
),
daily AS (
  SELECT day, event_type, COUNT(*) AS n FROM base GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM base),
spine AS ({sql_day_spine("d0", "d1")} FROM span),
types AS (SELECT DISTINCT event_type FROM base),
filled AS (
  SELECT s.day, t.event_type, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
  FROM spine s CROSS JOIN types t
  LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
),
sums AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_days,
         CAST(SUM(a.n) AS BIGINT) AS sx,
         CAST(SUM(b.n) AS BIGINT) AS sy,
         CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
         CAST(SUM(a.n * a.n) AS BIGINT) AS sx2,
         CAST(SUM(b.n * b.n) AS BIGINT) AS sy2
  FROM filled a
  JOIN filled b ON a.day = b.day AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_days,
       {sql_round_half_up(
           f"{_SQL_CORR_COV} / (sqrt({_SQL_CORR_VX}) * sqrt({_SQL_CORR_VY}))", 6
       )} AS pearson_r
FROM sums
WHERE {_SQL_CORR_VX} > 0.0 AND {_SQL_CORR_VY} > 0.0
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# Least-squares daily revenue trend per nation
# ---------------------------------------------------------------------------


def nation_revenue_trend(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation least-squares slope of ZERO-FILLED daily revenue
    over the order-date span — "which markets are growing" as a
    number instead of a chart.

    Revenue stays exact integers end to end: extended price has two
    decimals and the discount rate two, so
    ``price_cents · (100 − discount_bp)`` is an exact BIGINT in
    1e-4-dollar units; the day index x is the datediff from the span
    start. The slope formula runs once on the five exact power sums.
    """
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    rev_u = F.col("rev_u")
    # Prices/discounts are stored as DOUBLE in this corpus — a bare
    # cast after *100 would TRUNCATE on Spark but ROUND on DuckDB;
    # the floor(x*100 + 0.5) device is exact and engine-identical.
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc_bp = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    li = lineitem.select(
        "l_orderkey", (cents * (F.lit(100) - disc_bp)).alias("rev_u")
    )
    # per_day feeds the distinct-nations pass AND the left join —
    # persist so the three-table join pipeline runs once.
    per_day = track_persist(
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_orderdate").alias("day"))
        .agg(F.sum(rev_u).alias("rev"))
        .persist()
    )
    span = o.agg(F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1"))
    nations = per_day.select("nation").distinct()
    filled = (
        day_spine(span, keep=("d0",))
        .crossJoin(F.broadcast(nations))
        .join(per_day, ["nation", "day"], "left")
        .select(
            "nation",
            F.datediff("day", "d0").cast("long").alias("x"),
            F.coalesce("rev", F.lit(0)).alias("y"),
        )
    )
    sums = filled.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    den = nd * F.col("sx2").cast("double") - sx * sx
    slope_u = (nd * F.col("sxy").cast("double") - sx * sy) / den
    # den == 0 (single-day span) would be NULL on Spark but inf on
    # DuckDB — exclude the degenerate row, mirroring the correlation
    # operator's variance guard.
    return (
        sums.filter(den > 0.0)
        .select(
            "nation",
            "n_days",
            round_half_up(sy / nd / 10000.0, 4).alias("avg_daily_revenue"),
            round_half_up(slope_u / 10000.0, 6).alias("trend_per_day"),
        )
        .orderBy("nation")
    )


def q_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nation_revenue_trend(
        read_table(spark, sf_dir, "lineitem"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "nation"),
    )


_SQL_TREND_NUM = (
    "(CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_SQL_TREND_DEN = (
    "(CAST(n_days AS DOUBLE) * CAST(sx2 AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)

ORACLE_NATION_TREND = f"""
WITH per_day AS (
  SELECT n.n_name AS nation, o.o_orderdate AS day,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
span AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
         CAST(MAX(o_orderdate) AS DATE) AS d1
  FROM orders
),
spine AS ({sql_day_spine("d0", "d1", ", d0")} FROM span),
nations AS (SELECT DISTINCT nation FROM per_day),
filled AS (
  SELECT na.nation,
         CAST(s.day - s.d0 AS BIGINT) AS x,
         CAST(COALESCE(p.rev, 0) AS BIGINT) AS y
  FROM spine s CROSS JOIN nations na
  LEFT JOIN per_day p ON p.nation = na.nation AND p.day = s.day
),
sums AS (
  SELECT nation, COUNT(*) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sx2
  FROM filled GROUP BY 1
)
SELECT nation, n_days,
       {sql_round_half_up(
           "CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE) / 10000.0", 4
       )} AS avg_daily_revenue,
       {sql_round_half_up(f"{_SQL_TREND_NUM} / {_SQL_TREND_DEN} / 10000.0", 6)}
         AS trend_per_day
FROM sums
WHERE {_SQL_TREND_DEN} > 0.0
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Bootstrap confidence intervals — uncertainty quantification for a
# corpus metric, the report a pipeline attaches to any number it
# publishes from a SAMPLE (an eval slice, an A/B cell, a curated
# subset): how stable is this mean under resampling?
# ---------------------------------------------------------------------------

_BOOT_B = 32  # bootstrap replicates
# Poisson(1) inverse CDF at 16-bit granularity: weight k iff
# u16 < _POIS_T[k] (floor(CDF(k)·65536), k = 0..4; else 5). INTEGER
# thresholds compared to an INTEGER hash — cross-engine exact with no
# floating-point CDF anywhere.
_POIS_T = (24109, 48218, 60273, 64291, 65296)


def bootstrap_mean_ci(
    orders: DataFrame, n_reps: int = _BOOT_B, seed: str = "boot"
) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for mean(o_totalprice).

    The distributed bootstrap: instead of materializing B resampled
    copies (B× the data — the naive spelling no 100 TB pipeline can
    afford), each row draws its replicate-b multiplicity w_b ~
    Poisson(1) and every replicate is one weighted aggregate. Here
    that collapses further: ALL B replicates ride ONE scan as 2B
    map-side-combined sums (Σ w_b·cents, Σ w_b) — no explode, no row
    multiplication; the only shuffle is the 1-row final reduce, and
    the percentile runs over the B-row replicate-mean frame.

    Determinism & cross-engine exactness: w_b derives from
    ``md5(seed || b//8 || ':' || o_orderkey)`` — one md5 yields eight
    16-bit uniforms (4 hex chars each), so B=32 costs 4 md5/row — and
    the Poisson inverse CDF is the integer threshold ladder
    ``_POIS_T`` (no float compare). Money is exact integer cents (the
    nation_revenue_trend floor device); each replicate mean is ONE
    IEEE division, the CI is the pinned Spark ``percentile`` ↔ DuckDB
    ``quantile_cont`` pairing over B doubles.
    """
    assert n_reps % 8 == 0, "replicates pack 8 per md5"
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    base = orders.where(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderkey").cast("string").alias("k"), cents.alias("cents")
    )
    # The weight projection is heavy (~4 md5 + 32 six-branch CASE
    # ladders per row); a small single-split parquet file would run
    # the whole fold on one core. Spread ONLY when the scan yields
    # fewer splits than cores — at scale inputs arrive pre-split and
    # an unconditional repartition would be a wasted full-row shuffle
    # (the partial agg already collapses each split to one 2B-sum row).
    parallelism = orders.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < parallelism:
        base = base.repartition(parallelism)
    md5s = [
        F.md5(F.concat(F.lit(f"{seed}{g}:"), F.col("k")))
        for g in range(n_reps // 8)
    ]
    proj = base.select(
        "cents", *[m.alias(f"m{g}") for g, m in enumerate(md5s)]
    )

    def weight(b: int):
        u16 = F.conv(
            F.substring(F.col(f"m{b // 8}"), (b % 8) * 4 + 1, 4), 16, 10
        ).cast("long")
        w = F.lit(5)
        for k in range(len(_POIS_T) - 1, -1, -1):
            w = F.when(u16 < _POIS_T[k], F.lit(k)).otherwise(w)
        return w.cast("long")

    aggs = [F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sc")]
    for b in range(n_reps):
        w = weight(b)
        aggs.append(F.sum(w * F.col("cents")).alias(f"swc{b}"))
        aggs.append(F.sum(w).alias(f"sw{b}"))
    # Empty-input edge: a global agg still yields one row with n=0 /
    # NULL sums — drop it so an empty corpus returns zero rows, not a
    # NULL-numeric report.
    one = proj.agg(*aggs).where(F.col("n") > 0)
    reps = (
        one.select(
            "n",
            "sc",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"swc{b}").alias("swc"),
                            F.col(f"sw{b}").alias("sw"),
                        )
                        for b in range(n_reps)
                    ]
                )
            ).alias("r"),
        )
        # A replicate that resampled zero rows (possible on tiny
        # strata: P = e^-n per replicate) has no mean — drop it
        # instead of dividing by zero (ANSI mode makes 0/0 an ERROR,
        # not NaN). If EVERY replicate resamples zero rows (~1-row
        # inputs only), this frame goes empty and the groupBy below
        # emits zero rows; the oracle mirrors that exact shape with
        # its EXISTS(SELECT 1 FROM means) guard, so neither engine
        # ever emits a NULL-CI report row.
        .where(F.col("r.sw") > 0)
        .select(
            "n",
            "sc",
            (
                F.col("r.swc").cast("double")
                / F.col("r.sw").cast("double")
                / 100.0
            ).alias("mean_b"),
        )
    )
    return reps.groupBy("n", "sc").agg(
        F.percentile("mean_b", 0.025).alias("__lo"),
        F.percentile("mean_b", 0.975).alias("__hi"),
    ).select(
        F.col("n").alias("n_orders"),
        F.lit(n_reps).cast("long").alias("n_replicates"),
        round_half_up(
            F.col("sc").cast("double") / F.col("n").cast("double") / 100.0, 4
        ).alias("mean_price"),
        round_half_up(F.col("__lo"), 4).alias("ci_lo"),
        round_half_up(F.col("__hi"), 4).alias("ci_hi"),
    )


def q_orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bootstrap_mean_ci(read_table(spark, sf_dir, "orders"))


def _pois_case(u16: str) -> str:
    branches = " ".join(
        f"WHEN {u16} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 5 END"


ORACLE_BOOTSTRAP_CI = f"""
WITH o AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
),
w AS (
  SELECT b, cents,
         CAST('0x' || substr(md5('boot' || CAST(b // 8 AS VARCHAR) || ':' || k),
                             (b % 8) * 4 + 1, 4) AS BIGINT) AS u16
  FROM o CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) reps
),
means AS (
  SELECT b,
         CAST(SUM({_pois_case('u16')} * cents) AS DOUBLE)
           / CAST(SUM({_pois_case('u16')}) AS DOUBLE) / 100.0 AS mean_b
  FROM w GROUP BY b
  HAVING SUM({_pois_case('u16')}) > 0
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS sc
  FROM o
)
SELECT n_orders,
       CAST({_BOOT_B} AS BIGINT) AS n_replicates,
       {sql_round_half_up("CAST(sc AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0", 4)}
         AS mean_price,
       {sql_round_half_up("(SELECT quantile_cont(mean_b, 0.025) FROM means)", 4)}
         AS ci_lo,
       {sql_round_half_up("(SELECT quantile_cont(mean_b, 0.975) FROM means)", 4)}
         AS ci_hi
FROM tot
WHERE n_orders > 0 AND EXISTS (SELECT 1 FROM means)
"""


def brand_discount_elasticity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand discount elasticity: least-squares slope and Pearson
    correlation of line quantity against discount rate — "does a
    deeper discount actually move volume for this brand", the pricing
    question a retail warehouse answers monthly.

    Same exactness discipline as nation_revenue_trend: x = discount in
    integer basis points (floor(d·100 + 0.5) — exact, engine-
    identical), y = quantity in integer units, all five power sums
    exact BIGINTs, the closed-form slope/r evaluated once from
    identical integers. Brands with zero variance in either variable
    are excluded (undefined statistics — the no-NULL-numerics
    contract).

    Scale shape: one fact scan, broadcast-or-shuffle equi-join to the
    part dim for the brand key, map-side-combined power sums onto
    |brands| keys (25), closed-form math on the bounded frame.
    """
    li = lineitem.select(
        "l_partkey",
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("x"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("y"),
    )
    sums = (
        li.join(part.select("p_partkey", "p_brand"), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
        )
    )
    nd = F.col("n_lines").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = nd * F.col("sxy").cast("double") - sx * sy
    var_x = nd * F.col("sx2").cast("double") - sx * sx
    var_y = nd * F.col("sy2").cast("double") - sy * sy
    return (
        sums.filter((var_x > 0.0) & (var_y > 0.0))
        .select(
            "p_brand",
            "n_lines",
            round_half_up(cov_n / var_x, 6).alias("slope_qty_per_bp"),
            round_half_up(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias(
                "pearson_r"
            ),
        )
        .orderBy("p_brand")
    )


def q_brand_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brand_discount_elasticity(
        read_table(spark, sf_dir, "lineitem"), read_table(spark, sf_dir, "part")
    )


_SQL_EL_COV = (
    "(CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_SQL_EL_VX = (
    "(CAST(n_lines AS DOUBLE) * CAST(sx2 AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_SQL_EL_VY = (
    "(CAST(n_lines AS DOUBLE) * CAST(sy2 AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
)

ORACLE_DISCOUNT_ELASTICITY = f"""
WITH li AS (
  SELECT l_partkey,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS y
  FROM lineitem
),
sums AS (
  SELECT p.p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sx2,
         CAST(SUM(y * y) AS BIGINT) AS sy2
  FROM li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY 1
)
SELECT p_brand, n_lines,
       {sql_round_half_up(f"{_SQL_EL_COV} / {_SQL_EL_VX}", 6)} AS slope_qty_per_bp,
       {sql_round_half_up(
           f"{_SQL_EL_COV} / (sqrt({_SQL_EL_VX}) * sqrt({_SQL_EL_VY}))", 6
       )} AS pearson_r
FROM sums
WHERE {_SQL_EL_VX} > 0.0 AND {_SQL_EL_VY} > 0.0
ORDER BY p_brand
"""


_AB_SALT = "ab-v1"
_AB_Z_CRIT = 1.96


def ab_test_report(events: DataFrame) -> DataFrame:
    """Two-sample A/B significance test on engagement (purchase events
    per user) — the experimentation readout every product warehouse
    serves, as one exact-integer aggregate plus a closed-form Welch z.

    Users are assigned to arms by a salted md5 bucket (the repo-wide
    deterministic-randomization pattern — in production this IS how
    sticky experiment bucketing works, a hash of user id and
    experiment salt, so the derivation is the real mechanism, not a
    stand-in). Per arm the operator accumulates the exact BIGINT power
    sums (n, Σx, Σx²) of the per-user purchase count; mean, Welch
    variance, and z are evaluated once from those integers by the same
    IEEE expression tree on both engines (the type_correlation
    discipline — no streaming-variance aggregate whose accumulation
    order differs).

    Returns ONE row: (``n_users_a``, ``n_users_b``, ``purchases_a``,
    ``purchases_b``, ``mean_a``, ``mean_b``, ``z_stat``,
    ``significant``) — means on the 1e-6 grid, z on the 1e-4 grid,
    significance at |z| > 1.96.

    Scale shape: one scan → map-side-combined per-user counts
    (|users| keys) → one conditional aggregate onto a single row.
    """
    per_user = (
        events.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("x")
        )
        .select(
            F.pmod(
                h60(F.concat(F.lit(_AB_SALT + ":"), F.col("user_id").cast("string"))),
                F.lit(2),
            ).alias("arm"),
            "x",
        )
    )

    def s(arm: int, expr) -> F.Column:
        return F.sum(F.when(F.col("arm") == arm, expr).otherwise(0)).cast("long")

    sums = per_user.agg(
        s(0, F.lit(1)).alias("n_a"),
        s(0, F.col("x")).alias("s1_a"),
        s(0, F.col("x") * F.col("x")).alias("s2_a"),
        s(1, F.lit(1)).alias("n_b"),
        s(1, F.col("x")).alias("s1_b"),
        s(1, F.col("x") * F.col("x")).alias("s2_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_a = F.col("s1_a").cast("double") / na
    mean_b = F.col("s1_b").cast("double") / nb
    # spelled as multiplication, not `** 2`: Spark compiles ** to
    # java.lang.Math.pow (1-ulp guarantee only) while the oracle uses
    # s1_a * s1_a — both engines must run the same IEEE multiply.
    s1a, s1b = F.col("s1_a").cast("double"), F.col("s1_b").cast("double")
    var_a = (na * F.col("s2_a").cast("double") - s1a * s1a) / (na * (na - 1))
    var_b = (nb * F.col("s2_b").cast("double") - s1b * s1b) / (nb * (nb - 1))
    se2 = var_a / na + var_b / nb
    # zero-variance A/A degenerate (every user identical): z is 0/0 —
    # define it as 0 (no evidence of effect) instead of NaN on both
    # sides, keeping the no-NaN output contract.
    z = F.when(se2 > 0, (mean_a - mean_b) / F.sqrt(se2)).otherwise(F.lit(0.0))
    return sums.select(
        F.col("n_a").alias("n_users_a"),
        F.col("n_b").alias("n_users_b"),
        F.col("s1_a").alias("purchases_a"),
        F.col("s1_b").alias("purchases_b"),
        round_half_up(mean_a, 6).alias("mean_a"),
        round_half_up(mean_b, 6).alias("mean_b"),
        round_half_up(z, 4).alias("z_stat"),
        (F.abs(z) > _AB_Z_CRIT).alias("significant"),
    )


def q_events_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ab_test_report(read_table(spark, sf_dir, "events"))


def _oracle_ab_test() -> str:
    from ..operators.dedup import sql_h60

    arm_hash = sql_h60(f"'{_AB_SALT}:' || CAST(user_id AS VARCHAR)")
    arm = f"{arm_hash} % 2"
    mean_a = "(CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
    mean_b = "(CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    var_a = (
        "((CAST(n_a AS DOUBLE) * CAST(s2_a AS DOUBLE)"
        " - CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1)))"
    )
    var_b = (
        "((CAST(n_b AS DOUBLE) * CAST(s2_b AS DOUBLE)"
        " - CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE))"
        " / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1)))"
    )
    se2 = f"({var_a} / CAST(n_a AS DOUBLE) + {var_b} / CAST(n_b AS DOUBLE))"
    z = (
        f"(CASE WHEN {se2} > 0 THEN ({mean_a} - {mean_b}) / sqrt({se2})"
        f" ELSE 0.0 END)"
    )
    return f"""
WITH per_user AS (
  SELECT {arm} AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS x
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
),
sums AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS s1_a,
         CAST(SUM(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS BIGINT) AS s2_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS s1_b,
         CAST(SUM(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS BIGINT) AS s2_b
  FROM per_user
)
SELECT n_a AS n_users_a, n_b AS n_users_b,
       s1_a AS purchases_a, s1_b AS purchases_b,
       {sql_round_half_up(mean_a, 6)} AS mean_a,
       {sql_round_half_up(mean_b, 6)} AS mean_b,
       {sql_round_half_up(z, 4)} AS z_stat,
       ABS({z}) > {_AB_Z_CRIT!r} AS significant
FROM sums
"""


_FC_TEST_DAYS = 7
_FC_EPOCH = "1970-01-01"


def seasonal_naive_backtest(events: DataFrame, test_days: int = _FC_TEST_DAYS) -> DataFrame:
    """Seasonal-naive forecast baseline with a holdout backtest — the
    sanity model every forecasting deployment is graded against
    (M-competition convention: beat seasonal-naive or ship nothing).

    The last ``test_days`` days are held out; each holdout day's
    forecast is the MEAN DAILY TOTAL of its weekday over the training
    days. Returns one row per holdout day: (``day``, ``weekday_idx``,
    ``n_train_days``, ``actual``, ``forecast``, ``abs_err``), ordered
    by day.

    Determinism discipline: daily totals become INTEGER CENTS first
    (floor(sum·100 + 0.5) — true totals live on the 0.01 grid, so
    double-sum reorder noise ~1e-11 sits 9 orders below the half-cent
    boundary); the weekday mean is then integer half-up division
    (2s + n) div 2n — the mean of cent-grid values lands EXACTLY on
    .005 boundaries whenever n is even, where any float spelling
    would be one reorder-ulp from flipping the rounded answer. The
    half-up property requires s ≥ 0: Spark ``div`` and DuckDB ``//``
    both truncate toward zero, so a NEGATIVE weekday total would round
    half-DOWN (still engine-identical, no oracle divergence — but the
    invariant is half-up only on the non-negative domain). Daily
    revenue totals are sums of non-negative event values, so the
    assumption holds by construction of the input; a caller feeding
    signed values accepts half-down on negative weekday totals.
    Everything reported is cents/100.0, one exact conversion per
    value. Weekday is days-since-epoch mod 7 — both engines' date
    subtraction, no dayofweek() convention mismatch (Spark counts
    1=Sunday, DuckDB 0=Sunday).

    Scale shape: one scan → map-side-combined daily totals
    (|days| keys); the weekday means aggregate THAT bounded frame;
    the backtest join is 7 rows against 7 weekday means.
    """
    daily = (
        events.where(F.col("value").isNotNull())
        .select(F.col("ts").cast("date").alias("day"), "value")
        .groupBy("day")
        .agg(
            F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
        )
        .select(
            "day",
            F.pmod(F.datediff(F.col("day"), F.lit(_FC_EPOCH)), F.lit(7))
            .cast("long")
            .alias("weekday_idx"),
            "cents",
        )
    )
    mx = daily.agg(F.max("day").alias("mxd"))
    flagged = daily.crossJoin(F.broadcast(mx)).select(
        "day",
        "weekday_idx",
        "cents",
        (F.datediff(F.col("mxd"), F.col("day")) < test_days).alias("holdout"),
    )
    train = (
        flagged.where(~F.col("holdout"))
        .groupBy("weekday_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_days"),
            F.sum("cents").cast("long").alias("s_cents"),
        )
        .select(
            "weekday_idx",
            "n_train_days",
            F.expr("(2 * s_cents + n_train_days) div (2 * n_train_days)").alias(
                "fc_cents"
            ),
        )
    )
    return (
        flagged.where(F.col("holdout"))
        .join(F.broadcast(train), "weekday_idx")
        .select(
            "day",
            "weekday_idx",
            "n_train_days",
            (F.col("cents").cast("double") / 100).alias("actual"),
            (F.col("fc_cents").cast("double") / 100).alias("forecast"),
            (
                F.abs(F.col("cents") - F.col("fc_cents")).cast("double") / 100
            ).alias("abs_err"),
        )
        .orderBy("day")
    )


def q_events_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_naive_backtest(read_table(spark, sf_dir, "events"))


ORACLE_FORECAST_BASELINE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(CAST(ts AS DATE) - DATE '{_FC_EPOCH}' AS BIGINT) % 7 AS weekday_idx,
         CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
mx AS (SELECT MAX(day) AS mxd FROM daily),
flagged AS (
  SELECT day, weekday_idx, cents,
         (mxd - day < {_FC_TEST_DAYS}) AS holdout
  FROM daily CROSS JOIN mx
),
train AS (
  SELECT weekday_idx,
         CAST(COUNT(*) AS BIGINT) AS n_train_days,
         CAST((2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS fc_cents
  FROM flagged WHERE NOT holdout GROUP BY 1
)
SELECT f.day, f.weekday_idx, t.n_train_days,
       CAST(f.cents AS DOUBLE) / 100 AS actual,
       CAST(t.fc_cents AS DOUBLE) / 100 AS forecast,
       CAST(ABS(f.cents - t.fc_cents) AS DOUBLE) / 100 AS abs_err
FROM flagged f JOIN train t ON t.weekday_idx = f.weekday_idx
WHERE f.holdout
ORDER BY f.day
"""


QUERIES = {
    "events_type_correlation": q_events_type_correlation,
    "nation_revenue_trend": q_nation_revenue_trend,
    "orders_bootstrap_ci": q_orders_bootstrap_ci,
    "events_forecast_baseline": q_events_forecast_baseline,
    "events_ab_test_report": q_events_ab_test_report,
    "brand_discount_elasticity": q_brand_discount_elasticity,
}

ORACLES = {
    "events_type_correlation": ORACLE_TYPE_CORRELATION,
    "nation_revenue_trend": ORACLE_NATION_TREND,
    "orders_bootstrap_ci": ORACLE_BOOTSTRAP_CI,
    "events_forecast_baseline": ORACLE_FORECAST_BASELINE,
    "events_ab_test_report": _oracle_ab_test(),
    "brand_discount_elasticity": ORACLE_DISCOUNT_ELASTICITY,
}
