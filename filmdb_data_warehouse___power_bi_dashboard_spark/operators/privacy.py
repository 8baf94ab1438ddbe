"""Privacy auditing and private release: the governance layer a
training-data warehouse needs before any per-person table leaves the
boundary — first MEASURE re-identification risk (k-anonymity /
l-diversity over the quasi-identifier tuples), then RELEASE aggregates
through a differentially-private mechanism instead of raw counts.

``privacy_k_anonymity_report`` is the Sweeney equivalence-class audit:
group the table by its quasi-identifiers (attributes an adversary can
link from outside data — here nation and market segment, the classic
``(ZIP, birthdate, sex)`` stand-ins), and the size of the smallest
class IS the table's k. Classes below the publishing threshold k=5
are the re-identifiable population; l-diversity (min distinct
sensitive values per class — the account-balance band) catches the
homogeneity attack k-anonymity alone misses: a class of 20 people who
all share one sensitive value discloses it despite k=20.

``privacy_dp_counts`` releases per-segment customer counts under
pure ε-differential privacy (ε=1) via the GEOMETRIC mechanism (the
discrete two-sided analogue of Laplace; Ghosh-Roughgarden-
Sundararajan's universally-optimal mechanism for counting queries).
The discrete mechanism is chosen deliberately over continuous
Laplace: its noise is INTEGER, so the whole release — hash, uniform,
inverse-CDF lookup, noised count — stays on the exact-integer grid
and is replayable bit-for-bit by the DuckDB oracle (no cross-engine
``ln``/``exp`` drift; the repo-wide integer-exactness contract).
Noise is sampled by inverse CDF: a 16-bit uniform from
``md5('dpcounts:' || group)`` walks a PRECOMPUTED integer threshold
ladder (exact ``Fraction`` arithmetic at import time, α = 0.36788 a
fixed rational stand-in for e^{-ε}) — the same md5-u16-vs-integer-
ladder pattern as the Poisson bootstrap (trend.py). Support is
truncated at ±16 (CDF mass beyond is < 2^-16, below the uniform's
resolution); truncated-geometric release is itself standard for
bounded DP noise. A production release would draw fresh randomness
per publication — the md5-of-group-key seeding here is the
deterministic-replay harness for the gate, swapping it for a real
RNG changes one projection, none of the plan.

``privacy_generalization_report`` is the ACT half of the audit: the
Datafly/Samarati question "how much must the QIs be coarsened before
this table meets k" answered over a fixed full-domain generalization
ladder (widen the balance band → suppress it → roll nation up to
region → segment only). One scan builds the level-0 class frame;
every coarser level re-aggregates that persisted BOUNDED frame (the
OLAP rollup-lattice trick — legal because the ladder is monotone:
``floor(x/4000) = floor(floor(x/1000)/4)``, and the region rollup
joins the 25-row nation dim to the class frame, never to raw facts).
The minimal level meeting k is flagged via a window over the
|levels|-row result.

Scale shape (100 TB story): all operators are one map-side-combined
groupBy onto a BOUNDED key domain (the QI tuple space resp. the
segment domain) followed by O(|classes|) post-aggregate arithmetic —
raw facts scan once, nothing quadratic, no Python in the hot path,
and the noise CASE ladder is whole-stage-codegen branch logic over
the tiny aggregate frame. l-diversity's COUNT(DISTINCT sensitive)
is Spark's standard two-phase distinct aggregate on the same keys.

Reference anchor: the reference ships person-level tables (customer/
client in filmdb.sql) with no privacy layer; this module is part of
the SURVEY §2.11 training-data-pipeline extension (the erasure
counterpart, warehouse_delete_report, lives in maintenance.py).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

# Publishing threshold: classes smaller than this are "at risk" (the
# HIPAA Safe-Harbor-era convention; any fixed k works the same way).
_K_THRESH = 5

# Account-balance band width (dollars). Banding uses FLOOR over the
# raw DOUBLE — the division and floor are the identical IEEE ops on
# both engines, so band ids are bit-equal cross-engine (integer
# cents // is avoided: DuckDB's // truncates toward zero on
# negatives while floor division rounds down).
_BAND_DOLLARS = 1000.0


def k_anonymity_report(customer: DataFrame) -> DataFrame:
    """One-row k-anonymity / l-diversity audit of ``customer`` under
    quasi-identifiers (c_nationkey, c_mktsegment) with the account-
    balance band as the sensitive attribute (module docstring).

    Columns: n_rows, n_classes, k_min (the achieved k), l_min (the
    achieved l), classes_below_k / rows_below_k (< _K_THRESH), and
    risk_ratio = rows_below_k / n_rows (6 dp).
    """
    band = F.floor(F.col("c_acctbal") / F.lit(_BAND_DOLLARS)).alias("bal_band")
    classes = (
        customer.select("c_nationkey", "c_mktsegment", band)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("bal_band").alias("n_sensitive"),
        )
    )
    small = F.col("class_size") < _K_THRESH
    report = classes.agg(
        F.sum("class_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").cast("long").alias("k_min"),
        F.min("n_sensitive").cast("long").alias("l_min"),
        F.sum(small.cast("long")).cast("long").alias("classes_below_k"),
        F.sum(F.when(small, F.col("class_size")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_k"),
    )
    return report.select(
        "n_rows",
        "n_classes",
        "k_min",
        "l_min",
        "classes_below_k",
        "rows_below_k",
        round_half_up(
            F.col("rows_below_k").cast("double") / F.col("n_rows").cast("double"),
            6,
        ).alias("risk_ratio"),
    )


def q_privacy_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_anonymity_report(read_table(spark, sf_dir, "customer"))


ORACLE_K_ANON = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / {_BAND_DOLLARS!r})
                                  AS BIGINT)) AS BIGINT) AS n_sensitive
  FROM customer
  GROUP BY 1, 2
)
SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(class_size) AS BIGINT) AS k_min,
       CAST(MIN(n_sensitive) AS BIGINT) AS l_min,
       CAST(SUM(CASE WHEN class_size < {_K_THRESH} THEN 1 ELSE 0 END)
            AS BIGINT) AS classes_below_k,
       CAST(SUM(CASE WHEN class_size < {_K_THRESH} THEN class_size ELSE 0 END)
            AS BIGINT) AS rows_below_k,
       {sql_round_half_up(
           "CAST(SUM(CASE WHEN class_size < " + str(_K_THRESH)
           + " THEN class_size ELSE 0 END) AS DOUBLE)"
           " / CAST(SUM(class_size) AS DOUBLE)", 6
       )} AS risk_ratio
FROM classes
"""


# ---------------------------------------------------------------------------
# Differentially-private counts: truncated geometric mechanism
# ---------------------------------------------------------------------------

# α as a FIXED RATIONAL (≈ e^-1, i.e. ε = 1 for sensitivity-1 counts):
# the ladder below is exact Fraction arithmetic, so both engines see
# the identical integer thresholds. P(k) ∝ α^|k| on k ∈ [-_DP_K, _DP_K].
_DP_ALPHA = Fraction(36788, 100000)
_DP_K = 16


def _geometric_ladder() -> list[tuple[int, int]]:
    """(noise_k, threshold) pairs, ascending in k: noise(u16) is the
    first k with u16 < threshold, u16 uniform on [0, 65535]. Exact
    Fractions; the truncated support normalizes to exactly 1, so the
    final threshold is exactly 65536 (every u16 matches)."""
    powers = [_DP_ALPHA**j for j in range(_DP_K + 1)]
    z = 1 + 2 * sum(powers[1:])
    cdf = Fraction(0)
    out = []
    for k in range(-_DP_K, _DP_K + 1):
        cdf += powers[abs(k)] / z
        out.append((k, min(65536, int(cdf * 65536) + (0 if cdf * 65536 == int(cdf * 65536) else 1))))
    assert out[-1][1] == 65536
    return out


_DP_LADDER = _geometric_ladder()


def _dp_noise_col(u16) -> F.Column:
    noise = F.lit(_DP_LADDER[-1][0])
    for k, t in reversed(_DP_LADDER[:-1]):
        noise = F.when(u16 < t, F.lit(k)).otherwise(noise)
    return noise


def _dp_noise_sql(u16: str) -> str:
    branches = " ".join(
        f"WHEN {u16} < {t} THEN {k}" for k, t in _DP_LADDER[:-1]
    )
    return f"(CASE {branches} ELSE {_DP_LADDER[-1][0]} END)"


def dp_counts(customer: DataFrame, seed: str = "dpcounts:") -> DataFrame:
    """Per-market-segment customer counts released through the ε=1
    truncated geometric mechanism (module docstring). Columns:
    c_mktsegment, exact_cnt (kept for the audit harness — a real
    release publishes only dp_cnt), noise, dp_cnt."""
    counts = customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col("c_mktsegment"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    noise = _dp_noise_col(u16).cast("long")
    return (
        counts.select(
            "c_mktsegment",
            "exact_cnt",
            noise.alias("noise"),
            (F.col("exact_cnt") + noise).cast("long").alias("dp_cnt"),
        )
        .orderBy("c_mktsegment")
    )


def q_privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_counts(read_table(spark, sf_dir, "customer"))


_SQL_U16 = (
    "CAST('0x' || substr(md5('dpcounts:' || c_mktsegment), 1, 4) AS BIGINT)"
)

ORACLE_DP_COUNTS = f"""
WITH counts AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM customer GROUP BY 1
),
noised AS (
  SELECT c_mktsegment, exact_cnt,
         CAST({_dp_noise_sql(_SQL_U16)} AS BIGINT) AS noise
  FROM counts
)
SELECT c_mktsegment, exact_cnt, noise,
       CAST(exact_cnt + noise AS BIGINT) AS dp_cnt
FROM noised
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Generalization lattice: the ACT half of the k-anonymity arc
# ---------------------------------------------------------------------------

# Fixed full-domain generalization ladder (Datafly/Samarati style):
# each level coarsens one quasi-identifier. Level 0 is the audit's QI
# set plus the balance band; the ladder widens the band, suppresses
# it, rolls nation up to region, and finally keeps only the segment.
_GEN_LEVELS = (
    "(nation, segment, bal/1000)",
    "(nation, segment, bal/4000)",
    "(nation, segment)",
    "(region, segment)",
    "(segment)",
)


def generalization_report(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """One row per generalization level: class count, achieved k,
    rows below the k=5 threshold, whether the level meets k, and
    whether it is the CHOSEN level (the minimal one meeting k — the
    Datafly answer "how much must we coarsen before publishing").

    Scale shape: ONE scan of the fact table builds the level-0 class
    frame (map-side-combined groupBy onto the bounded QI domain);
    every other level is a re-aggregate of that persisted bounded
    frame — the OLAP rollup-lattice trick, legal because the ladder
    is monotone: level-1 bands derive from level-0 bands via the
    nested-floor identity floor(x/4000) = floor(floor(x/1000)/4),
    and the region rollup joins the 25-row nation dim to the CLASS
    frame, never to raw facts. The chosen-level flag is a window
    over the |levels|-row result. No forced broadcast anywhere —
    AQE decides the tiny joins."""
    from ..runtime import track_persist

    classes0 = track_persist(
        customer.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(_BAND_DOLLARS)).alias("b1"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()
    )
    c1 = classes0.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("b1") / F.lit(4.0)).alias("b4"),
    ).agg(F.sum("cnt").cast("long").alias("cnt"))
    c2 = classes0.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    c3 = (
        classes0.join(
            nation.select("n_nationkey", "n_regionkey"),
            classes0["c_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy("n_regionkey", "c_mktsegment")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    c4 = classes0.groupBy("c_mktsegment").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )

    def stats(frame: DataFrame, level: int) -> DataFrame:
        return frame.agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("cnt").cast("long").alias("k_min"),
            F.sum(
                F.when(F.col("cnt") < _K_THRESH, F.col("cnt")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("rows_below_k"),
        ).select(
            F.lit(level).cast("long").alias("level"),
            "n_classes",
            "k_min",
            "rows_below_k",
            (F.col("k_min") >= _K_THRESH).alias("meets_k"),
        )

    levels = (
        stats(classes0, 0)
        .unionByName(stats(c1, 1))
        .unionByName(stats(c2, 2))
        .unionByName(stats(c3, 3))
        .unionByName(stats(c4, 4))
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    chosen = F.min(
        F.when(F.col("meets_k"), F.col("level"))
    ).over(w)
    return levels.select(
        "level",
        F.element_at(
            F.array(*[F.lit(s) for s in _GEN_LEVELS]),
            F.col("level").cast("int") + 1,
        ).alias("qi_set"),
        "n_classes",
        "k_min",
        "rows_below_k",
        "meets_k",
        F.coalesce(
            F.col("meets_k") & (F.col("level") == chosen), F.lit(False)
        ).alias("is_chosen"),
    ).orderBy("level")


def q_privacy_generalization_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generalization_report(
        read_table(spark, sf_dir, "customer"), read_table(spark, sf_dir, "nation")
    )


_SQL_GEN_STATS = f"""
  SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(MIN(cnt) AS BIGINT) AS k_min,
         CAST(SUM(CASE WHEN cnt < {_K_THRESH} THEN cnt ELSE 0 END)
              AS BIGINT) AS rows_below_k,
         MIN(cnt) >= {_K_THRESH} AS meets_k
"""

ORACLE_GENERALIZATION = f"""
WITH classes0 AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / {_BAND_DOLLARS!r}) AS BIGINT) AS b1,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer GROUP BY 1, 2, 3
),
c1 AS (
  SELECT c_nationkey, c_mktsegment, CAST(FLOOR(b1 / 4.0) AS BIGINT) AS b4,
         CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM classes0 GROUP BY 1, 2, 3
),
c2 AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM classes0 GROUP BY 1, 2
),
c3 AS (
  SELECT n.n_regionkey, c.c_mktsegment, CAST(SUM(c.cnt) AS BIGINT) AS cnt
  FROM classes0 c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
c4 AS (
  SELECT c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM classes0 GROUP BY 1
),
levels AS (
        SELECT CAST(0 AS BIGINT) AS level, * FROM ({_SQL_GEN_STATS} FROM classes0)
  UNION ALL
        SELECT CAST(1 AS BIGINT), * FROM ({_SQL_GEN_STATS} FROM c1)
  UNION ALL
        SELECT CAST(2 AS BIGINT), * FROM ({_SQL_GEN_STATS} FROM c2)
  UNION ALL
        SELECT CAST(3 AS BIGINT), * FROM ({_SQL_GEN_STATS} FROM c3)
  UNION ALL
        SELECT CAST(4 AS BIGINT), * FROM ({_SQL_GEN_STATS} FROM c4)
)
SELECT level,
       CASE {" ".join(f"WHEN level = {i} THEN '{s}'" for i, s in enumerate(_GEN_LEVELS))}
       END AS qi_set,
       n_classes, k_min, rows_below_k, meets_k,
       COALESCE(meets_k AND level = MIN(CASE WHEN meets_k THEN level END)
                                    OVER (), FALSE) AS is_chosen
FROM levels
ORDER BY level
"""


QUERIES = {
    "privacy_k_anonymity_report": q_privacy_k_anonymity_report,
    "privacy_dp_counts": q_privacy_dp_counts,
    "privacy_generalization_report": q_privacy_generalization_report,
}
ORACLES = {
    "privacy_k_anonymity_report": ORACLE_K_ANON,
    "privacy_dp_counts": ORACLE_DP_COUNTS,
    "privacy_generalization_report": ORACLE_GENERALIZATION,
}
