"""Portable HyperLogLog: the cardinality sketch under the exact gate.

Spark ships `approx_count_distinct` (HLL++), and the registry's
approx_month_profile exercises it — but as a black box it can only
carry a rows-only check (its hash seed lives JVM-side). This module
implements HyperLogLog (Flajolet et al. 2007) FROM FIRST PRINCIPLES
on the cross-engine md5 hash, so the ENTIRE sketch — bucket split,
leading-zero registers, harmonic estimate, small-range correction —
is replayed bit-for-bit by the DuckDB oracle and carries a full
value-hash driver row. The point is pedagogical-operational both:
the sketch mechanics a 100 TB pipeline relies on, held to the same
evidence standard as an exact aggregate.

Exactness discipline:

* **Registers are integers.** h = h60(salt:key) is 60 bits; the low
  ``_HLL_B`` bits pick the bucket, the remaining W = 60−B bits form
  the window w; the register value is the position of w's highest
  set bit from the window top (ρ = 1..W, W+1 for w = 0), computed by
  a GENERATED comparison ladder (``CASE WHEN w >= 2^(W−1) THEN 1
  ...``) — the same SQL text runs on both engines, no log2 floats,
  no bit intrinsics with differing semantics.
* **The harmonic sum is an exact BIGINT.** Σ_j 2^(−M_j) is carried
  as Σ_j 2^(W+1−M_j) (≤ m·2^(W+1) ≪ 2^63), summed over the FULL
  m-register spine (empty registers coalesce to M = 0) — double
  summation would be order-dependent across partitions; the integer
  sum is not.
* **One float conversion at the end.** E = α_m·m²·2^(W+1)/S, and the
  standard small-range correction E ≤ 2.5m ∧ V>0 → m·ln(m/V), both
  computed from identical integers by identical IEEE ops (the
  value_drift ln precedent); outputs rounded on the 1e-4 grid.

Scale shape: one scan projects (group, bucket, ρ); a map-side-
combined MAX lands on |groups|·m keys; the spine fill and estimate
run on that bounded frame. This is exactly how HLL distributes — the
register frame IS the mergeable sketch state (MAX is the merge), so
the same plan computes per-partition sketches and their union free
of any second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table
from .dedup import h60, sql_h60

_HLL_SALT = "hll-v1"
_HLL_B = 8  # 2^8 = 256 buckets
_HLL_M = 1 << _HLL_B
_HLL_W = 60 - _HLL_B  # rho window width
# alpha_256 = 0.7213 / (1 + 1.079/m) — embedded as one repr'd double
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# The raw-estimate numerator alpha·m²·2^(W+1) PRE-FOLDED to one Python
# double and embedded as a single CAST(... AS DOUBLE) literal on both
# sides: multiplying the three literals in-engine would (a) leave the
# association order to each engine and (b) hit DuckDB's
# decimal-literal parsing (0.72... is DECIMAL(16,16); decimal×decimal
# overflows DECIMAL(18) long before double would).
_HLL_EST_NUM = _HLL_ALPHA * float(_HLL_M * _HLL_M) * float(2 ** (_HLL_W + 1))


def _rho_ladder(w_expr: str) -> str:
    """The leading-one-position ladder: identical SQL text for Spark
    and DuckDB (integer comparisons only)."""
    branches = "\n    ".join(
        f"WHEN {w_expr} >= {1 << (_HLL_W - k)} THEN {k}"
        for k in range(1, _HLL_W + 1)
    )
    return f"CASE\n    {branches}\n    ELSE {_HLL_W + 1} END"


def _hash_exprs(key_sql: str) -> tuple[str, str]:
    """(bucket, rho) SQL fragments over a 60-bit hash of key_sql —
    the DuckDB spelling; the Spark side differs only in the h60 call."""
    h = sql_h60(f"'{_HLL_SALT}:' || CAST({key_sql} AS VARCHAR)")
    bucket = f"({h}) % {_HLL_M}"
    rho = _rho_ladder(f"(({h}) // {_HLL_M})")
    return bucket, rho


def hll_report(events: DataFrame) -> DataFrame:
    """Per-event-type distinct-user cardinality: exact vs the portable
    HLL estimate.

    Returns (``event_type``, ``n_exact``, ``n_hll``, ``rel_err``)
    ordered by event_type — n_hll and rel_err on the 1e-4 grid.
    """
    ev = events.where(F.col("user_id").isNotNull()).select("event_type", "user_id")
    registers = hll_registers(ev, key="user_id", group_cols=["event_type"])
    est = hll_estimate(registers, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            round_half_up(F.col("hll_raw"), 4).alias("n_hll"),
            round_half_up(
                (F.col("hll_raw") - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def hll_registers(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """(group_cols..., bucket, m_j) register frame — the mergeable
    sketch state (register-wise MAX is the merge), streaming-legal
    because MAX is a supported streaming aggregate."""
    return hll_rho_projection(df, key, group_cols).groupBy(
        *group_cols, "bucket"
    ).agg(F.max("rho").alias("m_j"))


def hll_rho_projection(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """Scan projection (group_cols..., bucket, rho) — no shuffle, no
    state; safe on a stream."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_HLL_SALT + ":"), F.col(key).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = df.select(*group_cols, h.alias("h")).select(
        *group_cols,
        F.pmod(F.col("h"), F.lit(_HLL_M)).alias("bucket"),
        # integer division, NOT h/256: a 60-bit h is not exactly
        # representable in double, float division would corrupt w
        F.expr(f"h div {_HLL_M}").alias("w"),
    )
    return hashed.select(
        *group_cols, "bucket", F.expr(_rho_ladder("w")).alias("rho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., hll_raw double) from a register frame:
    exact-BIGINT harmonic fold with the empty registers folded in
    CLOSED FORM — an absent (group, bucket) row means M_j = 0, so the
    missing mass is exactly (m − n_present)·2^(W+1) and the zero-
    register count is m − n_present. No spine cross-join (which would
    also self-join the register frame against itself — ambiguous
    lineage when the registers come back from a streaming memory
    sink), no m× row blowup; one aggregate on the register frame.
    Small-range correction as in the paper."""
    full = 1 << (_HLL_W + 1)
    folded = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr(f"CAST(pow(2.0, {_HLL_W + 1} - m_j) AS BIGINT)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(full)
        )
        .cast("long")
        .alias("s_int"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("long").alias("v_zero"),
    )
    raw = F.lit(_HLL_EST_NUM) / F.col("s_int").cast("double")
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("v_zero") > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / F.col("v_zero").cast("double")),
    ).otherwise(raw)
    return folded.select(*group_cols, est.alias("hll_raw"))


def q_approx_distinct_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_report(read_table(spark, sf_dir, "events"))


def _sql_hll_est() -> str:
    raw = f"(CAST({_HLL_EST_NUM!r} AS DOUBLE) / CAST(s_int AS DOUBLE))"
    return (
        f"CASE WHEN {raw} <= CAST({2.5 * _HLL_M!r} AS DOUBLE) AND v_zero > 0"
        f" THEN CAST({float(_HLL_M)!r} AS DOUBLE)"
        f" * ln(CAST({float(_HLL_M)!r} AS DOUBLE) / CAST(v_zero AS DOUBLE))"
        f" ELSE {raw} END"
    )


def _oracle_hll_grouped(group_expr: str, g: str, with_rel_err: bool) -> str:
    """The full sketch replay over any grouping expression — shared by
    the batch entry (group = event_type) and the streaming entry
    (group = calendar day, ≡ Spark's epoch-aligned 1-day window)."""
    bucket, rho = _hash_exprs("user_id")
    est = _sql_hll_est()
    rel = (
        ",\n       "
        + sql_round_half_up(
            f"(({est}) - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)", 4
        )
        + " AS rel_err"
        if with_rel_err
        else ""
    )
    return f"""
WITH ev AS (
  SELECT {group_expr} AS {g}, user_id FROM events WHERE user_id IS NOT NULL
),
hashed AS (
  SELECT {g}, {bucket} AS bucket, {rho} AS rho FROM ev
),
registers AS (
  SELECT {g}, bucket, MAX(rho) AS m_j
  FROM hashed GROUP BY 1, 2
),
folded AS (
  SELECT {g},
         CAST(SUM(CAST(pow(2.0, {_HLL_W + 1} - m_j) AS BIGINT))
              + ({_HLL_M} - COUNT(*)) * {1 << (_HLL_W + 1)} AS BIGINT) AS s_int,
         CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v_zero
  FROM registers GROUP BY 1
),
exact AS (
  SELECT {g}, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM ev GROUP BY 1
)
SELECT f.{g}, e.n_exact,
       {sql_round_half_up(est, 4)} AS n_hll{rel}
FROM folded f JOIN exact e ON e.{g} = f.{g}
ORDER BY f.{g}
"""


def _oracle_hll() -> str:
    return _oracle_hll_grouped("event_type", "event_type", with_rel_err=True)


# ---------------------------------------------------------------------------
# Count-Min sketch: portable per-key frequency estimation
# ---------------------------------------------------------------------------

_CMS_SALT = "cms-v1"
_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row
_CMS_TOPK = 20


def cms_counters(df: DataFrame, key: str) -> DataFrame:
    """The d×w Count-Min counter table for ``key`` — the third classic
    mergeable summary alongside the HLL registers (distinct counts)
    and the Misra–Gries frame (heavy hitters): counters merge by
    element-wise SUM, so per-partition partials combine map-side and
    cross-corpus/stream merges are one groupBy. Returns (``j``,
    ``bucket``, ``c``), a CONSTANT d·w = 4·256 = 1024 rows regardless of
    corpus size.

    Built key-first: groupBy(key) shrinks the stream map-side to
    |keys| rows BEFORE the d-way explode, so the shuffle carries
    d·|keys| tiny rows, never d·|events|.
    """
    per_key = df.groupBy(F.col(key).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    rows = per_key.select(
        "__n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            h60(
                                F.concat(
                                    F.lit(f"{_CMS_SALT}:{j}:"),
                                    F.col("__k").cast("string"),
                                )
                            ),
                            F.lit(_CMS_W),
                        ).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("x"),
    )
    return rows.groupBy(F.col("x.j").alias("j"), F.col("x.bucket").alias("bucket")).agg(
        F.sum("__n").cast("long").alias("c")
    )


def cms_report(events: DataFrame) -> DataFrame:
    """Count-Min frequency report for the top-20 users by exact event
    count: exact count vs the CMS point estimate (min over the d
    counters a key hashes to). CMS guarantees ``n_cms >= n_exact``
    (collisions only ADD) — the ``overestimate`` column is the
    realized error a capacity planner reads against the ε·N bound.

    Scale shape: the counter build (see :func:`cms_counters`), one
    TakeOrdered for the top-k exact keys, then a k·d-row join against
    the 1024-row counter table (AQE broadcasts it). Everything is
    exact BIGINT arithmetic on md5-based portable hashes — the DuckDB
    oracle replays the sketch bit-for-bit.
    """
    ev = events.where(F.col("user_id").isNotNull()).select("user_id")
    counters = cms_counters(ev, "user_id")
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(_CMS_TOPK)
    )
    probes = top.select(
        "user_id",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            h60(
                                F.concat(
                                    F.lit(f"{_CMS_SALT}:{j}:"),
                                    F.col("user_id").cast("string"),
                                )
                            ),
                            F.lit(_CMS_W),
                        ).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("x"),
    ).select("user_id", "n_exact", F.col("x.j").alias("j"), F.col("x.bucket").alias("bucket"))
    return (
        probes.join(counters, ["j", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("c").cast("long").alias("n_cms"))
        .select(
            "user_id",
            "n_exact",
            "n_cms",
            (F.col("n_cms") - F.col("n_exact")).alias("overestimate"),
        )
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
    )


def q_approx_counts_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import read_table

    return cms_report(read_table(spark, sf_dir, "events"))


def _oracle_cms() -> str:
    def bucket(j: int, key_sql: str) -> str:
        h = sql_h60(f"'{_CMS_SALT}:{j}:' || CAST({key_sql} AS VARCHAR)")
        return f"({h}) % {_CMS_W}"

    probe_rows = "\nUNION ALL\n".join(
        f"SELECT user_id, n_exact, {j} AS j, {bucket(j, 'user_id')} AS bucket FROM top"
        for j in range(_CMS_D)
    )
    counter_rows = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {bucket(j, '__k')} AS bucket, __n FROM per_key"
        for j in range(_CMS_D)
    )
    return f"""
WITH per_key AS (
  SELECT user_id AS __k, CAST(COUNT(*) AS BIGINT) AS __n
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
counters AS (
  SELECT j, bucket, CAST(SUM(__n) AS BIGINT) AS c
  FROM ({counter_rows}) r
  GROUP BY j, bucket
),
top AS (
  SELECT __k AS user_id, __n AS n_exact
  FROM per_key ORDER BY __n DESC, __k ASC LIMIT {_CMS_TOPK}
),
probes AS ({probe_rows})
SELECT p.user_id, p.n_exact,
       CAST(MIN(c.c) AS BIGINT) AS n_cms,
       CAST(MIN(c.c) - p.n_exact AS BIGINT) AS overestimate
FROM probes p JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY p.user_id, p.n_exact
ORDER BY p.n_exact DESC, p.user_id ASC
"""


QUERIES = {
    "approx_distinct_hll_portable": q_approx_distinct_hll_portable,
    "approx_counts_cms_portable": q_approx_counts_cms_portable,
}
ORACLES = {
    "approx_distinct_hll_portable": _oracle_hll(),
    "approx_counts_cms_portable": _oracle_cms(),
}
