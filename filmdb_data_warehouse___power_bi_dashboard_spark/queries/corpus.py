"""The analytic corpus: the reference's 21-query surface re-expressed
over the synthetic star (SURVEY.md §2, §5). Entity mapping from the
reference's film-rental schema to the test corpus:

    payment/rental → lineitem+orders   film → part      store → supplier
    customer       → customer          category → p_brand
    city/country   → nation/region     payment_date → o_orderdate/l_shipdate

Every query is written twice — a DataFrame builder (this file) and an
ANSI-SQL oracle (``ORACLES``) — and engineered for cross-engine
determinism:

- money flows through DecimalType internally (exact,
  order-independent sums, windows, and ranks); the registry wrapper
  casts decimal OUTPUT columns to double in the final projection
  (see queries/__init__.py — the gate's pandas materialization
  renders DECIMAL as float64, so both engines emit IEEE doubles);
- ratios/averages/stddev are computed from exact decimal sums in
  double and rounded to a fixed scale;
- every top-k ORDER BY carries a unique tiebreaker;
- month/day bucketing happens on naive timestamps under a UTC session.

Reference citations (file:line under /root/reference/) are on each
query for parity checking.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.spine import sql_day_spine
from ..functions.scalar import (
    date_key,
    interval_days,
    money,
    net_revenue,
    round_half_up,
    sql_round_half_up,
)
from ..schemas import MONEY
from ..sources.catalog import read_table

# Revenue in DuckDB SQL — decimal-exact twin of functions.scalar.net_revenue:
# rounded to money scale PER ROW (reference keeps payment amounts in
# numeric(x,2) — creationdatwareh.sql:109), so both engines sum identical
# cent-exact values. NOTE: the per-row downscale must be an explicit
# ROUND, not a bare CAST — Spark's decimal cast rounds HALF_UP while
# DuckDB's decimal CAST truncates (.xx50 ties go down), which drifted
# sums by cents. DuckDB ROUND is half-away-from-zero, which equals
# Spark HALF_UP on positive money.
SQL_REV = (
    "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DECIMAL(18,2))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q1 — flagship: Top-10 parts by revenue.
# Reference: "Top 10 films par revenu" README.md:91-99 (J1 A1 O1 O4).
# Scale: join on l_partkey; `part` is dim-sized → broadcast; top-k is
# TakeOrderedAndProject (no full sort at 100 TB).
# ---------------------------------------------------------------------------


def q_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(
            F.sum(net_revenue()).cast(MONEY).alias("revenue"),
            F.count("*").alias("nb_ventes"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


ORACLE_Q1 = f"""
SELECT p_partkey, p_name,
       CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       COUNT(*) AS nb_ventes
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
ORDER BY revenue DESC, p_partkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q2 — KPI by store × month: CA / payments / distinct orders / basket.
# Reference: dw requetes_clees.sql:1-14 (A1 A2 A3 P8 A9 A10 J2 F4).
# ---------------------------------------------------------------------------


def q_kpi_supplier_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).join(
        F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
    )
    agg = (
        joined.groupBy(
            F.col("s_name").alias("nom_magasin"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("mois"),
        )
        .agg(
            F.sum(net_revenue()).cast(MONEY).alias("ca"),
            F.count("*").alias("nb_paiements"),
            F.countDistinct("l_orderkey").alias("nb_commandes"),
        )
        .withColumn(
            "panier_moyen",
            round_half_up(
                F.col("ca").cast("double") / F.nullif(F.col("nb_commandes"), F.lit(0)),
                4,
            ),
        )
    )
    return agg


_Q2_RATIO = sql_round_half_up(
    f"CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE)"
    " / NULLIF(COUNT(DISTINCT l_orderkey), 0)",
    4,
)

ORACLE_Q2 = f"""
SELECT s_name AS nom_magasin,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
       CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE) AS ca,
       COUNT(*) AS nb_paiements,
       COUNT(DISTINCT l_orderkey) AS nb_commandes,
       {_Q2_RATIO} AS panier_moyen
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q3 — category (brand) revenue + share of total.
# Reference: dw requetes_clees.sql:17-33 "CA par catégorie" (A1 A9 W4-lite).
# The share uses an empty-frame window (grand total) — Catalyst plans a
# single-partition window over the tiny aggregated set, not the fact.
# ---------------------------------------------------------------------------


def q_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    by_brand = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("categorie"))
        .agg(F.sum(net_revenue()).cast(MONEY).alias("ca"), F.count("*").alias("nb"))
    )
    total = Window.partitionBy()
    return by_brand.withColumn(
        "part_ca",
        round_half_up(
            F.col("ca").cast("double") / F.sum("ca").over(total).cast("double"), 6
        ),
    )


# The grand total is summed in exact decimal and only then cast to
# double, so the denominator is order-independent on both engines.
_Q3_SHARE = sql_round_half_up("CAST(ca AS DOUBLE) / CAST(SUM(ca) OVER () AS DOUBLE)", 6)

ORACLE_Q3 = f"""
WITH by_brand AS (
  SELECT p_brand AS categorie,
         CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS ca,
         COUNT(*) AS nb
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT categorie, CAST(ca AS DOUBLE) AS ca, nb,
       {_Q3_SHARE} AS part_ca
FROM by_brand
"""


# ---------------------------------------------------------------------------
# Q4 — loyal clients: HAVING on COUNT(DISTINCT).
# Reference: dw requetes_clees.sql:55-69 "clients fidèles" (A3 A11 J1).
# ---------------------------------------------------------------------------


def q_loyal_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.countDistinct("o_orderkey").alias("nb_commandes"),
            F.sum(money("o_totalprice")).cast(MONEY).alias("ca"),
        )
        .filter(F.col("nb_commandes") >= 15)
        .orderBy(F.desc("nb_commandes"), F.desc("ca"), F.asc("c_custkey"))
    )


ORACLE_Q4 = """
SELECT c_custkey, c_name,
       COUNT(DISTINCT o_orderkey) AS nb_commandes,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS ca
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
HAVING COUNT(DISTINCT o_orderkey) >= 15
ORDER BY nb_commandes DESC, ca DESC, c_custkey ASC
"""


# ---------------------------------------------------------------------------
# Q5 — new vs returning clients over the trailing 12 months.
# Reference: dw requetes_clees.sql:73-103 (A12 J4 P6 A3 F8).
# The 1-row bounds side is cross-joined (broadcast nested loop) — the
# reference's `JOIN ref r ON TRUE` shape.
# ---------------------------------------------------------------------------


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("maxd")).select(
        F.add_months(F.date_trunc("month", "maxd").cast("date"), -11).alias("d_debut"),
        F.col("maxd"),
    )
    premier = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("premier_achat"))
    periode = orders.crossJoin(F.broadcast(ref)).filter(
        (F.col("o_orderdate") >= F.col("d_debut")) & (F.col("o_orderdate") <= F.col("maxd"))
    )
    return (
        periode.join(premier, "o_custkey")
        .withColumn(
            "segment",
            F.when(F.col("premier_achat") >= F.col("d_debut"), F.lit("Nouveau")).otherwise(
                F.lit("Récurrent")
            ),
        )
        .groupBy("segment")
        .agg(
            F.countDistinct("o_custkey").alias("nb_clients"),
            F.sum(money("o_totalprice")).cast(MONEY).alias("ca"),
        )
        .orderBy("segment")
    )


ORACLE_Q5 = """
WITH ref AS (
  SELECT CAST(date_trunc('month', MAX(o_orderdate)) - INTERVAL 11 MONTH AS DATE) AS d_debut,
         MAX(o_orderdate) AS maxd
  FROM orders
),
premier AS (
  SELECT o_custkey, MIN(o_orderdate) AS premier_achat FROM orders GROUP BY o_custkey
)
SELECT CASE WHEN p.premier_achat >= r.d_debut THEN 'Nouveau' ELSE 'Récurrent' END AS segment,
       COUNT(DISTINCT o.o_custkey) AS nb_clients,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS ca
FROM orders o
CROSS JOIN ref r
JOIN premier p ON p.o_custkey = o.o_custkey
WHERE o.o_orderdate >= r.d_debut AND o.o_orderdate <= r.maxd
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q6 — monthly revenue trend.
# Reference: dw requetes_clees.sql:107-117 "évolution mensuelle" (A9 F4).
# ---------------------------------------------------------------------------


def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("mois"))
        .agg(F.sum(net_revenue()).cast(MONEY).alias("ca"), F.count("*").alias("nb"))
        .orderBy("mois")
    )


ORACLE_Q6 = f"""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mois,
       CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE) AS ca,
       COUNT(*) AS nb
FROM lineitem
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q7 — store × category heatmap (multi-key group-by over a 3-way join).
# Reference: dw requetes_clees.sql:121-134 (A10 J3).
# ---------------------------------------------------------------------------


def q_supplier_brand_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy(F.col("s_name").alias("nom_magasin"), F.col("p_brand").alias("categorie"))
        .agg(
            F.sum(net_revenue()).cast(MONEY).alias("ca"),
            F.sum("l_quantity").cast("double").alias("quantite"),
        )
    )


ORACLE_Q7 = f"""
SELECT s_name AS nom_magasin, p_brand AS categorie,
       CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE) AS ca,
       CAST(SUM(l_quantity) AS DOUBLE) AS quantite
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q8 — acquisition cohorts: first-purchase month × months-since.
# Reference: dw requetes_clees.sql:138-165 (J7 F7 A3).
# Two aggregations of the same base, joined — the reference's shared-CTE
# self-join. months_since uses calendar months (age() semantics).
# ---------------------------------------------------------------------------


def q_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    first_buy = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohorte")
    )
    activity = orders.select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("mois"),
        money("o_totalprice").alias("montant"),
    )
    return (
        activity.join(first_buy, "o_custkey")
        .withColumn("anciennete_mois", F.floor(F.months_between("mois", "cohorte")).cast("int"))
        .groupBy("cohorte", "anciennete_mois")
        .agg(
            F.countDistinct("o_custkey").alias("nb_clients"),
            F.sum("montant").cast(MONEY).alias("ca"),
        )
        .filter(F.col("anciennete_mois") <= 11)
        .orderBy("cohorte", "anciennete_mois")
    )


ORACLE_Q8 = """
WITH first_buy AS (
  SELECT o_custkey, CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohorte
  FROM orders GROUP BY o_custkey
)
SELECT f.cohorte,
       CAST(datediff('month', f.cohorte, CAST(date_trunc('month', o.o_orderdate) AS DATE)) AS INT)
         AS anciennete_mois,
       COUNT(DISTINCT o.o_custkey) AS nb_clients,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS ca
FROM orders o JOIN first_buy f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2
HAVING anciennete_mois <= 11
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q9 — RFM quintile scoring, NTILE(5) semantics WITHOUT the window.
# Reference: dw requetes_clees.sql:168-196 (W1 A5 A12).
# A bare `NTILE(5) OVER (ORDER BY …)` forces the whole customer base
# through one partition — the canonical window anti-pattern at scale.
# Instead each metric gets a global rank via a range-partitioned sort
# (functions/ranking.global_row_number) and the exact NTILE bucket is
# computed from (rank, n) — identical output (same oracle), parallel
# plan. The ordering carries the custkey tiebreaker so assignment is
# total-order deterministic in both engines.
# ---------------------------------------------------------------------------


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import global_row_numbers, ntile_from_rank
    from ..runtime import track_persist

    orders = _t(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        orders.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("maxd"), F.max("o_orderdate")).alias("recence_jours"),
            F.countDistinct("o_orderkey").alias("frequence"),
            F.sum(money("o_totalprice")).cast(MONEY).alias("monetaire"),
        )
        .persist()
    )
    base = track_persist(base)
    n = base.count()
    # Round-16 optimization (guide §1.2 step 1, §2.4): the three
    # metric ranks ride ONE fused global_row_numbers pass — one
    # boundary-sample job + one count job for all three (was two jobs
    # per metric) and three chained window stages in a single plan
    # (was three windows each joined back to base). Rank assignment is
    # bit-identical (pytest test_round16_ops asserts multi ≡ single).
    metrics = {
        "__rn_r": [("recence_jours", False), ("o_custkey", True)],
        "__rn_f": [("frequence", True), ("o_custkey", True)],
        "__rn_m": [("monetaire", True), ("o_custkey", True)],
    }
    out = global_row_numbers(base, metrics, n_rows=n)
    for score, rn in (
        ("score_r", "__rn_r"), ("score_f", "__rn_f"), ("score_m", "__rn_m")
    ):
        out = out.withColumn(score, ntile_from_rank(F.col(rn), n, 5))
    return out.select(
        "o_custkey",
        "recence_jours",
        "frequence",
        "monetaire",
        "score_r",
        "score_f",
        "score_m",
        (F.col("score_r") * 100 + F.col("score_f") * 10 + F.col("score_m")).cast("int").alias("rfm"),
    )


ORACLE_Q9 = """
WITH ref AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
base AS (
  SELECT o_custkey,
         CAST(datediff('day', CAST(MAX(o_orderdate) AS DATE), CAST(MAX(maxd) AS DATE)) AS INT)
           AS recence_jours,
         COUNT(DISTINCT o_orderkey) AS frequence,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS monetaire
  FROM orders CROSS JOIN ref
  GROUP BY o_custkey
)
SELECT o_custkey, recence_jours, frequence,
       CAST(monetaire AS DOUBLE) AS monetaire,
       CAST(NTILE(5) OVER (ORDER BY recence_jours DESC, o_custkey ASC) AS INT) AS score_r,
       CAST(NTILE(5) OVER (ORDER BY frequence ASC, o_custkey ASC) AS INT) AS score_f,
       CAST(NTILE(5) OVER (ORDER BY monetaire ASC, o_custkey ASC) AS INT) AS score_m,
       CAST(NTILE(5) OVER (ORDER BY recence_jours DESC, o_custkey ASC) * 100
          + NTILE(5) OVER (ORDER BY frequence ASC, o_custkey ASC) * 10
          + NTILE(5) OVER (ORDER BY monetaire ASC, o_custkey ASC) AS INT) AS rfm
FROM base
"""


# ---------------------------------------------------------------------------
# Q10 — daily revenue z-score outliers.
# Reference: dw requetes_clees.sql:199-223 (A6 A13 J4 O3 P6).
# Mean/stddev are derived from exact decimal sums (sum, sum of squares)
# so the doubles fed to the z-score are bit-identical across engines.
# ---------------------------------------------------------------------------


def q_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    daily = lineitem.groupBy(F.col("l_shipdate").cast("date").alias("jour")).agg(
        F.sum(net_revenue()).cast(MONEY).alias("ca")
    )
    stats = daily.agg(
        F.count("*").alias("n"),
        F.sum("ca").cast(MONEY).alias("s1"),
        F.sum(F.col("ca") * F.col("ca")).cast("decimal(38,4)").alias("s2"),
    )
    scored = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn("moyenne", F.col("s1").cast("double") / F.col("n"))
        .withColumn(
            "ecart_type",
            F.sqrt(F.col("s2").cast("double") / F.col("n") - F.col("moyenne") * F.col("moyenne")),
        )
        .withColumn(
            "zscore",
            F.when(F.col("ecart_type") > 0, (F.col("ca").cast("double") - F.col("moyenne")) / F.col("ecart_type")).otherwise(F.lit(0.0)),
        )
    )
    return (
        scored.select("jour", "ca", round_half_up(F.col("zscore"), 4).alias("zscore"))
        .orderBy(F.abs(F.col("zscore")).desc(), F.asc("jour"))
        .limit(20)
    )


_Q10_Z = sql_round_half_up(
    "CASE WHEN ecart_type > 0"
    " THEN (CAST(ca AS DOUBLE) - moyenne) / ecart_type ELSE 0.0 END",
    4,
)

ORACLE_Q10 = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS jour,
         CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS ca
  FROM lineitem GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(ca) AS DECIMAL(18,2)) AS s1,
         CAST(SUM(ca * ca) AS DECIMAL(38,4)) AS s2
  FROM daily
),
scored AS (
  SELECT d.jour, d.ca,
         CAST(s.s1 AS DOUBLE) / s.n AS moyenne,
         sqrt(CAST(s.s2 AS DOUBLE) / s.n
              - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n)) AS ecart_type
  FROM daily d CROSS JOIN stats s
),
final AS (
  SELECT jour, ca, {_Q10_Z} AS zscore
  FROM scored
)
SELECT jour, CAST(ca AS DOUBLE) AS ca, zscore
FROM final
ORDER BY abs(zscore) DESC, jour ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 — month-over-month / year-over-year deltas via LAG(1)/LAG(12).
# Reference: dw requetes_clees.sql:226-248 (W2 P6 P8).
# The monthly series is joined to a generated month spine first so
# LAG(12) is calendar-aligned even when months are missing (SURVEY §7).
# ---------------------------------------------------------------------------


def q_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    monthly = lineitem.groupBy(
        F.date_trunc("month", "l_shipdate").cast("date").alias("mois")
    ).agg(F.sum(net_revenue()).cast(MONEY).alias("ca"))
    bounds = monthly.agg(F.min("mois").alias("lo"), F.max("mois").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("mois")
    )
    filled = spine.join(monthly, "mois", "left").select(
        "mois", F.coalesce(F.col("ca"), F.lit(0).cast(MONEY)).alias("ca")
    )
    w = Window.orderBy("mois")
    # Restrict to months where both deltas are DEFINED (a prior month
    # and a prior year exist with nonzero CA): keeps every output
    # column non-null, which the gate-facing contract requires (a NULL
    # double renders as NaN in the oracle's pandas frame but None in
    # Spark's collect — an engine-representation mismatch, not a value
    # difference). LAG(1)/LAG(12) still run over the full spine.
    return (
        filled.withColumn("ca_m1", F.lag("ca", 1).over(w).cast(MONEY))
        .withColumn("ca_m12", F.lag("ca", 12).over(w).cast(MONEY))
        .filter(
            F.col("ca_m1").isNotNull()
            & (F.col("ca_m1") != 0)
            & F.col("ca_m12").isNotNull()
            & (F.col("ca_m12") != 0)
        )
        .withColumn(
            "mom_pct",
            round_half_up(
                (F.col("ca") - F.col("ca_m1")).cast("double")
                / F.nullif(F.col("ca_m1").cast("double"), F.lit(0.0)),
                4,
            ),
        )
        .withColumn(
            "yoy_pct",
            round_half_up(
                (F.col("ca") - F.col("ca_m12")).cast("double")
                / F.nullif(F.col("ca_m12").cast("double"), F.lit(0.0)),
                4,
            ),
        )
        .orderBy("mois")
    )


_Q11_MOM = sql_round_half_up(
    "CAST(ca - ca_m1 AS DOUBLE) / NULLIF(CAST(ca_m1 AS DOUBLE), 0.0)", 4
)
_Q11_YOY = sql_round_half_up(
    "CAST(ca - ca_m12 AS DOUBLE) / NULLIF(CAST(ca_m12 AS DOUBLE), 0.0)", 4
)

ORACLE_Q11 = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mois,
         CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS ca
  FROM lineitem GROUP BY 1
),
spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT MIN(mois) FROM monthly),
           (SELECT MAX(mois) FROM monthly),
           INTERVAL 1 MONTH)) AS DATE) AS mois
),
filled AS (
  SELECT s.mois, CAST(COALESCE(m.ca, 0) AS DECIMAL(18,2)) AS ca
  FROM spine s LEFT JOIN monthly m ON s.mois = m.mois
),
lagged AS (
  SELECT mois, ca,
         CAST(LAG(ca, 1) OVER (ORDER BY mois) AS DECIMAL(18,2)) AS ca_m1,
         CAST(LAG(ca, 12) OVER (ORDER BY mois) AS DECIMAL(18,2)) AS ca_m12
  FROM filled
)
SELECT mois, CAST(ca AS DOUBLE) AS ca,
       CAST(ca_m1 AS DOUBLE) AS ca_m1,
       CAST(ca_m12 AS DOUBLE) AS ca_m12,
       {_Q11_MOM} AS mom_pct,
       {_Q11_YOY} AS yoy_pct
FROM lagged
WHERE ca_m1 IS NOT NULL AND ca_m1 <> 0
  AND ca_m12 IS NOT NULL AND ca_m12 <> 0
ORDER BY mois
"""


# ---------------------------------------------------------------------------
# Q12 — 30-day rolling revenue per region (physical ROWS frame over a
# daily pre-aggregation). Reference: dw requetes_clees.sql:251-265 (W3).
# ---------------------------------------------------------------------------


def q_rolling_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    daily = (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("l_shipdate").cast("date").alias("jour"))
        .agg(F.sum(net_revenue()).cast(MONEY).alias("ca_jour"))
    )
    w = Window.partitionBy("region").orderBy("jour").rowsBetween(-29, 0)
    return daily.select(
        "region",
        "jour",
        "ca_jour",
        F.sum("ca_jour").over(w).cast(MONEY).alias("ca_30j"),
    ).orderBy("region", "jour")


ORACLE_Q12 = f"""
WITH daily AS (
  SELECT r_name AS region, CAST(l_shipdate AS DATE) AS jour,
         CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS ca_jour
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region, jour, CAST(ca_jour AS DOUBLE) AS ca_jour,
       CAST(CAST(SUM(ca_jour) OVER (PARTITION BY region ORDER BY jour
            ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS ca_30j
FROM daily ORDER BY region, jour
"""


# ---------------------------------------------------------------------------
# Q13 — Pareto 80/20: cumulative revenue share across categories.
# Reference: DAX `CA cumul catégories` / `% cumul CA catégories`
# (pbix page "Produits & clients"; SURVEY §2.5 W4).
# ---------------------------------------------------------------------------


def q_pareto_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    by_brand = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("categorie"))
        .agg(F.sum(net_revenue()).cast(MONEY).alias("ca"))
    )
    w_cum = Window.orderBy(F.desc("ca"), F.asc("categorie")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    return (
        by_brand.withColumn("ca_cumul", F.sum("ca").over(w_cum).cast(MONEY))
        .withColumn(
            "pct_cumul",
            round_half_up(
                F.col("ca_cumul").cast("double") / F.sum("ca").over(w_all).cast("double"),
                6,
            ),
        )
        .orderBy(F.desc("ca"), F.asc("categorie"))
    )


_Q13_PCT = sql_round_half_up(
    "CAST(ca_cumul AS DOUBLE) / CAST(SUM(ca) OVER () AS DOUBLE)", 6
)

ORACLE_Q13 = f"""
WITH by_brand AS (
  SELECT p_brand AS categorie, CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS ca
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
),
cum AS (
  SELECT categorie, ca,
         CAST(SUM(ca) OVER (ORDER BY ca DESC, categorie ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS ca_cumul
  FROM by_brand
)
SELECT categorie, CAST(ca AS DOUBLE) AS ca,
       CAST(ca_cumul AS DOUBLE) AS ca_cumul,
       {_Q13_PCT} AS pct_cumul
FROM cum ORDER BY cum.ca DESC, categorie ASC
"""


# ---------------------------------------------------------------------------
# Q14 — top part per brand (rank-1 per group).
# Reference: DAX Top Film / Top Catégorie measures (SURVEY §2.5 W5).
# ---------------------------------------------------------------------------


def q_top_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    by_part = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.sum(net_revenue()).cast(MONEY).alias("ca"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("ca"), F.asc("p_partkey"))
    return (
        by_part.withColumn("rang", F.row_number().over(w))
        .filter(F.col("rang") == 1)
        .select(
            F.col("p_brand").alias("categorie"),
            F.col("p_name").alias("top_produit"),
            "ca",
        )
        .orderBy("categorie")
    )


ORACLE_Q14 = f"""
WITH by_part AS (
  SELECT p_brand, p_partkey, p_name, CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS ca
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT p_brand, p_name, ca,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY ca DESC, p_partkey ASC) AS rang
  FROM by_part
)
SELECT p_brand AS categorie, p_name AS top_produit,
       CAST(ca AS DOUBLE) AS ca
FROM ranked WHERE rang = 1 ORDER BY categorie
"""


# ---------------------------------------------------------------------------
# Q15 — shipping-delay stats: elapsed-day semantics, GREATEST clamp,
# exact median. Reference: vues.sql:217-247 late-returns views
# (F6 P9 A4 A7 A5). interval_days = EXTRACT(DAY FROM a-b), not datediff.
# ---------------------------------------------------------------------------


def q_shipping_delays(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("pays"),
            interval_days("l_shipdate", "o_orderdate").alias("delai_jours"),
        )
        .withColumn("retard_jours", F.greatest(F.col("delai_jours") - F.lit(60), F.lit(0)))
    )
    return (
        base.groupBy("pays")
        .agg(
            F.count("*").alias("nb_lignes"),
            round_half_up(F.sum("delai_jours").cast("double") / F.count("*"), 4).alias(
                "delai_moyen"
            ),
            round_half_up(F.expr("percentile(retard_jours, 0.5)"), 4).alias(
                "retard_median"
            ),
            F.max("retard_jours").alias("retard_max"),
            F.sum(F.when(F.col("retard_jours") > 0, 1).otherwise(0)).alias("nb_en_retard"),
        )
        .orderBy("pays")
    )


_Q15_MOYEN = sql_round_half_up("CAST(SUM(delai_jours) AS DOUBLE) / COUNT(*)", 4)
_Q15_MEDIAN = sql_round_half_up("CAST(quantile_cont(retard_jours, 0.5) AS DOUBLE)", 4)

ORACLE_Q15 = f"""
WITH base AS (
  SELECT n_name AS pays,
         CAST(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 86400) AS INT) AS delai_jours,
         GREATEST(CAST(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 86400) AS INT) - 60, 0)
           AS retard_jours
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
SELECT pays,
       COUNT(*) AS nb_lignes,
       {_Q15_MOYEN} AS delai_moyen,
       {_Q15_MEDIAN} AS retard_median,
       MAX(retard_jours) AS retard_max,
       CAST(SUM(CASE WHEN retard_jours > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb_en_retard
FROM base GROUP BY pays ORDER BY pays
"""


# ---------------------------------------------------------------------------
# Q16 — parts never ordered (anti-join).
# Reference: vues.sql:308-315 "films jamais loués" (J6). The Spark plan
# uses a true left_anti (broadcast on the keys side); the oracle keeps
# the reference's outer-join + IS NULL spelling — same rows.
# ---------------------------------------------------------------------------


def q_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # Pre-aggregating to DISTINCT keys shrinks the anti-join's build
    # side from the full fact to |part| keys (map-side combine before
    # the shuffle) — orders of magnitude less data moved at scale.
    ordered_keys = lineitem.select("l_partkey").distinct()
    return (
        part.join(ordered_keys, part.p_partkey == ordered_keys.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


ORACLE_Q16 = """
SELECT p_partkey, p_name, p_brand
FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
WHERE l_partkey IS NULL
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Q17 — ordered, distinct string aggregation per group.
# Reference: vues.sql:7-13, 31, 50-52 STRING_AGG actor lists (A8).
# Spark's collect_set is order-nondeterministic → sort_array before
# array_join makes it total-order deterministic (SURVEY §7 hard parts).
# ---------------------------------------------------------------------------


def q_brand_type_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy(F.col("p_brand").alias("categorie"))
        .agg(
            F.array_join(F.sort_array(F.collect_set("p_type")), ", ").alias("types"),
            F.countDistinct("p_type").alias("nb_types"),
            F.count("*").alias("nb_produits"),
        )
        .orderBy("categorie")
    )


ORACLE_Q17 = """
SELECT p_brand AS categorie,
       string_agg(DISTINCT p_type, ', ' ORDER BY p_type) AS types,
       COUNT(DISTINCT p_type) AS nb_types,
       COUNT(*) AS nb_produits
FROM part GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q18 — generated month spine with zero-filled revenue.
# Reference: GENERATE_SERIES date spine (insertion_dataware.sql:20-37,
# v_calendrier filmdb.sql:403-418; S7 P7 A5 A12).
# ---------------------------------------------------------------------------


def q_month_spine_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mois")
    ).agg(F.sum(money("o_totalprice")).cast(MONEY).alias("ca"), F.count("*").alias("nb"))
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("mois")
    )
    return (
        spine.join(monthly, "mois", "left")
        .select(
            "mois",
            F.coalesce(F.col("ca"), F.lit(0).cast(MONEY)).alias("ca"),
            F.coalesce(F.col("nb"), F.lit(0)).alias("nb"),
        )
        .orderBy("mois")
    )


ORACLE_Q18 = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ca,
         COUNT(*) AS nb
  FROM orders GROUP BY 1
),
spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) FROM orders),
           (SELECT CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) FROM orders),
           INTERVAL 1 MONTH)) AS DATE) AS mois
)
SELECT s.mois,
       CAST(CAST(COALESCE(m.ca, 0) AS DECIMAL(18,2)) AS DOUBLE) AS ca,
       COALESCE(m.nb, 0) AS nb
FROM spine s LEFT JOIN monthly m ON s.mois = m.mois
ORDER BY s.mois
"""


# ---------------------------------------------------------------------------
# Q19 — orders inside a computed window (theta join against 1-row bounds).
# Reference: source requetes_clees.sql:17,39,59,92 `JOIN borne b ON
# p.payment_date BETWEEN b.d_debut AND b.d_fin` (J5 A12).
# Catalyst plans BroadcastNestedLoopJoin — correct for a 1-row side.
# ---------------------------------------------------------------------------


def q_orders_last_full_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    borne = orders.agg(F.max("o_orderdate").alias("maxd")).select(
        F.date_trunc("month", F.add_months(F.col("maxd"), -1)).cast("date").alias("d_debut"),
        F.date_sub(F.date_trunc("month", "maxd").cast("date"), 1).alias("d_fin"),
    )
    return (
        orders.crossJoin(F.broadcast(borne))
        .filter(F.col("o_orderdate").cast("date").between(F.col("d_debut"), F.col("d_fin")))
        .groupBy(F.col("o_orderpriority").alias("priorite"))
        .agg(
            F.count("*").alias("nb_commandes"),
            F.sum(money("o_totalprice")).cast(MONEY).alias("ca"),
        )
        .orderBy("priorite")
    )


ORACLE_Q19 = """
WITH borne AS (
  SELECT CAST(date_trunc('month', MAX(o_orderdate) - INTERVAL 1 MONTH) AS DATE) AS d_debut,
         CAST(date_trunc('month', MAX(o_orderdate)) - INTERVAL 1 DAY AS DATE) AS d_fin
  FROM orders
)
SELECT o_orderpriority AS priorite,
       COUNT(*) AS nb_commandes,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS ca
FROM orders JOIN borne b
  ON CAST(o_orderdate AS DATE) BETWEEN b.d_debut AND b.d_fin
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q20 — yyyymmdd smart-date-key rollup (the warehouse date-key formula).
# Reference: insertion_dataware.sql:27,175; dw requetes_clees.sql:276 (F9).
# ---------------------------------------------------------------------------


def q_date_key_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(date_key("l_shipdate").alias("date_key"))
        .agg(F.sum(net_revenue()).cast(MONEY).alias("ca"), F.count("*").alias("nb"))
        .orderBy("date_key")
    )


ORACLE_Q20 = f"""
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 10000
          + EXTRACT(MONTH FROM l_shipdate) * 100
          + EXTRACT(DAY FROM l_shipdate) AS INT) AS date_key,
       CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE) AS ca,
       COUNT(*) AS nb
FROM lineitem GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q21 — CASE segmentation + COALESCE defaults + NULLIF guard, over
# exact decimal sums. Reference: P6/P7/P8 cluster (dw requetes_clees
# .sql:95-96, 5, 9; vues.sql:275).
# ---------------------------------------------------------------------------


def q_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    seg = customer.select(
        F.coalesce(F.col("c_mktsegment"), F.lit("Inconnu")).alias("segment"),
        F.when(F.col("c_acctbal") < 0, F.lit("debiteur"))
        .when(F.col("c_acctbal") < 5000, F.lit("standard"))
        .otherwise(F.lit("premium"))
        .alias("tranche"),
        money("c_acctbal").alias("solde"),
    )
    return (
        seg.groupBy("segment", "tranche")
        .agg(
            F.count("*").alias("nb_clients"),
            round_half_up(
                F.sum("solde").cast("double") / F.nullif(F.count("*"), F.lit(0)), 4
            ).alias("solde_moyen"),
        )
        .orderBy("segment", "tranche")
    )


_Q21_MOYEN = sql_round_half_up(
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / NULLIF(COUNT(*), 0)", 4
)

ORACLE_Q21 = f"""
SELECT COALESCE(c_mktsegment, 'Inconnu') AS segment,
       CASE WHEN c_acctbal < 0 THEN 'debiteur'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tranche,
       COUNT(*) AS nb_clients,
       {_Q21_MOYEN} AS solde_moyen
FROM customer
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q22 — ROLLUP subtotals: region → store → grand total.
# Reference: the "Chiffre d'affaire total des 2 magasins" pivotTable
# with subtotals (pbix page "Magasins & territoires"; SURVEY §2.4 note
# — rollup is the natural Spark spelling of pivot subtotal rows).
# ---------------------------------------------------------------------------


def q_rollup_region_magasin(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup(F.col("r_name"), F.col("s_name"))
        .agg(F.sum(net_revenue()).cast(MONEY).alias("ca"), F.count("*").alias("nb"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("TOTAL")).alias("region"),
            F.coalesce(F.col("s_name"), F.lit("TOTAL")).alias("magasin"),
            "ca",
            "nb",
        )
        .orderBy("region", "magasin")
    )


ORACLE_Q22 = f"""
SELECT COALESCE(r_name, 'TOTAL') AS region,
       COALESCE(s_name, 'TOTAL') AS magasin,
       CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE) AS ca,
       COUNT(*) AS nb
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, s_name)
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q23 — semi-structured props extraction over the events stream table.
# Beyond-reference (no JSON exists in the reference — SURVEY §2.8),
# but a training-data pipeline reads JSON sidecars constantly; the
# extraction stays JVM-side (get_json_object, no UDF).
# ---------------------------------------------------------------------------


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import read_table

    events = read_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            # try_cast: a malformed sidecar value must yield NULL, not
            # kill the job under ANSI arithmetic (probed: bare cast
            # throws CAST_INVALID_INPUT).
            F.get_json_object("props", "$.k").try_cast("long").alias("k"),
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("nb"),
            F.sum("k").alias("sum_k"),
            F.count("k").alias("nb_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# json_valid guard (round-8, pathological-corpus audit): DuckDB's
# json_extract_string HARD-ERRORS on malformed JSON while Spark's
# get_json_object returns NULL — one corrupt sidecar row killed the
# whole oracle. The CASE makes a malformed props yield NULL k on both
# engines; NULL props already does.
_SQL_K = (
    "TRY_CAST(CASE WHEN json_valid(props)"
    " THEN json_extract_string(props, '$.k') END AS BIGINT)"
)

ORACLE_Q23 = f"""
SELECT event_type,
       COUNT(*) AS nb,
       CAST(SUM({_SQL_K}) AS BIGINT) AS sum_k,
       COUNT({_SQL_K}) AS nb_k,
       MAX({_SQL_K}) AS max_k
FROM events
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Pivot / unpivot — the BI matrix reshape (Power BI's matrix visual
# spreads one categorical onto columns; the reference's heatmap view
# is the long form of the same data). ``groupBy().pivot(col, values)``
# with EXPLICIT pivot values is the scale spelling: Spark skips the
# extra distinct-values job and plans a single pass with one
# conditional aggregate per column — identical shuffle shape to the
# plain groupBy. The unpivot rides the built-in melt/stack, restoring
# the long form losslessly.
# ---------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


# The wide matrix is shared between the pivot query and its unpivot
# round-trip: without the memo the unpivot re-ran the 3-join +
# groupBy pivot from scratch (the pair cost ~2x one pivot). The
# persisted frame is tracked, so bench/tests can release the blocks;
# recomputation stays correct (the plan is deterministic) — the memo
# only buys the materialized reuse within a run.
# WeakKeyDictionary keyed by the session (see plans/etl._STAR_CACHE):
# a strong id(spark) key would pin dead sessions + persisted blocks.
_PIVOT_WIDE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _pivot_wide_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_session = _PIVOT_WIDE_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("pays"), F.col("c_mktsegment").alias("segment"),
                net_revenue().alias("rev"))
    )
    out = (
        base.groupBy("pays")
        .pivot("segment", _SEGMENTS)
        .agg(F.sum("rev").cast(MONEY))
    )
    # Matrix cells with no data are 0, not NULL (BI matrix semantics;
    # also the comparator's no-NULL-numeric contract).
    wide = out.select(
        "pays", *[F.coalesce(F.col(s), F.lit(0).cast(MONEY)).alias(s) for s in _SEGMENTS]
    )
    # UNtracked persist, deliberately: the wide matrix is one row per
    # nation (25 rows x 6 cols — bytes, not blocks), and the whole
    # point is surviving the between-query release_persisted() sweep
    # so the unpivot round-trip reuses the materialized 3-join.
    wide = wide.persist()
    per_session[sf_dir] = wide
    return wide


def q_pivot_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue matrix nation × market segment: one row per customer
    nation, one column per segment (explicit value list)."""
    return _pivot_wide_nation_segment(spark, sf_dir).orderBy("pays")


_PIVOT_CELL = (
    "CAST(COALESCE(SUM(CASE WHEN c_mktsegment = '{seg}' THEN {rev} END), 0)"
    " AS DECIMAL(18,2))"
)

ORACLE_PIVOT = f"""
SELECT n_name AS pays,
       {", ".join(
           "CAST(" + _PIVOT_CELL.format(seg=s, rev=SQL_REV) + " AS DOUBLE) AS " + s
           for s in _SEGMENTS
       )}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
"""


def q_unpivot_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: melt the pivot matrix back to long form — the
    built-in unpivot (ids/values melt), dropping the zero-filled
    cells so the long form equals the original grouped frame. Reads
    the SAME persisted wide frame the pivot query produced."""
    wide = _pivot_wide_nation_segment(spark, sf_dir)
    long = wide.unpivot(
        ids=["pays"], values=_SEGMENTS, variableColumnName="segment",
        valueColumnName="ca",
    )
    return long.where(F.col("ca") != 0).orderBy("pays", "segment")


ORACLE_UNPIVOT = f"""
SELECT n_name AS pays,
       c_mktsegment AS segment,
       CAST(CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) AS DOUBLE) AS ca
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1, 2
HAVING CAST(SUM({SQL_REV}) AS DECIMAL(18,2)) <> 0
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Approximate aggregates (beyond-reference, the 100 TB BI posture):
# exact COUNT(DISTINCT) shuffles every distinct value; HLL++ sketches
# (approx_count_distinct) and quantile summaries (percentile_approx)
# keep FIXED-size per-partition state that merges map-side — the plan
# shows partial ObjectHashAggregate, so network cost is
# partitions x sketch size, independent of cardinality. Accuracy is
# pinned in pytest (relative error vs the exact answer), not by an
# oracle — sketch internals differ across engines by design.
# ---------------------------------------------------------------------------


def q_approx_month_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-month: HLL distinct customers (rsd 2%) + quantile
    sketch of order value. Rows-only in the driver gate; error bounds
    vs exact are asserted in tests/test_operators.py."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("mois"))
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_clients"),
            F.percentile_approx(F.col("o_totalprice").cast("double"), [0.5, 0.95], 10_000)
            .alias("pq"),
            F.count("*").alias("nb"),
        )
        .select(
            "mois",
            "approx_clients",
            F.col("pq")[0].alias("approx_p50"),
            F.col("pq")[1].alias("approx_p95"),
            "nb",
        )
        .orderBy("mois")
    )


def approx_error_bounds(orders: DataFrame) -> DataFrame:
    """Driver-hashable quality contract for the sketch family
    (companion to the rows-only ``approx_month_profile``): per
    order-month, the EXACT distinct-customer count and exact
    p50/p95 (replayable values), plus three booleans asserting each
    sketch honours its published error guarantee —

    - ``hll_ok``: |HLL(rsd 2%) - exact| <= max(2, 10% of exact)
      (5x the rsd, plus an absolute floor for single-digit months);
    - ``p50_ok`` / ``p95_ok``: the TRUE RANK of the value
      percentile_approx returned is within eps + 1/n of the target
      quantile (eps = 1/accuracy-class 0.05, 1/n = small-month
      discretization) — the actual KLL/GK contract, unlike a
      value-relative bound, which a wide-spread 2-row month breaks.

    The oracle recomputes the exact columns and asserts the booleans
    TRUE; sketch internals never need to match across engines.
    Zero violations measured at sf0.001/0.01/0.1.

    Scale shape: one grouped agg carrying fixed-size sketch state
    (map-side partial ObjectHashAggregate) + one broadcast join back
    for the rank check — the month domain is bounded, the fact is
    scanned twice (persisted projection), nothing is quadratic.
    """
    from ..runtime import track_persist

    o = track_persist(
        orders
        .select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("mois"),
            F.col("o_totalprice").cast("double").alias("v"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("vc"),
            "o_custkey",
        )
        .persist()
    )
    # COUNT(DISTINCT) must not share an aggregate with the sketch
    # functions: Spark rewrites a mixed distinct+object agg into a
    # pre-aggregation keyed by (mois, o_custkey), which instantiates a
    # percentile/HLL sketch object PER DISTINCT CUSTOMER instead of
    # per month (measured 9.4 s vs 0.9 s at sf0.1). Two aggs joined on
    # the bounded month key keep each plan shape sane; the joined
    # frame is persisted because its sketch outputs become group keys
    # of the rank stage below (re-derivation there is the same trap).
    g_cd = o.groupBy("mois").agg(
        F.countDistinct("o_custkey").alias("exact_clients"),
        F.count(F.lit(1)).alias("nb"),
    )
    g_sk = o.groupBy("mois").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__hll"),
        F.expr("percentile(vc, 0.5)").alias("__p50c"),
        F.expr("percentile(vc, 0.95)").alias("__p95c"),
        F.percentile_approx("v", [0.5, 0.95], 10_000).alias("__pq"),
    )
    g = track_persist(g_cd.join(g_sk, "mois").persist())
    tol = F.lit(0.05) + 1 / F.col("nb")
    ranked = (
        o.join(F.broadcast(g), "mois")
        .groupBy("mois", "nb", "exact_clients", "__hll", "__p50c", "__p95c")
        .agg(
            *[
                (
                    F.sum(F.when(cmp(F.col("v"), F.col("__pq")[i]), 1).otherwise(0))
                    / F.col("nb")
                ).alias(alias)
                for i, q in ((0, "50"), (1, "95"))
                for cmp, alias in (
                    (lambda a, b: a <= b, f"__r{q}_le"),
                    (lambda a, b: a < b, f"__r{q}_lt"),
                )
            ]
        )
    )
    return ranked.select(
        "mois",
        "nb",
        "exact_clients",
        (F.col("__p50c") / 100).alias("exact_p50"),
        (F.col("__p95c") / 100).alias("exact_p95"),
        (
            F.abs(F.col("__hll") - F.col("exact_clients"))
            <= F.greatest(F.lit(2.0), 0.1 * F.col("exact_clients"))
        ).alias("hll_ok"),
        (
            (F.col("__r50_le") >= 0.5 - tol) & (F.col("__r50_lt") <= 0.5 + tol)
        ).alias("p50_ok"),
        (
            (F.col("__r95_le") >= 0.95 - tol) & (F.col("__r95_lt") <= 0.95 + tol)
        ).alias("p95_ok"),
    ).orderBy("mois")


def q_approx_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_error_bounds(_t(spark, sf_dir, "orders"))


ORACLE_APPROX_ERROR_BOUNDS = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
       COUNT(*) AS nb,
       COUNT(DISTINCT o_custkey) AS exact_clients,
       quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.5) / 100
           AS exact_p50,
       quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.95) / 100
           AS exact_p95,
       TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
FROM orders
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (parts rented together)
# ---------------------------------------------------------------------------

_BASKET_TOPK = 25
# Straggler guard: an order with B distinct parts expands to B(B-1)/2
# pairs — quadratic in the one dimension the data model doesn't bound.
# TPC-H-shaped baskets hold ≤13 parts (measured), so the cap is a
# no-op here; at 100 TB it converts a single pathological mega-basket
# (a bot account, a bulk order) from a task-killing straggler into a
# dropped outlier, which is the standard affinity-mining treatment.
_BASKET_CAP = 100


def _capped_basket(li: DataFrame) -> DataFrame:
    """Distinct (order, part) pairs with pathological mega-baskets
    dropped (see _BASKET_CAP note above) — the shared input of the
    co-occurrence counter and the lift scorer."""
    basket = li.select("l_orderkey", "l_partkey").distinct()
    sized = basket.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("basket_n"))
    return basket.join(
        F.broadcast(sized.filter(F.col("basket_n") > _BASKET_CAP)),
        "l_orderkey",
        "left_anti",
    )


def _pair_counts(capped: DataFrame) -> DataFrame:
    """Unordered co-occurrence pair counts over the capped baskets.

    Round-17 rewrite (guide §2.4 — remove shuffles outright): the old
    self-equi-join on ``l_orderkey`` re-executed the whole capped
    frame for each side (the planner does not reuse the exchange
    across the differently-aliased subtrees) and shuffled the basket
    rows twice. Baskets are cap-bounded (≤ ``_BASKET_CAP`` parts), so
    the pair expansion fits a per-group array: collect each basket's
    sorted part list (one exchange), emit the C(n,2) ordered pairs
    with a nested HOF (pure codegen, ``part_a < part_b`` falls out of
    the sort), and count (map-side combined, second exchange). Same
    pair multiset as the join spelling — rows are distinct
    (order, part), so the sorted list is duplicate-free."""
    baskets = (
        capped.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("__parts"))
        .where(F.size("__parts") >= 2)
    )
    sz = F.size("__parts")
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), sz - 2),
            lambda i: F.transform(
                F.sequence(i + 1, sz - 1),
                lambda j: F.struct(
                    F.element_at(F.col("__parts"), (i + 1).cast("int")).alias(
                        "part_a"
                    ),
                    F.element_at(F.col("__parts"), (j + 1).cast("int")).alias(
                        "part_b"
                    ),
                ),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_arr).alias("__p"))
        .select("__p.part_a", "__p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_basket_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part-pairs co-occurring in one order ("rented together" —
    the BI affinity widget behind every recommendation panel).

    Spark shape (round-17): distinct (order, part) → per-basket sorted
    part array → nested-HOF pair expansion → map-side-combined count
    on (part, part) keys (see ``_pair_counts``). The basket-size cap
    above bounds the per-group array and the expansion.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        _pair_counts(_capped_basket(li))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(_BASKET_TOPK)
    )


def q_customer_year_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native set operations (SURVEY §2.7 — the reference's SQL uses
    none, so this is the engine-completeness demonstration): the
    1994/1995 active-customer sets compared with INTERSECT / EXCEPT /
    UNION, reported as one retention-style summary row.

    Spark shape: DataFrame ``intersect`` / ``exceptAll``-free
    ``subtract`` / ``union().distinct()`` — each plans a hash
    aggregate or left-anti join on the distinct key sets (already
    reduced before any set op, so the shuffles carry keys only).
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("y")
    )
    a = o.filter(F.col("y") == 1994).select("o_custkey").distinct()
    b = o.filter(F.col("y") == 1995).select("o_custkey").distinct()
    counts = [
        a.agg(F.count(F.lit(1)).alias("n_1994")),
        b.agg(F.count(F.lit(1)).alias("n_1995")),
        a.intersect(b).agg(F.count(F.lit(1)).alias("n_both")),
        a.subtract(b).agg(F.count(F.lit(1)).alias("n_only_1994")),
        b.subtract(a).agg(F.count(F.lit(1)).alias("n_only_1995")),
        a.union(b).distinct().agg(F.count(F.lit(1)).alias("n_either")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(F.broadcast(c))
    return out


ORACLE_SET_OPS = """
WITH a AS (
  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1994
),
b AS (
  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
)
SELECT (SELECT COUNT(*) FROM a) AS n_1994,
       (SELECT COUNT(*) FROM b) AS n_1995,
       (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_both,
       (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_only_1994,
       (SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)) AS n_only_1995,
       (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_either
"""


_WILSON_Z = 1.96
_RELIABILITY_TOPK = 25
_RELIABILITY_MIN_LINES = 20


def q_supplier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier reliability ranked by the WILSON LOWER BOUND of the
    kept (non-returned, ``l_returnflag <> 'R'``) line proportion —
    the ranking-under-uncertainty correction: a 3/3 supplier must not
    outrank a 9500/10000 one, which a raw-rate sort does. The bound
    shrinks as n falls, so thin samples sort below well-measured
    ones.

    Determinism: the bound is +,-,*,/,sqrt only — every op IEEE
    correctly-rounded — written as the SAME expression tree in Spark
    and the oracle, so the doubles are bit-identical before the final
    rounding.

    Scale shape: one map-side-combined aggregate per supplier over
    the fact scan (two columns read), then a scalar expression and
    TakeOrderedAndProject — no joins, no second pass.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("l_returnflag") != "R").cast("long")).alias("n_ontime"),
    ).filter(F.col("n_lines") >= _RELIABILITY_MIN_LINES)
    z = F.lit(_WILSON_Z)
    n = F.col("n_lines").cast("double")
    p = F.col("n_ontime").cast("double") / n
    wilson = (
        p
        + z * z / (2.0 * n)
        - z * F.sqrt((p * (1.0 - p) + z * z / (4.0 * n)) / n)
    ) / (1.0 + z * z / n)
    return (
        per.select(
            "l_suppkey",
            "n_lines",
            "n_ontime",
            round_half_up(p, 6).alias("ontime_rate"),
            round_half_up(wilson, 6).alias("reliability_lb"),
        )
        .orderBy(F.desc("reliability_lb"), F.asc("l_suppkey"))
        .limit(_RELIABILITY_TOPK)
    )


_SQL_WILSON_P = "(CAST(n_ontime AS DOUBLE) / CAST(n_lines AS DOUBLE))"
_SQL_WILSON_N = "CAST(n_lines AS DOUBLE)"
# z*z MUST be pre-multiplied in Python: DuckDB parses 1.96 as
# DECIMAL(3,2), so a literal 1.96 * 1.96 is the EXACT decimal 3.8416
# — a different double than Spark's fold of
# double(1.96) * double(1.96). Embedding the Python product (the same
# IEEE fold Catalyst constant-folds) keeps the expression trees
# bit-identical, as the docstring promises.
_WILSON_Z2 = _WILSON_Z * _WILSON_Z
_SQL_WILSON = (
    f"({_SQL_WILSON_P} + {_WILSON_Z2!r} / (2.0 * {_SQL_WILSON_N})"
    f" - {_WILSON_Z!r} * sqrt(({_SQL_WILSON_P} * (1.0 - {_SQL_WILSON_P})"
    f" + {_WILSON_Z2!r} / (4.0 * {_SQL_WILSON_N})) / {_SQL_WILSON_N}))"
    f" / (1.0 + {_WILSON_Z2!r} / {_SQL_WILSON_N})"
)

ORACLE_SUPPLIER_RELIABILITY = f"""
WITH per AS (
  SELECT l_suppkey,
         COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ontime
  FROM lineitem GROUP BY 1
  HAVING COUNT(*) >= {_RELIABILITY_MIN_LINES}
)
SELECT l_suppkey, n_lines, n_ontime,
       {sql_round_half_up(_SQL_WILSON_P, 6)} AS ontime_rate,
       {sql_round_half_up(_SQL_WILSON, 6)} AS reliability_lb
FROM per
ORDER BY reliability_lb DESC, l_suppkey ASC
LIMIT {_RELIABILITY_TOPK}
"""


def open_backlog_daily(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Open-order backlog time series by SWEEP-LINE: each order
    contributes +1 on its order date and -1 the day after its last
    line ships; the running sum over the day spine IS the number of
    orders in flight. This turns an interval-overlap count — a range
    join of |days| x |orders| if written naively — into one O(|orders|)
    aggregation plus a window over the tiny day spine.

    Scale shape: the per-order close date is a map-side-combined MAX;
    the per-order span frame feeds three consumers (opens, closes,
    spine bounds), so it is persisted once; the +-1 deltas aggregate
    onto |days| keys; ONLY the |days|-row spine passes through the
    cumulative window (a bounded aggregated frame — the documented
    exception to the no-global-window rule). Output is integer-only,
    so the oracle comparison is exact.
    """
    from ..runtime import track_persist

    o = orders.select("o_orderkey", "o_orderdate")
    close = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("close_date")
    )
    span = track_persist(
        o.join(close, o.o_orderkey == close.l_orderkey)
        .select(
            F.col("o_orderdate").alias("opened"),
            F.date_add(F.col("close_date"), 1).alias("closed_next"),
        )
        .persist()
    )
    opens = span.groupBy(F.col("opened").alias("day")).agg(
        F.count(F.lit(1)).alias("n_opened")
    )
    closes = span.groupBy(F.col("closed_next").alias("day")).agg(
        F.count(F.lit(1)).alias("n_closed")
    )
    from ..functions.spine import day_spine

    spine = day_spine(
        span.agg(F.min("opened").alias("d0"), F.max("closed_next").alias("d1"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(opens, "day", "left")
        .join(closes, "day", "left")
        .select(
            "day",
            F.coalesce("n_opened", F.lit(0)).alias("n_opened"),
            F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
        )
        .withColumn(
            "backlog",
            F.sum(F.col("n_opened") - F.col("n_closed")).over(w),
        )
        .orderBy("day")
    )


def q_orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return open_backlog_daily(
        read_table(spark, sf_dir, "orders"), read_table(spark, sf_dir, "lineitem")
    )


_SQL_BACKLOG_SPINE = sql_day_spine("d0", "d1")

ORACLE_OPEN_BACKLOG = f"""
WITH span AS (
  SELECT o.o_orderdate AS opened,
         CAST(MAX(l.l_shipdate) + INTERVAL 1 DAY AS DATE) AS closed_next
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
opens AS (SELECT opened AS day, COUNT(*) AS n_opened FROM span GROUP BY 1),
closes AS (SELECT closed_next AS day, COUNT(*) AS n_closed FROM span GROUP BY 1),
bounds AS (SELECT MIN(opened) AS d0, MAX(closed_next) AS d1 FROM span),
spine AS ({_SQL_BACKLOG_SPINE} FROM bounds),
daily AS (
  SELECT s.day,
         CAST(COALESCE(o.n_opened, 0) AS BIGINT) AS n_opened,
         CAST(COALESCE(c.n_closed, 0) AS BIGINT) AS n_closed
  FROM spine s
  LEFT JOIN opens o ON s.day = o.day
  LEFT JOIN closes c ON s.day = c.day
)
SELECT day, n_opened, n_closed,
       CAST(SUM(n_opened - n_closed) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS backlog
FROM daily
ORDER BY day
"""


_LIFT_MIN_SUPPORT = 2


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift over the co-occurrence pairs:
    ``lift(a,b) = P(a,b) / (P(a)·P(b))`` estimated over baskets —
    the affinity score that separates "popular with everything"
    pairs from genuinely associated ones (raw counts, the widget's
    default, rank ubiquitous parts first; lift corrects for margin
    popularity — the same correction PMI applies in co-occurrence
    embeddings, minus the log).

    The score is left as the ratio rather than log-lift on purpose:
    ``/`` is IEEE correctly-rounded on both engines while ``ln`` is
    only ~1-ulp libm-accurate, so the ratio hash-matches the oracle
    bit-for-bit where the log may not.

    Scale shape: reuses the capped-basket frame; per-part margins are
    one map-side-combined aggregate; the basket total is a 1-row
    broadcast cross join; the two margin lookups join on the pair
    table AFTER the support filter, so the expensive side is already
    pruned. Top-k is TakeOrderedAndProject.
    """
    li = read_table(spark, sf_dir, "lineitem")
    # The capped frame feeds THREE consumers (total, margins, pair
    # join a+b sides); without persist each one replays the scan +
    # distinct + anti-join. track_persist only REGISTERS the frame
    # for release — the persist() call is ours.
    from ..runtime import track_persist

    capped = track_persist(_capped_basket(li).persist())
    totals = capped.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    # capped rows are distinct (order, part), so a plain count per
    # part IS the number of distinct baskets containing the part.
    item = capped.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    pairs = _pair_counts(capped).filter(F.col("n_orders") >= _LIFT_MIN_SUPPORT)
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "part_a",
            "part_b",
            "n_orders",
            round_half_up(
                F.col("n_orders").cast("double")
                * F.col("n_baskets")
                / F.col("n_a")
                / F.col("n_b"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(_BASKET_TOPK)
    )


ORACLE_BASKET_LIFT = f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
capped AS (
  SELECT * FROM basket
  WHERE l_orderkey NOT IN (
    SELECT l_orderkey FROM basket
    GROUP BY 1 HAVING COUNT(*) > {_BASKET_CAP}
  )
),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM capped),
item AS (SELECT l_partkey, COUNT(*) AS n_item FROM capped GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
  FROM capped a
  JOIN capped b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_LIFT_MIN_SUPPORT}
)
SELECT part_a, part_b, n_orders,
       {sql_round_half_up(
           "CAST(n_orders AS DOUBLE) * n_baskets / ia.n_item / ib.n_item", 6
       )} AS lift
FROM pair
JOIN item ia ON pair.part_a = ia.l_partkey
JOIN item ib ON pair.part_b = ib.l_partkey
CROSS JOIN tot
ORDER BY lift DESC, part_a ASC, part_b ASC
LIMIT {_BASKET_TOPK}
"""


ORACLE_BASKET_PAIRS = f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
capped AS (
  SELECT * FROM basket
  WHERE l_orderkey NOT IN (
    SELECT l_orderkey FROM basket
    GROUP BY 1 HAVING COUNT(*) > {_BASKET_CAP}
  )
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders
FROM capped a
JOIN capped b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT {_BASKET_TOPK}
"""


QUERIES = {
    "basket_pair_counts": q_basket_pair_counts,
    "basket_lift": q_basket_lift,
    "supplier_reliability": q_supplier_reliability,
    "orders_open_backlog_daily": q_orders_open_backlog_daily,
    "customer_year_set_ops": q_customer_year_set_ops,
    "events_json_props": q_events_json_props,
    "approx_month_profile": q_approx_month_profile,
    "approx_error_bounds": q_approx_error_bounds,
    "pivot_nation_segment": q_pivot_nation_segment,
    "unpivot_nation_segment": q_unpivot_nation_segment,
    "rollup_region_magasin": q_rollup_region_magasin,
    "top_parts_by_revenue": q_top_parts_by_revenue,
    "kpi_supplier_month": q_kpi_supplier_month,
    "brand_revenue_share": q_brand_revenue_share,
    "loyal_clients": q_loyal_clients,
    "new_vs_returning": q_new_vs_returning,
    "monthly_revenue": q_monthly_revenue,
    "supplier_brand_heatmap": q_supplier_brand_heatmap,
    "cohorts": q_cohorts,
    "rfm": q_rfm,
    "daily_zscore": q_daily_zscore,
    "mom_yoy": q_mom_yoy,
    "rolling_30d": q_rolling_30d,
    "pareto_brands": q_pareto_brands,
    "top_part_per_brand": q_top_part_per_brand,
    "shipping_delays": q_shipping_delays,
    "parts_never_ordered": q_parts_never_ordered,
    "brand_type_list": q_brand_type_list,
    "month_spine_coverage": q_month_spine_coverage,
    "orders_last_full_month": q_orders_last_full_month,
    "date_key_rollup": q_date_key_rollup,
    "customer_segments": q_customer_segments,
}

ORACLES = {
    "approx_error_bounds": ORACLE_APPROX_ERROR_BOUNDS,
    "basket_pair_counts": ORACLE_BASKET_PAIRS,
    "basket_lift": ORACLE_BASKET_LIFT,
    "supplier_reliability": ORACLE_SUPPLIER_RELIABILITY,
    "orders_open_backlog_daily": ORACLE_OPEN_BACKLOG,
    "customer_year_set_ops": ORACLE_SET_OPS,
    "pivot_nation_segment": ORACLE_PIVOT,
    "unpivot_nation_segment": ORACLE_UNPIVOT,
    "events_json_props": ORACLE_Q23,
    "rollup_region_magasin": ORACLE_Q22,
    "top_parts_by_revenue": ORACLE_Q1,
    "kpi_supplier_month": ORACLE_Q2,
    "brand_revenue_share": ORACLE_Q3,
    "loyal_clients": ORACLE_Q4,
    "new_vs_returning": ORACLE_Q5,
    "monthly_revenue": ORACLE_Q6,
    "supplier_brand_heatmap": ORACLE_Q7,
    "cohorts": ORACLE_Q8,
    "rfm": ORACLE_Q9,
    "daily_zscore": ORACLE_Q10,
    "mom_yoy": ORACLE_Q11,
    "rolling_30d": ORACLE_Q12,
    "pareto_brands": ORACLE_Q13,
    "top_part_per_brand": ORACLE_Q14,
    "shipping_delays": ORACLE_Q15,
    "parts_never_ordered": ORACLE_Q16,
    "brand_type_list": ORACLE_Q17,
    "month_spine_coverage": ORACLE_Q18,
    "orders_last_full_month": ORACLE_Q19,
    "date_key_rollup": ORACLE_Q20,
    "customer_segments": ORACLE_Q21,
}
