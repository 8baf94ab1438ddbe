"""Warehouse data-quality audit: declarative constraints as one report.

The reference warehouse enforces its integrity in-engine (PK/FK
constraints and CHECKs in creationdatwareh.sql; the loader's ON
CONFLICT upserts assume them). A lake has no enforcing engine — the
equivalent operation is a SCHEDULED CONSTRAINT AUDIT (the
Deequ/Great-Expectations stage every production warehouse runs after
each load): referential integrity, key uniqueness, NOT NULL, domain
ranges, and cross-table ordering invariants, each reported as
(checked, violations) so the run is monotonically comparable across
loads.

One row per constraint: (``dq_check``, ``tbl``, ``n_checked``,
``n_violations``) — BIGINTs, ordered by check name. The fixture is
referentially clean but NOT fully clean: its ship dates are drawn
independently of the order date, so ``ord_lineitem_ship_after_order``
reports real violations (2,815 at sf0.01) — live proof the audit
isn't a constant zero, pinned in tests/test_round12b_ops.py alongside
the surgically-corrupted-frame case that plants one violation of
every other kind.

Scan economics (100 TB story): constraints are grouped BY TABLE so
each fact is read ONCE — the three lineitem FKs, the quantity domain
and the ship-after-order invariant all ride a single pass (left joins
against deduplicated key projections + one conditional aggregate),
not five scans. FK joins are equi-joins against key-only projections
(column-pruned to the key, AQE picks broadcast vs shuffle); every
count is map-side combined. No collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table

_OUT_COLS = ("dq_check", "tbl", "n_checked", "n_violations")


def _rows_from_one_pass(agg_row: DataFrame, tbl: str, checks: list[tuple[str, str]]) -> DataFrame:
    """Unpivot a single-row aggregate (n, <violation counts...>) into
    one report row per constraint via ``stack`` (whole-stage codegen,
    no driver round-trip)."""
    stack_args = ", ".join(f"'{name}', {col}" for name, col in checks)
    return agg_row.select(
        F.expr(f"stack({len(checks)}, {stack_args}) AS (dq_check, n_violations)"),
        F.col("n").alias("n_checked"),
    ).select(
        "dq_check",
        F.lit(tbl).alias("tbl"),
        F.col("n_checked").cast("long"),
        F.col("n_violations").cast("long"),
    )


def _viol(cond) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def dq_audit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    customer: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    """Evaluate the constraint suite (module docstring) and return the
    ordered report."""
    # --- lineitem: one pass, five constraints -------------------------
    o_keys = orders.select("o_orderkey", "o_orderdate").distinct()
    p_keys = part.select("p_partkey").distinct()
    s_keys = supplier.select("s_suppkey").distinct()
    li = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(o_keys, lineitem.l_orderkey == o_keys.o_orderkey, "left")
        .join(p_keys, lineitem.l_partkey == p_keys.p_partkey, "left")
        .join(s_keys, lineitem.l_suppkey == s_keys.s_suppkey, "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _viol(F.col("o_orderkey").isNull()).alias("fk_o"),
            _viol(F.col("p_partkey").isNull()).alias("fk_p"),
            _viol(F.col("s_suppkey").isNull()).alias("fk_s"),
            _viol(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50)
            ).alias("dom_q"),
            _viol(
                F.col("o_orderdate").isNotNull()
                & (F.col("l_shipdate") < F.col("o_orderdate"))
            ).alias("shp"),
        )
    )
    li_rows = _rows_from_one_pass(
        li,
        "lineitem",
        [
            ("fk_lineitem_orders", "fk_o"),
            ("fk_lineitem_part", "fk_p"),
            ("fk_lineitem_supplier", "fk_s"),
            ("dom_lineitem_quantity", "dom_q"),
            ("ord_lineitem_ship_after_order", "shp"),
        ],
    )
    # --- orders: one pass, three constraints --------------------------
    c_keys = customer.select("c_custkey").distinct()
    od = (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(c_keys, orders.o_custkey == c_keys.c_custkey, "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _viol(F.col("c_custkey").isNull()).alias("fk_c"),
            _viol(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
            ).alias("dom_tp"),
            (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
            .cast("long")
            .alias("pk_dup"),
        )
    )
    od_rows = _rows_from_one_pass(
        od,
        "orders",
        [
            ("fk_orders_customer", "fk_c"),
            ("dom_orders_totalprice", "dom_tp"),
            ("pk_orders_unique", "pk_dup"),
        ],
    )
    # --- customer / documents: single-table passes --------------------
    cu = customer.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) - F.count_distinct("c_custkey")).cast("long").alias("pk_dup"),
    )
    cu_rows = _rows_from_one_pass(cu, "customer", [("pk_customer_unique", "pk_dup")])
    dc = documents.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _viol(F.col("text").isNull()).alias("nn_text"),
    )
    dc_rows = _rows_from_one_pass(dc, "documents", [("nn_documents_text", "nn_text")])
    return (
        li_rows.unionByName(od_rows)
        .unionByName(cu_rows)
        .unionByName(dc_rows)
        .orderBy("dq_check")
    )


def q_warehouse_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_audit(
        read_table(spark, sf_dir, "lineitem"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "part"),
        read_table(spark, sf_dir, "supplier"),
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "documents"),
    )


ORACLE_DQ_AUDIT = """
WITH li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_o,
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_p,
         CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_s,
         CAST(SUM(CASE WHEN l.l_quantity IS NULL OR l.l_quantity < 1
                         OR l.l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS dom_q,
         CAST(SUM(CASE WHEN o.o_orderdate IS NOT NULL
                        AND l.l_shipdate < o.o_orderdate
                       THEN 1 ELSE 0 END) AS BIGINT) AS shp
  FROM lineitem l
  LEFT JOIN (SELECT DISTINCT o_orderkey, o_orderdate FROM orders) o
    ON l.l_orderkey = o.o_orderkey
  LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
    ON l.l_partkey = p.p_partkey
  LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
    ON l.l_suppkey = s.s_suppkey
),
od AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_c,
         CAST(SUM(CASE WHEN o.o_totalprice IS NULL OR o.o_totalprice <= 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS dom_tp,
         CAST(COUNT(*) - COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS pk_dup
  FROM orders o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
),
cu AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS pk_dup
  FROM customer
),
dc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_text
  FROM documents
)
SELECT * FROM (
  SELECT 'fk_lineitem_orders' AS dq_check, 'lineitem' AS tbl, n AS n_checked,
         fk_o AS n_violations FROM li
  UNION ALL SELECT 'fk_lineitem_part', 'lineitem', n, fk_p FROM li
  UNION ALL SELECT 'fk_lineitem_supplier', 'lineitem', n, fk_s FROM li
  UNION ALL SELECT 'dom_lineitem_quantity', 'lineitem', n, dom_q FROM li
  UNION ALL SELECT 'ord_lineitem_ship_after_order', 'lineitem', n, shp FROM li
  UNION ALL SELECT 'fk_orders_customer', 'orders', n, fk_c FROM od
  UNION ALL SELECT 'dom_orders_totalprice', 'orders', n, dom_tp FROM od
  UNION ALL SELECT 'pk_orders_unique', 'orders', n, pk_dup FROM od
  UNION ALL SELECT 'pk_customer_unique', 'customer', n, pk_dup FROM cu
  UNION ALL SELECT 'nn_documents_text', 'documents', n, nn_text FROM dc
)
ORDER BY dq_check
"""


QUERIES = {"warehouse_dq_audit": q_warehouse_dq_audit}
ORACLES = {"warehouse_dq_audit": ORACLE_DQ_AUDIT}
