"""Graph link analysis: fixed-point PageRank as K unrolled hops.

Link-authority scoring is the mechanism large-scale curation
pipelines use to weight sources (domain authority over a link graph
→ per-document quality priors). The classic spelling — iterate
``r ← (1−α)·e + α·Aᵀ D⁻¹ r`` until convergence — has two problems
for this repo's evidence model: unbounded iteration isn't
SQL-expressible, and float accumulation is summation-order-dependent,
so Spark and DuckDB would drift in the low bits even at the same
iteration count.

Both are solved here by construction:

* **K fixed hops, unrolled.** Curation ranking doesn't need the
  stationary fixpoint — K=3 hops of authority propagation already
  separates hubs from leaves, and a FIXED hop count unrolls into a
  chain of join+groupBy stages (Spark) ≡ a chain of CTEs (DuckDB).
  This makes it the repo's first *iterative* algorithm carrying a
  full value-hash oracle rather than a rows-only check.
* **Exact integer fixed-point.** Ranks live in units of 1e-9
  (``_PR_SCALE``); each hop is ``teleport + (Σ (r // deg)) · 85 //
  100`` — integer division and BIGINT sums only, so every
  intermediate is order-independent and bit-equal across engines
  (both engines' integer division agrees on non-negative operands;
  all quantities here are non-negative). Overflow bound: a node's
  inflow is at most the total rank mass ≈ n·SCALE ≈ 1.6e13 at sf0.1
  (and the ·85 stays < 1.4e15 ≪ 2^63); at 1e9 nodes drop SCALE to
  1e6 — the unit is a parameter, not a constraint.

Scale shape: the edge list is built once (distinct pairs — one
shuffle), persisted, and reused by all K hops; each hop is one
broadcast-or-shuffle hash join (|edges| rows) + one map-side-combined
sum onto |nodes| keys. Nothing quadratic, no driver collect; K is a
constant multiplier on linear work, exactly how GraphX/Pregel
schedules it — but expressed as DataFrame algebra so Catalyst/AQE
plan each hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import track_persist
from ..sources.catalog import read_table

_PR_SCALE = 1_000_000_000  # rank unit: 1e-9 of one teleport mass
_PR_ALPHA_NUM, _PR_ALPHA_DEN = 85, 100  # damping 0.85 as a ratio
_PR_TELEPORT = _PR_SCALE * (_PR_ALPHA_DEN - _PR_ALPHA_NUM) // _PR_ALPHA_DEN
_PR_HOPS = 3


def fixed_point_pagerank(
    pairs: DataFrame, hops: int = _PR_HOPS, scale: int = _PR_SCALE
) -> DataFrame:
    """K-hop damped PageRank over an undirected graph.

    ``pairs`` holds one row per undirected edge (``u``, ``v`` long
    node ids, each pair listed once). Returns (``u``, ``deg``,
    ``rank_fp``) with the fixed-point rank after ``hops`` rounds from
    a uniform start of ``scale`` per node. Isolated nodes (no
    edge) are by definition absent.

    Overflow guard (enforced, not just documented): total rank mass
    is conserved-or-shrinking hop to hop (teleport·n + 0.85·mass ≤
    n·scale whenever mass ≤ n·scale), so any node's inflow is at most
    n·scale and the hop's ``inflow * 85`` stays in BIGINT iff
    ``n·scale ≤ (2^63−1)//85``. Past that bound Spark's non-ANSI long
    multiply would WRAP SILENTLY (quietly wrong ranks) while DuckDB
    raises — an asymmetric failure for an operator sold on bit-equal
    cross-engine results — so the bound is checked up front and fails
    loudly on both engines' behalf: raise, telling the caller to
    lower ``scale`` (the rank unit is a parameter, not a constraint;
    at 1e9 nodes use scale=1e6). The node count is one
    map-side-combined aggregate over the already-persisted edge list.
    """
    teleport = scale * (_PR_ALPHA_DEN - _PR_ALPHA_NUM) // _PR_ALPHA_DEN
    edges = track_persist(
        pairs.select("u", "v")
        .unionByName(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .persist()
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    n_nodes = deg.count()
    if n_nodes * scale > (2**63 - 1) // _PR_ALPHA_NUM:
        raise ValueError(
            f"fixed-point overflow bound: {n_nodes} nodes at rank unit "
            f"scale={scale} puts the hop's damped inflow past BIGINT "
            f"(need n*scale <= {(2**63 - 1) // _PR_ALPHA_NUM}); lower "
            "the scale parameter"
        )
    ranks = deg.select("u", "deg", F.lit(scale).cast("long").alias("r"))
    for _ in range(hops):
        # Each undirected neighbor u sends r//deg to v; the new rank
        # is teleport + damped inflow — all BIGINT, order-independent.
        inflow = (
            edges.join(ranks, "u")
            .select(F.col("v").alias("u"), F.expr("r div deg").alias("c"))
            .groupBy("u")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = deg.join(inflow, "u").select(
            "u",
            "deg",
            (
                F.lit(teleport)
                + F.expr(f"(inflow * {_PR_ALPHA_NUM}) div {_PR_ALPHA_DEN}")
            ).cast("long").alias("r"),
        )
    return ranks.select("u", "deg", F.col("r").alias("rank_fp"))


def q_graph_supplier_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by 3-hop purchase-graph authority.

    The bipartite graph has a node per customer (even id 2·custkey)
    and per supplier (odd id 2·suppkey+1), with an undirected edge
    for every DISTINCT (customer, supplier) purchase relationship —
    edge multiplicity is deliberately collapsed so authority measures
    breadth of the customer base, not volume (volume is kpi_* terrain).
    """
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("u"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("v"),
        )
        .distinct()
    )
    ranks = fixed_point_pagerank(pairs)
    return (
        ranks.where(F.col("u") % 2 == 1)
        .select(
            F.expr("(u - 1) div 2").alias("s_suppkey"),
            F.col("deg").alias("n_customers"),
            F.col("rank_fp").alias("authority_fp"),
        )
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")), "s_suppkey")
        .select("s_suppkey", "s_name", "n_customers", "authority_fp")
        .orderBy(F.col("authority_fp").desc(), F.col("s_suppkey"))
        .limit(20)
    )


def _hop_cte(prev: str, name: str) -> str:
    return f"""{name} AS (
  SELECT d.u AS u, d.deg AS deg,
         CAST({_PR_TELEPORT} + (SUM(s.r // s.deg) * {_PR_ALPHA_NUM})
              // {_PR_ALPHA_DEN} AS BIGINT) AS r
  FROM edges e JOIN {prev} s ON e.u = s.u JOIN deg d ON d.u = e.v
  GROUP BY d.u, d.deg
)"""


ORACLE_SUPPLIER_AUTHORITY = f"""
WITH pairs AS (
  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS u,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS v
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u),
r0 AS (SELECT u, deg, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg),
{_hop_cte('r0', 'r1')},
{_hop_cte('r1', 'r2')},
{_hop_cte('r2', 'r3')}
SELECT CAST((r3.u - 1) // 2 AS BIGINT) AS s_suppkey, s.s_name,
       r3.deg AS n_customers, r3.r AS authority_fp
FROM r3 JOIN supplier s ON s.s_suppkey = (r3.u - 1) // 2
WHERE r3.u % 2 = 1
ORDER BY authority_fp DESC, s_suppkey
LIMIT 20
"""


QUERIES = {
    "graph_supplier_authority": q_graph_supplier_authority,
}

ORACLES = {
    "graph_supplier_authority": ORACLE_SUPPLIER_AUTHORITY,
}
