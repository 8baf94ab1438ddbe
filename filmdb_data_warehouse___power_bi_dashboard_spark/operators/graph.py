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
from .dedup import h60, sql_h60

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
    # Round-17 (guide §2.4/§5): persist the degree table too — every
    # hop joins it (K+1 references plus the rank base), and without the
    # pin each reference re-ran the |E|-row aggregation inside the one
    # big job. The overflow-guard count below already materializes it,
    # so the pin costs no extra action; |deg| = |nodes| rows.
    deg = track_persist(
        edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg")).persist()
    )
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


_CC_SCALE = 1_000_000  # clustering coefficient unit: 1e-6
# Broadcast guard for the triangle joins (round-17): an edge set at or
# under this many rows (two BIGINTs each; built hash relation on the
# order of 100 MB at the bound — comfortably inside a production
# executor's broadcast budget, far under the 8 GB hard cap) broadcasts
# its probe sides; a larger graph keeps the sort-merge shape.
# Deliberately a row bound from a real count, not a planner byte
# estimate — aggregate/cached outputs carry no reliable size.
_GRAPH_BROADCAST_EDGES = 2_000_000


def triangle_participation(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph via the
    degree-ordered forward algorithm.

    ``edges`` holds one row per undirected edge (``a`` < ``b``, long
    ids, deduplicated). Every edge is ORIENTED from its
    (degree, id)-smaller endpoint to the larger one — the classic
    trick (Chiba–Nishizeki / Schank–Wagner "forward") that bounds
    every node's out-degree by O(√m), so the path-candidate join
    e1(u→v) ⋈ e2(v→w) is O(m^1.5) worst-case instead of the hub-degree
    quadratic the naive id-ordering pays on skewed graphs. The
    ordering is a pure function of the edge list ((deg, id) tuple
    compare — no floats, no randomness), so the DuckDB oracle replays
    it exactly. Each triangle u<v<w (in degree order) is produced
    exactly once by closing e1(u→v), e2(v→w) with e3(u→w), which the
    total order guarantees is also oriented.

    Returns (``u``, ``deg``, ``triangles``) for every node in at
    least one triangle — BIGINTs only.

    Scale shape: edge list persisted and reused (orientation, both
    path sides, the closing probe); the path join shuffles on v, the
    closing join on (u, w); participation is one explode +
    map-side-combined count onto node keys. No collect, nothing
    beyond O(m^1.5).
    """
    e = track_persist(edges.select("a", "b").persist())
    # Round-17 (guide §3.1 — pick the join strategy deliberately): one
    # count sizes the graph (and pins the edge-build lineage, which
    # previously materialized inside the big job anyway). Under the
    # guard the degree attach, both path-join probe sides and the
    # participation join all BROADCAST — the static planner sort-merge
    # joined them because an aggregate/cache output has no reliable
    # size estimate, shuffling the O(m^1.5) path-candidate stream on
    # (u, w). A guarded hash relation of the oriented edge set
    # (~16 B/edge, ≤ ~32 MB at the bound) keeps the whole candidate
    # expansion inside one codegen stage; a graph past the bound keeps
    # the shuffled shape — at real scale the edge set must not
    # broadcast, so the guard is the 100 TB posture, not a local hack.
    n_e = e.count()
    small = n_e <= _GRAPH_BROADCAST_EDGES
    bc = F.broadcast if small else (lambda df: df)
    deg = (
        e.select(F.col("a").alias("u"))
        .unionByName(e.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    ed = e.join(
        bc(deg.select(F.col("u").alias("a"), F.col("deg").alias("dega"))), "a"
    ).join(bc(deg.select(F.col("u").alias("b"), F.col("deg").alias("degb"))), "b")
    lower = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = track_persist(
        ed.select(
            F.when(lower, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower, F.col("b")).otherwise(F.col("a")).alias("dst"),
        ).persist()
    )
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = e1.join(bc(e2), "v").join(bc(e3), ["u", "w"])
    nodes = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return nodes.join(bc(deg), "u").select("u", "deg", "triangles")


_TRI_SALT = "tri-v1"
_TRI_INV_P = 5  # DOULION sparsification: keep each edge w.p. 1/5


def q_graph_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle count in the sparsified co-purchase
    graph, with the DOULION-unbiased full-graph estimate.

    Nodes are parts; an undirected edge connects two parts bought in
    the same order at least once (per-order line count is bounded —
    ≤7 in the TPC-H-shaped fixture — so the per-order pair expansion
    is a constant factor on the order count, never quadratic in the
    table). The co-purchase graph is DENSE (avg degree ~180 at
    sf0.1), so exact counting pays Σ outdeg² path candidates; the
    published answer is DOULION (Tsourakakis et al., KDD 2009):
    sparsify by keeping each edge independently with probability p,
    count exactly on the sparse graph, scale by p⁻³ — an unbiased
    estimator of the full count whose join cost shrinks by p². Here
    p = 1/5 via a 60-bit md5 bucket over the edge key, so the
    "coin flips" are deterministic and the DuckDB oracle replays the
    identical sample — the estimator's randomness is salted-hash
    randomness, the repo-wide pattern.

    ``triangles`` is the EXACT count on the sampled graph,
    ``est_full_triangles`` the unbiased p⁻³ per-node estimate, and
    ``clustering_fp`` the local clustering coefficient
    2·tri/(deg·(deg−1)) of the sampled graph in exact 1e-6 integer
    units. Sampled-graph degree ties are broken by part key, so the
    frontier is deterministic.
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    # Round-17 (guide §2.4 — remove shuffles outright): the per-order
    # pair expansion used to be a self-equi-join of the distinct
    # (order, part) frame with itself — the planner re-executed the
    # frame for both aliased sides and shuffled it twice. Orders are
    # line-count-bounded, so the expansion fits a per-order array:
    # collect each order's sorted part set (one exchange), emit the
    # C(n,2) ordered pairs with a nested HOF (a < b falls out of the
    # sort), then the same distinct + DOULION filter. Identical edge
    # set — the DuckDB oracle still replays the join spelling.
    orders_parts = (
        lineitem.select("l_orderkey", F.col("l_partkey").cast("long").alias("pk"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("pk")).alias("__parts"))
        .where(F.size("__parts") >= 2)
    )
    _sz = F.size("__parts")
    _pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), _sz - 2),
            lambda i: F.transform(
                F.sequence(i + 1, _sz - 1),
                lambda j: F.struct(
                    F.element_at(F.col("__parts"), (i + 1).cast("int")).alias("a"),
                    F.element_at(F.col("__parts"), (j + 1).cast("int")).alias("b"),
                ),
            ),
        )
    )
    edges = (
        orders_parts.select(F.explode(_pair_arr).alias("__p"))
        .select("__p.a", "__p.b")
        .distinct()
        .where(
            F.pmod(
                h60(
                    F.concat(
                        F.lit(_TRI_SALT + ":"),
                        F.col("a").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                F.lit(_TRI_INV_P),
            )
            == 0
        )
    )
    nodes = triangle_participation(edges)
    return (
        nodes.select(F.col("u").alias("p_partkey"), "deg", "triangles")
        .join(F.broadcast(part.select(F.col("p_partkey").cast("long").alias("p_partkey"), "p_name")), "p_partkey")
        .select(
            "p_partkey",
            "p_name",
            "triangles",
            (F.col("triangles") * _TRI_INV_P**3).cast("long").alias("est_full_triangles"),
            "deg",
            F.expr(f"(triangles * {2 * _CC_SCALE}) div (deg * (deg - 1))")
            .cast("long")
            .alias("clustering_fp"),
        )
        .orderBy(F.col("triangles").desc(), "p_partkey")
        .limit(20)
    )


ORACLE_COPURCHASE_TRIANGLES = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e_full AS (
  SELECT DISTINCT CAST(x.l_partkey AS BIGINT) AS a,
                  CAST(y.l_partkey AS BIGINT) AS b
  FROM items x JOIN items y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
e AS (
  SELECT a, b FROM e_full
  WHERE {sql_h60(
      f"'{_TRI_SALT}:' || CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)"
  )} % {_TRI_INV_P} = 0
),
deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS u FROM e UNION ALL SELECT b AS u FROM e)
  GROUP BY u
),
oriented AS (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e.a < e.b)
              THEN e.a ELSE e.b END AS src,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e.a < e.b)
              THEN e.b ELSE e.a END AS dst
  FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b
),
tri AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM oriented e1
  JOIN oriented e2 ON e1.dst = e2.src
  JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
nodes AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS triangles
  FROM (SELECT u FROM tri UNION ALL SELECT v AS u FROM tri
        UNION ALL SELECT w AS u FROM tri)
  GROUP BY u
)
SELECT n.u AS p_partkey, p.p_name, n.triangles,
       CAST(n.triangles * {_TRI_INV_P**3} AS BIGINT) AS est_full_triangles,
       d.deg,
       CAST((n.triangles * {2 * _CC_SCALE}) // (d.deg * (d.deg - 1)) AS BIGINT)
         AS clustering_fp
FROM nodes n
JOIN deg d ON d.u = n.u
JOIN part p ON CAST(p.p_partkey AS BIGINT) = n.u
ORDER BY triangles DESC, p_partkey
LIMIT 20
"""


QUERIES = {
    "graph_supplier_authority": q_graph_supplier_authority,
    "graph_copurchase_triangles": q_graph_copurchase_triangles,
}

ORACLES = {
    "graph_supplier_authority": ORACLE_SUPPLIER_AUTHORITY,
    "graph_copurchase_triangles": ORACLE_COPURCHASE_TRIANGLES,
}
