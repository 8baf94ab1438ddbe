"""Warehouse-maintenance audits as gate-registered operators.

``sources.sinks.delete_by_keys`` (GDPR erasure) and
``compact_small_files`` were pytest-only until round 11; a data-
erasure path deserves driver-hashed evidence, so
``warehouse_delete_report`` runs a REAL erasure — stage a copy of the
orders table, delete every order of the requested customers through
the production ``delete_by_keys`` (broadcast anti-join +
stage-and-swap), then audit the REWRITTEN parquet — and reports a
one-row summary the DuckDB oracle replays relationally: row counts
before/removed/kept, the kept-side money total (content
preservation), and the residual count of erased keys still present,
which a correct erasure leaves at exactly 0. A broken delete (rows
surviving, payload mutated, over-deletion) diverges from the oracle's
relational complement and goes hash-red.

Scale notes: the erasure-request key list broadcasts (erasure batches
are tiny next to the table); the audit is two scans of the rewritten
table (count + sum, and a broadcast semi-join for the residual). At
100 TB both the rewrite and the audit narrow to the partition
directories holding the affected keys — the changed-partition pattern
documented on delete_by_keys itself.

Round 12 adds the layout rewrites to the gate the same way:
``warehouse_layout_report`` (oracle-checked content + file-count
audit of REAL cluster_by_layout / zorder_by_layout rewrites) and
``warehouse_layout_pruning`` (rows-only footer-stats pruning report —
range-partition boundaries are sample-dependent, so per-file
membership has no SQL oracle; pruning bounds are pytest-asserted).
All staging lives on the warehouse volume via ``runtime.scratch_dir``.
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import scratch_dir
from ..sources.catalog import read_table
from ..sources.sinks import cluster_by_layout, delete_by_keys, zorder_by_layout

# Erasure request: every 97th customer asks to be forgotten —
# deterministic, non-empty at every fixture SF, and replayable in SQL.
_ERASE_MOD = 97


def warehouse_delete_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row erasure audit (see module docstring). The staged table
    copy and its backup live on the warehouse volume
    (``runtime.scratch_dir`` — not ``/tmp``, whose tmpfs a table-sized
    copy can exhaust at larger SFs), removed in ``finally``; the
    report's five scalars are collected (1 row, domain-bounded) before
    cleanup so the returned DataFrame owns its data. Timing note
    (PERF.md): this entry's bench cost is dominated by the staging
    copy + rewrite, by design — the REAL erasure is the thing under
    test, not the audit query."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    keys = customer.where(
        F.pmod(F.col("c_custkey"), F.lit(_ERASE_MOD)) == 0
    ).select(F.col("c_custkey").alias("o_custkey"))

    work = scratch_dir("gdpr-delete-")
    path = os.path.join(work, "orders")
    try:
        orders.write.mode("overwrite").parquet(path)
        rows_before = spark.read.parquet(path).count()
        rows_removed = delete_by_keys(spark, path, keys, "o_custkey")
        after = spark.read.parquet(path)
        # o_totalprice is DOUBLE — sum exact integer cents (the
        # nation_revenue_trend floor device) so the total is
        # order-independent across partial-agg orders and engines;
        # COALESCE covers the fully-erased (empty kept side) corpus.
        cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        kept_agg = after.agg(
            F.count(F.lit(1)).alias("rows_kept"),
            F.coalesce(F.sum(cents), F.lit(0)).alias("kept_cents"),
        ).collect()[0]
        residual = after.join(F.broadcast(keys), "o_custkey", "left_semi").count()
        return spark.createDataFrame(
            [
                (
                    rows_before,
                    rows_removed,
                    kept_agg["rows_kept"],
                    residual,
                    kept_agg["kept_cents"] / 100.0,
                )
            ],
            "rows_before long, rows_removed long, rows_kept long, "
            "residual_erased_rows long, kept_total_price double",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_warehouse_delete_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warehouse_delete_report(spark, sf_dir)


# The oracle replays the erasure relationally on the source table: the
# kept side is the complement of the request keys, and a CORRECT
# physical erasure leaves zero residual rows — the literal 0 is the
# specification the Spark-side measurement must hit.
ORACLE_DELETE_REPORT = f"""
WITH erased AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0
),
kept AS (
  SELECT * FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM erased)
)
SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS rows_before,
       CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM kept)
            AS BIGINT) AS rows_removed,
       CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS rows_kept,
       CAST(0 AS BIGINT) AS residual_erased_rows,
       CAST(COALESCE((SELECT SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                      FROM kept), 0) AS DOUBLE) / 100.0 AS kept_total_price
"""


# ---------------------------------------------------------------------------
# Layout rewrites under the gate (round 12): cluster_by_layout and
# zorder_by_layout were pytest-only (footer assertions in
# tests/test_round11_ops.py); these two entries run the REAL rewrites
# through the production sinks on a staged copy of ``orders`` so the
# mechanism executes under the driver gate, bench, and plan hygiene
# like every other operator.
# ---------------------------------------------------------------------------

# 16 files = 4 leading Z-prefix bits = 2 bits of resolution PER
# dimension: each file's bounding box is one (quarter × quarter) of
# the 2-D keyspace, so a sub-quarter band predicate on either
# dimension overlaps ~4 of 16 files. At 8 files the orderkey
# dimension would get a single bit — file boxes spanning key HALVES —
# and no 10%-band could prune at all (measured before this constant
# was raised).
_LAYOUT_N_FILES = 16


_LAYOUT_MEMO: dict = {}


def _staged_layouts(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Stage a copy of ``orders`` per layout and rewrite it: one
    range-clustered on o_orderkey, one Z-ordered on (o_orderkey,
    o_custkey) — both into exactly ``_LAYOUT_N_FILES`` files through
    the production sinks (atomic stage-and-swap inside).

    Memoized per corpus version for the process lifetime (both layout
    entries and the bench loop read the same rewrite; re-staging per
    query would double the setup I/O the delete-report note in
    PERF.md already flags). Staging lives on the warehouse volume
    (``runtime.scratch_dir``), removed at process exit."""
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    key = (os.path.abspath(sf_dir), st.st_mtime_ns, st.st_size)
    hit = _LAYOUT_MEMO.get(key)
    if hit is not None and all(os.path.isdir(p) for p in hit.values()):
        return hit
    work = scratch_dir("layout-")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    orders = read_table(spark, sf_dir, "orders")
    paths: dict[str, str] = {}
    for layout in ("clustered", "zordered"):
        p = os.path.join(work, layout)
        orders.write.mode("overwrite").parquet(p)
        if layout == "clustered":
            cluster_by_layout(spark, p, ["o_orderkey"], n_files=_LAYOUT_N_FILES)
        else:
            zorder_by_layout(
                spark, p, ("o_orderkey", "o_custkey"), n_files=_LAYOUT_N_FILES
            )
        paths[layout] = p
    _LAYOUT_MEMO[key] = paths
    return paths


def _file_ranges(path: str, col: str) -> list[tuple]:
    """Per-parquet-file (min, max) of ``col`` read from footer
    statistics — the exact metadata a stats-pruning scan consults.
    Driver-side loop bounded by the file count (= _LAYOUT_N_FILES)."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, f)).metadata
            lo = hi = None
            for rg in range(meta.num_row_groups):
                rgm = meta.row_group(rg)
                for ci in range(rgm.num_columns):
                    c = rgm.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                out.append((lo, hi))
    return out


def q_warehouse_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked layout-rewrite audit: after BOTH rewrites, each
    staged table must hold exactly the source rows (count + exact-cents
    money total read back from the REWRITTEN parquet — a lossy rewrite
    diverges from the oracle, which computes the same aggregates
    relationally from the source) in exactly ``_LAYOUT_N_FILES`` files
    (the literal in the oracle is the specification, like the
    delete-report's residual ≡ 0). The sample-dependent part of the
    layouts — which rows land in which file — is deliberately NOT here;
    that is q_warehouse_layout_pruning's rows-only terrain."""
    paths = _staged_layouts(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    rows = []
    for layout in sorted(paths):
        p = paths[layout]
        n_files = sum(
            1
            for _root, _dirs, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )
        agg = (
            spark.read.parquet(p)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(cents), F.lit(0)).alias("c"),
            )
            .collect()[0]  # 1 row per layout, domain-bounded
        )
        rows.append((layout, n_files, agg["n"], agg["c"] / 100.0))
    return spark.createDataFrame(
        rows,
        "layout string, files_total long, rows_total long, total_price double",
    )


ORACLE_LAYOUT_REPORT = f"""
WITH src AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,
         CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
              AS DOUBLE) / 100.0 AS total_price
  FROM orders
)
SELECT layout, CAST({_LAYOUT_N_FILES} AS BIGINT) AS files_total,
       rows_total, total_price
FROM src CROSS JOIN (VALUES ('clustered'), ('zordered')) AS l(layout)
ORDER BY layout
"""


def q_warehouse_layout_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only pruning report (range-partition boundaries are
    sample-dependent, so per-file membership has no SQL oracle; the
    content/file-count half of the same rewrites is value-hashed by
    q_warehouse_layout_report): for a mid-range band predicate on
    EACH dimension, how many files' footer [min, max] a stats-pruning
    scan cannot exclude. The clustered layout prunes its leading
    column and nothing else; the Z-ordered layout prunes BOTH — the
    multi-dimensional win the bit-interleave exists for
    (pytest-asserted with hard bounds in tests/test_round11_ops.py
    and test_round12_ops.py; here the numbers run under the driver's
    rows-only check + bench every round)."""
    paths = _staged_layouts(spark, sf_dir)
    rows = []
    for layout in sorted(paths):
        p = paths[layout]
        rec: list = [layout]
        for col in ("o_orderkey", "o_custkey"):
            ranges = _file_ranges(p, col)
            lo = min(r[0] for r in ranges)
            hi = max(r[1] for r in ranges)
            # Band at 26-36% of the keyspace: 10% wide (narrow enough
            # to prune) and inside the [25%, 37.5%) Z-octant — a band
            # straddling a power-of-two boundary (e.g. the 50%
            # midpoint) touches boxes on BOTH sides at every prefix
            # level and measures nothing.
            band_lo = lo + (hi - lo) * 26 // 100
            band_hi = lo + (hi - lo) * 36 // 100
            overlap = sum(
                1 for mn, mx in ranges if mn <= band_hi and mx >= band_lo
            )
            rec.append(len(ranges))
            rec.append(overlap)
        rows.append(
            (rec[0], rec[1], rec[2], rec[4])
        )  # files_total once; per-dim overlap counts
    return spark.createDataFrame(
        rows,
        "layout string, files_total long, files_band_orderkey long, "
        "files_band_custkey long",
    )


QUERIES = {
    "warehouse_delete_report": q_warehouse_delete_report,
    "warehouse_layout_report": q_warehouse_layout_report,
    "warehouse_layout_pruning": q_warehouse_layout_pruning,
}

ORACLES = {
    "warehouse_delete_report": ORACLE_DELETE_REPORT,
    "warehouse_layout_report": ORACLE_LAYOUT_REPORT,
}
