"""Slowly-changing-dimension Type 2 versioning.

The reference's dimension refresh is SCD1 — ``ON CONFLICT DO UPDATE``
overwrites attributes in place (insertion_dataware.sql:74-80), losing
history. SCD2 keeps every version with a validity interval: applying
an update batch CLOSES the current row of each changed key
(``valid_to`` = effective date) and APPENDS a new current version.

Spark-first shape — one broadcast-friendly join and a union, no
row-at-a-time merge loop:

1. join current rows to the update batch on the business key;
2. rows whose tracked attributes changed are split into a closed copy
   (valid_to set) and a fresh version (valid_from = effective date);
3. unchanged / unmatched rows pass through untouched; brand-new keys
   append as first versions.

At scale both sides partition by the business key; when the update
batch is dim-sized (the normal case) it broadcasts and the whole
apply is one scan over the current dimension. The operation is a pure
function of (current, updates) — rerunning it is idempotent, matching
the warehouse's deterministic-refresh discipline (plans/etl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table

OPEN_END = "9999-12-31"


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str = "effective_date",
) -> DataFrame:
    """Apply an SCD2 update batch.

    ``current``: one row per (key, version) with ``valid_from``,
    ``valid_to`` (OPEN_END for the live version) and the tracked
    attribute columns. ``updates``: one row per key with the new
    attribute values and ``effective_col``. Returns the full new
    version table.

    Late-arrival contract (out-of-order batches): an update whose
    effective date precedes the live version's ``valid_from`` would
    close that version with ``valid_to < valid_from`` — an inverted
    interval that silently corrupts every as-of lookup downstream.
    Such updates are REJECTED: the plan embeds a ``raise_error`` that
    fires during execution on the first offending row (no extra
    validation pass, fails on a 1000-executor cluster exactly like a
    local run). Backfilling history is a different operation
    (rebuilding closed versions), not a variant of apply; callers with
    genuinely late feeds must re-sort batches by effective date before
    applying. ``effective == valid_from`` is allowed and yields a
    zero-length closed version — the standard same-day-correction
    shape.
    """
    upd = F.broadcast(
        updates.select(
            F.col(key).alias("__k"),
            F.col(effective_col).alias("__eff"),
            *[F.col(c).alias(f"__new_{c}") for c in tracked],
        )
    )
    live = current.where(F.col("valid_to") == OPEN_END)
    closed_history = current.where(F.col("valid_to") != OPEN_END)

    joined = live.join(upd, live[key] == F.col("__k"), "left")
    # Compare tracked columns individually with NULL-safe equality.
    # A concat_ws fingerprint would silently skip NULLs, making e.g.
    # ('a', NULL) and (NULL, 'a') — or NULL -> '' — compare equal and
    # drop the update from history.
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    changed = F.col("__k").isNotNull() & ~same

    passthrough = joined.where(~changed).select(*current.columns)
    # Late-arrival guard (see docstring): ISO 'YYYY-MM-DD' strings
    # compare correctly lexicographically, so one string comparison
    # catches inverted intervals row-by-row inside the scan.
    eff = F.col("__eff").cast("string")
    closed_out = (
        joined.where(changed)
        .withColumn(
            "valid_to",
            F.when(
                eff < F.col("valid_from"),
                F.raise_error(
                    F.concat_ws(
                        " ",
                        F.lit("scd2_apply: out-of-order update for key"),
                        F.col("__k").cast("string"),
                        F.lit("(effective"),
                        eff,
                        F.lit("< live valid_from"),
                        F.col("valid_from"),
                        F.lit(
                            "); re-sort batches by effective date or backfill"
                            " history explicitly"
                        ),
                    )
                ),
            ).otherwise(eff),
        )
        .select(*current.columns)
    )
    new_versions = (
        joined.where(changed)
        .select(
            *[
                F.col(f"__new_{c}").alias(c) if c in tracked
                else F.col("__eff").cast("string").alias(c) if c == "valid_from"
                else F.lit(OPEN_END).alias(c) if c == "valid_to"
                else F.col(c)
                for c in current.columns
            ]
        )
    )
    return closed_history.unionByName(passthrough).unionByName(closed_out).unionByName(
        new_versions
    )


def q_scd2_dim_client(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 demo on dim_client: seed every customer as a first version
    (valid_from 1992-01-01), then apply a deterministic update batch —
    customers with ``c_custkey % 10 = 0`` move to segment 'UPGRADED'
    effective 1998-01-01. Output: the full version table (closed rows
    + unchanged + new versions), oracle-checked in DuckDB."""
    customer = read_table(spark, sf_dir, "customer")
    current = customer.select(
        F.col("c_custkey").alias("client_id"),
        F.col("c_name").alias("nom_client"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
    )
    updates = (
        customer.where(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("client_id"),
            F.lit("UPGRADED").alias("segment"),
            F.lit("1998-01-01").alias("effective_date"),
        )
    )
    out = scd2_apply(current, updates, key="client_id", tracked=["segment"])
    return out.orderBy("client_id", "valid_from")


ORACLE_SCD2 = f"""
WITH seed AS (
  SELECT c_custkey AS client_id, c_name AS nom_client,
         c_mktsegment AS segment,
         '1992-01-01' AS valid_from, '{OPEN_END}' AS valid_to
  FROM customer
),
changed AS (
  SELECT * FROM seed WHERE client_id % 10 = 0 AND segment <> 'UPGRADED'
)
SELECT client_id, nom_client, segment, valid_from, valid_to
FROM seed
WHERE client_id NOT IN (SELECT client_id FROM changed)
UNION ALL
SELECT client_id, nom_client, segment, valid_from, '1998-01-01' AS valid_to
FROM changed
UNION ALL
SELECT client_id, nom_client, 'UPGRADED' AS segment,
       '1998-01-01' AS valid_from, '{OPEN_END}' AS valid_to
FROM changed
ORDER BY client_id, valid_from
"""


def _client_versions(customer: DataFrame) -> DataFrame:
    """The same deterministic version table q_scd2_dim_client emits
    (seed 1992-01-01, custkey%10==0 → 'UPGRADED' effective
    1998-01-01), rebuilt here so the PIT query can consume it without
    touching that entry's registered definition."""
    current = customer.select(
        F.col("c_custkey").alias("client_id"),
        F.col("c_name").alias("nom_client"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
    )
    updates = customer.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("client_id"),
        F.lit("UPGRADED").alias("segment"),
        F.lit("1998-01-01").alias("effective_date"),
    )
    return scd2_apply(current, updates, key="client_id", tracked=["segment"])


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    fact_key: str,
    fact_date,
) -> DataFrame:
    """Kimball point-in-time enrichment: attach to each fact row the
    dimension version valid AT the fact date (``valid_from <= date <
    valid_to``, ISO strings compared lexicographically — the module's
    interval convention). Because versions partition each key's
    timeline, the join is lossless and unique: exactly one version
    matches every fact (pytest-asserted). Plan shape: an equi hash
    join on the business key with the interval test as a join filter —
    no forced broadcast hint, so AQE broadcasts the dim when it fits
    (the normal case) and at 100 TB, where the version table itself is
    huge, both sides hash-partition by key and the
    few-versions-per-key interval scan is a per-row filter, never a
    range-join blowup. (A hard ``F.broadcast`` here would make that
    documented large-dim plan unreachable — the big case would OOM
    instead of shuffling.)"""
    d = fact_date.cast("string")
    return facts.join(
        versions,
        (facts[fact_key] == versions["client_id"])
        & (d >= versions["valid_from"])
        & (d < versions["valid_to"]),
    )


def q_scd2_point_in_time_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-was vs as-is revenue by client segment — THE report SCD2
    exists to make possible. As-was attributes each order to the
    segment its customer was in ON THE ORDER DATE (point-in-time
    join); as-is restates all history under the customer's live
    segment (the SCD1 answer). Upgraded customers' pre-1998 orders
    are the divergence: original segment in as-was, 'UPGRADED' in
    as-is. Money is exact integer cents until one final division."""
    from ..functions.scalar import round_half_up

    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    versions = _client_versions(customer)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    facts = orders.select(
        F.col("o_custkey"), F.col("o_orderdate"), cents.alias("cents")
    )

    as_was = (
        point_in_time_join(facts, versions, "o_custkey", F.col("o_orderdate"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("orders_as_was"),
            F.sum("cents").alias("__c_was"),
        )
    )
    live = versions.where(F.col("valid_to") == OPEN_END).select(
        "client_id", "segment"
    )
    as_is = (
        # Like point_in_time_join: AQE-decided join strategy — the
        # live-version frame is one row per client, small at fixture
        # SFs but unbounded in principle.
        facts.join(live, facts["o_custkey"] == live["client_id"])
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("orders_as_is"),
            F.sum("cents").alias("__c_is"),
        )
    )
    money = lambda c: round_half_up(  # noqa: E731
        F.coalesce(c, F.lit(0)).cast("double") / 100.0, 2
    )
    return (
        as_was.join(as_is, "segment", "full")
        .select(
            "segment",
            F.coalesce("orders_as_was", F.lit(0)).cast("long").alias("orders_as_was"),
            money(F.col("__c_was")).alias("rev_as_was"),
            F.coalesce("orders_as_is", F.lit(0)).cast("long").alias("orders_as_is"),
            money(F.col("__c_is")).alias("rev_as_is"),
        )
        .orderBy("segment")
    )


def _oracle_pit() -> str:
    from ..functions.scalar import sql_round_half_up

    versions = f"""
seed AS (
  SELECT c_custkey AS client_id, c_mktsegment AS segment,
         '1992-01-01' AS valid_from, '{OPEN_END}' AS valid_to
  FROM customer
),
changed AS (
  SELECT * FROM seed WHERE client_id % 10 = 0 AND segment <> 'UPGRADED'
),
versions AS (
  SELECT client_id, segment, valid_from, valid_to FROM seed
  WHERE client_id NOT IN (SELECT client_id FROM changed)
  UNION ALL
  SELECT client_id, segment, valid_from, '1998-01-01' FROM changed
  UNION ALL
  SELECT client_id, 'UPGRADED', '1998-01-01', '{OPEN_END}' FROM changed
),
facts AS (
  SELECT o_custkey, CAST(o_orderdate AS VARCHAR) AS d,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
as_was AS (
  SELECT v.segment, CAST(COUNT(*) AS BIGINT) AS orders_as_was,
         CAST(SUM(f.cents) AS BIGINT) AS c_was
  FROM facts f JOIN versions v
    ON f.o_custkey = v.client_id
   AND f.d >= v.valid_from AND f.d < v.valid_to
  GROUP BY v.segment
),
as_is AS (
  SELECT v.segment, CAST(COUNT(*) AS BIGINT) AS orders_as_is,
         CAST(SUM(f.cents) AS BIGINT) AS c_is
  FROM facts f JOIN versions v
    ON f.o_custkey = v.client_id AND v.valid_to = '{OPEN_END}'
  GROUP BY v.segment
)"""
    money = lambda c: sql_round_half_up(  # noqa: E731
        f"CAST(COALESCE({c}, 0) AS DOUBLE) / 100.0", 2
    )
    return f"""
WITH {versions}
SELECT COALESCE(w.segment, i.segment) AS segment,
       COALESCE(w.orders_as_was, 0) AS orders_as_was,
       {money('w.c_was')} AS rev_as_was,
       COALESCE(i.orders_as_is, 0) AS orders_as_is,
       {money('i.c_is')} AS rev_as_is
FROM as_was w FULL JOIN as_is i ON w.segment = i.segment
ORDER BY segment
"""


QUERIES = {
    "scd2_dim_client": q_scd2_dim_client,
    "scd2_point_in_time_report": q_scd2_point_in_time_report,
}

ORACLES = {
    "scd2_dim_client": ORACLE_SCD2,
    "scd2_point_in_time_report": _oracle_pit(),
}
