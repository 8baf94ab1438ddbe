"""Cluster-scale techniques the 100 TB story depends on, proven on
the local session: bucketed co-located joins (no exchange) and
salting rewrites (same answer, skew-spread partitioning)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.functions.skew import (
    salted_collect_set,
    salted_join,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, sf_small):
    """Two tables bucketed identically on the join key must sort-merge
    join with ZERO exchanges — the bucketed scan itself satisfies the
    hash-distribution requirement. This is the write-once/join-many
    amortization a daily 100 TB fact join runs on."""
    orders = read_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = read_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        n_buckets=8,
    )
    try:
        with _no_broadcast(spark):
            joined = read_bucketed(spark, "b_orders").join(
                read_bucketed(spark, "b_lineitem"), "o_orderkey"
            )
            agg = joined.groupBy().agg(F.count("*").alias("n"))
            plan = _plan(joined)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            # And the answer is the plain-join answer.
            n_bucketed = agg.collect()[0]["n"]
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert n_bucketed == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark, sf_small):
    """The salting rewrite must be answer-preserving: inner join of
    events (big, skewed user activity) against a per-user dimension
    equals the plain join row-for-row."""
    events = read_table(spark, sf_small, "events").select(
        "event_id", "user_id", "value"
    )
    users = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("nb"))
        .withColumn("tier", F.when(F.col("nb") >= 10, "heavy").otherwise("light"))
        .select("user_id", "tier")
    )
    with_salt = {
        (r["event_id"], r["tier"])
        for r in salted_join(events, users, ["user_id"], n_salts=8).collect()
    }
    plain = {
        (r["event_id"], r["tier"]) for r in events.join(users, "user_id").collect()
    }
    assert with_salt == plain


def test_salted_join_spreads_keys_over_salts(spark, sf_small):
    """The point of the salt: one key's rows must occupy >1 (key,
    salt) bucket, i.e. the hot key no longer maps to one reducer."""
    events = read_table(spark, sf_small, "events").select("event_id", "user_id")
    top_user = events.groupBy("user_id").count().orderBy(F.desc("count")).first()
    salted = events.filter(F.col("user_id") == top_user["user_id"]).withColumn(
        "__salt", F.pmod(F.xxhash64("event_id", "user_id"), F.lit(8)).cast("int")
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets > 1, "salt failed to spread the hottest key"


def test_salted_collect_set_matches_plain(spark, sf_small):
    events = read_table(spark, sf_small, "events").select("user_id", "event_type")
    two_phase = {
        r["user_id"]: r["event_type_set"]
        for r in salted_collect_set(events, ["user_id"], "event_type").collect()
    }
    plain = {
        r["user_id"]: sorted(r["s"])
        for r in events.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("s"))
        .collect()
    }
    assert two_phase == plain
