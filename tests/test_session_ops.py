"""Behavior tests for the session's new operators: Markov transition
matrix, curriculum quality deciles, association lift, and SemDeDup
semantic dedup — crafted-frame semantics plus the scale-shape
assertions (no single-partition window over raw data). The oracle
parity gate covers corpus-level value equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.funnel import (
    transition_matrix,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
    quality_deciles,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.vectors import (
    semantic_dedup_summary,
)


def test_transition_matrix_counts_and_probabilities(spark):
    rows = [
        # user 1: view -> click -> purchase
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:01:00", 1, "click"),
        (3, "2024-01-01 10:02:00", 1, "purchase"),
        # user 2: view -> view -> click
        (4, "2024-01-02 09:00:00", 2, "view"),
        (5, "2024-01-02 09:05:00", 2, "view"),
        (6, "2024-01-02 09:06:00", 2, "click"),
        # user 3: single event, no transition
        (7, "2024-01-03 08:00:00", 3, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["from_type"], r["to_type"]): r
        for r in transition_matrix(ev).collect()
    }
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("click", "purchase")]["n_transitions"] == 1
    # row-stochastic: view row = 2/3 click + 1/3 view
    assert abs(out[("view", "click")]["p_next"] - 0.666667) < 1e-9
    assert abs(out[("view", "view")]["p_next"] - 0.333333) < 1e-9
    assert out[("click", "purchase")]["p_next"] == 1.0
    # no cross-user chaining: user 1's purchase never transitions
    assert not any(k[0] == "purchase" for k in out)


def test_transition_matrix_window_is_partitioned(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "view")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = transition_matrix(ev)._jdf.queryExecution().executedPlan().toString()
    # The LEAD window must shuffle on user_id (hashpartitioning), not
    # sort all raw events into one partition; the only permissible
    # SinglePartition exchange is the k x k normalizing window's.
    assert "hashpartitioning(user_id" in plan


def test_quality_deciles_ntile_sizes_and_coverage(spark):
    # 23 docs -> NTILE(10): first 3 deciles get 3 docs, the rest 2.
    docs = spark.createDataFrame(
        [(i, "word " * (i + 1) + "end", "en", "src", 1) for i in range(23)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = quality_deciles(docs).collect()
    sizes = {r["decile"]: r["n_docs"] for r in out}
    assert sorted(sizes) == list(range(1, 11))
    assert [sizes[d] for d in range(1, 11)] == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
    assert sum(sizes.values()) == 23
    # deciles are ordered by quality: min of decile d+1 >= max of d
    by_d = {r["decile"]: r for r in out}
    for d in range(1, 10):
        assert by_d[d + 1]["min_quality"] >= by_d[d]["max_quality"]


def test_quality_deciles_small_corpus(spark):
    # n < k: each doc its own bucket 1..n (NTILE semantics).
    docs = spark.createDataFrame(
        [(i, "a few words here", "en", "s", 1) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = quality_deciles(docs).collect()
    assert [r["decile"] for r in out] == [1, 2, 3, 4]
    assert all(r["n_docs"] == 1 for r in out)


def test_semantic_dedup_keeps_first_representative(spark):
    # label 0: vectors 1,2,3 identical -> keep 1, drop 2 and 3.
    # label 1: orthogonal pair -> nothing dropped.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [2.0, 0.0], 0),  # same direction, different norm
        (10, [1.0, 0.0], 1),
        (11, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in semantic_dedup_summary(emb, threshold=0.9).collect()}
    assert out[0]["n_vectors"] == 3 and out[0]["n_dropped"] == 2
    assert out[0]["n_kept"] == 1
    assert out[1]["n_dropped"] == 0 and out[1]["n_kept"] == 2
    assert abs(out[0]["drop_pct"] - 66.6667) < 1e-9


from tests.test_plans import _plan  # the canonical plan-audit helper


def test_deciles_plan_has_no_single_partition_window_over_docs(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        q_corpus_quality_deciles,
    )

    plan = _plan(q_corpus_quality_deciles(spark, sf_small))
    # Ranks must ride the range-bucketed windows; NTILE arithmetic
    # must not reintroduce a SinglePartition window over documents.
    assert "hashpartitioning(__sg_bucket" in plan, plan[:1500]


def test_backlog_plan_joins_spine_not_orders(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
        q_orders_open_backlog_daily,
    )

    plan = _plan(q_orders_open_backlog_daily(spark, sf_small))
    # The cumulative window is allowed exactly once, over the
    # aggregated day spine; the order/lineitem interval pair must
    # never appear as a range (non-equi) join.
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_join_is_cluster_keyed(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.vectors import (
        q_embedding_semantic_dedup,
    )

    plan = _plan(q_embedding_semantic_dedup(spark, sf_small))
    # The pair join must be an equi-join on the cluster key (label) —
    # a regression to a cross product would be the 100 TB killer.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reliability_plan_is_single_agg_no_join(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
        q_supplier_reliability,
    )

    plan = _plan(q_supplier_reliability(spark, sf_small))
    assert "Join" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan
    # partial (map-side) aggregation before the exchange
    assert "partial_count" in plan or "partial" in plan.lower()


def test_anomaly_days_flags_only_outliers(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
        anomaly_days,
    )

    rows = []
    eid = 0
    # 9 normal days at ~100, one spike at 1000
    for d in range(1, 10):
        eid += 1
        rows.append((eid, f"2024-01-0{d} 10:00:00", 1, "view", 100.0 + d))
    rows.append((100, "2024-01-10 10:00:00", 1, "view", 1000.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = anomaly_days(ev).collect()
    assert [str(r["day"]) for r in out] == ["2024-01-10"]
    assert out[0]["day_value"] == 1000.0
    assert out[0]["robust_z"] > 3.0


def test_anomaly_days_constant_series_flags_nothing(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
        anomaly_days,
    )

    rows = [
        (i, f"2024-01-0{i} 10:00:00", 1, "view", 50.0) for i in range(1, 8)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    assert anomaly_days(ev).count() == 0  # MAD=0 -> no division, no flags


def test_wilson_bound_ranks_thin_samples_below(spark):
    import filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus as c

    # supplier 1: 100 lines, 90 kept; supplier 2: 20 lines, 20 kept.
    # Raw rate puts 2 first (1.0 > 0.9); the Wilson bound must rank
    # the well-measured 90/100 above the thin perfect 20/20? No —
    # 20/20 lower bound ~0.839, 90/100 ~0.825: thin-but-perfect still
    # wins here. Use 5x thinner: the min-lines filter excludes <20,
    # so compare 20/20 (lb~0.839) vs 400/360? Instead assert the
    # ordering property directly: the bound is strictly below the raw
    # rate, and a 20/20 bound sits well below 1.0.
    rows = []
    for i in range(100):
        rows.append((1, 1, "A" if i < 90 else "R"))
    for i in range(20):
        rows.append((2, 2, "A"))
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long, l_returnflag string")
    per = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("l_returnflag") != "R").cast("long")).alias("n_ontime"),
    )
    z = F.lit(c._WILSON_Z)
    n = F.col("n_lines").cast("double")
    p = F.col("n_ontime").cast("double") / n
    wilson = (
        p + z * z / (2.0 * n) - z * F.sqrt((p * (1.0 - p) + z * z / (4.0 * n)) / n)
    ) / (1.0 + z * z / n)
    got = {
        r["l_suppkey"]: (r["rate"], r["lb"])
        for r in per.select(
            "l_suppkey", p.alias("rate"), wilson.alias("lb")
        ).collect()
    }
    assert got[1][1] < got[1][0]  # bound strictly below raw rate
    assert got[2][0] == 1.0 and got[2][1] < 0.85  # perfect-but-thin shrinks


def test_open_backlog_sweep_line(spark):
    import datetime as dt

    from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
        open_backlog_daily,
    )

    orders = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1)),
            (2, dt.date(2024, 1, 2)),
            (3, dt.date(2024, 1, 1)),  # no lineitem: excluded
        ],
        "o_orderkey long, o_orderdate date",
    )
    li = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 3)),  # order 1 open Jan1-3
            (1, dt.date(2024, 1, 2)),  # earlier line: MAX wins
            (2, dt.date(2024, 1, 2)),  # order 2 open Jan2 only
        ],
        "l_orderkey long, l_shipdate date",
    )
    out = {str(r["day"]): r for r in open_backlog_daily(orders, li).collect()}
    assert out["2024-01-01"]["backlog"] == 1  # order 1 open
    assert out["2024-01-02"]["backlog"] == 2  # both open
    assert out["2024-01-03"]["backlog"] == 1  # order 2 closed after Jan2
    assert out["2024-01-04"]["backlog"] == 0  # all closed
    assert out["2024-01-01"]["n_opened"] == 1
    assert out["2024-01-02"]["n_opened"] == 1
    assert out["2024-01-03"]["n_closed"] == 1
    assert out["2024-01-04"]["n_closed"] == 1
    # the spine is gap-free from first open to last close+1
    assert sorted(out) == [f"2024-01-0{d}" for d in range(1, 5)]


def test_conversion_latency_chains_after_first_touch(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.funnel import (
        conversion_latency,
    )

    rows = [
        # user 1: purchase 90s after first view
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:01:30", 1, "purchase"),
        # user 2: purchase BEFORE any view -> not a conversion
        (3, "2024-01-01 09:00:00", 2, "purchase"),
        (4, "2024-01-01 09:30:00", 2, "view"),
        # user 3: two purchases after view -> first one counts (30s)
        (5, "2024-01-02 08:00:00", 3, "view"),
        (6, "2024-01-02 08:00:30", 3, "purchase"),
        (7, "2024-01-02 09:00:00", 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = conversion_latency(ev).collect()[0]
    assert out["n_converted"] == 2
    assert out["min_s"] == 30.0
    assert out["max_s"] == 90.0
    assert out["p50_s"] == 60.0  # interpolated midpoint of {30, 90}
    assert out["avg_s"] == 60.0


def test_retention_matrix_triangle(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.retention import (
        retention_matrix,
    )

    rows = [
        # cohort week of 2024-01-01 (Mon): users 1,2 start that week
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-02 10:00:00", 2, "view"),
        # user 1 returns in week +1; user 2 does not
        (3, "2024-01-08 10:00:00", 1, "click"),
        # user 3 starts in week +1 (its own cohort)
        (4, "2024-01-09 10:00:00", 3, "view"),
        # both 1 and 3 active in week +2
        (5, "2024-01-15 10:00:00", 1, "view"),
        (6, "2024-01-16 10:00:00", 3, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in retention_matrix(ev).collect()
    }
    c1 = "2024-01-01"
    c2 = "2024-01-08"
    assert out[(c1, 0)]["cohort_size"] == 2 and out[(c1, 0)]["n_active"] == 2
    assert out[(c1, 1)]["n_active"] == 1
    assert abs(out[(c1, 1)]["retention_pct"] - 50.0) < 1e-9
    assert out[(c1, 2)]["n_active"] == 1
    assert out[(c2, 0)]["cohort_size"] == 1
    assert out[(c2, 1)]["n_active"] == 1
    # offset-0 cells are always 100%
    assert all(
        r["retention_pct"] == 100.0
        for k, r in out.items()
        if k[1] == 0
    )


def test_dup_ratio_counts_non_keepers_per_source(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.retention import (
        dup_ratio_by_source,
    )

    docs = spark.createDataFrame(
        [
            # same canonical token set (order/repeats ignored): 1 is
            # keeper, 2 (same source) and 3 (other source) are dups
            (1, "alpha beta gamma", "en", "web", 16),
            (2, "gamma beta alpha alpha", "en", "web", 22),
            (3, "beta gamma alpha", "en", "books", 16),
            # unique doc
            (4, "totally different text", "en", "web", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in dup_ratio_by_source(docs).collect()}
    assert out["web"]["n_docs"] == 3 and out["web"]["n_dups"] == 1
    assert out["books"]["n_docs"] == 1 and out["books"]["n_dups"] == 1
    assert abs(out["books"]["dup_pct"] - 100.0) < 1e-9


def test_dim_stats_finds_dead_and_constant_dims(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.vectors import (
        dim_stats,
    )

    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.5], 0),
            (2, [0.0, 1.0, -0.5], 0),
            (3, [0.0, 1.0, 0.5], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["dim"]: r for r in dim_stats(emb).collect()}
    assert out[1]["n_zero"] == 3 and out[1]["std_val"] == 0.0  # dead dim
    assert out[2]["mean_val"] == 1.0 and out[2]["std_val"] == 0.0  # constant
    assert out[3]["n_zero"] == 0
    assert abs(out[3]["mean_val"] - 0.166667) < 1e-9
    assert out[3]["min_val"] == -0.5 and out[3]["max_val"] == 0.5
    assert all(r["n_values"] == 3 for r in out.values())


def test_hour_of_week_iso_dow_and_zero_fill(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.funnel import (
        hour_of_week_profile,
    )

    rows = [
        # 2024-01-01 is a MONDAY -> ISO dow 1
        (1, "2024-01-01 09:00:00", 1, "view"),
        (2, "2024-01-01 09:30:00", 1, "view"),
        # 2024-01-07 is a SUNDAY -> ISO dow 7
        (3, "2024-01-07 23:00:00", 1, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["dow"], r["hour"]): r for r in hour_of_week_profile(ev).collect()}
    assert len(out) == 168  # full zero-filled grid
    assert out[(1, 9)]["n_events"] == 2
    assert out[(7, 23)]["n_events"] == 1
    assert out[(3, 12)]["n_events"] == 0
    # chi2 term of an empty cell = expected itself
    exp = 3.0 / 168.0
    assert abs(out[(3, 12)]["chi2_term"] - round(exp, 4)) < 1e-3


def test_pipeline_funnel_stage_attrition(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.text import (
        pipeline_funnel,
    )

    # English (has "the" marker) but punctuation-heavy: q ~= 0.4 < 0.5
    the = "the cat!!! ### $$$ %%% ???"
    docs = spark.createDataFrame(
        [
            # exact duplicates: 1 kept at exact_unique, 2 dropped
            (1, "the cat sat on the mat today it is a fine day", "en", "s", 1),
            (2, "the cat sat on the mat today it is a fine day", "en", "s", 1),
            # canonical dup of 1 (same token set, reordered + repeats)
            (3, "cat the sat on mat the today it is a fine day day", "en", "s", 1),
            # empty text: dropped at nonempty
            (4, "", "en", "s", 0),
            # unique but not English (Spanish markers)
            (5, "el que la de y un es en el que", "es", "s", 1),
            # unique English but low quality (pure stopwords)
            (6, the, "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["stage"]: r for r in pipeline_funnel(docs).collect()}
    assert out["raw"]["n_docs"] == 6 and out["raw"]["pct_of_raw"] == 100.0
    assert out["nonempty"]["n_docs"] == 5
    assert out["exact_unique"]["n_docs"] == 4  # doc 2 dropped
    assert out["canonical_unique"]["n_docs"] == 3  # doc 3 dropped
    assert out["lang_en"]["n_docs"] == 2  # doc 5 dropped
    assert out["quality"]["n_docs"] == 1  # doc 6 dropped
    # monotone non-increasing
    ns = [out[s]["n_docs"] for s in ("raw", "nonempty", "exact_unique",
                                      "canonical_unique", "lang_en", "quality")]
    assert ns == sorted(ns, reverse=True)


def test_readability_orders_prose_above_jargon(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.text import (
        readability,
    )

    docs = spark.createDataFrame(
        [
            # short simple sentences: high reading ease
            (1, "The cat sat. The dog ran. It was fun.", "en", "s", 1),
            # one long polysyllabic sentence: low reading ease
            (2, "Intercontinental organizational repercussions necessitate "
                "comprehensive reevaluation of infrastructural prioritization", "en", "s", 1),
            # no terminal punctuation: sentence count floors at 1
            (3, "just a fragment", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in readability(docs).collect()}
    assert out[1]["n_sentences"] == 3
    assert out[3]["n_sentences"] == 1
    assert out[1]["flesch"] > out[2]["flesch"]
    assert out[2]["flesch"] < 0  # academic soup scores below zero


def test_changepoint_finds_level_shift(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
        changepoint_day,
    )

    rows, eid = [], 0
    # level 10 for days 1-5, level 100 for days 6-10: the CUSUM peak
    # is the last low-level day (day 5).
    for d in range(1, 11):
        eid += 1
        rows.append((eid, f"2024-01-{d:02d} 10:00:00", 1, "view", 10.0 if d <= 5 else 100.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    row = changepoint_day(ev).collect()[0]
    assert str(row["changepoint_day"]) == "2024-01-05"
    # |5*10 - 5*55| = 225 dollars of cumulative deviation at the peak
    assert row["cusum_peak"] == 225.0


def test_type_correlation_signs_and_zero_fill(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        type_volume_correlation,
    )

    rows, eid = [], 0
    # 4 days: "up" counts 1,2,3,4; "down" counts 4,3,2,1 (perfectly
    # anti-correlated); "gap" appears ONLY on day 1 (zero-fill makes
    # its series 2,0,0,0 — without fill it would be a 1-point series)
    for d, (nu, nd) in enumerate([(1, 4), (2, 3), (3, 2), (4, 1)], start=1):
        for _ in range(nu):
            eid += 1
            rows.append((eid, f"2024-01-0{d} 10:00:00", 1, "up"))
        for _ in range(nd):
            eid += 1
            rows.append((eid, f"2024-01-0{d} 11:00:00", 1, "down"))
    rows += [(900, "2024-01-01 09:00:00", 1, "gap"), (901, "2024-01-01 09:01:00", 1, "gap")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["type_a"], r["type_b"]): r for r in type_volume_correlation(ev).collect()}
    assert out[("down", "up")]["pearson_r"] == -1.0
    assert out[("down", "up")]["n_days"] == 4
    # gap's zero-filled series (2,0,0,0) correlates negatively with up
    assert out[("gap", "up")]["pearson_r"] < 0


def test_nation_trend_slope_on_linear_revenue(spark):
    import datetime as dt

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        nation_revenue_trend,
    )

    nation = spark.createDataFrame([(1, "A")], "n_nationkey long, n_name string")
    customer = spark.createDataFrame([(1, 1)], "c_custkey long, c_nationkey long")
    orders = spark.createDataFrame(
        [(i, 1, dt.date(2024, 1, i)) for i in range(1, 4)],
        "o_orderkey long, o_custkey long, o_orderdate date",
    )
    # revenue 100, 200, 300 dollars on days 0,1,2 -> slope 100/day
    lineitem = spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 200.0, 0.0), (3, 300.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    row = nation_revenue_trend(lineitem, orders, customer, nation).collect()[0]
    assert row["nation"] == "A" and row["n_days"] == 3
    assert row["trend_per_day"] == 100.0
    assert row["avg_daily_revenue"] == 200.0
    # a 10% discount scales revenue exactly (integer basis points)
    li_disc = spark.createDataFrame(
        [(1, 100.0, 0.1), (2, 200.0, 0.1), (3, 300.0, 0.1)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    row2 = nation_revenue_trend(li_disc, orders, customer, nation).collect()[0]
    assert row2["trend_per_day"] == 90.0


def test_dim_stats_counts_and_excludes_nan(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.vectors import (
        dim_stats,
    )

    emb = spark.createDataFrame(
        [
            (1, [float("nan"), 1.0], 0),
            (2, [0.5, 1.0], 0),
            (3, [float("nan"), 1.0], 0),  # dim 1: 2 NaN of 3
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["dim"]: r for r in dim_stats(emb).collect()}
    assert out[1]["n_values"] == 3 and out[1]["n_nan"] == 2
    assert out[1]["mean_val"] == 0.5  # over the single clean sample
    assert out[1]["std_val"] == 0.0
    assert out[2]["n_nan"] == 0 and out[2]["mean_val"] == 1.0
    # all-NaN dim reports zeros, never NULL (gate bans NULL numerics)
    all_nan = spark.createDataFrame(
        [(1, [float("nan")], 0), (2, [float("nan")], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    row = dim_stats(all_nan).collect()[0]
    assert row["n_nan"] == 2 and row["mean_val"] == 0.0
    assert row["std_val"] == 0.0 and row["min_val"] == 0.0
    assert row["n_zero"] == 0  # coalesced, never NULL


def test_audio_windows_rms_and_tail_drop(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        audio_window_energy,
    )

    media = spark.createDataFrame(
        [
            # 5 samples at win=4: one full window [1,2,3,4], tail [5] dropped
            (1, "audio", bytearray([1, 2, 3, 4, 5])),
            # exactly two windows of constant 10s
            (2, "audio", bytearray([10] * 8)),
            # non-audio rows are filtered out
            (3, "video", bytearray([9] * 8)),
            # shorter than one window: no rows
            (4, "audio", bytearray([7, 7])),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = audio_window_energy(media, win=4).collect()
    by_key = {(r["media_id"], r["window_idx"]): r for r in rows}
    assert set(by_key) == {(1, 0), (2, 0), (2, 1)}
    assert by_key[(1, 0)]["mean_sample"] == 2.5
    # rms of [1,2,3,4] = sqrt(30/4) = sqrt(7.5)
    import math

    assert abs(by_key[(1, 0)]["rms"] - math.floor(math.sqrt(7.5) * 1e6 + 0.5) / 1e6) < 1e-12
    assert by_key[(2, 0)]["rms"] == 10.0 and by_key[(2, 1)]["mean_sample"] == 10.0


def test_semantic_dedup_never_pairs_across_labels(spark):
    # identical vectors in different labels are NOT near-dups — the
    # cluster bound is the semantic (and the scale) contract.
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = semantic_dedup_summary(emb, threshold=0.5).collect()
    assert all(r["n_dropped"] == 0 for r in out)
