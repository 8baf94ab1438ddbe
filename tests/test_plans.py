"""Physical-plan audits: the plan properties the engine's 100 TB story
depends on, asserted so a regression (lost broadcast, lost pushdown,
reintroduced single-partition window) fails CI loudly.
"""

from __future__ import annotations

import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.queries import corpus
from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_is_take_ordered_not_global_sort(spark, sf_small):
    plan = _plan(corpus.q_top_parts_by_revenue(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_star_join_broadcasts_dims(spark, sf_small):
    plan = _plan(corpus.q_supplier_brand_heatmap(spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_small):
    lineitem = read_table(spark, sf_small, "lineitem")
    df = lineitem.filter(lineitem.l_quantity > 40).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]" in plan, plan


def test_column_pruning_reaches_scan(spark, sf_small):
    plan = _plan(corpus.q_monthly_revenue(spark, sf_small))
    # The scan must read only the three referenced columns, not the
    # 11-column lineitem schema.
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_shipdate" in read_schema
    assert "l_extendedprice" in read_schema
    assert "l_quantity" not in read_schema, read_schema


def test_rfm_has_no_single_partition_window(spark, sf_small):
    plan = _plan(corpus.q_rfm(spark, sf_small))
    # The quintile ranks ride on deterministic range buckets (hash
    # shuffle on __sg_bucket + local windows); a regression to
    # NTILE OVER (ORDER BY …) would plan a window over
    # SinglePartition.
    assert "SinglePartition" not in plan.split("AdaptiveSparkPlan")[0] or (
        "Window" not in plan or "hashpartitioning(__sg_bucket" in plan
    )
    assert "hashpartitioning(__sg_bucket" in plan, "expected bucket-partitioned windows"


def test_agg_has_partial_combine(spark, sf_small):
    plan = _plan(corpus.q_monthly_revenue(spark, sf_small))
    # Map-side combine: HashAggregate appears twice (partial + final).
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_ann_lsh_plan_codegen_friendly(spark, sf_small):
    """Regression guards for the round-3 ANN lessons (PERF.md §8):
    the hyperplane literal matrix must appear in the plan ONCE (not
    re-inlined per signature read — was a 1.2 MB plan), and the
    bucket prefilter must live in a Filter, never in the
    BroadcastNestedLoopJoin condition (which disables whole-stage
    codegen)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
        q_ann_topk_lsh,
    )

    plan = q_ann_topk_lsh(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 300_000, f"plan blew up to {len(plan)} chars — literal re-inlining?"
    # Catalyst merges the prefilter back into the BNLJ condition —
    # harmless for SCALAR bit ops, fatal for higher-order functions
    # (CodegenFallback, evaluated interpreted per pair).
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            low = line.lower()
            for hof in ("zip_with", "exists(", "aggregate(", "transform("):
                assert hof not in low, (
                    f"higher-order function {hof!r} in the join condition "
                    "(CodegenFallback per pair — the round-3 regression)"
                )


def test_no_cartesian_products_in_star_queries(spark, sf_small):
    for name in ("q_kpi_supplier_month", "q_supplier_brand_heatmap", "q_cohorts"):
        plan = _plan(getattr(corpus, name)(spark, sf_small))
        assert "CartesianProduct" not in plan, name


def test_ann_ivf_probe_scoring_is_joinless_block_kernel(spark, sf_small):
    """IVF candidate generation (round-16 shape): base vectors cross
    the Python boundary ONCE each through the probed block kernel —
    no join operator anywhere (the old base×probe broadcast join
    shipped every base vector once per probing query), and certainly
    never a nested-loop or cartesian shape."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
        q_ann_topk_ivf,
    )

    plan = _plan(q_ann_topk_ivf(spark, sf_small))
    assert "MapInPandas" in plan, plan[:2000]
    for bad in (
        "BroadcastHashJoin", "BroadcastNestedLoopJoin",
        "SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
    ):
        assert bad not in plan, bad


def test_asof_join_is_union_window_not_range_join(spark, sf_small):
    """The as-of join must compile to union + keyed window — no join
    operator anywhere (a range join would explode O(|matches|) rows
    and go quadratic on skewed keys)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.asof import (
        q_events_asof_purchase_view,
    )

    plan = _plan(q_events_asof_purchase_view(spark, sf_small))
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, join_op
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan, plan[:3000]


def test_corpus_curation_is_single_scan_single_shuffle(spark, sf_small):
    """The curation pipeline composes language-ID + quality + dedup as
    Column expressions, so the physical plan must scan documents ONCE
    and shuffle ONCE (the fingerprint window) — the naive
    three-operator join would show three scans and doc_id exchanges."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.text import (
        q_corpus_curation,
    )

    plan = _plan(q_corpus_curation(spark, sf_small))
    assert plan.count("Scan parquet") == 1, plan[:3000]
    shuffles = plan.count("Exchange") - plan.count("AQEShuffleRead")
    assert "hashpartitioning(__fp" in plan, plan[:3000]
    assert shuffles <= 2, plan[:3000]  # fingerprint window + final sort


def test_pivot_single_pass_no_distinct_job(spark, sf_small):
    """Explicit pivot values must plan ONE aggregate pass (partial +
    final HashAggregate) — a missing value list would trigger a
    separate distinct-values collection before the pivot."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
        q_pivot_nation_segment,
    )

    plan = _plan(q_pivot_nation_segment(spark, sf_small))
    assert plan.count("HashAggregate") >= 2  # partial + final
    # No pivot_first-of-distinct-scan shape: the five segment columns
    # appear as conditional aggregates in the same pass.
    assert "pivotfirst" in plan.lower() or "CASE WHEN" in plan or "if(" in plan.lower()


def test_scd2_update_batch_broadcasts(spark, sf_small):
    """The SCD2 apply joins the dimension against the (dim-sized)
    update batch — the batch must broadcast, never shuffle the
    dimension."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import (
        q_scd2_dim_client,
    )

    plan = _plan(q_scd2_dim_client(spark, sf_small))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_scrub_is_map_only(spark, sf_small):
    """PII redaction must be a pure projection over the scan — zero
    exchanges; regexp_replace/extract_all are codegen expressions."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        _PII_EMAIL,
        _PII_URL,
        pii_scrub,
    )

    docs = read_table(spark, sf_small, "documents")
    plan = _plan(pii_scrub(docs, "text", {"email": _PII_EMAIL, "url": _PII_URL}))
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("Scan parquet") == 1


def test_bm25_is_one_broadcast_stats_join_plus_takeordered(spark, sf_small):
    """BM25's corpus statistics are a 1-row aggregate broadcast back;
    top-k must be TakeOrderedAndProject, and nothing may sort-merge
    or explode tokens."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        q_text_bm25,
    )

    plan = _plan(q_text_bm25(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" not in plan, "BM25 must not explode tokens for a fixed term list"


def test_repetition_profile_partial_aggregates(spark, sf_small):
    """The gram counts must shrink map-side (partial+final
    HashAggregate) over ONE scan of documents."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        q_text_repetition_profile,
    )

    plan = _plan(q_text_repetition_profile(spark, sf_small))
    assert plan.count("Scan parquet") == 1, plan[:3000]
    assert plan.count("HashAggregate") >= 2


def test_cdc_latest_is_hash_agg_not_window(spark, sf_small):
    """Latest-state compaction must be max_by hash aggregation with
    map-side combine — a regression to the row_number window would
    sort full per-user history and cannot partially aggregate."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.cdc import (
        q_events_cdc_latest,
    )

    plan = _plan(q_events_cdc_latest(spark, sf_small))
    assert "Window" not in plan, plan[:2000]
    agg_nodes = plan.count("HashAggregate") + plan.count("ObjectHashAggregate") + plan.count("SortAggregate")
    assert agg_nodes >= 2, plan[:2000]


def test_tfidf_pairs_no_cartesian_and_partial_agg(spark, sf_small):
    """The tf-idf similarity join must stay inverted-index shaped:
    no cartesian/nested-loop anywhere, partial+final aggregation for
    the tf and dot sums."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        q_dedup_tfidf_pairs,
    )

    plan = _plan(q_dedup_tfidf_pairs(spark, sf_small))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 2


def test_frame_sample_is_shuffle_free_map_pipeline(spark, sf_small):
    """Frame sampling must be scan → project → explode → Arrow map —
    zero exchanges before the mapInPandas node (the final orderBy is
    the only sort)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        extract_frame_features,
        synthesize_media,
    )

    docs = read_table(spark, sf_small, "documents")
    plan = _plan(extract_frame_features(synthesize_media(docs)))
    assert "Exchange" not in plan, plan[:2000]
    assert "MapInPandas" in plan
    assert "Generate" in plan  # the explode of sampled indices


def test_chunking_is_single_scan_no_join(spark, sf_small):
    """Document chunking must be scan → explode → project: no join,
    no aggregation, and the only exchange is the final presentation
    sort."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.chunking import (
        q_text_chunking,
    )

    plan = _plan(q_text_chunking(spark, sf_small))
    for bad in ("Join", "HashAggregate", "Window"):
        assert bad not in plan, bad
    assert "Generate" in plan  # the explode of chunk ids
    assert plan.count("Exchange") <= 1, plan[:2000]


def test_pack_spans_window_is_source_partitioned(spark, sf_small):
    """The packing running sum must ride a window PARTITIONED BY
    source — never a single-partition global window."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.chunking import (
        q_corpus_pack_spans,
    )

    plan = _plan(q_corpus_pack_spans(spark, sf_small))
    assert "Window" in plan
    assert "hashpartitioning(source" in plan, plan[:2000]
    assert "SinglePartition" not in plan.split("AdaptiveSparkPlan")[0]


def test_centroid_outliers_broadcasts_centroids(spark, sf_small):
    """The per-label centroid table (labels × dim, tiny) must join
    back by BROADCAST; the vector side never sort-merge shuffles."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.chunking import (
        q_embedding_centroid_outliers,
    )

    plan = _plan(q_embedding_centroid_outliers(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_skew_profile_is_takeordered_with_scalar_broadcast(spark, sf_small):
    """Top-N hot keys must plan as TakeOrderedAndProject (never a full
    sort) with the 1-row total joined by broadcast."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
        q_join_key_skew_profile,
    )

    plan = _plan(q_join_key_skew_profile(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pack_spans_global_no_single_partition_window(spark, sf_small):
    """The global-sequence packing must ride range-bucketed prefix
    sums — a regression to SUM() OVER (ORDER BY doc_id) would plan a
    window over SinglePartition."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.chunking import (
        q_corpus_pack_spans_global,
    )

    plan = _plan(q_corpus_pack_spans_global(spark, sf_small))
    assert "Window" in plan
    assert "hashpartitioning(__sg_bucket" in plan, plan[:2000]


def test_funnel_never_joins_raw_events_to_raw_events(spark, sf_small):
    """Funnel stages must reduce to per-user MIN aggregates BEFORE
    chaining: every join input on the build side is an aggregated
    per-user frame, so no shuffle moves raw event rows twice. We
    assert the plan has (at least) one aggregate per stage and no
    cartesian/nested-loop joins except the final 1-row base
    broadcast."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.funnel import (
        q_events_funnel,
    )

    plan = _plan(q_events_funnel(spark, sf_small))
    assert "CartesianProduct" not in plan
    agg_nodes = (
        plan.count("HashAggregate")
        + plan.count("ObjectHashAggregate")
        + plan.count("SortAggregate")
    )
    assert agg_nodes >= 6, plan[:2000]  # 3 stages x (partial+final) at least


def test_gap_fill_broadcasts_spine(spark, sf_small):
    """The day spine (bounded by the corpus horizon) must broadcast
    into the user cross join — the fact side never shuffles for it."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.funnel import (
        q_events_gap_filled_daily,
    )

    plan = _plan(q_events_gap_filled_daily(spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
