"""Segment-level boilerplate removal + embedding-care operators:
crafted-fixture semantics, properties, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.segments import (
    q_text_segment_dedup,
    segment_dedup,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.vectors import (
    integrity_audit,
    quantize_report,
)


# ---------------------------------------------------------------- segments
@pytest.fixture(scope="module")
def boiler_docs(spark):
    """Three docs sharing a boilerplate line; each also has unique
    lines. Newline mode — the real-world splitter."""
    footer = "subscribe to our newsletter"
    rows = [
        Row(doc_id=1, text=f"alpha body one\n{footer}\nalpha tail"),
        Row(doc_id=2, text=f"{footer}\nbeta body two"),
        Row(doc_id=3, text=f"gamma body three\n{footer}"),
        Row(doc_id=4, text="delta stands alone"),
    ]
    return spark.createDataFrame(rows)


def test_lines_mode_drops_shared_line_keeps_order(spark, boiler_docs):
    out = {
        r["doc_id"]: r
        for r in segment_dedup(boiler_docs, min_docs=3, mode="lines").collect()
    }
    assert out[1]["cleaned_text"] == "alpha body one\nalpha tail"
    assert out[2]["cleaned_text"] == "beta body two"
    assert out[3]["cleaned_text"] == "gamma body three"
    assert out[4]["cleaned_text"] == "delta stands alone"
    assert (out[1]["n_segments"], out[1]["n_kept"]) == (3, 2)
    # no document row invented or deleted
    assert set(out) == {1, 2, 3, 4}


def test_lines_mode_threshold_not_met_is_identity(spark, boiler_docs):
    out = segment_dedup(boiler_docs, min_docs=5, mode="lines").collect()
    orig = {r["doc_id"]: r["text"] for r in boiler_docs.collect()}
    for r in out:
        assert r["cleaned_text"] == orig[r["doc_id"]]
        assert r["n_kept"] == r["n_segments"]


def test_lines_mode_idempotent(spark, boiler_docs):
    once = segment_dedup(boiler_docs, min_docs=3, mode="lines").select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    twice = segment_dedup(once, min_docs=3, mode="lines")
    for r in twice.collect():
        assert r["n_kept"] == r["n_segments"]


def test_fully_boilerplate_doc_survives_empty(spark):
    rows = [Row(doc_id=i, text="same line") for i in range(3)]
    out = segment_dedup(spark.createDataFrame(rows), min_docs=3, mode="lines")
    got = out.collect()
    assert len(got) == 3
    assert all(r["cleaned_text"] == "" and r["n_kept"] == 0 for r in got)


def test_words_mode_has_signal_on_corpus(spark, sf_med):
    """At sf0.01 the 4-word-window pass removes real segments (47
    windows recur in >= 3 docs) but never all of a doc's segments."""
    out = q_text_segment_dedup(spark, sf_med)
    agg = out.agg(
        F.sum("n_segments").alias("total"),
        F.sum("n_kept").alias("kept"),
        F.min("n_kept").alias("min_kept"),
    ).collect()[0]
    assert agg["kept"] < agg["total"]  # something was dropped
    assert agg["min_kept"] > 0  # no doc fully erased at this scale
    # reassembly preserves word order: cleaned text is a subsequence
    # of the original in segment units — spot-check doc with drops
    dropped = out.filter(F.col("n_kept") < F.col("n_segments")).count()
    assert dropped > 0


def test_segment_dedup_plan_shape(spark, boiler_docs):
    plan = segment_dedup(boiler_docs, mode="lines")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    # df-count aggregates on the compact hash key, partial-combined
    assert "partial_count(distinct" in plan or "HashAggregate" in plan


def test_segment_dedup_scan_prunes_to_two_columns(spark, sf_small):
    df = q_text_segment_dedup(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # documents has 5 columns; only doc_id + text should reach the scan
    assert "text" in read_schema and "doc_id" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema, read_schema


# ---------------------------------------------------------------- vectors
def test_integrity_audit_counts_injected_defects(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text="t") for i in range(5)])
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[3.0, 4.0], label=0),      # norm 5
            Row(vec_id=1, embedding=[0.0, 0.0], label=0),      # zero-norm
            Row(vec_id=2, embedding=[float("nan"), 1.0], label=0),  # NaN
            Row(vec_id=3, embedding=[1.0, 2.0, 2.0], label=0),  # bad dim
            Row(vec_id=9, embedding=[1.0, 0.0], label=0),      # orphan
        ]
    ).select("vec_id", F.col("embedding").cast("array<float>"), "label")
    row = integrity_audit(docs, emb).collect()[0]
    assert row["n_docs"] == 5 and row["n_vecs"] == 5
    assert row["n_orphan_vecs"] == 1  # vec_id 9 has no doc
    assert row["n_docs_missing_vec"] == 1  # doc_id 4 has no vec
    assert row["expected_dim"] == 2
    assert row["n_bad_dim"] == 1
    assert row["n_nan_vecs"] == 1
    assert row["n_zero_norm"] == 1
    assert row["norm_max"] == 5.0 and row["norm_min"] == 0.0


def test_quantize_error_bounded_by_half_step(spark, sf_small):
    """int8 max-abs quantization: reconstruction error of any element
    is at most half a quantization step (amax/127/2), up to fp eps."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    emb = read_table(spark, sf_small, "embeddings")
    rep = quantize_report(emb)
    amax_bound = emb.select(
        F.max(
            F.aggregate(
                "embedding",
                F.lit(0.0).cast("double"),
                lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
            )
        ).alias("m")
    ).collect()[0]["m"]
    worst = rep.agg(F.max("max_abs_err").alias("w")).collect()[0]["w"]
    assert worst <= amax_bound / 127.0 / 2.0 * (1 + 1e-9)
    # every label row present, counts sum to table size
    assert rep.agg(F.sum("n_vecs")).collect()[0][0] == emb.count()


def test_quantize_zero_vector_lossless(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.0, 0.0, 0.0], label=7)]
    ).select("vec_id", F.col("embedding").cast("array<float>"), "label")
    row = quantize_report(emb).collect()[0]
    assert row["max_abs_err"] == 0.0 and row["avg_amax"] == 0.0


# ------------------------------------------------------------- epoch order
def test_epoch_order_is_per_epoch_permutation(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import epoch_order
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    n = docs.count()
    out = epoch_order(docs, n_epochs=3)
    per = (
        out.groupBy("epoch")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("position").alias("n_pos"),
            F.min("position").alias("lo"),
            F.max("position").alias("hi"),
        )
        .collect()
    )
    assert len(per) == 3
    for r in per:
        assert (r["n"], r["n_pos"], r["lo"], r["hi"]) == (n, n, 1, n)
    # epochs genuinely reorder: epoch 1 and 2 disagree somewhere
    e1 = out.filter("epoch = 1").select("position", F.col("doc_id").alias("d1"))
    e2 = out.filter("epoch = 2").select("position", F.col("doc_id").alias("d2"))
    diff = e1.join(e2, "position").filter("d1 <> d2").count()
    assert diff > 0


def test_epoch_order_stable_across_recompute(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import epoch_order
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    a = {(r["epoch"], r["doc_id"]): r["position"] for r in epoch_order(docs).collect()}
    b = {(r["epoch"], r["doc_id"]): r["position"] for r in epoch_order(docs).collect()}
    assert a == b


def test_epoch_order_no_single_partition_window(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import epoch_order
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    plan = epoch_order(docs)._jdf.queryExecution().executedPlan().toString()
    # The global rank must ride the range-bucketed spine (local
    # windows hash-partitioned on the bucket column), not a global
    # ROW_NUMBER over SinglePartition.
    assert "hashpartitioning(__sg_bucket" in plan, "expected bucket-partitioned windows"


def test_vector_ops_stay_codegen(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    emb = read_table(spark, sf_small, "embeddings")
    plan = quantize_report(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
