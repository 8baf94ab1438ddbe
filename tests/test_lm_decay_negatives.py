"""Semantic + plan properties for the round-6 late additions: bigram
LM scoring, hard-negative mining, and time-decay aggregation. (Their
cross-engine value parity runs in test_oracle_parity.py like every
other oracle-bearing entry.)
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
    time_decay_agg,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.lm import (
    bigram_lm_score,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
    hard_negatives_topk,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
    read_table,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lm_score_ranks_fluent_above_gibberish(spark):
    # Docs 1-3 share the same common bigrams; doc 4 is one-off word
    # salad. The model is corpus-trained, so the repeated phrasing has
    # high conditional probability and the salad sits at the smoothing
    # floor.
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the cat sat on the mat"),
        (4, "zq xv bnpl wkrt uude ggha"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert out[1].avg_logp > out[4].avg_logp
    assert out[4].ppl > out[1].ppl
    # identical docs score identically
    assert out[1].avg_logp == out[3].avg_logp


def test_lm_score_short_docs_excluded_and_plan_is_codegen(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, "two words")], "doc_id long, text string"
    )
    res = bigram_lm_score(docs)
    assert [r.doc_id for r in res.collect()] == [2]
    plan = _plan(res)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hard_negatives_labels_differ_and_are_nearest(spark, sf_small):
    emb = read_table(spark, sf_small, "embeddings")
    anchors = emb.filter(F.col("label") == 0)
    out = hard_negatives_topk(emb, anchors, k=5)
    joined = (
        out.join(
            emb.select(F.col("vec_id"), F.col("label").alias("neg_label")),
            "vec_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("q_label"),
            ),
            "query_id",
        )
        .collect()
    )
    assert joined, "expected non-empty hard-negative set"
    assert all(r.neg_label != r.q_label for r in joined)
    # ranks are dense 1..k per anchor
    by_q = {}
    for r in joined:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_time_decay_discounts_old_events(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, "click", 100.0),
        (2, t0 + datetime.timedelta(days=7), "click", 100.0),
        (3, t0 + datetime.timedelta(days=14), "click", 100.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    row = time_decay_agg(events, half_life_days=7.0).collect()[0]
    # weights: 2^-2 + 2^-1 + 2^0 = 175 of the raw 300
    assert row.n_events == 3
    assert abs(row.sum_value - 300.0) < 1e-9
    assert abs(row.decayed_sum - 175.0) < 1e-6


def test_time_decay_plan_shape(spark, sf_small):
    df = time_decay_agg(read_table(spark, sf_small, "events"))
    plan = _plan(df)
    # 1-row reference broadcasts; the only wide exchange is the final
    # bounded-domain group-by (+ its ordering).
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("hashpartitioning(event_type") <= 2
