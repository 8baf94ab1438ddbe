"""Semantic + plan properties for RRF hybrid retrieval and the
market-basket pair counts (value parity runs in test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.retrieval import (
    dense_topk,
    rrf_hybrid_search,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
    q_basket_pair_counts,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
    read_table,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dense_topk_self_query_ranks_first(spark, sf_small):
    emb = read_table(spark, sf_small, "embeddings")
    rows = dense_topk(emb, query_vec_id=0, k=5).collect()
    # the query vector's own row has cosine 1.0 and must lead
    assert rows[0].doc_id == 0
    assert abs(rows[0].cosine - 1.0) < 1e-9
    assert all(rows[i].cosine >= rows[i + 1].cosine for i in range(len(rows) - 1))


def test_rrf_rewards_presence_in_both_branches(spark, sf_small):
    docs = read_table(spark, sf_small, "documents")
    emb = read_table(spark, sf_small, "embeddings")
    out = rrf_hybrid_search(docs, emb, ["spark", "merge", "window"]).collect()
    assert out, "expected a non-empty fused ranking"
    both = [r for r in out if r.lex_rank > 0 and r.vec_rank > 0]
    one = [r for r in out if (r.lex_rank > 0) != (r.vec_rank > 0)]
    if both and one:
        # any doc present in both branches outscores the best
        # single-branch doc of equal-or-worse branch ranks
        assert max(r.rrf_score for r in both) >= max(r.rrf_score for r in one)
    # scores are the sum of at most two reciprocal terms
    for r in out:
        assert 0.0 < r.rrf_score <= 2.0 / 61.0 + 1e-9


def test_basket_pairs_are_canonical_and_join_reuses_exchange(spark, sf_small):
    df = q_basket_pair_counts(spark, sf_small)
    rows = df.collect()
    assert rows, "expected co-occurring pairs"
    assert all(r.part_a < r.part_b for r in rows)
    assert all(
        rows[i].n_orders >= rows[i + 1].n_orders for i in range(len(rows) - 1)
    )
    # Round-17 shape pin: the pair expansion is the per-basket
    # nested-HOF explode — no self-join of the capped frame anywhere
    # (the old spelling re-executed it per aliased side and shuffled
    # it twice; ReusedExchange only sometimes rescued it).
    plan = _plan(df)
    assert "Generate" in plan, plan[:3000]
    for join_op in (
        "SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
    ):
        assert join_op not in plan, join_op


def test_basket_pair_count_matches_manual_check(spark):
    rows = [
        (1, 10),
        (1, 20),
        (1, 30),
        (2, 10),
        (2, 20),
        (3, 10),
        (3, 20),
        (3, 20),  # duplicate line: same part twice in one order
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import corpus

    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = basket.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    out = {
        (r.part_a, r.part_b): r.n_orders
        for r in a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .collect()
    }
    assert out == {(10, 20): 3, (10, 30): 1, (20, 30): 1}
