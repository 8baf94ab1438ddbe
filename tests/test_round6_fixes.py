"""Regression tests for the round-6 robustness fixes:

1. SCD2 change detection is NULL-safe per tracked column (a concat_ws
   fingerprint silently skipped NULLs, dropping updates like
   ('a', NULL) -> (NULL, 'a') from dimension history).
2. connected_components raises instead of returning partially
   propagated labels when the graph diameter exceeds max_iter.
3. embedding_near_dup_pairs handles negative and sparse/hash-like
   vec_ids (raw range blocking truncated negative ids into phantom
   blocks and exploded the pair table on sparse ids).
4. register_all_views memoizes per SESSION, not applicationId — a
   sibling spark.newSession() shares the app id but has its own
   temp-view catalog.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
    connected_components,
    embedding_near_dup_pairs,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import (
    OPEN_END,
    scd2_apply,
)


def test_scd2_null_involving_changes_detected(spark):
    current = spark.createDataFrame(
        [
            (1, "a", None, "1992-01-01", OPEN_END),   # ('a', NULL) -> (NULL, 'a')
            (2, None, None, "1992-01-01", OPEN_END),  # NULL -> 'x'
            (3, "b", "c", "1992-01-01", OPEN_END),    # unchanged
            (4, "d", None, "1992-01-01", OPEN_END),   # 'd' -> NULL
        ],
        "k int, s1 string, s2 string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [
            (1, None, "a", "1998-01-01"),
            (2, "x", None, "1998-01-01"),
            (3, "b", "c", "1998-01-01"),
            (4, None, None, "1998-01-01"),
        ],
        "k int, s1 string, s2 string, effective_date string",
    )
    out = scd2_apply(current, updates, key="k", tracked=["s1", "s2"])
    rows = {(r.k, r.s1, r.s2, r.valid_from, r.valid_to) for r in out.collect()}
    # Keys 1, 2, 4 changed: each contributes a closed row + a new live
    # version. Key 3 is unchanged: passes through as-is.
    assert (1, "a", None, "1992-01-01", "1998-01-01") in rows
    assert (1, None, "a", "1998-01-01", OPEN_END) in rows
    assert (2, None, None, "1992-01-01", "1998-01-01") in rows
    assert (2, "x", None, "1998-01-01", OPEN_END) in rows
    assert (4, "d", None, "1992-01-01", "1998-01-01") in rows
    assert (4, None, None, "1998-01-01", OPEN_END) in rows
    assert (3, "b", "c", "1992-01-01", OPEN_END) in rows
    assert len(rows) == 7


def test_connected_components_raises_on_non_convergence(spark, monkeypatch):
    # A path graph 0-1-2-...-9 has diameter 9; min-label propagation
    # moves the 0 label one hop per round, so max_iter=3 cannot finish.
    # Force the DISTRIBUTED loop (round-16: small graphs now take the
    # size-guarded driver union-find, which has no iteration budget
    # and simply answers correctly) so the guard is still exercised.
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators import dedup

    monkeypatch.setattr(dedup, "_CC_LOCAL_EDGES", 0)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)


def test_connected_components_path_graph_converges(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    labels = connected_components(edges, max_iter=25)
    assert {(r.node, r.label) for r in labels.collect()} == {
        (i, 0) for i in range(10)
    }


def test_embedding_pairs_negative_and_sparse_ids(spark):
    # Two identical-vector pairs; ids negative and hash-like sparse.
    # Raw range blocking would (a) truncate the negative ids into a
    # block with no pair-table row (silently dropped) and (b) make the
    # pair table O((1e9/4096)^2).
    vecs = [
        (-5, [1.0, 0.0, 0.0]),
        (-4, [1.0, 0.0, 0.0]),
        (1_000_000_007, [0.0, 1.0, 0.0]),
        (1_000_000_008, [0.0, 1.0, 0.0]),
        (7, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert got == {
        (-5, -4, 1.0),
        (1_000_000_007, 1_000_000_008, 1.0),
    }


def test_embedding_pairs_dense_ids_unchanged(spark):
    vecs = [(i, [1.0, float(i % 2), 0.0]) for i in range(10)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = embedding_near_dup_pairs(emb, threshold=0.99).collect()
    evens = {(r.vec_a, r.vec_b) for r in got if r.cosine == 1.0}
    assert {(a, b) for a, b in evens if a % 2 == 0 and b % 2 == 0} == {
        (a, b) for a in range(0, 10, 2) for b in range(a + 2, 10, 2)
    }


def test_metrics_cumulative_guard_rejects_unbounded_group(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans import metrics
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.etl import (
        build_star_frames,
    )

    star = build_star_frames(spark, sf_small)
    # Entity-level group (client names scale with the data): the
    # unpartitioned cumulative window must be refused, not silently
    # single-partitioned.
    with pytest.raises(ValueError, match="single-partition"):
        metrics.evaluate(star, ["ca_total", "ca_cumul"], group_by=["nom_client"])
    # Domain-bounded group still evaluates.
    out = metrics.evaluate(star, ["ca_total", "ca_cumul"], group_by=["nom_categorie"])
    assert out.count() > 0


def test_pivot_unpivot_share_wide_frame(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import corpus

    corpus._PIVOT_WIDE_CACHE.clear()
    wide = corpus.q_pivot_nation_segment(spark, sf_small)
    assert wide.count() > 0
    assert len(corpus._PIVOT_WIDE_CACHE) == 1
    long = corpus.q_unpivot_nation_segment(spark, sf_small)
    assert long.count() > 0
    # The unpivot read the SAME memoized wide frame — no rebuild.
    assert len(corpus._PIVOT_WIDE_CACHE) == 1


def test_sibling_session_gets_its_own_views(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.views import (
        register_all_views,
    )

    register_all_views(spark, sf_small)
    assert spark.sql("SELECT COUNT(*) AS n FROM v_clients").first().n > 0
    sibling = spark.newSession()
    try:
        # Same applicationId, fresh (empty) temp-view catalog: the memo
        # must NOT treat the sibling as already registered.
        register_all_views(sibling, sf_small)
        assert sibling.sql("SELECT COUNT(*) AS n FROM v_clients").first().n > 0
    finally:
        # Temp views die with the session object; nothing to clean.
        pass


def test_robust_stats_degenerate_constant_distribution(spark):
    """p05 == p95 (constant values): pinned rows must count in exactly
    one bucket — mean equals the constant, stddev is 0 (the
    double-count bug doubled the mean and drove variance negative)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.health import (
        robust_value_stats,
    )

    rows = [(i, "buy", 5.0) for i in range(20)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = robust_value_stats(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r.winsor_mean == 5.0
    assert r.winsor_std == 0.0
    assert r.p05_value == 5.0 and r.p95_value == 5.0


def test_global_running_sum_keeps_fractional_type(spark):
    """A double value column must yield exact fractional running sums,
    not long-truncated ones."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.ranking import (
        global_running_sum,
    )

    df = spark.createDataFrame(
        [(i, 0.5) for i in range(6)], "id long, amount double"
    )
    out = {
        r.id: r.running_sum
        for r in global_running_sum(df, ["id"], "amount").collect()
    }
    assert out == {0: 0.0, 1: 0.5, 2: 1.0, 3: 1.5, 4: 2.0, 5: 2.5}
    # Integral input still returns exact longs.
    dfi = spark.createDataFrame([(i, 2) for i in range(4)], "id long, n int")
    outi = {r.id: r.running_sum for r in global_running_sum(dfi, ["id"], "n").collect()}
    assert outi == {0: 0, 1: 2, 2: 4, 3: 6}


def test_stream_left_attribution_empty_side_returns_empty(spark, tmp_path):
    """With zero click events the closed region is empty: the query
    must return an empty frame (matching the oracle's NULL cutoff),
    not crash on min(None, ts)."""
    import datetime

    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        q_stream_left_attribution,
    )

    rows = [
        (i, datetime.datetime(2024, 1, 1, 10, i), 1, "purchase", 5.0, "{}")
        for i in range(3)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    ev.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = q_stream_left_attribution(spark, sf)
    assert out.count() == 0
