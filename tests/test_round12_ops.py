"""Round-12 additions: image dedup detect→act completion (clusters +
canonical keep), the learned quality-classifier inference stage, the
layout rewrites as gate entries, and the round's hardening fixes
(AQE-decided joins instead of forced broadcasts, the PageRank overflow
guard, the bootstrap oracle's degenerate-shape parity). Oracle
equivalence for the oracle-bearing entries is covered by
tests/test_oracle_parity.py; this file asserts what the oracle cannot
see."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.classifier import (
    _MIN_DF,
    _W_OFF,
    _W_SPAN,
    quality_classifier_scores,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
    ascii_guarded,
    image_dedup_keep,
    image_dhash_pairs,
    synthesize_media,
)


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


# ---------------------------------------------------------------------------
# Image dedup keep (pairs -> components -> canonical keep)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def keep_frames(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    media = ascii_guarded(
        synthesize_media(read_table(spark, sf_small, "documents"))
    )
    pairs = image_dhash_pairs(media).collect()
    kept = image_dedup_keep(media).collect()
    return pairs, kept


def test_image_dedup_keep_one_keeper_per_cluster(keep_frames):
    _pairs, kept = keep_frames
    assert kept, "sf0.001 fixture must produce at least one near-dup cluster"
    by_cluster: dict = {}
    for r in kept:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1, f"cluster {cid}: {len(keepers)} keepers"
        k = keepers[0]
        b_max = max(m.payload_bytes for m in members)
        assert k.payload_bytes == b_max
        # ties -> smallest media_id among the argmax set
        assert k.media_id == min(
            m.media_id for m in members if m.payload_bytes == b_max
        )
        # min-label components: cluster id IS the smallest member id
        assert cid == min(m.media_id for m in members)


def test_image_dedup_keep_membership_covers_pairs(keep_frames):
    pairs, kept = keep_frames
    label = {r.media_id: r.cluster_id for r in kept}
    for p in pairs:
        assert label.get(p.media_a) is not None
        assert label[p.media_a] == label[p.media_b], (
            f"pair ({p.media_a},{p.media_b}) split across clusters"
        )


def test_image_dedup_keep_prefers_larger_payload(spark):
    # Two identical 100-byte payloads plus a LARGER 200-byte near-dup:
    # all-zero payloads have zero cell sums at ANY length (a constant
    # NONZERO byte would not — the 1-vs-2-byte proportional slices
    # make unequal sums), so all three share the all-zero dHash
    # (hamming 0) and the keeper must be the big copy, not the
    # smallest id.
    media = spark.createDataFrame(
        [
            (1, "image", b"\x00" * 100),
            (2, "image", b"\x00" * 100),
            (3, "image", b"\x00" * 200),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r for r in image_dedup_keep(media).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r.cluster_id == 1 for r in rows.values())
    assert rows[3].keep and not rows[1].keep and not rows[2].keep


# ---------------------------------------------------------------------------
# Learned quality-classifier inference
# ---------------------------------------------------------------------------


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_quality_classifier_matches_bruteforce(spark):
    docs = spark.createDataFrame(
        [
            (1, "red fish blue fish"),
            (2, "red red dog"),
            (3, "blue dog dog dog"),
            (4, "unseen tokens entirely novel"),  # all OOV at min_df=2
            (5, None),  # NULL text: no row in the output
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in quality_classifier_scores(docs, min_df=2).collect()
    }
    texts = {1: "red fish blue fish", 2: "red red dog", 3: "blue dog dog dog",
             4: "unseen tokens entirely novel"}
    df_count: dict = {}
    for t in texts.values():
        for tok in set(t.split(" ")):
            df_count[tok] = df_count.get(tok, 0) + 1
    w = {
        tok: _h60_py(tok) % _W_SPAN - _W_OFF
        for tok, n in df_count.items()
        if n >= 2
    }
    assert set(got) == set(texts)
    for doc_id, t in texts.items():
        toks = t.split(" ")
        logit = sum(w.get(tok, 0) for tok in toks)
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.logit_fp == logit
        assert r.quality_pass == (logit >= 0)
    assert got[4].logit_fp == 0 and got[4].quality_pass  # OOV fallback


def test_quality_classifier_vocab_is_min_df_capped(spark):
    """The fixture corpus's 31-token vocabulary is all high-df, so the
    cap is exercised on a synthetic long-tail corpus: head tokens in
    every doc, a unique tail token per doc (df=1)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.classifier import (
        token_weight_table,
    )

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("head common words rare"), F.col("id")).alias("text"),
    )
    vocab = [r.tok for r in token_weight_table(docs, min_df=_MIN_DF).collect()]
    assert sorted(vocab) == ["common", "head", "words"], vocab


def test_quality_classifier_no_forced_broadcast(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert "resolvedhint" not in _analyzed(
        quality_classifier_scores(docs)
    ).lower()


# ---------------------------------------------------------------------------
# Layout rewrites under the gate
# ---------------------------------------------------------------------------


def test_layout_report_preserves_content(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.maintenance import (
        _LAYOUT_N_FILES,
        q_warehouse_layout_report,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    rows = {r.layout: r for r in q_warehouse_layout_report(spark, sf_small).collect()}
    assert set(rows) == {"clustered", "zordered"}
    n_orders = read_table(spark, sf_small, "orders").count()
    for r in rows.values():
        assert r.files_total == _LAYOUT_N_FILES
        assert r.rows_total == n_orders


def test_layout_pruning_shape(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.maintenance import (
        q_warehouse_layout_pruning,
    )

    rows = {
        r.layout: r for r in q_warehouse_layout_pruning(spark, sf_small).collect()
    }
    c, z = rows["clustered"], rows["zordered"]
    # Clustered: near-perfect pruning on the leading column, none on
    # the other (every file spans the full custkey range).
    assert c.files_band_orderkey <= c.files_total // 4
    assert c.files_band_custkey == c.files_total
    # Z-ordered: real pruning on BOTH dimensions — the property the
    # bit-interleave exists for. Quantile-placed file boundaries
    # straddle Z-octants, so the bound is conservative (strictly
    # better than no pruning on each dim, and better than clustered
    # on the non-leading dim).
    assert z.files_band_orderkey < z.files_total
    assert z.files_band_custkey < z.files_total
    assert z.files_band_custkey < c.files_band_custkey


# ---------------------------------------------------------------------------
# Hardening fixes
# ---------------------------------------------------------------------------


def test_pagerank_overflow_guard_raises(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.graph import (
        fixed_point_pagerank,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "u long, v long"
    )
    with pytest.raises(ValueError, match="overflow bound"):
        fixed_point_pagerank(pairs, scale=2**62)


def test_pagerank_scale_parameter_still_exact(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.graph import (
        fixed_point_pagerank,
    )

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    # star: 2 is the hub. teleport = 15, hop: inflow*85//100.
    got = {r.u: r.rank_fp for r in fixed_point_pagerank(pairs, hops=1, scale=100).collect()}
    # deg: 1->1, 2->2, 3->1; start r=100 each.
    # node1 inflow = r2//deg2 = 50 -> 15 + 50*85//100 = 57; node3 same.
    # node2 inflow = 100//1 + 100//1 = 200 -> 15 + 170 = 185.
    assert got == {1: 57, 2: 185, 3: 57}


def test_linkage_no_forced_broadcast_and_high_cardinality(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.linkage import (
        fuzzy_match_report,
    )

    # 3000 distinct names, each its own block: completes without any
    # forced vocabulary broadcast and yields no fuzzy blocks.
    part = spark.range(3000).select(
        F.concat(F.lit("name"), F.col("id"), F.lit(" widget")).alias("p_name")
    )
    df = fuzzy_match_report(part)
    assert "resolvedhint" not in _analyzed(df).lower()
    assert df.count() == 0


def test_point_in_time_join_no_forced_broadcast(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import (
        point_in_time_join,
    )

    facts = spark.createDataFrame(
        [(1, "1995-06-01")], "client_id_f long, d string"
    ).select(F.col("client_id_f").alias("k"), "d")
    versions = spark.createDataFrame(
        [(1, "A", "1992-01-01", "9999-12-31")],
        "client_id long, segment string, valid_from string, valid_to string",
    )
    joined = point_in_time_join(facts, versions, "k", F.col("d"))
    assert "resolvedhint" not in _analyzed(joined).lower()
    assert joined.count() == 1


def test_bootstrap_oracle_degenerate_all_zero_replicates():
    """ADVICE r11: if every replicate resamples zero rows the Spark
    side emits 0 rows; the oracle's EXISTS guard must mirror that
    instead of emitting a NULL-CI row. Forcing the degenerate corpus
    through md5 draws is infeasible (P ~ e^-32n), so the oracle's
    `means` CTE is emptied surgically and the final shape asserted."""
    import duckdb

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.trend import (
        ORACLE_BOOTSTRAP_CI,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT 1 AS o_orderkey, 100.0 AS o_totalprice"
    )
    assert con.execute(ORACLE_BOOTSTRAP_CI).df().shape[0] == 1  # normal path
    forced_empty = ORACLE_BOOTSTRAP_CI.replace("HAVING SUM", "HAVING 1=0 AND SUM")
    assert forced_empty != ORACLE_BOOTSTRAP_CI
    assert con.execute(forced_empty).df().shape[0] == 0, (
        "oracle must emit ZERO rows when every replicate is empty "
        "(the Spark side's groupBy-over-empty shape)"
    )


def test_scratch_dir_on_warehouse_volume():
    import shutil

    from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import scratch_dir

    d = scratch_dir("unit-")
    try:
        assert os.path.isdir(d)
        assert not d.startswith("/tmp")
        assert os.path.join("spark-warehouse", "scratch") in d
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Privacy family: k-anonymity audit + DP geometric release
# ---------------------------------------------------------------------------


def test_k_anonymity_report_matches_bruteforce(spark, sf_small):
    import math

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.privacy import (
        _K_THRESH,
        k_anonymity_report,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    cust = read_table(spark, sf_small, "customer")
    classes: dict = {}
    for r in cust.collect():
        classes.setdefault((r.c_nationkey, r.c_mktsegment), []).append(
            math.floor(r.c_acctbal / 1000.0)
        )
    sizes = [len(v) for v in classes.values()]
    rep = k_anonymity_report(cust).collect()[0]
    assert rep.n_rows == sum(sizes)
    assert rep.n_classes == len(classes)
    assert rep.k_min == min(sizes)
    assert rep.l_min == min(len(set(v)) for v in classes.values())
    assert rep.classes_below_k == sum(s < _K_THRESH for s in sizes)
    assert rep.rows_below_k == sum(s for s in sizes if s < _K_THRESH)


def test_dp_ladder_symmetric_normalized_geometric():
    """The mechanism's correctness lives in the ladder: thresholds
    must be monotone, cover the full u16 range exactly, be symmetric
    about 0 (within the uniform's 1-step quantization), and decay
    geometrically at rate alpha — i.e. actually BE the truncated
    two-sided geometric distribution."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.privacy import (
        _DP_ALPHA,
        _DP_LADDER,
    )

    ths = [t for _, t in _DP_LADDER]
    assert ths == sorted(ths) and ths[-1] == 65536
    width = {
        k: t - p for (k, t), p in zip(_DP_LADDER, [0] + ths[:-1])
    }
    assert sum(width.values()) == 65536
    for k in range(0, 11):
        assert abs(width[k] - width[-k]) <= 1
    for k in range(0, 6):
        assert abs(width[k + 1] / width[k] - float(_DP_ALPHA)) < 0.01


def test_dp_counts_noise_bounded_deterministic(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.privacy import (
        _DP_K,
        dp_counts,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    cust = read_table(spark, sf_small, "customer")
    a = {r.c_mktsegment: tuple(r) for r in dp_counts(cust).collect()}
    assert a == {r.c_mktsegment: tuple(r) for r in dp_counts(cust).collect()}
    exact = {
        r.c_mktsegment: r.cnt
        for r in cust.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for seg, (_, e, noise, dp) in a.items():
        assert e == exact[seg]
        assert abs(noise) <= _DP_K
        assert dp == e + noise
    # A different seed re-draws the noise — the knob a real
    # per-publication RNG replaces.
    other = {
        r.c_mktsegment: r.noise for r in dp_counts(cust, seed="other:").collect()
    }
    assert any(other[s] != a[s][2] for s in other)


def test_generalization_report_lattice_monotone_and_chosen_minimal(spark, sf_small):
    """The ladder is a chain of true coarsenings, so along levels:
    n_classes is non-increasing, k_min non-decreasing, and
    rows_below_k non-increasing (a row below k after a merge was
    below k before it). The chosen flag marks exactly the MINIMAL
    level meeting k, and at most one row carries it."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.privacy import (
        _K_THRESH,
        generalization_report,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    rows = generalization_report(
        read_table(spark, sf_small, "customer"),
        read_table(spark, sf_small, "nation"),
    ).collect()
    assert [r.level for r in rows] == [0, 1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert a.n_classes >= b.n_classes
        assert a.k_min <= b.k_min
        assert a.rows_below_k >= b.rows_below_k
    for r in rows:
        assert r.meets_k == (r.k_min >= _K_THRESH)
    meeting = [r.level for r in rows if r.meets_k]
    chosen = [r.level for r in rows if r.is_chosen]
    assert chosen == (meeting[:1] if meeting else [])
