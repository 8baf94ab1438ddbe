"""Round-10 additions: leakage-safe cluster-aware split, Misra-Gries
heavy hitters, incremental minhash dedup. The oracle equivalence of
all three is covered by tests/test_oracle_parity.py (they are
oracle-bearing registry entries); this file asserts the properties
the oracle cannot see — sketch-pruning exactness on an adversarial
long-tail corpus, row-level cluster atomicity, probe/recompute
agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
    _INCR_MOD,
    _INCR_SLOT,
    _materialized_jaccard_pairs,
    _materialized_minhash_sigs,
    minhash_lsh_pairs,
    minhash_probe_pairs,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.frequent import (
    heavy_hitters,
    mg_candidates,
    _mg_merge,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
    _LEAK_SALT,
    _LEAK_WEIGHTS,
    leakage_safe_split,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_mg_merge_prunes_to_m_and_bounds_error():
    from collections import Counter

    sketch: dict[str, int] = {}
    # 1000 'hot' + long tail of 900 singletons, fed in tail-first
    # order (worst case for the sketch: tail occupies counters first).
    stream = [f"tail{i}" for i in range(900)] + ["hot"] * 1000
    n = len(stream)
    m = 8
    for i in range(0, n, 100):
        _mg_merge(sketch, Counter(stream[i : i + 100]), m)
    assert len(sketch) <= m
    # Any word with true count > n/(m+1) must survive.
    assert "hot" in sketch
    # Surviving estimate never exceeds the true count and undercounts
    # by at most n/(m+1).
    assert sketch["hot"] <= 1000
    assert 1000 - sketch["hot"] <= n / (m + 1)


@pytest.fixture(scope="module")
def longtail_docs(spark):
    """Adversarial corpus whose vocabulary (2000+ words) dwarfs a
    small sketch: 3 genuinely heavy words + near-unique tail, spread
    over enough rows that every partition sees mostly tail."""
    rows = []
    doc_id = 0
    for i in range(400):
        # each doc: one heavy word + 5 unique tail words
        heavy = ["alpha", "beta", "gamma"][i % 3]
        tail = " ".join(f"t{doc_id}x{j}" for j in range(5))
        rows.append((doc_id, f"{heavy} {tail}", "en", "synth", 10))
        doc_id += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(8)


def test_heavy_hitters_exact_on_longtail(spark, longtail_docs):
    # m=64 counters vs 2400-word vocabulary: pruning fires constantly,
    # yet the verified answer must equal the exact GROUP BY.
    got = heavy_hitters(longtail_docs, m=64, inv_support=32).collect()
    words = longtail_docs.select(
        F.explode(F.split("text", " ")).alias("word")
    )
    n = words.count()
    exact = {
        r["word"]: r["nb"]
        for r in words.groupBy("word")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") * 32 >= F.lit(n))
        .collect()
    }
    assert {r["word"] for r in got} == set(exact) == {"alpha", "beta", "gamma"}
    for r in got:
        assert r["nb"] == exact[r["word"]]
        assert r["n_tokens"] == n


def test_heavy_hitters_rejects_unsound_support(longtail_docs):
    with pytest.raises(ValueError):
        heavy_hitters(longtail_docs, m=16, inv_support=64)


def test_mg_candidates_bounded_output(spark, longtail_docs):
    words = longtail_docs.select(
        F.explode(F.split("text", " ")).alias("word")
    )
    m = 32
    n_parts = words.rdd.getNumPartitions()
    assert mg_candidates(words, m).count() <= m * n_parts


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        st.integers(min_value=2, max_value=12),
        st.integers(min_value=1, max_value=50),
    )
    def test_mg_guarantee_holds_on_random_streams(stream, m, chunk):
        """Formal MG property: after chunked merges with m counters,
        every item with true count > n/(m+1) survives, and surviving
        estimates undercount by at most n/(m+1)."""
        from collections import Counter

        sketch: dict[int, int] = {}
        for i in range(0, len(stream), chunk):
            _mg_merge(sketch, Counter(stream[i : i + chunk]), m)
        n = len(stream)
        true = Counter(stream)
        bound = n / (m + 1)
        assert len(sketch) <= m
        for item, c in true.items():
            if c > bound:
                assert item in sketch, (item, c, bound)
            if item in sketch:
                assert sketch[item] <= c
                assert c - sketch[item] <= bound
except ImportError:  # pragma: no cover - hypothesis is baked into this env
    pass


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------


def test_bloom_decontamination_equals_plain_and_prunes(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _DECON_TEST_SOURCES,
        _materialized_postings,
        bloom_filter_join,
        bloom_table,
        q_dedup_decontamination,
        q_dedup_decontamination_bloom,
    )

    plain = {tuple(r) for r in q_dedup_decontamination(spark, sf_small).collect()}
    bloomed = {
        tuple(r) for r in q_dedup_decontamination_bloom(spark, sf_small).collect()
    }
    assert plain == bloomed and plain, "answer must be preserved and non-empty"
    post = _materialized_postings(spark, sf_small, n=3).withColumn(
        "is_test", F.col("source").isin(*_DECON_TEST_SOURCES)
    )
    key = F.concat_ws("\x00", F.col("block"), F.col("s"))
    bloom = bloom_table(
        post.where(F.col("is_test")).select(key.alias("k")).distinct(), "k"
    )
    n_train = post.where(~F.col("is_test")).count()
    kept = bloom_filter_join(post.where(~F.col("is_test")), key, bloom).count()
    assert kept < n_train, "prefilter dropped nothing — bloom is dead weight"


def test_bloom_filter_has_no_false_negatives(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        bloom_filter_join,
        bloom_table,
    )

    members = spark.range(0, 500).select(
        F.concat(F.lit("key"), F.col("id")).alias("k")
    )
    bloom = bloom_table(members, "k")
    kept = bloom_filter_join(members, F.col("k"), bloom).count()
    assert kept == 500  # every inserted key must pass its own filter


# ---------------------------------------------------------------------------
# Leakage-safe split
# ---------------------------------------------------------------------------


def test_leakage_split_row_level_atomicity(spark, sf_small):
    docs = read_table(spark, sf_small, "documents")
    pairs = _materialized_jaccard_pairs(spark, sf_small, threshold=0.6, n=3)
    assigned = leakage_safe_split(docs, pairs, _LEAK_WEIGHTS, _LEAK_SALT)
    lab = assigned.select("doc_id", "split")
    crossing = (
        pairs.join(
            lab.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            lab.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossing == 0
    # Assignment covers every document exactly once.
    assert assigned.count() == docs.count()
    assert assigned.select("doc_id").distinct().count() == docs.count()


def test_leakage_split_is_deterministic(spark, sf_small):
    docs = read_table(spark, sf_small, "documents")
    pairs = _materialized_jaccard_pairs(spark, sf_small, threshold=0.6, n=3)
    a = leakage_safe_split(docs, pairs, _LEAK_WEIGHTS, _LEAK_SALT)
    b = leakage_safe_split(docs, pairs, _LEAK_WEIGHTS, _LEAK_SALT)
    assert (
        a.select("doc_id", "split")
        .exceptAll(b.select("doc_id", "split"))
        .count()
        == 0
    )


# ---------------------------------------------------------------------------
# Incremental minhash probe
# ---------------------------------------------------------------------------


def test_probe_pairs_equal_full_pipeline_cross_side(spark, sf_small):
    """The incremental probe must find EXACTLY the cross-side subset
    of the full-corpus LSH pairs — ingest-time dedup loses nothing
    against rerunning dedup over old+new together."""
    docs = read_table(spark, sf_small, "documents")
    sigs = _materialized_minhash_sigs(spark, sf_small, portable=True)
    is_batch = F.pmod(F.col("doc_id"), F.lit(_INCR_MOD)) == F.lit(_INCR_SLOT)
    probe = minhash_probe_pairs(
        sigs.where(~is_batch), sigs.where(is_batch), portable=True
    ).select(
        F.least("new_doc", "old_doc").alias("doc_a"),
        F.greatest("new_doc", "old_doc").alias("doc_b"),
        "est_jaccard",
    )
    full = minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, threshold=0.5, portable=True, sigs=sigs
    ).where(
        (F.pmod(F.col("doc_a"), F.lit(_INCR_MOD)) == F.lit(_INCR_SLOT))
        != (F.pmod(F.col("doc_b"), F.lit(_INCR_MOD)) == F.lit(_INCR_SLOT))
    )
    assert probe.exceptAll(full).count() == 0
    assert full.exceptAll(probe).count() == 0


# ---------------------------------------------------------------------------
# Warehouse maintenance: delete-by-keys, small-file compaction
# ---------------------------------------------------------------------------


def test_delete_by_keys_removes_exactly_requested(spark, tmp_path):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.sinks import (
        delete_by_keys,
    )

    path = str(tmp_path / "tbl")
    spark.range(0, 100).withColumn("v", F.col("id") * 2).write.parquet(path)
    keys = spark.createDataFrame([(3,), (7,), (99,), (1000,)], "id long")
    removed = delete_by_keys(spark, path, keys, "id")
    assert removed == 3  # 1000 was never present
    left = spark.read.parquet(path)
    assert left.count() == 97
    assert left.where(F.col("id").isin(3, 7, 99)).count() == 0
    # untouched rows keep their values
    assert left.where((F.col("id") == 5) & (F.col("v") == 10)).count() == 1


def test_compact_small_files_preserves_rows(spark, tmp_path):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.sinks import (
        compact_small_files,
    )

    path = str(tmp_path / "tbl")
    # simulate micro-batch appends: 12 tiny files
    for i in range(12):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode("append").parquet(path)
    before, after = compact_small_files(spark, path, target_rows_per_file=1000)
    assert before >= 12
    assert after == 1
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == list(range(120))


# ---------------------------------------------------------------------------
# Streaming minhash dedup
# ---------------------------------------------------------------------------


def test_stream_minhash_equals_batch_and_crosses_batches(spark, sf_small):
    """The streamed pair set must equal the one-shot batch pipeline's
    (oracle parity covers values; this guards the set), and at least
    one pair must SPAN two micro-batch slices — i.e. the accumulated
    index was actually probed, not just the within-batch self-joins."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        stream_minhash_dedup,
    )

    # 1 file/trigger: batch membership == slice membership, so the
    # cross-slice check below genuinely proves an index probe.
    streamed = stream_minhash_dedup(spark, sf_small, n_slices=4, files_per_trigger=1)
    docs = read_table(spark, sf_small, "documents")
    batch = minhash_lsh_pairs(docs, threshold=0.5, portable=True)
    # Collected-set compare (pairs are unique by construction);
    # exceptAll on this plan pair trips a Catalyst rewrite bug
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on the replication sum).
    s = {(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in streamed.collect()}
    b = {(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in batch.collect()}
    assert s == b
    cross = sum(1 for a, bb, _ in s if a % 4 != bb % 4)
    assert cross > 0, "no pair spans two slices — index probe untested"


# ---------------------------------------------------------------------------
# Plan shapes — the scale claims above, asserted on the executed plan.
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_heavy_hitter_recount_join_is_broadcast(spark, sf_small):
    """The exact recount must semi-join the tiny candidate set into
    the token stream as a broadcast — a SortMergeJoin here would
    shuffle the full tail, defeating the design."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.frequent import (
        q_text_heavy_hitters,
    )

    plan = _plan(q_text_heavy_hitters(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_eval_sample_cutoff_join_is_broadcast(spark, sf_small):
    """The per-stratum cutoff must reach the scan as a broadcast join
    (stratum-size table is tiny); the corpus must never shuffle to
    fetch its cutoff."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        q_corpus_eval_sample,
    )

    plan = _plan(q_corpus_eval_sample(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Per-stratum eval sample
# ---------------------------------------------------------------------------


def test_eval_sample_matches_naive_window(spark, sf_small):
    """The two-phase cutoff device must select EXACTLY the k smallest
    buckets per stratum — identical to the naive full-stratum window
    it replaces at scale."""
    from pyspark.sql import Window

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        _BUCKETS,
        _EVAL_K,
        _EVAL_SALT,
        _bucket,
        eval_sample,
    )

    docs = read_table(spark, sf_small, "documents")
    got = eval_sample(docs, ["source", "lang"])
    w = Window.partitionBy("source", "lang").orderBy("__b", "doc_id")
    naive = (
        docs.withColumn("__b", _bucket(["doc_id"], _EVAL_SALT, portable=True))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= _EVAL_K)
        .select("source", "lang", "rk", "doc_id")
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_keep_policy_keeps_exactly_one_best_per_cluster(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        q_dedup_keep_policy,
    )

    rows = q_dedup_keep_policy(spark, sf_small).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert by_cluster, "corpus should contain at least one near-dup cluster"
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, cid
        best_q = max(m["quality_score"] for m in members)
        ties = [m["doc_id"] for m in members if m["quality_score"] == best_q]
        assert keepers[0]["doc_id"] == min(ties), cid
        assert len(members) >= 2, cid  # clusters come from pairs


def test_langid_confusion_row_shares_sum_to_one(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.text import (
        q_text_langid_confusion,
    )

    rows = q_text_langid_confusion(spark, sf_small).collect()
    per_lang: dict[str, float] = {}
    for r in rows:
        per_lang[r["lang_declared"]] = per_lang.get(r["lang_declared"], 0.0) + r[
            "row_share"
        ]
    for lang, s in per_lang.items():
        assert abs(s - 1.0) < 1e-3, (lang, s)


def test_eval_sample_full_strata_yield_k(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        _EVAL_K,
        eval_sample,
    )

    docs = read_table(spark, sf_small, "documents")
    sizes = {
        (r["source"], r["lang"]): r["n"]
        for r in docs.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r["source"], r["lang"]): r["n"]
        for r in eval_sample(docs, ["source", "lang"])
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for stratum, sz in sizes.items():
        assert got.get(stratum, 0) == min(sz, _EVAL_K), stratum
