"""Round-16 additions: incremental release-manifest maintenance.

The streaming twin of the composed ``corpus_release`` chain maintains
the release manifest under arriving train batches via per-batch state
folds (ledger / postings index / edges / touched-cluster relabels /
survivor deltas). These tests pin the two properties the driver's
final-state oracle cannot see:

- PREFIX equality: after EVERY batch — not just the last — the
  maintained manifest equals the batch ``corpus_release`` manifest of
  the documents ingested so far (holdout static + train prefix). This
  is what makes the maintainer a continuous release, not a deferred
  batch job.
- Redelivery idempotency: re-folding an already-ingested batch is a
  byte-level no-op on every state table (at-least-once delivery is
  the only guarantee a real source gives).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def release_stream_state(spark, sf_small):
    """Drive release_manifest_fold manually over 3 doc_id slices of
    the sf0.001 train corpus, capturing the manifest after each fold
    plus the batch-operator manifest of each prefix."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _CONTAIN_W,
        _DECON_TEST_SOURCES,
        jaccard_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.release import (
        corpus_release,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.segments import (
        window_hashes,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        read_release_manifest,
        release_manifest_fold,
    )

    docs = read_table(spark, sf_small, "documents")
    test_pred = F.col("source").isin(*_DECON_TEST_SOURCES)
    holdout = docs.where(test_pred).localCheckpoint(eager=True)
    te_h = (
        window_hashes(holdout, _CONTAIN_W).select("h").distinct().persist()
    )
    te_h.count()
    train = docs.where(~test_pred).localCheckpoint(eager=True)
    n_slices = 3
    state_dir = tempfile.mkdtemp(prefix="rel-test-")
    after_each = []
    expected_each = []
    slices = [
        train.where(F.pmod(F.col("doc_id"), F.lit(n_slices)) == b).localCheckpoint(
            eager=True
        )
        for b in range(n_slices)
    ]
    prefix = holdout
    for b, sl in enumerate(slices):
        release_manifest_fold(spark, state_dir, sl, te_h)
        after_each.append(_rows(read_release_manifest(spark, state_dir)))
        prefix = prefix.unionByName(sl)
        pref = prefix.localCheckpoint(eager=True)
        expected = corpus_release(
            pref, jaccard_pairs(pref, threshold=0.6, n=3), test_pred
        )["manifest"]
        expected_each.append(_rows(expected))
    yield {
        "state_dir": state_dir,
        "after_each": after_each,
        "expected_each": expected_each,
        "slices": slices,
        "te_h": te_h,
    }
    te_h.unpersist()
    shutil.rmtree(state_dir, ignore_errors=True)


def test_release_manifest_prefix_equality(release_stream_state):
    """After every fold the maintained manifest must equal the batch
    corpus_release manifest of the ingested prefix — bit-for-bit,
    including token totals, scrub chars and sequence counts."""
    st = release_stream_state
    for b, (got, want) in enumerate(zip(st["after_each"], st["expected_each"])):
        assert got == want, f"batch {b}: maintained manifest != batch release"
    assert len(st["after_each"][-1]) > 0


def test_release_manifest_redelivery_is_noop(spark, release_stream_state):
    """Re-folding an already-ingested slice must change nothing: the
    ledger fence makes the whole fold exactly-once under at-least-once
    delivery. Checked on every state table, not just the manifest."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        read_release_manifest,
        release_manifest_fold,
    )

    st = release_stream_state
    state_dir = st["state_dir"]
    before = {
        t: _rows(spark.read.parquet(os.path.join(state_dir, t)))
        for t in ("ledger", "edges", "clusters", "survivors", "manifest")
        if os.path.exists(os.path.join(state_dir, t))
    }
    release_manifest_fold(spark, state_dir, st["slices"][0], st["te_h"])
    release_manifest_fold(spark, state_dir, st["slices"][-1], st["te_h"])
    after = {
        t: _rows(spark.read.parquet(os.path.join(state_dir, t)))
        for t in before
    }
    assert before == after
    assert _rows(read_release_manifest(spark, state_dir)) == st["after_each"][-1]


def test_local_components_equals_distributed(spark, sf_small):
    """The fold's size-guarded driver union-find must label exactly
    like the distributed min-label loop — checked on the real sf0.001
    near-dup pair graph plus a chain (worst diameter) and a
    star-with-bridge synthetic."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        _local_components,
    )

    docs = read_table(spark, sf_small, "documents")
    real = [
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.6, n=3).collect()
    ]
    synth = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (5, 10)]
    for pairs in (real, synth):
        if not pairs:
            continue
        edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        want = {
            r["node"]: r["label"]
            for r in connected_components(
                edges, src="doc_a", dst="doc_b"
            ).collect()
        }
        assert _local_components(pairs) == want


def test_release_manifest_cross_batch_cluster_merge(spark):
    """The hardest incremental path, forced deliberately: clusters A
    (batch 1) and B (batch 2) are DISJOINT near-dup clusters until a
    bridging doc arrives in batch 3 whose text overlaps both — the
    maintainer must merge them into one cluster labeled by the global
    min id, absorb the old survivor rows, and still equal the batch
    release at every prefix. Also exercises singleton absorption (doc
    30 stays a singleton throughout) and the scrub path (doc 30
    shares a 40+-char window with the holdout doc)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _CONTAIN_W,
        jaccard_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.release import (
        corpus_release,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.segments import (
        window_hashes,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        read_release_manifest,
        release_manifest_fold,
    )

    leak = "the quick brown fox jumps over the lazy dog near the riverbank"
    t10 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t20 = "one two three four five six seven eight nine ten"
    rows = [
        (5, t10 + " " + t20, "en", "web", 1),      # bridge: overlaps A and B
        (10, t10, "en", "web", 1),                 # cluster A
        (11, t10, "en", "web", 1),
        (20, t20, "en", "books", 1),               # cluster B
        (21, t20, "en", "books", 1),
        (30, "warehouse logistics report " + leak, "en", "web", 1),
        (90, "benchmark question set " + leak, "en", "src0", 1),  # holdout
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    test_pred = F.col("source") == "src0"
    holdout = docs.where(test_pred)
    te_h = window_hashes(holdout, _CONTAIN_W).select("h").distinct()
    thr = 0.4  # J(bridge, A) = 8/18 ≈ 0.444; J(A, B) = 0
    batches = [[10, 11], [20, 21, 30], [5]]
    state_dir = tempfile.mkdtemp(prefix="rel-merge-")
    try:
        seen: list[int] = []
        for ids in batches:
            seen += ids
            release_manifest_fold(
                spark,
                state_dir,
                docs.where(F.col("doc_id").isin(ids)),
                te_h,
                threshold=thr,
            )
            prefix = docs.where(
                F.col("doc_id").isin(seen) | test_pred
            ).localCheckpoint(eager=True)
            want = _rows(
                corpus_release(
                    prefix, jaccard_pairs(prefix, threshold=thr, n=3), test_pred
                )["manifest"]
            )
            got = _rows(read_release_manifest(spark, state_dir))
            assert got == want, f"after batch {ids}: maintained != batch release"
        clusters = spark.read.parquet(os.path.join(state_dir, "clusters"))
        labels = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
        assert labels == {5: 5, 10: 5, 11: 5, 20: 5, 21: 5}  # A ∪ B merged
        surv = spark.read.parquet(os.path.join(state_dir, "survivors"))
        w = {r["group_id"]: r["weight"] for r in surv.collect()}
        assert w == {5: 5, 30: 1}  # one merged group + the singleton
        scrubbed = spark.read.parquet(os.path.join(state_dir, "ledger")).where(
            F.col("doc_id") == 30
        ).collect()[0]
        assert scrubbed["removed_chars"] >= len(leak)  # holdout window cut
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def test_release_manifest_giant_cluster_across_batches(spark):
    """Skew worst case: EVERY doc is a near-dup of every other, so
    each batch touches the one giant cluster and the fold must relabel
    and re-derive its survivor row every time (maximal churn). Pins:
    single final cluster labeled by the global min id, weight = corpus
    size, manifest equality with the batch release at every prefix —
    the incremental path degrades to full-cluster recompute without
    ever being wrong."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _CONTAIN_W,
        jaccard_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.release import (
        corpus_release,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.segments import (
        window_hashes,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        read_release_manifest,
        release_manifest_fold,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    n = 24
    rows = [(i, base, "en", f"src{2 + i % 3}", 1) for i in range(3, 3 + n)]
    rows.append((1, "totally unrelated benchmark text", "en", "src0", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    test_pred = F.col("source") == "src0"
    te_h = (
        window_hashes(docs.where(test_pred), _CONTAIN_W).select("h").distinct()
    )
    state_dir = tempfile.mkdtemp(prefix="rel-giant-")
    try:
        seen: list[int] = []
        for b in range(3):
            ids = [i for i in range(3, 3 + n) if i % 3 == b]
            seen += ids
            release_manifest_fold(
                spark,
                state_dir,
                docs.where(F.col("doc_id").isin(ids)),
                te_h,
            )
            prefix = docs.where(
                F.col("doc_id").isin(seen) | test_pred
            ).localCheckpoint(eager=True)
            want = _rows(
                corpus_release(
                    prefix, jaccard_pairs(prefix, threshold=0.6, n=3), test_pred
                )["manifest"]
            )
            got = _rows(read_release_manifest(spark, state_dir))
            assert got == want, f"after batch {b}: maintained != batch release"
        clusters = spark.read.parquet(os.path.join(state_dir, "clusters"))
        labels = {r["cluster_id"] for r in clusters.collect()}
        assert labels == {3} and clusters.count() == n  # one giant cluster
        surv = spark.read.parquet(os.path.join(state_dir, "survivors"))
        assert _rows(surv.select("group_id", "weight")) == [(3, n)]
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def test_release_manifest_streaming_entry_equals_batch(spark, sf_small):
    """End-to-end: the registered streaming entry (availableNow file
    stream, 2-file triggers) returns the batch entry's manifest."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.release import (
        q_corpus_release,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        q_stream_release_manifest,
    )

    got = _rows(q_stream_release_manifest(spark, sf_small))
    want = _rows(q_corpus_release(spark, sf_small))
    assert got == want and len(got) > 0


def test_global_row_numbers_fused_equals_single_spec(spark):
    """Round-16 optimization guard: the fused multi-spec
    global_row_numbers assigns each alias EXACTLY the ranks the
    single-spec global_row_number assigns for the same order spec —
    same hash-sampled boundaries, same within-bucket window — on data
    with prefix ties, mixed asc/desc directions, and more rows than
    the boundary-sample target."""
    import random

    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.ranking import (
        global_row_number,
        global_row_numbers,
    )

    rng = random.Random(16)
    rows = [
        (i, rng.randint(0, 40), rng.randint(0, 7), rng.choice("abcde"))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, x int, y int, s string").repartition(5)
    specs = {
        "rn_a": [("x", True), ("id", True)],
        "rn_b": [("y", False), ("s", True), ("id", True)],
        "rn_c": [("s", False), ("id", False)],
    }
    fused = global_row_numbers(df, specs, num_partitions=4)
    got = {
        alias: {r["id"]: r[alias] for r in fused.collect()} for alias in specs
    }
    for alias, order in specs.items():
        want = {
            r["id"]: r["__rn"]
            for r in global_row_number(
                df, order, alias="__rn", num_partitions=4
            ).collect()
        }
        assert got[alias] == want, f"fused ranks diverge for {alias}"


def test_cc_fast_path_equals_distributed(spark, monkeypatch):
    """Round-16 optimization guard: connected_components' size-guarded
    driver union-find fast path labels a graph EXACTLY like the
    distributed min-label loop (forced by shrinking the guard to 0),
    including multi-cluster graphs, chains, and isolated edges."""
    import random

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators import dedup

    rng = random.Random(1616)
    edges = [(rng.randint(0, 120), rng.randint(0, 120)) for _ in range(150)]
    edges += [(1000 + i, 1001 + i) for i in range(0, 40, 2)]  # isolated pairs
    # chain of diameter 20 — under the distributed loop's max_iter
    # budget (the fast path has no such budget; union-find is exact at
    # any diameter)
    edges += [(2000 + i, 2000 + i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(4)

    fast = {
        (r["node"], r["label"])
        for r in dedup.connected_components(df).collect()
    }
    monkeypatch.setattr(dedup, "_CC_LOCAL_EDGES", 0)
    slow = {
        (r["node"], r["label"])
        for r in dedup.connected_components(df).collect()
    }
    assert fast == slow and len(fast) > 0
