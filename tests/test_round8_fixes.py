"""Round-8 fix regressions: the vectorized multimodal byte kernel and
its oracle twin, unconditional minhash/simhash degenerate-doc guards
(ADVICE r7), the portable split-bucket NULL sentinel, the
driver-collect cap, the history-derived gate window, and the artifact
store's corpus-version chaos test."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import compare


# ---------------------------------------------------------------------------
# extract_features: vectorized kernel == scalar reference math
# ---------------------------------------------------------------------------


def _ref_features(b: bytes):
    n = len(b)
    if not n:
        return 0, 0.0, 0.0
    counts: dict[int, int] = {}
    for byte in b:
        counts[byte] = counts.get(byte, 0) + 1
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return n, sum(b) / n, ent


def test_extract_features_vectorized_matches_reference(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        FEATURES,
        extract_features,
    )

    payloads = [
        b"",
        b"\x00",
        b"\xff" * 300,
        bytes(range(256)) * 3,
        b"the quick brown fox jumps over the lazy dog " * 7,
        bytes([1, 1, 2, 3, 5, 8, 13, 21, 34, 55] * 41),
    ]
    media = spark.createDataFrame(
        [(i, "image", p, None) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary, meta struct<width:int>",
    )
    got = {r["media_id"]: r for r in extract_features(media).collect()}
    assert set(got) == set(range(len(payloads)))
    assert [f.name for f in FEATURES.fields] == list(got[0].asDict())
    for i, p in enumerate(payloads):
        n, mean, ent = _ref_features(p)
        r = got[i]
        assert r["byte_len"] == n
        assert r["byte_mean"] == pytest.approx(mean, abs=1e-12)
        # different but equivalent formula ((ln n − Σc·ln c/n)/ln 2 vs
        # −Σ p·log2 p): agreement to 1e-9 is far inside the oracle
        # twin's 1e-4 rounding grid
        assert r["byte_entropy"] == pytest.approx(ent, abs=1e-9)
    # all-identical bytes: entropy exactly 0 (ln n − n·ln n/n)
    assert got[2]["byte_entropy"] == 0.0 and got[2]["byte_mean"] == 255.0


def test_byte_entropy_twin_matches_oracle_on_crafted_docs(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb cc d", "en", "web", 14),
            (2, "z", "en", "web", 1),
            (3, "the entropy of this sentence is moderate", "en", "web", 41),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    # build the same plan q_multimodal_byte_entropy builds, but over
    # the crafted corpus
    feats = mm.extract_features(mm.synthesize_media(docs)).where(F.col("byte_len") > 0)
    ent_r4 = F.floor(F.col("byte_entropy") * 1e4 + F.lit(0.5)) / 1e4
    out = feats.select(
        "media_id",
        "kind",
        "byte_len",
        F.floor(F.col("byte_mean") * F.col("byte_len") + F.lit(0.5))
        .cast("long")
        .alias("byte_sum"),
        "byte_mean",
        ent_r4.alias("byte_entropy_r4"),
    ).orderBy("media_id")
    ok, msg = compare(out, con, mm.ORACLE_BYTE_ENTROPY)
    assert ok, msg


# ---------------------------------------------------------------------------
# ADVICE r7: degenerate-doc guards in the xxhash64 fast paths
# ---------------------------------------------------------------------------


def _degenerate_docs(spark):
    # two sub-3-token docs, two NULL-text docs, plus two real near-dup
    # docs so the pipelines emit SOMETHING
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    return spark.createDataFrame(
        [
            (1, "a b", "en", "web", 3),
            (2, "c", "en", "web", 1),
            (3, None, "en", "web", None),
            (4, None, "en", "web", None),
            (5, base, "en", "web", len(base)),
            (6, base + " extra", "en", "web", len(base) + 6),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_minhash_fast_path_drops_subshingle_docs(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = _degenerate_docs(spark)
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5).collect()
    ids = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # pre-fix the fast path emitted (1,2)/(3,4)-style est=1.0 pairs
    # from all-sentinel signatures
    assert all(a in (5, 6) and b in (5, 6) for a, b in ids), ids
    assert (5, 6) in ids  # the real near-dup survives the guard


def test_simhash_drops_null_text_docs(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    docs = _degenerate_docs(spark)
    for portable in (False, True):
        fps = simhash_fingerprints(docs, bits=32, portable=portable)
        assert {r["doc_id"] for r in fps.collect()} == {1, 2, 5, 6}
        pairs = simhash_pairs(docs, bits=32, max_hamming=3, portable=portable).collect()
        for r in pairs:
            assert r["doc_a"] not in (3, 4) and r["doc_b"] not in (3, 4)


# ---------------------------------------------------------------------------
# ADVICE r7: portable split bucket must not collide ('a', NULL) with ('a',)
# ---------------------------------------------------------------------------


def test_portable_bucket_null_key_distinct(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import _bucket

    df = spark.createDataFrame([("x", None), ("x", "y")], "k1 string, k2 string")
    two = df.select(
        _bucket(["k1", "k2"], "s1", portable=True).alias("b2"),
        _bucket(["k1"], "s1", portable=True).alias("b1"),
        "k2",
    ).collect()
    by_k2 = {r["k2"]: r for r in two}
    # pre-fix concat_ws skipped the NULL and b2 == b1 for the NULL row
    assert by_k2[None]["b2"] != by_k2[None]["b1"]
    # non-null keys are untouched by the sentinel (oracle stability)
    assert by_k2["y"]["b1"] == by_k2[None]["b1"]


def test_portable_split_assignment_unchanged(spark, sf_small):
    """The sentinel must not move any existing assignment: doc_id keys
    are non-null, so corpus_split_portable's oracle (which predates the
    fix) must still hash-match."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        ORACLE_SPLIT_PORTABLE,
        q_corpus_split_portable,
    )
    from tests.oracle_harness import duck_connection

    con = duck_connection(sf_small)
    try:
        ok, msg = compare(q_corpus_split_portable(spark, sf_small), con, ORACLE_SPLIT_PORTABLE)
        assert ok, msg
    finally:
        con.close()


# ---------------------------------------------------------------------------
# driver-collect cap (similarity kernels)
# ---------------------------------------------------------------------------


def test_collect_cap_raises_on_corpus_sized_queries(spark, sf_small, monkeypatch):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators import similarity
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    emb = read_table(spark, sf_small, "embeddings")
    monkeypatch.setattr(similarity, "_QUERY_COLLECT_CAP", 4)
    with pytest.raises(ValueError, match="driver-collect cap"):
        similarity.bruteforce_topk(emb, emb, k=3)
    with pytest.raises(ValueError, match="driver-collect cap"):
        similarity.hard_negatives_topk(emb, emb, k=3)
    # under the cap the kernel works unchanged
    small_q = emb.filter(F.col("vec_id") < 3)
    assert similarity.bruteforce_topk(emb, small_q, k=3).count() > 0


# ---------------------------------------------------------------------------
# history-derived gate window
# ---------------------------------------------------------------------------


def test_gate_history_covers_registry_and_prioritizes_stale():
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import (
        _GATE_WINDOW,
        _gate_history,
        oracles,
        registry,
    )

    reg = list(registry())
    hist = _gate_history()
    ora = set(oracles())
    missing = set(reg) - set(hist)
    assert not missing, f"registry entries missing from gate_history.json: {sorted(missing)}"
    retired = set(hist) - set(reg)
    assert not retired, f"gate_history.json entries no longer registered: {sorted(retired)}"
    window = set(reg[:_GATE_WINDOW])
    for name, rec in hist.items():
        if name not in ora:
            continue  # rows-only: no hash slot to claim
        last = rec.get("last_driver_round")
        changed = rec.get("changed_round") or 0
        if last is None or changed > last:
            assert name in window, (
                f"{name} changed in round {changed} (last driver row: {last}) "
                f"but is outside the {_GATE_WINDOW}-slot driver window"
            )


# ---------------------------------------------------------------------------
# artifact store: corpus mutation must invalidate memo + record
# ---------------------------------------------------------------------------


def test_corpus_artifact_invalidates_on_corpus_change(tmp_path):
    from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import (
        corpus_artifact,
        json_artifact_io,
    )

    src = tmp_path / "documents.parquet"
    src.write_bytes(b"v1-corpus-bytes")
    save, load = json_artifact_io()
    builds = []

    def build():
        builds.append(1)
        return {"n": len(builds)}

    params = ("chaos-test", str(tmp_path))  # unique store key per test run
    a1 = corpus_artifact(str(tmp_path), "documents", "chaos", params, build, save, load)
    a2 = corpus_artifact(str(tmp_path), "documents", "chaos", params, build, save, load)
    assert a1 == a2 == {"n": 1} and len(builds) == 1  # memo hit, no rebuild

    # corpus regenerated: content+size change -> new version key ->
    # stale memo AND stale on-disk record must both miss
    src.write_bytes(b"v2-corpus-bytes-longer")
    a3 = corpus_artifact(str(tmp_path), "documents", "chaos", params, build, save, load)
    assert a3 == {"n": 2} and len(builds) == 2

    # same-size rewrite (mtime_ns moves): still a new version
    src.write_bytes(b"v3-corpus-bytes-longer")
    a4 = corpus_artifact(str(tmp_path), "documents", "chaos", params, build, save, load)
    assert a4 == {"n": 3} and len(builds) == 3

    # unstat-able corpus: builds fresh, stores nothing
    a5 = corpus_artifact(str(tmp_path / "nope"), "documents", "chaos", params, build, save, load)
    assert a5 == {"n": 4} and len(builds) == 4


def test_minhash_sig_artifact_matches_pure_path(spark, sf_small):
    """The cached signature artifact must be plan-for-plan equivalent
    to the pure recompute: same pairs, same estimates."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _materialized_minhash_sigs,
        minhash_lsh_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    pure = minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5, portable=True)
    sigs = _materialized_minhash_sigs(spark, sf_small, portable=True)
    cached = minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, threshold=0.5, portable=True, sigs=sigs
    )
    assert sorted(map(tuple, pure.collect())) == sorted(map(tuple, cached.collect()))


def test_ivf_kernel_assignment_matches_literal_path(spark, sf_small, monkeypatch):
    """The large-k Arrow-kernel assignment branch (plan-literal budget
    overflow guard) must be row-identical to the literal-matrix
    expression branch on the same centroids."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators import similarity as S
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    emb = read_table(spark, sf_small, "embeddings")
    cent = S._load_or_train_quantizer(emb, sf_small, n_clusters=16, iters=1)
    literal = S.ivf_topk(emb, emb, k=5, n_clusters=16, nprobe=4, centroids=cent).collect()
    monkeypatch.setattr(S, "_LITERAL_K_MAX", 1)  # force the kernel branch
    kernel = S.ivf_topk(emb, emb, k=5, n_clusters=16, nprobe=4, centroids=cent).collect()
    assert sorted(map(tuple, literal)) == sorted(map(tuple, kernel))
    assert len(literal) > 0


def test_lloyd_kernel_branch_matches_literal_branch(spark, sf_small, monkeypatch):
    import numpy as np

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators import similarity as S
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    emb = read_table(spark, sf_small, "embeddings")
    literal = S.train_ivf_centroids(emb, n_clusters=8, iters=2)
    monkeypatch.setattr(S, "_LITERAL_K_MAX", 1)
    kernel = S.train_ivf_centroids(emb, n_clusters=8, iters=2)
    # identical assignments; the per-cluster mean SUM may reassociate
    # across partitions, so compare to float tolerance, not bits
    assert np.allclose(np.asarray(literal), np.asarray(kernel), atol=1e-9)


def test_artifact_backed_dedup_plans_read_the_artifact(spark, sf_small):
    """The registry entries must actually consume the cached parquet:
    a plan that silently fell back to the raw-text recompute would
    still be CORRECT (same values), so only a plan assertion catches
    the caching regressing away."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        q_dedup_minhash_portable,
        q_dedup_simhash_portable,
    )

    for q in (q_dedup_minhash_portable, q_dedup_simhash_portable):
        plan = q(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
        assert "corpus_artifacts" in plan, f"{q.__name__} does not scan the artifact store"


def test_simhash_fp_artifact_matches_pure_path(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _materialized_simhash_fps,
        simhash_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    pure = simhash_pairs(docs, bits=32, max_hamming=3, portable=True)
    fps = _materialized_simhash_fps(spark, sf_small, portable=True)
    cached = simhash_pairs(docs, bits=32, max_hamming=3, portable=True, fps=fps)
    assert sorted(map(tuple, pure.collect())) == sorted(map(tuple, cached.collect()))
