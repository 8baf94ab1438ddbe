"""Quality properties for the hash-based operators that have no SQL
oracle: MinHash-LSH recall vs exact Jaccard, SimHash hamming radius,
and (once similarity lands) ANN recall vs brute force.
"""

from __future__ import annotations

import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return read_table(spark, sf_small, "documents")


def test_minhash_recall_vs_exact(docs):
    """Banded LSH (32 hashes, 8 bands of 4) must recover the high-
    similarity pairs the exact operator finds: recall >= 0.8 at
    Jaccard >= 0.7 (banding theory: P(candidate) = 1-(1-s^4)^8,
    ~0.97 at s=0.7)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.7).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.0).collect()
    }
    assert exact, "fixture should contain at least one near-dup pair"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(exact)} exact pairs"


def test_jaccard_df_cap_identical_on_corpus(docs):
    """cap=64 must drop only zero-overlap candidate mass here: no
    near-dup pair in the corpus is connected through a df>64 shingle,
    so output pairs are identical with the cap on and off."""
    uncapped = sorted(map(tuple, jaccard_pairs(docs, threshold=0.6).collect()))
    capped = sorted(map(tuple, jaccard_pairs(docs, threshold=0.6, max_df=64).collect()))
    assert uncapped == capped
    assert uncapped, "fixture should contain at least one near-dup pair"


def test_jaccard_short_docs_empty_shingles(spark):
    """Documents shorter than n tokens must produce NO pairs — not a
    truncated pseudo-shingle that pairs identical short docs (the
    Spark concat_ws NULL-skip vs SQL || NULL-propagate divergence)."""
    docs = spark.createDataFrame(
        [(1, "en", "hello world"), (2, "en", "hello world"), (3, "en", "one"),
         (4, "en", "a b c d"), (5, "en", "a b c d")],
        "doc_id long, lang string, text string",
    )
    pairs = jaccard_pairs(docs, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(4, 5)}


def test_minhash_estimate_tracks_exact(docs):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.7).collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    common = set(exact) & set(est)
    assert common
    for pair in common:
        assert abs(exact[pair] - est[pair]) < 0.35, (
            f"{pair}: exact={exact[pair]:.2f} est={est[pair]:.2f}"
        )


def test_simhash_pairs_within_radius(docs):
    pairs = simhash_pairs(docs, bits=32, max_hamming=3).collect()
    for r in pairs:
        assert r["hamming"] <= 3
    # Deterministic across runs.
    again = simhash_pairs(docs, bits=32, max_hamming=3).collect()
    assert sorted(map(tuple, pairs)) == sorted(map(tuple, again))


def test_embedding_lsh_recall_and_precision_vs_exact(spark, sf_small):
    """The LSH-bucketed near-dup (scale path) must recover most exact
    pairs at threshold 0.4 — hyperplane agreement for cos>=0.4 is
    >=0.63/bit, so P(candidate) >= 1-(1-0.63^4)^8 ~ 0.75 — and every
    emitted pair must BE an exact pair with the identical strict-fold
    cosine (the refine step is exact, only candidate RECALL is
    approximate)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    emb = read_table(spark, sf_small, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_near_dup_lsh(emb, threshold=0.4).collect()
    }
    assert exact, "fixture should contain near-dup embedding pairs"
    assert set(approx) <= set(exact), "LSH emitted a non-exact pair (refine broken)"
    for pair, c in approx.items():
        assert c == exact[pair], f"{pair}: refine cosine {c} != exact {exact[pair]}"
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"embedding-LSH recall {recall:.2f} over {len(exact)} pairs"


def test_ann_lsh_recall_vs_bruteforce(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
        q_ann_topk_bruteforce,
        q_ann_topk_lsh,
    )

    exact = q_ann_topk_bruteforce(spark, sf_small).collect()
    approx = q_ann_topk_lsh(spark, sf_small).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"ANN recall@10 {mean_recall:.2f} (per-query {recalls})"


def test_ann_ivf_recall_and_exactness_vs_bruteforce(spark, sf_small):
    """IVF-flat: candidates are data-adaptive (trained coarse
    quantizer) rather than data-independent hyperplanes. On this
    near-uniform corpus probing 8/16 lists must recover >=0.7 of the
    exact top-10 graph; every emitted (query, vec) hit must carry the
    identical strict-fold cosine as brute force (only candidate
    RECALL is approximate, scoring is exact)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
        q_ann_topk_bruteforce,
        q_ann_topk_ivf,
    )

    exact_rows = q_ann_topk_bruteforce(spark, sf_small).collect()
    approx_rows = q_ann_topk_ivf(spark, sf_small).collect()
    exact_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact_rows}
    exact_sets: dict[int, set[int]] = {}
    for r in exact_rows:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = 0
    for r in approx_rows:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            hits += 1
            assert r["cosine"] == exact_cos[key], f"{key}: IVF cosine differs"
    mean_recall = hits / sum(len(s) for s in exact_sets.values())
    assert mean_recall >= 0.7, f"IVF recall@10 {mean_recall:.2f}"


def test_multimodal_features_match_sql_twin(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.multimodal import (
        q_multimodal_byte_stats,
        q_multimodal_features,
    )

    sql_side = {
        r["media_id"]: (r["kind"], r["byte_len"], r["payload_md5"])
        for r in q_multimodal_byte_stats(spark, sf_small).collect()
    }
    pandas_side = q_multimodal_features(spark, sf_small).collect()
    assert len(pandas_side) == len(sql_side)
    for r in pandas_side:
        kind, blen, md5 = sql_side[r["media_id"]]
        assert (r["kind"], r["byte_len"], r["payload_md5"]) == (kind, blen, md5)
        assert 0.0 < r["byte_entropy"] <= 8.0


def test_simhash_near_dups_have_close_fingerprints(spark, docs):
    """The known near-dup pairs (trigram Jaccard >= 0.9) must land
    within a small hamming distance of each other."""
    import pyspark.sql.functions as F

    near = jaccard_pairs(docs, threshold=0.9).collect()
    assert near, "fixture should contain >=1 strong near-dup"
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs, bits=32).collect()}
    for r in near:
        ham = bin(fps[r["doc_a"]] ^ fps[r["doc_b"]]).count("1")
        assert ham <= 6, f"pair {r['doc_a']},{r['doc_b']} hamming {ham}"


def test_embedding_pairs_fold_matches_jvm_expression(spark, sf_small):
    """The filter-refine scorer re-computes candidate cosines with a
    Python left fold claimed bit-identical to the JVM
    aggregate(zip_with)/round_half_up expression. Pin that claim:
    score every pair both ways and require exact (not approximate)
    double equality."""
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.scalar import (
        round_half_up,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        dot_product,
        embedding_near_dup_pairs,
    )

    emb = read_table(spark, sf_small, "embeddings")
    # threshold -1: every pair survives, so the fold path is exercised
    # on the full range of cosines, not just near-dups.
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=-1.0).collect()
    }
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        F.sqrt(dot_product("embedding", "embedding")).alias("norm"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    want = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            round_half_up(dot / (F.col("a.norm") * F.col("b.norm")), 6).alias("cosine"),
        )
        .collect()
    }
    assert got == want  # exact double equality, all pairs


def test_approx_month_profile_error_bounds_and_partial_agg(spark, sf_small):
    """Sketch accuracy vs the exact answers (HLL rsd=2% → assert <=6%
    observed; the quantile sketch is RANK-accurate and does not
    interpolate → assert each approx quantile lies inside a widened
    exact rank bracket), and the scale property that justifies the
    sketches: the plan must show PARTIAL ObjectHashAggregate
    (map-side sketch merge), so shuffle size is
    partitions x sketch size, independent of customer cardinality."""
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
        q_approx_month_profile,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    import math
    from collections import defaultdict

    approx = {r["mois"]: r for r in q_approx_month_profile(spark, sf_small).collect()}
    orders = read_table(spark, sf_small, "orders")
    exact_clients = {
        r["mois"]: r["clients"]
        for r in orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("mois"))
        .agg(F.countDistinct("o_custkey").alias("clients"))
        .collect()
    }
    by_month: dict[str, list[float]] = defaultdict(list)
    for r in orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("mois"),
        F.col("o_totalprice").cast("double").alias("v"),
    ).collect():
        by_month[r["mois"]].append(r["v"])
    assert set(approx) == set(by_month)
    for mois, a in approx.items():
        assert abs(a["approx_clients"] - exact_clients[mois]) <= max(
            2, 0.06 * exact_clients[mois]
        ), mois
        vals = sorted(by_month[mois])
        n = len(vals)
        for p, got in ((0.5, a["approx_p50"]), (0.95, a["approx_p95"])):
            # percentile_approx returns an ELEMENT at (rank-accurate)
            # position ceil(p*n); allow +-1 rank of slack.
            r = math.ceil(p * n)
            window = vals[max(0, r - 2) : min(n, r + 1)]
            assert got in window, (mois, p, got, window)

    plan = q_approx_month_profile(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan, plan[:1500]
    assert "partial_approx_count_distinct" in plan or plan.count("ObjectHashAggregate") >= 2, plan[:1500]


def test_deterministic_split_properties(spark, sf_small):
    """Split assignment must be (a) a partition of the input, (b)
    stable under repartitioning (the randomSplit failure mode), (c)
    consistent across TABLES sharing the key+salt (leak-freedom), and
    (d) close to the requested 80/10/10 rates."""
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        deterministic_split,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = deterministic_split(docs, ["doc_id"], weights)
    rows = {r["doc_id"]: r["split"] for r in split.select("doc_id", "split").collect()}
    n = docs.count()
    assert len(rows) == n  # every row labeled exactly once

    # (b) repartitioning must not move any row across splits.
    reparted = deterministic_split(docs.repartition(7), ["doc_id"], weights)
    rows2 = {r["doc_id"]: r["split"] for r in reparted.select("doc_id", "split").collect()}
    assert rows == rows2

    # (c) a DIFFERENT table keyed on the same ids gets the same splits.
    other = docs.select("doc_id", "lang")
    rows3 = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(other, ["doc_id"], weights).collect()
    }
    assert rows == rows3

    # (d) rates within binomial noise (3 sigma).
    from collections import Counter

    counts = Counter(rows.values())
    for label, w in weights.items():
        p = w / sum(weights.values())
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(counts[label] - n * p) <= 3 * sigma + 1, (label, counts)


def test_stratified_sample_rates_and_determinism(spark, sf_small):
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        stratified_sample,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    fractions = {"en": 0.5, "fr": 0.25}
    kept = stratified_sample(docs, ["doc_id"], "lang", fractions)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(5), ["doc_id"], "lang", fractions)
        .select("doc_id")
        .collect()
    }
    assert ids == ids2  # recompute/repartition stable
    per_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(kept_lang) <= set(fractions)  # unlisted strata dropped
    for lang, frac in fractions.items():
        n = per_lang.get(lang, 0)
        if n == 0:
            continue
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(kept_lang.get(lang, 0) - n * frac) <= 3 * sigma + 1, (lang, kept_lang)


def test_connected_components_multi_hop_chain(spark):
    """Label propagation must traverse diameters > 1: a 6-node path
    graph (0-1-2-3-4-5) plus a disjoint pair must collapse to two
    clusters with min-id labels."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        "src long, dst long",
    )
    got = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 10: 10, 11: 10}


def test_ann_pq_recall_and_exactness_vs_bruteforce(spark, sf_small):
    """PQ-ADC scan + exact re-rank: the 8x16 codebook compresses each
    vector to 8 bytes, so candidate SELECTION is approximate, but the
    rerank is the strict fold — every emitted hit that brute force
    also ranks must carry the identical cosine, and recall@10 must
    clear 0.5 with a 4k rerank margin."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
        q_ann_topk_bruteforce,
        q_ann_topk_pq,
    )

    exact_rows = q_ann_topk_bruteforce(spark, sf_small).collect()
    approx_rows = q_ann_topk_pq(spark, sf_small).collect()
    exact_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact_rows}
    exact_sets: dict[int, set[int]] = {}
    for r in exact_rows:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx_rows:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key], f"rerank not exact at {key}"
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"PQ recall@10 {mean_recall:.2f}"
