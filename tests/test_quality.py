"""Behavior tests for the quality/curation operators (operators/
quality.py) and CDC compaction (operators/cdc.py) on crafted inline
frames — the oracle-parity gate covers the corpus queries; these pin
the operator semantics themselves."""

from __future__ import annotations

import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.cdc import latest_state
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
    bm25_search,
    mix_weights,
    pii_scrub,
    repetition_profile,
)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or https://x.io/page now"),
            (2, "no pii here"),
            (3, "twice a@b.co and c@d.org"),
        ],
        "id int, text string",
    )
    out = pii_scrub(
        df,
        "text",
        {
            "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
            "url": "https?://[^ ]+",
        },
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["pii_hits_email"] == 1 and rows[1]["pii_hits_url"] == 1
    assert rows[1]["text_clean"] == "contact <EMAIL> or <URL> now"
    assert rows[2]["pii_hits_email"] == 0 and rows[2]["text_clean"] == "no pii here"
    assert rows[3]["pii_hits_email"] == 2
    assert rows[3]["text_clean"] == "twice <EMAIL> and <EMAIL>"


def test_bm25_orders_by_relevance(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark runs fast", "en"),
            (2, "spark is here", "en"),
            (3, "nothing relevant at all", "en"),
            (4, "rare rare rare rare rare", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = bm25_search(docs, ["spark"], top_k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids == [1, 2]  # doc 3/4 match nothing; higher tf ranks first
    assert out[0]["bm25"] > out[1]["bm25"] > 0


def test_bm25_idf_favors_rarer_term(spark):
    # 'common' appears in every doc, 'rare' in one: equal tf, the doc
    # matching the rare term must outrank the common-term doc.
    docs = spark.createDataFrame(
        [
            (1, "common rare x", "en"),
            (2, "common a b", "en"),
            (3, "common c d", "en"),
            (4, "common e f", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_search(docs, ["common", "rare"]).collect()}
    assert out[1] > out[2]


def test_repetition_profile_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),
            (2, "w x y z"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_profile(docs).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 4
    assert r1["dup_word_ratio"] == pytest.approx(0.75)
    assert r1["top_bigram_share"] == pytest.approx(1.0)  # 'a a' x3 of 3
    assert r1["dup_bigram_frac"] == pytest.approx(1.0)
    assert r1["dup_trigram_frac"] == pytest.approx(1.0)  # 'a a a' x2
    r2 = rows[2]
    assert r2["dup_word_ratio"] == 0.0
    assert r2["dup_bigram_frac"] == 0.0 and r2["dup_trigram_frac"] == 0.0


def test_mix_weights_properties(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (10 if i < 90 else 1000), "big" if i < 90 else "small")
         for i in range(100)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in mix_weights(docs, alpha=0.5, budget_frac=0.5).collect()}
    assert sum(r["mix_weight"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)
    # alpha < 1 upweights the smaller-token source relative to its share.
    tok_big, tok_small = out["big"]["n_tokens"], out["small"]["n_tokens"]
    share_small = tok_small / (tok_big + tok_small)
    assert out["small"]["mix_weight"] < share_small or tok_small < tok_big
    # epochs = weight * budget / tokens: smaller source repeats more.
    if tok_small < tok_big:
        assert out["small"]["epochs"] > out["big"]["epochs"]


def test_latest_state_wins_by_order_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 10:00:00", "a", 1.0),
            (2, 100, "2024-01-02 10:00:00", "b", 2.0),  # latest ts wins
            (3, 200, "2024-01-01 10:00:00", "c", 3.0),
            (4, 200, "2024-01-01 10:00:00", "d", 4.0),  # ts tie: higher id wins
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    )
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = {
        r["user_id"]: r
        for r in latest_state(
            df, ["user_id"], ["ts", "event_id"], ["event_id", "event_type", "value"]
        ).collect()
    }
    assert out[100]["event_type"] == "b" and out[100]["n_changes"] == 2
    assert out[200]["event_type"] == "d" and out[200]["event_id"] == 4


def test_decontamination_artifact_path_equals_pure_path(spark, sf_small):
    """The materialized-postings spelling of decontamination must
    return exactly the rows of the pure (raw-text) spelling."""
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _DECON_TEST_SOURCES,
        decontamination_pairs,
        q_dedup_decontamination,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    pure = decontamination_pairs(
        docs, F.col("source").isin(*_DECON_TEST_SOURCES), threshold=0.5, n=3
    )
    art = q_dedup_decontamination(spark, sf_small)
    assert sorted(map(tuple, art.collect())) == sorted(map(tuple, pure.collect()))


def test_jaccard_and_tfidf_artifact_paths_equal_pure_paths(spark, sf_small):
    """The artifact-backed gate spellings must return exactly the
    pure raw-text spellings' rows."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        jaccard_pairs,
        q_dedup_ngram_jaccard,
        q_dedup_tfidf_pairs,
        tfidf_cosine_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    assert sorted(map(tuple, q_dedup_ngram_jaccard(spark, sf_small).collect())) == sorted(
        map(tuple, jaccard_pairs(docs, threshold=0.6, n=3).collect())
    )
    assert sorted(map(tuple, q_dedup_tfidf_pairs(spark, sf_small).collect())) == sorted(
        map(tuple, tfidf_cosine_pairs(docs, threshold=0.5, n=3).collect())
    )
