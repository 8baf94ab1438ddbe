"""Round-7 fix regressions: NULL-ordering pin in quality deciles,
locale-pinned month labels, SCD2 late-arrival rejection, and the
connected-components convergence guard at its boundary."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import duckdb
import pytest

from tests.oracle_harness import compare


# ---------------------------------------------------------------------------
# quality_deciles: NULL/empty-text docs must land identically on both
# engines (ADVICE r6: Spark asc sort = NULLS FIRST, DuckDB NTILE =
# NULLS LAST — now both rank on COALESCE(score, +inf)).
# ---------------------------------------------------------------------------


def _crafted_docs(spark):
    rows = [
        (i, f"the quick brown fox jumps over dog number {i} again and again", "en", "web", 60)
        for i in range(1, 22)
    ]
    rows.append((22, "", "en", "web", 0))      # empty text -> 0.25 score
    rows.append((23, None, "en", "web", None))  # NULL text -> NULL score
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_quality_deciles_null_docs_match_oracle(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        _deciles_oracle,
        quality_deciles,
    )

    docs = _crafted_docs(spark)
    out = quality_deciles(docs)
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    ok, msg = compare(out, con, _deciles_oracle())
    assert ok, msg


def test_quality_deciles_null_docs_rank_last(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        quality_deciles,
    )

    docs = _crafted_docs(spark)
    rows = {r["decile"]: r for r in quality_deciles(docs).collect()}
    # 23 docs over 10 bins: bins 1-3 hold 3 docs, 4-10 hold 2. The
    # empty-text doc scores 0.25 (the whitespace split yields [''], so
    # ratios are defined — both engines agree) and ranks FIRST; the
    # NULL-text doc has a NULL score and must rank LAST (NULLS LAST on
    # both engines): bin 10 = one 0.8222 doc + the NULL doc, whose
    # score the min/max aggregates ignore.
    assert rows[1]["min_quality"] == 0.25
    last = rows[10]
    assert last["n_docs"] == 2
    assert last["min_quality"] == last["max_quality"] == 0.8222
    # total rows across bins include the NULL doc exactly once
    assert sum(rows[d]["n_docs"] for d in rows) == 23


# ---------------------------------------------------------------------------
# month_label: literal English abbreviations, independent of the JVM
# default locale (reference TO_CHAR(mois,'Mon YYYY')).
# ---------------------------------------------------------------------------

_EXPECTED_LABELS = [
    "Jan 1995", "Feb 1995", "Mar 1995", "Apr 1995", "May 1995", "Jun 1995",
    "Jul 1995", "Aug 1995", "Sep 1995", "Oct 1995", "Nov 1995", "Dec 1995",
]

_LOCALE_PROBE = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession, functions as F
    sys.path.insert(0, {repo!r})
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.etl import month_label

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("locale-probe")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.language=fr -Duser.country=FR",
        )
        .getOrCreate()
    )
    jvm_locale = spark._jvm.java.util.Locale.getDefault().toString()
    df = spark.sql(
        "SELECT sequence(DATE'1995-01-01', DATE'1995-12-01', INTERVAL 1 MONTH) AS m"
    ).select(F.explode("m").alias("mois"))
    labels = [r["l"] for r in df.select(month_label("mois").alias("l")).collect()]
    jvm_fmt = [
        r["l"]
        for r in df.select(F.date_format("mois", "MMM yyyy").alias("l")).collect()
    ]
    print(json.dumps({{"locale": jvm_locale, "labels": labels, "jvm_fmt": jvm_fmt}}))
    spark.stop()
    """
)


def test_month_label_english_literals(spark):
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.etl import month_label

    df = spark.sql(
        "SELECT sequence(DATE'1995-01-01', DATE'1995-12-01', INTERVAL 1 MONTH) AS m"
    ).select(F.explode("m").alias("mois"))
    labels = [r["l"] for r in df.select(month_label("mois").alias("l")).collect()]
    assert labels == _EXPECTED_LABELS


def test_month_label_survives_french_jvm(tmp_path):
    """Run month_label in a FRESH JVM whose default locale is fr_FR:
    the labels must stay English. Measured here: Spark >=3 pins its
    datetime formatters to Locale.US, so date_format('MMM yyyy') also
    stays English — the literal month map keeps that guarantee
    explicit in OUR code instead of resting on a Spark internal."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "probe.py"
    script.write_text(_LOCALE_PROBE.format(repo=repo))
    res = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=300
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["locale"].startswith("fr"), out["locale"]
    assert out["labels"] == _EXPECTED_LABELS
    # Spark's own formatter under the French JVM (documents the
    # Locale.US pin this Spark build ships; our labels don't rely on it)
    assert out["jvm_fmt"] == _EXPECTED_LABELS


# ---------------------------------------------------------------------------
# SCD2 late-arrival contract: out-of-order update batches are rejected
# at execution time (inverted validity intervals never reach the sink).
# ---------------------------------------------------------------------------


def _scd_frames(spark, effective: str):
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import OPEN_END

    current = spark.createDataFrame(
        [
            (1, "alice", "GOLD", "1995-01-01", OPEN_END),
            (2, "bob", "SILVER", "1995-01-01", OPEN_END),
        ],
        "client_id long, nom_client string, segment string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, "PLATINUM", effective)],
        "client_id long, segment string, effective_date string",
    )
    return current, updates


def test_scd2_out_of_order_update_rejected(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import scd2_apply

    current, updates = _scd_frames(spark, "1994-06-30")
    out = scd2_apply(current, updates, key="client_id", tracked=["segment"])
    with pytest.raises(Exception, match="out-of-order"):
        out.collect()


def test_scd2_same_day_correction_allowed(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import (
        OPEN_END,
        scd2_apply,
    )

    current, updates = _scd_frames(spark, "1995-01-01")
    rows = sorted(
        scd2_apply(current, updates, key="client_id", tracked=["segment"]).collect(),
        key=lambda r: (r["client_id"], r["valid_from"], r["valid_to"]),
    )
    v1 = [r for r in rows if r["client_id"] == 1]
    assert len(v1) == 2
    closed, live = sorted(v1, key=lambda r: r["valid_to"])
    assert closed["valid_to"] == "1995-01-01"  # zero-length closed version
    assert live["segment"] == "PLATINUM" and live["valid_to"] == OPEN_END


def test_scd2_in_order_update_still_applies(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.scd import (
        OPEN_END,
        scd2_apply,
    )

    current, updates = _scd_frames(spark, "1996-03-15")
    rows = scd2_apply(current, updates, key="client_id", tracked=["segment"]).collect()
    v1 = sorted(
        (r for r in rows if r["client_id"] == 1), key=lambda r: r["valid_from"]
    )
    assert [(r["valid_from"], r["valid_to"], r["segment"]) for r in v1] == [
        ("1995-01-01", "1996-03-15", "GOLD"),
        ("1996-03-15", OPEN_END, "PLATINUM"),
    ]


# ---------------------------------------------------------------------------
# connected_components: the convergence guard must FIRE on a graph
# whose diameter exceeds the round budget (previously untested).
# ---------------------------------------------------------------------------


def test_connected_components_nonconvergence_raises(spark, monkeypatch):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators import dedup
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        connected_components,
    )

    # Path graph 0-1-2-...-9: min-label 0 moves one hop per round, so
    # 3 rounds cannot finish and the guard must reject rather than
    # return partial (wrong) cluster ids. Force the DISTRIBUTED loop
    # (round-16: small graphs now take the size-guarded driver
    # union-find, which has no iteration budget) so the guard is
    # still exercised.
    monkeypatch.setattr(dedup, "_CC_LOCAL_EDGES", 0)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)


def test_connected_components_exact_budget_converges(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        connected_components,
    )

    # Same path graph with a sufficient budget: one component, label 0.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    rows = connected_components(edges, max_iter=12).collect()
    assert {r["node"] for r in rows} == set(range(10))
    assert {r["label"] for r in rows} == {0}


# ---------------------------------------------------------------------------
# Portable (md5-hash) banding twins: same quality contracts as the
# xxhash fast paths — the hash family must not change the recall story.
# ---------------------------------------------------------------------------


def test_minhash_portable_recall_vs_exact(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    exact = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs, threshold=0.7).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, threshold=0.0, portable=True
        ).collect()
    }
    assert exact, "fixture should contain at least one near-dup pair"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"portable LSH recall {recall:.2f} over {len(exact)} exact pairs"


def test_simhash_portable_within_radius(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        simhash_pairs,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    docs = read_table(spark, sf_small, "documents")
    pairs = simhash_pairs(docs, bits=32, max_hamming=3, portable=True).collect()
    assert pairs, "corpus should contain close fingerprints"
    assert all(r["hamming"] <= 3 for r in pairs)


# ---------------------------------------------------------------------------
# Token-budget selection: boundary semantics on a crafted frame.
# ---------------------------------------------------------------------------


def test_token_budget_boundary(spark):
    """5 equal-token docs, budget 50%: the greedy rule (keep while the
    EXCLUSIVE prefix sum is under budget) keeps exactly 3 — the doc
    straddling the boundary is kept, the next is not. NULL-text doc
    ranks last and is never selected."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.quality import (
        token_budget_selection,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"  # 12 tokens
    rows = [(i, text, "en", f"s{i}", len(text)) for i in range(1, 6)]
    rows.append((6, None, "en", "s6", None))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["source"]: r for r in token_budget_selection(docs, fraction=0.5).collect()}
    # total = 60 tokens, budget 30; docs tie on quality -> doc_id order:
    # prefix sums 0, 12, 24 (< 30 -> kept), 36 (not kept)
    assert set(out) == {"s1", "s2", "s3"}
    assert all(r["n_docs_selected"] == 1 and r["tokens_selected"] == 12 for r in out.values())


# ---------------------------------------------------------------------------
# Round-7 quality contracts for the previously rows-only families.
# ---------------------------------------------------------------------------


def test_ann_recall_report_contract(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.similarity import (
        q_ann_recall_report,
    )

    rows = {r["algo"]: r for r in q_ann_recall_report(spark, sf_small).collect()}
    assert set(rows) == {"ivf", "pq"}
    for algo, r in rows.items():
        assert r["recall_ok"], f"{algo} recall fell below its floor"
        assert r["n_truth_pairs"] == r["n_queries"] * r["k"]
        assert r["n_queries"] > 50  # the 25% hash sample is non-trivial


def test_portable_split_disjoint_and_leak_free(spark):
    """Same key under the same salt -> same split on ANY table (the
    leak-freedom contract), and rates track the weights."""
    from pyspark.sql import functions as F

    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.sampling import (
        deterministic_split,
    )

    a = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    b = a.withColumn("extra", F.lit("feature-table"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    sa = deterministic_split(a, ["doc_id"], w, portable=True)
    sb = deterministic_split(b, ["doc_id"], w, portable=True)
    joined = sa.join(sb.withColumnRenamed("split", "split_b"), "doc_id")
    assert joined.filter(F.col("split") != F.col("split_b")).count() == 0
    rates = {r["split"]: r["n"] for r in sa.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(rates.values()) == 4000
    assert abs(rates["train"] / 4000 - 0.8) < 0.03
    assert abs(rates["val"] / 4000 - 0.1) < 0.02
    assert abs(rates["test"] / 4000 - 0.1) < 0.02


def test_approx_bounds_wide_spread_tiny_month(spark):
    """A 2-row month with a 50x value spread: a value-relative bound
    on percentile_approx would trip (the sketch returns one of the two
    raw values, the exact percentile interpolates between them); the
    rank-based contract must hold."""
    import datetime

    from filmdb_data_warehouse___power_bi_dashboard_spark.queries.corpus import (
        approx_error_bounds,
    )

    rows = [
        (datetime.date(2024, 1, 5), 10.00, 1),
        (datetime.date(2024, 1, 20), 500.00, 2),
    ] + [
        (datetime.date(2024, 2, 1 + i % 28), 100.0 + i, 10 + i) for i in range(40)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double, o_custkey long"
    )
    out = {str(r["mois"]): r for r in approx_error_bounds(orders).collect()}
    assert set(out) == {"2024-01-01", "2024-02-01"}
    for r in out.values():
        assert r["hll_ok"] and r["p50_ok"] and r["p95_ok"], dict(r.asDict())
    jan = out["2024-01-01"]
    assert jan["nb"] == 2 and jan["exact_clients"] == 2
    assert jan["exact_p50"] == 255.0  # interpolated midpoint of 10 and 500
