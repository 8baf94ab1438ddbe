"""Round-14 additions and regression fixtures.

1. Cross-engine regex-dialect parity on the exact characters the
   round-13 advisor flagged: Java's ``.`` excludes \\r/\\u0085/\\u2028/
   \\u2029 while RE2's excludes only \\n, and Java's ``\\s`` includes
   \\x0B while RE2's does not. The production fixtures contain none of
   these characters, so only a planted corpus can prove the BPE symbol
   wrap (now ``([\\s\\S])``, total in both dialects) and the stump
   feature's explicit whitespace class really agree across engines.
"""

from __future__ import annotations

import duckdb
import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
    ORACLE_BPE_TOKENIZE,
    ORACLE_BPE_TOKENIZE_HIER,
    bpe_token_counts,
    bpe_token_counts_hier,
)
from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.operators.classifier import (
    _oracle_stump_splits,
    stump_split_report,
)
from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
    _oracle_decon_containment,
    containment_decontamination_pairs,
    decontamination_pairs,
)

from .oracle_harness import compare

# Words carrying each divergence character INSIDE the word (never as
# the space separator), plus enough repeated normal words that merge
# mining has real signal at both levels.
_DIVERGENCE_TEXTS = [
    "the theory theme then they the theory theme then they",
    "weird\rcarriage word and weird\rcarriage again the theory",
    "line\nfeed stays one tok the theme then and theory",
    "vertical\x0btab token here the they then theme and",
    "nextline and para sep and line end the theory",
    "the theory theme then they and and and the the",
]


@pytest.fixture(scope="module")
def divergence_docs(spark, tmp_path_factory):
    """(spark_df, duckdb connection with a matching ``documents`` view)
    over the planted-divergence corpus, shared via parquet so both
    engines read bit-identical rows."""
    rows = [
        (i, t, "en" if i % 2 == 0 else "fr", f"src{i % 3}", len(t))
        for i, t in enumerate(_DIVERGENCE_TEXTS)
    ]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path_factory.mktemp("div") / "documents.parquet")
    sdf.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return spark.read.parquet(path), con


def test_bpe_tokenize_parity_on_dot_invisible_chars(divergence_docs):
    sdf, con = divergence_docs
    ok, msg = compare(bpe_token_counts(sdf), con, ORACLE_BPE_TOKENIZE)
    assert ok, msg


def test_bpe_tokenize_hier_parity_on_dot_invisible_chars(divergence_docs):
    sdf, con = divergence_docs
    ok, msg = compare(bpe_token_counts_hier(sdf), con, ORACLE_BPE_TOKENIZE_HIER)
    assert ok, msg


def test_bpe_every_char_is_a_symbol(divergence_docs):
    """The round-14 contract: n_symbols == summed code-point length of
    the whitespace-split words, for every document INCLUDING those
    with line terminators inside words (the '.'-wrap undercounted
    nothing but claimed to — now the claim is exact), and
    n_merges_applied = n_symbols - n_tokens_bpe is never negative."""
    rows = {r["doc_id"]: r for r in bpe_token_counts(divergence_docs[0]).collect()}
    for i, t in enumerate(_DIVERGENCE_TEXTS):
        expect = sum(len(w) for w in t.split(" ") if len(w) >= 1)
        assert rows[i]["n_symbols"] == expect, (i, rows[i])
        assert rows[i]["n_merges_applied"] >= 0


def test_stump_splits_parity_on_vertical_tab(divergence_docs):
    sdf, con = divergence_docs
    ok, msg = compare(stump_split_report(sdf), con, _oracle_stump_splits())
    assert ok, msg


# ---------------------------------------------------------------------------
# 2. Containment decontamination: the planted-injection fixture the
#    round-13 verdict asked for — a short holdout snippet embedded
#    verbatim inside a long train document. Symmetric Jaccard is
#    diluted by the train doc's size and misses the pair at the
#    production threshold; containment (normalized by the TEST side
#    only) scores it 1.0.
# ---------------------------------------------------------------------------

_SNIPPET = (
    "the secret evaluation answer key is forty two and the capital "
    "of france is paris exactly"
)

_FILLER = (
    "galaxies rotate under dark matter halos while spiral arms trace "
    "density waves through interstellar dust and young luminous stars "
    "ignite along the compressed gas lanes of each passing crest "
) * 3


@pytest.fixture(scope="module")
def injected_docs(spark, tmp_path_factory):
    texts = [
        # doc 0: the HOLDOUT snippet (src0 = holdout side).
        (0, _SNIPPET, "en", "src0"),
        # doc 1: long train doc with the snippet embedded mid-text.
        (1, _FILLER + _SNIPPET + " " + _FILLER, "en", "src2"),
        # docs 2-4: unrelated train noise.
        (2, _FILLER, "en", "src2"),
        (3, "completely different words about maritime navigation and "
            "celestial charts used by ancient sailors at night", "en", "src3"),
        (4, "short train doc", "en", "src4"),
    ]
    rows = [(i, t, lg, src, len(t)) for i, t, lg, src in texts]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path_factory.mktemp("inj") / "documents.parquet")
    sdf.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return spark.read.parquet(path), con


def test_jaccard_decon_misses_embedded_snippet(injected_docs):
    sdf, _ = injected_docs
    pairs = decontamination_pairs(
        sdf, F.col("source").isin("src0", "src1"), threshold=0.5
    ).collect()
    assert not any(
        r["train_doc"] == 1 and r["test_doc"] == 0 for r in pairs
    ), f"jaccard unexpectedly flagged the embedded snippet: {pairs}"


def test_containment_decon_finds_embedded_snippet(injected_docs):
    sdf, _ = injected_docs
    pairs = {
        (r["train_doc"], r["test_doc"]): r["containment"]
        for r in containment_decontamination_pairs(
            sdf, F.col("source").isin("src0", "src1")
        ).collect()
    }
    assert (1, 0) in pairs, f"containment missed the planted pair: {pairs}"
    assert pairs[(1, 0)] == 1.0  # snippet fully embedded
    # the unrelated train docs are NOT flagged
    assert not any(tr in (2, 3, 4) for tr, _ in pairs)


# ---------------------------------------------------------------------------
# 3. K-level BPE: per-level convergence is monotone non-increasing and
#    consistent with the flat / two-level entries it generalizes.
# ---------------------------------------------------------------------------


def test_bpe_klevel_monotone_and_consistent(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        bpe_level_convergence,
        bpe_token_counts,
        bpe_token_counts_hier,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    docs = read_table(spark, sf_small, "documents")
    curve = {r["level"]: r["n_tokens"] for r in bpe_level_convergence(docs).collect()}
    assert sorted(curve) == [0, 1, 2, 3]
    for lv in (1, 2, 3):
        assert curve[lv] <= curve[lv - 1], curve
    # level 0/1 must equal the flat apply entry's corpus totals, and
    # level 2 the two-level entry's — the K-level trainer IS those
    # operators at depth 1 and 2.
    flat = bpe_token_counts(docs).agg(
        F.sum("n_symbols").alias("s"), F.sum("n_tokens_bpe").alias("t")
    ).collect()[0]
    assert curve[0] == flat["s"] and curve[1] == flat["t"]
    hier = bpe_token_counts_hier(docs).agg(F.sum("n_tokens_l2").alias("t")).collect()[0]
    assert curve[2] == hier["t"]


def test_bpe_klevel_parity_on_divergence_corpus(divergence_docs):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.bpe import (
        _oracle_bpe_klevel,
        bpe_level_convergence,
    )

    sdf, con = divergence_docs
    ok, msg = compare(bpe_level_convergence(sdf), con, _oracle_bpe_klevel())
    assert ok, msg


def test_containment_decon_oracle_parity_on_planted_corpus(injected_docs):
    sdf, con = injected_docs
    ok, msg = compare(
        containment_decontamination_pairs(
            sdf, F.col("source").isin("src0", "src1")
        ),
        con,
        _oracle_decon_containment(),
    )
    assert ok, msg


def test_decontamination_scrub_excises_exactly_the_snippet(injected_docs):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        decontamination_scrub,
    )

    sdf, _ = injected_docs
    rows = {
        r["doc_id"]: r
        for r in decontamination_scrub(
            sdf, F.col("source").isin("src0", "src1")
        ).collect()
    }
    # Train docs only in the output — the holdout doc is not rewritten.
    assert sorted(rows) == [1, 2, 3, 4]
    hit = rows[1]
    assert _SNIPPET not in hit["cleaned_text"]
    assert hit["n_spans"] == 1 and hit["removed_chars"] == len(_SNIPPET)
    # Everything around the snippet survives verbatim.
    assert hit["cleaned_text"] == _FILLER + " " + _FILLER
    for i in (2, 3, 4):
        assert rows[i]["n_spans"] == 0 and rows[i]["removed_chars"] == 0


def test_decontamination_scrub_oracle_parity_on_planted_corpus(injected_docs):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.dedup import (
        _oracle_decon_scrub,
        decontamination_scrub,
    )

    sdf, con = injected_docs
    ok, msg = compare(
        decontamination_scrub(sdf, F.col("source").isin("src0", "src1")),
        con,
        _oracle_decon_scrub(),
    )
    assert ok, msg


def test_classifier_calibration_parity_and_invariants(divergence_docs, spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.operators.classifier import (
        _oracle_classifier_calibration,
        classifier_calibration,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import (
        read_table,
    )

    sdf, con = divergence_docs
    ok, msg = compare(
        classifier_calibration(sdf, min_df=1), con,
        _oracle_classifier_calibration().replace("COUNT(*) >= 5", "COUNT(*) >= 1"),
    )
    assert ok, msg
    # invariants on the fixture: bins partition the scored docs, rates
    # are probabilities, bins stay inside the clamp
    docs = read_table(spark, sf_small, "documents")
    rows = classifier_calibration(docs).collect()
    n_text = docs.where(F.col("text").isNotNull()).count()
    assert sum(r["n_docs"] for r in rows) == n_text
    for r in rows:
        assert 0.0 <= r["en_rate"] <= 1.0
        assert -5 <= r["score_bin"] <= 4
        assert 0 <= r["n_en"] <= r["n_docs"]


def test_stream_decontamination_equals_batch(spark, sf_small):
    """The streaming job's flagged pair set equals the batch
    operator's bit-for-bit (static holdout + per-batch-complete train
    windows make this exact, not approximate)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import registry
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        stream_decontamination,
    )

    streamed = {
        (r["train_doc"], r["test_doc"]): r["containment"]
        for r in stream_decontamination(spark, sf_small).collect()
    }
    batch = {
        (r["train_doc"], r["test_doc"]): r["containment"]
        for r in registry()["dedup_decontamination_containment"](
            spark, sf_small
        ).collect()
    }
    assert streamed == batch
