"""Adversarial cross-engine audit: every oracle-bearing query over the
documents / embeddings / events tables is replayed on a PATHOLOGICAL
corpus — NULL and empty texts, sub-shingle docs, whitespace runs,
exact duplicates, NULL langs/sources, zero-norm and NULL embeddings,
NULL/malformed event props — and must still hash-match its DuckDB
oracle.

Rationale: the production corpora are clean, so guard mismatches
between a Spark plan and its oracle string (the round-6/7 ADVICE
class: NULL-text simhash fingerprints, concat_ws NULL-skips,
all-sentinel minhash signatures) stay latent for rounds. This module
makes them fail HERE first. Texts stay pure ASCII — the multimodal
oracles' byte-as-char replay is a documented corpus invariant, not a
guard to test.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401  (kept for triage edits)

from filmdb_data_warehouse___power_bi_dashboard_spark.queries import oracles, registry

from .oracle_harness import compare

_REG = registry()
_ORACLES = oracles()

# Families whose inputs are the LLM-pipeline tables; everything else
# reads the TPC-H-ish tables, which this module leaves untouched.
_PREFIXES = (
    "dedup_",
    "text_",
    "corpus_",
    "embedding_",
    "ann_",
    "multimodal_",
    "events_",
    "stream_",
    "sessionize",
    "retrieval_",
    "pii_",
    "basket_",  # lineitem-based: symlinked, acts as a control group
)

# Documented preconditions, not guard bugs (excluded with reasons):
_EXCLUDED = {
    # recall floors are calibrated on the real embedding distribution;
    # a 40-vector pathological corpus can legitimately land under the
    # IVF floor, flipping the boolean the oracle asserts TRUE.
    "ann_recall_report",
}

_NAMES = sorted(
    n
    for n in _REG
    if n in _ORACLES and n.startswith(_PREFIXES) and n not in _EXCLUDED
)


def _write_pathological(tmp: str, src_sf: str) -> None:
    con = duckdb.connect()
    docs_src = os.path.join(src_sf, "documents.parquet")
    emb_src = os.path.join(src_sf, "embeddings.parquet")
    ev_src = os.path.join(src_sf, "events.parquet")

    # documents: 30 real docs (near-dup signal survives) + degenerates.
    # NOTE doc_id stays dense from 0 so the %3 media-kind mapping and
    # split-bucket coverage still exercise all branches.
    con.execute(
        f"""
        COPY (
          WITH real AS (
            SELECT * FROM read_parquet('{docs_src}') ORDER BY doc_id LIMIT 30
          ),
          degen(doc_id, text, lang, source, n_chars) AS (VALUES
            (30, NULL, 'en', 'src2', NULL),
            (31, NULL, NULL, NULL, NULL),
            (32, '', 'en', 'src2', 0),
            (33, 'x', 'en', 'src3', 1),
            (34, 'x y', 'en', 'src3', 3),
            (35, '  double  spaces  run ', 'en', 'src4', 22),
            (36, 'x y', NULL, 'src0', 3),
            (37, (SELECT text FROM real WHERE doc_id = 0), 'es', 'src1',
                 (SELECT n_chars FROM real WHERE doc_id = 0)),
            (38, (SELECT text FROM real WHERE doc_id = 0), NULL, NULL,
                 (SELECT n_chars FROM real WHERE doc_id = 0)),
            (39, 'the the the the the the the the', 'en', 'src0', 31)
          )
          SELECT * FROM real UNION ALL SELECT * FROM degen ORDER BY doc_id
        ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings: 40 real + NULL vector, zero vector (NaN cosine),
    # exact duplicate of vec 0, NULL label.
    con.execute(
        f"""
        COPY (
          WITH real AS (
            SELECT * FROM read_parquet('{emb_src}') ORDER BY vec_id LIMIT 40
          ),
          degen AS (
            SELECT 40 AS vec_id, CAST(NULL AS FLOAT[]) AS embedding, 1 AS label
            UNION ALL
            SELECT 41, CAST([0.0 for i in range(1, 65)] AS FLOAT[]), 2
            UNION ALL
            SELECT 42, (SELECT embedding FROM real WHERE vec_id = 0), 3
            UNION ALL
            SELECT 43, (SELECT embedding FROM real WHERE vec_id = 1), NULL
          )
          SELECT * FROM real UNION ALL SELECT * FROM degen ORDER BY vec_id
        ) TO '{tmp}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    # events: 120 real + NULL value / props / type / user, malformed
    # JSON, a timestamp tie on one user.
    con.execute(
        f"""
        COPY (
          WITH real AS (
            SELECT * FROM read_parquet('{ev_src}') ORDER BY event_id LIMIT 120
          ),
          degen(event_id, ts, user_id, event_type, value, props) AS (VALUES
            (120, TIMESTAMP '2024-01-01 05:00:00', 1, 'click', NULL, NULL),
            (121, TIMESTAMP '2024-01-01 05:00:00', 1, 'click', 1.5, '{{oops'),
            (122, TIMESTAMP '2024-01-01 06:00:00', 2, NULL, 2.5, '{{"k": 1}}'),
            (123, TIMESTAMP '2024-01-01 07:00:00', NULL, 'purchase', 3.5, '{{"k": 2}}'),
            (124, TIMESTAMP '2024-01-01 08:00:00', 3, 'purchase', 0.0, '{{"j": 9}}'),
            (125, TIMESTAMP '1970-01-01 00:00:00.000001', 4, 'view', 0.1, NULL),
            (126, TIMESTAMP '2024-01-31 23:59:59.999999', 5, 'click', 0.2, NULL)
          )
          SELECT * FROM real UNION ALL SELECT * FROM degen ORDER BY event_id
        ) TO '{tmp}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


@pytest.fixture(scope="module")
def patho_sf(tmp_path_factory, sf_small) -> str:
    tmp = str(tmp_path_factory.mktemp("patho_sf"))
    _write_pathological(tmp, sf_small)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    ):
        os.symlink(
            os.path.join(sf_small, f"{t}.parquet"), os.path.join(tmp, f"{t}.parquet")
        )
    return tmp


@pytest.fixture(scope="module")
def patho_duck(patho_sf):
    from .oracle_harness import duck_connection

    con = duck_connection(patho_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_parity_on_pathological_corpus(spark, patho_sf, patho_duck, name):
    df = _REG[name](spark, patho_sf)
    ok, msg = compare(df, patho_duck, _ORACLES[name])
    assert ok, f"{name} diverged on the pathological corpus: {msg}"


# Rows-only pipeline entries (xxhash64 fast paths, trained IVF/PQ, the
# mapInPandas feature path) plus the recall report: no oracle to
# compare on this corpus, but they must RUN — the round-8 audit's
# crash class (ANSI DIVIDE_BY_ZERO on zero-norm vectors, numpy astype
# on NULL labels) would otherwise stay untested on degenerate data.
_ROWS_ONLY = sorted(
    (set(_REG) - set(_ORACLES) | {"ann_recall_report"})
    & {n for n in _REG if n.startswith(_PREFIXES)}
)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs_on_pathological_corpus(spark, patho_sf, name):
    rows = _REG[name](spark, patho_sf).collect()
    assert rows is not None  # ran to completion; emptiness is legal


# ---------------------------------------------------------------------------
# Unicode corpus: the TEXT-pipeline families must agree across engines
# on multibyte text too (Java regex vs RE2, char-vs-byte length, md5
# over UTF-8, case mapping). The multimodal family is excluded BY
# CONTRACT: its oracles replay bytes as ascii(char), valid only on the
# documented pure-ASCII corpus invariant.
# ---------------------------------------------------------------------------

_TEXT_PREFIXES = ("dedup_", "text_", "corpus_", "pii_")
_UNI_NAMES = sorted(
    n
    for n in _REG
    if n in _ORACLES
    and n.startswith(_TEXT_PREFIXES)
    and not n.startswith(("dedup_embedding", "corpus_split_summary"))
)


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory, sf_small) -> str:
    tmp = str(tmp_path_factory.mktemp("unicode_sf"))
    con = duckdb.connect()
    docs_src = os.path.join(sf_small, "documents.parquet")
    con.execute(
        f"""
        COPY (
          WITH real AS (
            SELECT * FROM read_parquet('{docs_src}') ORDER BY doc_id LIMIT 25
          ),
          uni(doc_id, text, lang, source, n_chars) AS (VALUES
            (25, 'café déjà vu — naïve façade über straße', 'fr', 'web', 39),
            (26, 'le café est déjà prêt et la façade est naïve aussi', 'fr', 'web', 50),
            (27, '这是 一段 中文 文本 用于 测试 分词 行为', 'zh', 'web', 23),
            (28, 'emoji 🎬 in 🎥 the 🍿 corpus 🎬 again 🎬 and 🎥 again', 'en', 'web', 48),
            (29, 'combining é acute vs precomposed é acute forms here', 'en', 'web', 52),
            (30, 'nbsp separated tokens are one whitespace token', 'en', 'web', 46),
            (31, 'ΚΑΛΗΜΈΡΑ κόσμε ΚΑΛΗΜΈΡΑ κόσμε mixed ΕΛΛΗΝΙΚΆ case', 'el', 'web', 50),
            (32, 'café déjà vu — naïve façade über straße', 'fr', 'src1', 39)
          )
          SELECT * FROM real UNION ALL SELECT * FROM uni ORDER BY doc_id
        ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ):
        os.symlink(
            os.path.join(sf_small, f"{t}.parquet"), os.path.join(tmp, f"{t}.parquet")
        )
    return tmp


@pytest.fixture(scope="module")
def unicode_duck(unicode_sf):
    from .oracle_harness import duck_connection

    con = duck_connection(unicode_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", _UNI_NAMES)
def test_oracle_parity_on_unicode_corpus(spark, unicode_sf, unicode_duck, name):
    df = _REG[name](spark, unicode_sf)
    ok, msg = compare(df, unicode_duck, _ORACLES[name])
    assert ok, f"{name} diverged on the unicode corpus: {msg}"
