"""Learned quality-classifier inference: the model-based curation
stage (fastText / logistic-regression quality filtering) that every
production training-data pipeline runs after the heuristic filters.

A trained linear text classifier is, at inference time, nothing but a
(token → weight) lookup plus a per-document weighted sum:
``logit(d) = Σ_t count(d,t) · w(t)``, thresholded into keep/drop.
That is exactly a broadcast-joinable dimension table and one
map-side-combined aggregate — no model runtime needed in the hot
path, which is why the linear family dominates at corpus scale
(fastText's quality filter in CCNet/RedPajama-style pipelines).

Here the weight table stands in for the trained artifact: the
vocabulary is every token with document frequency ≥ ``_MIN_DF``
(Zipf's law makes this a tiny fraction of the token stream — the same
min-count cap the lm.py bigram model documents), and each weight is
derived deterministically from the cross-engine ``h60`` token hash,
mapped onto the integer grid [−1000, 1000]. Deterministic weights
make the whole inference pass — vocabulary build, weight lookup, OOV
fallback, logit sum, threshold — replayable by the DuckDB oracle, so
the driver hash attests the full stage. Swapping in real trained
weights changes ONE projection (read the table instead of hashing),
none of the plan shape.

Integer-exactness contract: weights and counts are BIGINTs, so every
logit is an exact integer sum (partition-order independent, bit-equal
across engines); the only float is the final length-normalized score,
computed once per document from identical integers.

Scale shape (100 TB story): token counts are one explode + groupBy
(doc_id, token) — partial-agg combines within each document's
partition before any shuffle; document frequency is a second
map-side-combined agg onto token keys; the weight table is
vocabulary-sized (min_df-capped), so AQE broadcasts it — and if a
degenerate corpus made it large, the equi-join degrades to a shuffle
hash join instead of an OOM (no forced hint, the round-12 linkage
lesson). The per-document reduction lands on doc_id keys. Nothing
quadratic, no Python in the hot path, raw text scanned once.

Reference anchor: the reference's text surface is the tsvector
full-text column (filmdb.sql:143); this module is part of the
SURVEY §2.11 training-data-pipeline extension over `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table
from .dedup import h60, sql_h60

# Vocabulary cap: a token enters the model only with document
# frequency >= _MIN_DF. 5 at the 500-doc sf0.01 fixture keeps the
# vocabulary meaningfully smaller than the token stream while leaving
# most running text in-vocabulary — the regime a trained classifier
# operates in.
_MIN_DF = 5
# Weight grid: h60(token) mapped onto [-1000, 1000] — integer
# "trained" weights on a symmetric grid, zero-mean by construction.
_W_SPAN = 2001
_W_OFF = 1000


def token_weight_table(docs: DataFrame, min_df: int = _MIN_DF) -> DataFrame:
    """The model artifact: (token, weight BIGINT) for every token with
    document frequency >= min_df. In production this frame is READ
    (the trained model's weight vector); here it is derived so the
    oracle can rebuild it bit-for-bit."""
    counts = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select(
            "tok",
            (F.pmod(h60("tok"), F.lit(_W_SPAN)) - F.lit(_W_OFF))
            .cast("long")
            .alias("w"),
        )
    )


def quality_classifier_scores(
    docs: DataFrame, min_df: int = _MIN_DF
) -> DataFrame:
    """Score every document under the linear model (module docstring).

    Returns (doc_id, n_tokens, logit_fp, score, quality_pass) ordered
    by doc_id: ``logit_fp`` the exact integer logit Σ count·weight
    (OOV tokens weigh 0 via the left join's COALESCE — the standard
    unknown-token fallback), ``score`` the length-normalized logit in
    weight units (logit / n_tokens / 1000, rounded on the 1e-6 grid),
    ``quality_pass`` the keep/drop decision at the logit-0 threshold —
    integer-exact, so the classification boundary is bit-identical
    across engines.
    """
    counts = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    weights = token_weight_table(docs, min_df=min_df)
    scored = counts.join(weights, "tok", "left").groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0)))
        .cast("long")
        .alias("logit_fp"),
    )
    score = (
        F.col("logit_fp").cast("double")
        / F.col("n_tokens").cast("double")
        / float(_W_OFF)
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit_fp",
        round_half_up(score, 6).alias("score"),
        (F.col("logit_fp") >= 0).alias("quality_pass"),
    ).orderBy("doc_id")


def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_classifier_scores(read_table(spark, sf_dir, "documents"))


ORACLE_QUALITY_CLASSIFIER = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
),
weights AS (
  SELECT tok, CAST({sql_h60('tok')} % {_W_SPAN} - {_W_OFF} AS BIGINT) AS w
  FROM (SELECT tok FROM counts GROUP BY tok HAVING COUNT(*) >= {_MIN_DF}) v
),
scored AS (
  SELECT c.doc_id,
         CAST(SUM(c.cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(c.cnt * COALESCE(w.w, 0)) AS BIGINT) AS logit_fp
  FROM counts c LEFT JOIN weights w ON c.tok = w.tok
  GROUP BY c.doc_id
)
SELECT doc_id, n_tokens, logit_fp,
       {sql_round_half_up(
           "CAST(logit_fp AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
           f" / {float(_W_OFF)!r}", 6
       )} AS score,
       logit_fp >= 0 AS quality_pass
FROM scored
ORDER BY doc_id
"""


QUERIES = {"text_quality_classifier": q_text_quality_classifier}
ORACLES = {"text_quality_classifier": ORACLE_QUALITY_CLASSIFIER}
