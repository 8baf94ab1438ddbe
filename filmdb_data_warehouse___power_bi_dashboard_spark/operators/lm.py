"""Statistical language-model scoring over the ``documents`` corpus:
a self-trained bigram model with add-alpha smoothing, scoring every
document by its average per-bigram log-probability (and the derived
perplexity) — the KenLM-style quality signal production pipelines use
to filter training text (fluent text scores high; gibberish, boiler-
plate and wrong-language text score low).

Scale design (100 TB story): the model is two hash aggregations over
the exploded bigram stream — both map-side combined, and the shuffle
carries (word, word) keys, never document text. Scoring is an
equi-join of the same bigram stream against the model (AQE picks
broadcast when the model is small; at web scale you cap the model to
bigrams with count >= min_count — a tiny fraction by Zipf's law — and
the left join's smoothing term already handles the out-of-model
fallback, so the cap changes only the model size, not the operator
shape). The per-document reduction sums exact integer-scaled
log-probs (BIGINT — partition-order independent), so results are
bit-stable and oracle-checkable; no Python touches the hot path.

Reference anchor: the reference's text surface is the tsvector
full-text column (filmdb.sql:143); this module is part of the
SURVEY §2.11 training-data-pipeline extension over `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

_ALPHA = 0.5


def _scaled_long(x):
    """double -> exact integer-scaled BIGINT on a 1e-6 grid; one IEEE
    multiply+add+floor, identical in both engines (chunking._scaled_long
    twin, kept local to avoid a cross-module private import)."""
    return F.floor(x * 1e6 + F.lit(0.5)).cast("long")


def bigram_lm_score(docs: DataFrame, alpha: float = _ALPHA) -> DataFrame:
    """Score each document by the average log-probability of its word
    bigrams under an add-``alpha`` smoothed bigram model trained on the
    same corpus: P(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V).

    Bit-stability contract: each bigram's log-prob is rounded onto a
    1e-6 integer grid BEFORE the per-document sum, so the reduction is
    exact BIGINT arithmetic — immune to partition order — and the final
    avg/perplexity derive from identical doubles in Spark and DuckDB.

    Returns (doc_id, n_bigrams, avg_logp, ppl) ordered by doc_id.
    """
    a = float(alpha)
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    # Zipped bigram stream: positions 1..n-1 paired with 2..n. The
    # slice+zip spelling stays in codegen (no posexplode self-join).
    bge = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    model = bge.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # Context counts derive from the model (sum of bigram counts per
    # left word) — one more tiny agg instead of a second corpus pass.
    ctx = model.groupBy("w1").agg(F.sum("c").alias("cw"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )

    # Left joins + smoothing fallback: on the self-trained registered
    # query every bigram is in-model (inner == left), but a capped /
    # pre-trained model scores unseen bigrams as a/(cw + a*V) with
    # cw=0 — the standard OOV path — without changing the plan shape.
    logp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(a))
        / (
            F.coalesce(F.col("cw"), F.lit(0)).cast("double")
            + F.lit(a) * F.col("v").cast("double")
        )
    )
    scored = (
        bge.join(model, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", _scaled_long(logp).alias("lp"))
    )
    n = F.count(F.lit(1))
    s = F.sum("lp")
    avg = (s.cast("double") / F.lit(1e6)) / n.cast("double")
    return (
        scored.groupBy("doc_id")
        .agg(
            n.alias("n_bigrams"),
            round_half_up(avg, 6).alias("avg_logp"),
            round_half_up(F.exp(-avg), 4).alias("ppl"),
        )
        .orderBy("doc_id")
    )


def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_score(read_table(spark, sf_dir, "documents"))


_SQL_LOGP_SCALED = (
    "CAST(FLOOR(ln((CAST(COALESCE(m.c, 0) AS DOUBLE) + {a!r})"
    " / (CAST(COALESCE(x.cw, 0) AS DOUBLE) + {a!r} * CAST(v.v AS DOUBLE)))"
    " * 1000000.0 + 0.5) AS BIGINT)"
).format(a=_ALPHA)

ORACLE_LM_SCORE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
bge AS (
  SELECT doc_id,
         unnest(t[1:len(t) - 1]) AS w1,
         unnest(t[2:len(t)]) AS w2
  FROM toks
),
model AS (SELECT w1, w2, COUNT(*) AS c FROM bge GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(c) AS cw FROM model GROUP BY 1),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT unnest(t) AS w FROM toks) u
),
scored AS (
  SELECT g.doc_id, {_SQL_LOGP_SCALED} AS lp
  FROM bge g
  LEFT JOIN model m ON g.w1 = m.w1 AND g.w2 = m.w2
  LEFT JOIN ctx x ON g.w1 = x.w1
  CROSS JOIN vocab v
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       {sql_round_half_up(
           "(CAST(SUM(lp) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE)", 6
       )} AS avg_logp,
       {sql_round_half_up(
           "exp(-((CAST(SUM(lp) AS DOUBLE) / 1000000.0)"
           " / CAST(COUNT(*) AS DOUBLE)))", 4
       )} AS ppl
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES = {"text_lm_score": q_text_lm_score}
ORACLES = {"text_lm_score": ORACLE_LM_SCORE}
