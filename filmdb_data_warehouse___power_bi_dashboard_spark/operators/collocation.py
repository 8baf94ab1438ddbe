"""Collocation mining: word-bigram association strength (lift / PMI).

The corpus-linguistics companion to BPE's character-pair table: which
WORD pairs co-occur adjacently far more often than their marginals
predict? The association measure behind phrase detection
(word2vec's phrase pass), multi-word-expression extraction, and
boilerplate-phrase screening. PMI is log(lift); the log is monotone,
so ranking by LIFT ranks by PMI while staying on an exact integer
grid — no cross-engine transcendental drift:

    lift = P(x,y) / (P(x)·P(y)) = c_xy · N / (c_x· · c_·y)

with c_x· / c_·y the bigram-table marginals (occurrences as first /
second word) and N the total bigram count. ``lift_fp`` is that ratio
in 1e-4 integer units via widened integer arithmetic —
DECIMAL(38,0) on the Spark side, HUGEINT in the oracle — because
c_xy·N·10⁴ exceeds BIGINT long before a production corpus does
(the events_value_drift overflow lesson, applied at design time).

Scale shape (100 TB story): bigrams come from array expressions in
the scan projection (split once, explode over positions — codegen,
no UDF); the (x, y) count is one map-side-combined groupBy; marginals
are two more aggregates ON THE BIGRAM-COUNT FRAME (vocabulary²-
bounded, far smaller than the corpus — never a second text scan); the
min-count filter (Zipf) cuts the frame before the joins; final join
keys are single words, AQE-planned. TakeOrdered for the top-K.

Determinism: all counts BIGINT; ordering (lift_fp DESC, x, y) is a
unique total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table

_MIN_COUNT = 5
_LIFT_SCALE = 10_000
_TOP_K = 30


def collocations(
    docs: DataFrame, min_count: int = _MIN_COUNT, top_k: int = _TOP_K
) -> DataFrame:
    """Top-``top_k`` adjacent word pairs by exact integer-grid lift.

    Returns (``x``, ``y``, ``n_xy``, ``n_x``, ``n_y``, ``lift_fp``):
    ``n_x``/``n_y`` the first-/second-position marginals from the
    bigram table, ``lift_fp`` = c_xy·N·10⁴ // (c_x·c_y). Pairs below
    ``min_count`` are dropped before the marginal joins.
    """
    bigrams = (
        docs.where(F.col("text").isNotNull())
        .select(F.split("text", " ").alias("l"))
        # single-word docs: sequence(1, 0) would DESCEND in Spark and
        # hit element_at(l, 0); the oracle's range(1, 1) is just empty.
        .where(F.expr("size(l) >= 2"))
        .select(
            F.explode(F.expr("sequence(1, size(l) - 1)")).alias("i"), F.col("l")
        )
        .select(
            F.expr("element_at(l, i)").alias("x"),
            F.expr("element_at(l, i + 1)").alias("y"),
        )
    )
    counts = bigrams.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    totals = counts.agg(F.sum("n_xy").cast("long").alias("n_total"))
    mx = counts.groupBy("x").agg(F.sum("n_xy").cast("long").alias("n_x"))
    my = counts.groupBy("y").agg(F.sum("n_xy").cast("long").alias("n_y"))
    return (
        counts.where(F.col("n_xy") >= min_count)
        .join(mx, "x")
        .join(my, "y")
        .crossJoin(F.broadcast(totals))
        .select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            F.expr(
                "CAST((CAST(n_xy AS DECIMAL(38,0)) * n_total * "
                f"{_LIFT_SCALE}) div (CAST(n_x AS DECIMAL(38,0)) * n_y) AS LONG)"
            ).alias("lift_fp"),
        )
        .orderBy(F.col("lift_fp").desc(), "x", "y")
        .limit(top_k)
    )


def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return collocations(read_table(spark, sf_dir, "documents"))


ORACLE_COLLOCATIONS = f"""
WITH docs AS (
  SELECT string_split(text, ' ') AS l FROM documents WHERE text IS NOT NULL
),
bigrams AS (
  SELECT l[CAST(i AS INT)] AS x, l[CAST(i AS INT) + 1] AS y
  FROM docs, unnest(range(1, len(l))) AS t(i)
),
counts AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bigrams GROUP BY 1, 2
),
totals AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_total FROM counts),
mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM counts GROUP BY 1),
my AS (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM counts GROUP BY 1)
SELECT c.x, c.y, c.n_xy, mx.n_x, my.n_y,
       CAST((CAST(c.n_xy AS HUGEINT) * t.n_total * {_LIFT_SCALE})
            // (CAST(mx.n_x AS HUGEINT) * my.n_y) AS BIGINT) AS lift_fp
FROM counts c
JOIN mx ON mx.x = c.x
JOIN my ON my.y = c.y
CROSS JOIN totals t
WHERE c.n_xy >= {_MIN_COUNT}
ORDER BY lift_fp DESC, c.x, c.y
LIMIT {_TOP_K}
"""


QUERIES = {"text_collocations": q_text_collocations}
ORACLES = {"text_collocations": ORACLE_COLLOCATIONS}
