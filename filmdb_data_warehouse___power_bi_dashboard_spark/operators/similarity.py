"""Similarity search over the ``embeddings`` table (``array<float>``,
64-dim): brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH-bucketed variant as the scale path.

Scale design: brute force is O(Q·N) — correct but only viable when
either side is small; it broadcasts the Q queries so the N side
streams without a shuffle. The LSH variant hashes every vector into
``n_tables`` signatures of ``n_bits`` hyperplane signs; candidates
are only scored inside matching (table, signature) buckets, so the
per-query cost drops to the bucket population. Both return identical
schemas so callers can swap exact↔approximate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from .dedup import _spread
from ..sources.catalog import read_table

_SEED = 7


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    """Left-to-right double dot product (zip_with + aggregate) —
    bit-identical to the oracle's explicitly-ordered list_sum, and
    ~4× faster than a fully-unrolled sum (which overflows codegen's
    method budget — measured, see operators/dedup.dot_product)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(vec_col)
    return df.withColumn("__v", v).withColumn("__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"))))


def bruteforce_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the queries, one pass over the
    base vectors, per-query rank via a window PARTITIONED by query
    (parallel across queries — not a global sort).

    ``queries`` needs (vec_id, embedding); output one row per
    (query_id, rank<=k).
    """
    base = _with_norm(_spread(emb)).select("vec_id", "__v", "__norm")
    q = (
        _with_norm(queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("__v").alias("__qv"),
            F.col("__norm").alias("__qnorm"),
        )
    )
    pairs = base.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("__qv"), F.col("__v")) / (F.col("__qnorm") * F.col("__norm"))
    scored = pairs.select(
        "query_id", "vec_id", round_half_up(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(n_tables: int, n_bits: int, dim: int, seed: int = _SEED) -> list[list[list[float]]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).tolist()


def lsh_signatures(
    emb: DataFrame, n_tables: int = 8, n_bits: int = 4, dim: int = 64
) -> DataFrame:
    """(vec_id, table, signature): sign-of-dot-product bits against
    seeded random hyperplanes, packed into an int per table. One scan,
    no shuffle, all array expressions."""
    planes = _hyperplanes(n_tables, n_bits, dim)
    v = _as_double("embedding")
    sigs = []
    for t in range(n_tables):
        bits = None
        for bpos in range(n_bits):
            plane = F.array(*[F.lit(x) for x in planes[t][bpos]])
            bit = F.when(_dot(v, plane) >= 0, F.lit(1 << bpos)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        sigs.append(F.struct(F.lit(t).alias("table"), bits.alias("signature")))
    return emb.select("vec_id", F.explode(F.array(*sigs)).alias("s")).select(
        "vec_id", F.col("s.table").alias("table"), F.col("s.signature").alias("signature")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any (table,
    signature) bucket with the query, then exact cosine rank within
    candidates. Same output schema as :func:`bruteforce_topk`.

    At 100 TB: the bucket join shuffles only (signature, vec_id)
    pairs; tune n_bits so bucket population ~ thousands (recall ↔
    cost dial), and n_tables for recall amplification.
    """
    base_sig = lsh_signatures(_spread(emb), n_tables, n_bits)
    q_sig = lsh_signatures(queries, n_tables, n_bits).select(
        F.col("vec_id").alias("query_id"), "table", "signature"
    )
    cand = (
        base_sig.join(q_sig, ["table", "signature"])
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("query_id"))
    base = _with_norm(_spread(emb)).select("vec_id", "__v", "__norm")
    q = _with_norm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__norm").alias("__qnorm"),
    )
    cos = _dot(F.col("__qv"), F.col("__v")) / (F.col("__qnorm") * F.col("__norm"))
    scored = (
        cand.join(base, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id", round_half_up(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

_N_QUERIES = 5  # vec_id 0..4 as the benchmark query set


def q_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return bruteforce_topk(emb, queries, k=10)


_SQL_COS_QB = sql_round_half_up(
    "list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    "          for i in range(1, len(q.embedding) + 1)])"
    " / (sqrt(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)"
    "                   for i in range(1, len(q.embedding) + 1)]))"
    "    * sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    "                     for i in range(1, len(b.embedding) + 1)])))",
    6,
)

ORACLE_ANN_BRUTEFORCE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         {_SQL_COS_QB} AS cosine
  FROM embeddings b
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}) q
  WHERE b.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check (seeded hyperplanes not reproducible in SQL);
    recall vs brute force asserted in pytest."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_topk(emb, queries, k=10)


QUERIES = {
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "ann_topk_lsh": q_ann_topk_lsh,
}

ORACLES = {
    "ann_topk_bruteforce": ORACLE_ANN_BRUTEFORCE,
}
