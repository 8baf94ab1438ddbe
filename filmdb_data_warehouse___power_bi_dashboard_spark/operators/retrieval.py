"""Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
ranking and a dense embedding-cosine ranking over the same corpus —
the standard two-tower RAG / search-stack shape (sparse recall +
dense recall, fused without score calibration).

Scale design: both candidate branches end in a bounded top-``k_each``
(TakeOrderedAndProject), so the fusion join touches only 2·k_each
rows — broadcast territory regardless of corpus size. The lexical
branch reuses the BM25 column-expression pass (one scan, no explode);
the dense branch is a 1-row query-vector broadcast into a codegen
HOF cosine fold (N×1, so no block kernel needed). Rank windows run
on post-limit frames bounded by k_each — never on unaggregated data.

Reference anchor: extends the tsvector full-text surface
(filmdb.sql:143) the way production search stacks do — the reference
ranks by ts_rank only; RRF is the SURVEY §2.11 extension fusing it
with the embedding corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table
from .quality import _BM25_TERMS, bm25_search
from .similarity import _SQL_COS_QB, _as_double, _dot

_RRF_K = 60
_K_EACH = 50
_TOP_K = 20
_QUERY_VEC_ID = 0


def dense_topk(emb: DataFrame, query_vec_id: int, k: int) -> DataFrame:
    """Cosine top-k against ONE stored query vector: 1-row broadcast
    cross join + left-to-right double fold (bit-identical to the
    DuckDB ordered list_sum), TakeOrdered tail."""
    q = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("q_emb"))
    )
    qv = _as_double("q_emb")
    bv = _as_double("embedding")
    # try_divide (round-8): a zero-norm base vector threw ANSI
    # DIVIDE_BY_ZERO here; NULL cosine ranks last on both engines
    # (Spark DESC NULLS LAST == DuckDB, whose float x/0 is NULL), so
    # degenerate vectors can never displace a real candidate.
    cos = F.try_divide(_dot(qv, bv), F.sqrt(_dot(qv, qv)) * F.sqrt(_dot(bv, bv)))
    return (
        emb.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            round_half_up(cos, 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vec_id: int = _QUERY_VEC_ID,
    k_each: int = _K_EACH,
    top_k: int = _TOP_K,
    rrf_k: int = _RRF_K,
) -> DataFrame:
    """Fuse the two rankings: rrf = Σ_branch 1/(rrf_k + rank), with a
    branch contributing 0 when the doc is outside its top-``k_each``
    (ranks returned as 0 in that case — no NULL numeric outputs, per
    the gate contract). Returns the fused top-``top_k``."""
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = bm25_search(docs, terms, top_k=k_each).select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )
    w_vec = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    vec = dense_topk(emb, query_vec_id, k_each).select(
        "doc_id", F.row_number().over(w_vec).alias("vec_rank")
    )
    lex_term = F.when(
        F.col("lex_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("lex_rank").cast("double")),
    ).otherwise(F.lit(0.0))
    vec_term = F.when(
        F.col("vec_rank").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("vec_rank").cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
            round_half_up(lex_term + vec_term, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(top_k)
    )


def q_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    return rrf_hybrid_search(docs, emb, _BM25_TERMS)


def _rrf_oracle() -> str:
    from .quality import _BM25_TOPK, ORACLE_BM25

    # The lexical branch reuses ORACLE_BM25 verbatim, whose LIMIT is
    # _BM25_TOPK — the fusion depth must agree or the branches diverge.
    assert _K_EACH == _BM25_TOPK
    return f"""
WITH lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
  FROM ({ORACLE_BM25}) lx
),
dense_scored AS (
  SELECT b.vec_id AS doc_id, {_SQL_COS_QB} AS cosine
  FROM embeddings b
  CROSS JOIN (SELECT embedding FROM embeddings
              WHERE vec_id = {_QUERY_VEC_ID}) q
),
vec AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS vec_rank
  FROM (SELECT doc_id, cosine FROM dense_scored
        ORDER BY cosine DESC, doc_id ASC LIMIT {_K_EACH}) dx
),
fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         COALESCE(l.lex_rank, 0) AS lex_rank,
         COALESCE(v.vec_rank, 0) AS vec_rank,
         (CASE WHEN l.lex_rank IS NOT NULL
               THEN 1.0 / ({float(_RRF_K)!r} + CAST(l.lex_rank AS DOUBLE))
               ELSE 0.0 END
          + CASE WHEN v.vec_rank IS NOT NULL
                 THEN 1.0 / ({float(_RRF_K)!r} + CAST(v.vec_rank AS DOUBLE))
                 ELSE 0.0 END) AS rrf
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, CAST(lex_rank AS INT) AS lex_rank,
       CAST(vec_rank AS INT) AS vec_rank,
       {sql_round_half_up("rrf", 6)} AS rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {_TOP_K}
"""


ORACLE_RETRIEVAL_RRF = _rrf_oracle()

QUERIES = {"retrieval_rrf": q_retrieval_rrf}
ORACLES = {"retrieval_rrf": ORACLE_RETRIEVAL_RRF}
