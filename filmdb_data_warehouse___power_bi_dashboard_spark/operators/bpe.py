"""Tokenizer-training statistics: BPE merge-candidate estimation.

Training a byte-pair-encoding tokenizer starts from exactly one
corpus-scale aggregate: the frequency of every ADJACENT SYMBOL PAIR,
weighted by how often the containing word occurs (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
the merge chosen at each step is the argmax of this table). The full
iterative trainer re-counts after each merge, but the expensive,
data-sized step — and the one a distributed engine owns — is this
first pair-count pass; subsequent iterations ride the (word, freq)
dictionary, which is vocabulary-sized, not corpus-sized.

The classic trick, kept here: count pairs over the DISTINCT-WORD
dictionary weighted by word frequency, never over the raw token
stream. Zipf's law makes the dictionary orders of magnitude smaller
than the corpus (measured on the fixture: 500 docs → ~14k running
tokens → a few hundred distinct words), so the per-character pair
explosion — the only super-linear-looking step — rides a frame whose
size is bounded by VOCABULARY × word length, independent of corpus
row count.

Scale shape (100 TB story): one explode + map-side-combined groupBy
builds the word dictionary (the same shape as text_vocabulary); the
pair explosion is array expressions over that small frame
(``transform(sequence(...))`` — whole-stage codegen, no UDF); the
final pair aggregate lands on at most |alphabet|² keys. Raw text is
scanned once; nothing quadratic in documents.

Determinism: counts are BIGINTs; ordering is (merge_count DESC,
pair), a unique total order, so the top-K frontier is bit-identical
across engines.

Reference anchor: SURVEY §2.11 training-data-pipeline extension over
`documents` (the reference's text surface is the tsvector column,
filmdb.sql:143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table

_TOP_K = 40


def bpe_merge_candidates(docs: DataFrame, top_k: int = _TOP_K) -> DataFrame:
    """Top-``top_k`` adjacent character pairs by corpus-weighted count.

    Returns (``pair``, ``merge_count``, ``n_word_types``):
    ``merge_count`` is the total number of adjacent occurrences across
    the corpus (a word contributes freq × occurrences-within-word, so
    'aaa' counts 'aa' twice per instance — the exact quantity BPE
    maximizes), ``n_word_types`` the number of distinct dictionary
    words containing the pair. Words shorter than 2 characters have no
    pair and drop out via the empty sequence.
    """
    freq = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    pairs = freq.select(
        "tok",
        "f",
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("f").cast("long").alias("merge_count"),
            F.count_distinct("tok").cast("long").alias("n_word_types"),
        )
        .orderBy(F.col("merge_count").desc(), "pair")
        .limit(top_k)
    )


def q_text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merge_candidates(read_table(spark, sf_dir, "documents"))


ORACLE_BPE_MERGE_CANDIDATES = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks WHERE length(tok) >= 2 GROUP BY tok
),
pairs AS (
  SELECT tok, f, substr(tok, CAST(i AS INT), 2) AS pair
  FROM freq, unnest(range(1, length(tok))) AS t(i)
)
SELECT pair,
       CAST(SUM(f) AS BIGINT) AS merge_count,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_word_types
FROM pairs
GROUP BY pair
ORDER BY merge_count DESC, pair
LIMIT {_TOP_K}
"""


QUERIES = {"text_bpe_merge_candidates": q_text_bpe_merge_candidates}
ORACLES = {"text_bpe_merge_candidates": ORACLE_BPE_MERGE_CANDIDATES}
