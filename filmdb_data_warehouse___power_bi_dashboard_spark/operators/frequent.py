"""Bounded-memory frequent-item detection (heavy hitters) over the
corpus token stream — beyond the reference surface (its SQL engine
would spell this as a full GROUP BY over every distinct token).

The scale problem: ``SELECT word, COUNT(*) ... GROUP BY word`` over a
100 TB corpus shuffles the ENTIRE long tail — billions of near-unique
tokens each carried to a reducer just to be discarded. The classic fix
is a two-phase candidate/verify design built on the Misra-Gries
summary (Misra & Gries 1982; merge analysis in Agarwal et al.,
"Mergeable Summaries", PODS'12):

1. **Candidate phase (map-only, bounded memory).** Each partition
   maintains an ``m``-counter Misra-Gries sketch over its token
   stream via ``mapInPandas`` (Arrow batches; per-batch counting is
   C-speed ``pandas.value_counts``, the sketch merge touches at most
   ``m`` + batch-vocabulary keys). A partition emits only its
   surviving keys — at most ``m`` rows, whatever the tail size.

   Guarantee: if a word is ABSENT from partition p's final sketch,
   its count within p is at most n_p/(m+1) — each prune subtracts
   d from at least m+1 counters, so the total pruned mass Σd ≤
   n_p/(m+1). Summing over partitions: a word absent from EVERY
   sketch has global count ≤ N/(m+1). Contrapositive: every word
   with count > N/(m+1) appears in the candidate union.

2. **Verify phase (exact, bounded shuffle).** Re-scan the token
   stream, semi-join against the broadcast candidate set (at most
   m × n_partitions keys — the long tail is filtered BEFORE the
   shuffle), and count candidates exactly. Keep words whose exact
   count clears the support threshold N/``_INV_SUPPORT``.

With ``_INV_SUPPORT`` < m+1 the final answer is provably EXACT —
identical to the full GROUP BY — because phase 1 cannot have dropped
a qualifying word (N/256 > N/513). That is why this entry carries a
plain-SQL oracle (DuckDB runs the naive GROUP BY + HAVING): the
sketch is an execution strategy, not an approximation, and the driver
hash attests it.

MG's surviving SET depends on arrival order, but only the candidate
superset does — the exact recount + threshold make the final result
order- and partitioning-independent (recompute-stable under AQE and
executor loss).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import read_table

# Sketch width. 512 counters bound phase-1 error at N/513 per the
# guarantee above; candidates are at most 512 per partition.
_MG_COUNTERS = 512

# Support denominator: a word is a heavy hitter iff
# count * _INV_SUPPORT >= total_tokens (integer arithmetic — no
# float threshold to diverge between engines). Must be < m+1 for the
# exactness guarantee.
_INV_SUPPORT = 256


def _mg_merge(sketch: dict, batch: Counter, m: int) -> None:
    """Merge an exact batch Counter into the sketch in place, then
    prune to ``m`` entries by subtracting the (m+1)-th largest count
    from every counter and dropping the non-positive ones."""
    for w, c in batch.items():
        sketch[w] = sketch.get(w, 0) + c
    if len(sketch) > m:
        d = sorted(sketch.values(), reverse=True)[m]
        for w in list(sketch):
            nv = sketch[w] - d
            if nv > 0:
                sketch[w] = nv
            else:
                del sketch[w]


def mg_candidates(words: DataFrame, m: int = _MG_COUNTERS) -> DataFrame:
    """Per-partition Misra-Gries survivors of the ``word`` column —
    the candidate superset for any support threshold above N/(m+1)."""

    def _partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketch: dict[str, int] = {}
        for pdf in batches:
            counts = pdf["word"].value_counts()
            _mg_merge(sketch, Counter(counts.to_dict()), m)
        yield pd.DataFrame({"word": pd.Series(list(sketch), dtype="object")})

    return words.mapInPandas(_partition, schema="word string").distinct()


def heavy_hitters(
    docs: DataFrame, m: int = _MG_COUNTERS, inv_support: int = _INV_SUPPORT
) -> DataFrame:
    """Exact heavy hitters (count ≥ total/inv_support) without ever
    shuffling the rare-word tail. Tokenization matches
    ``text.vocabulary``: split on single space."""
    if inv_support > m:
        raise ValueError(
            f"exactness requires inv_support <= m (got {inv_support} > {m}):"
            " phase 1 only guarantees candidates above N/(m+1)"
        )
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    cand = mg_candidates(words, m)
    tot = words.agg(F.count(F.lit(1)).alias("n_tokens"))
    counted = (
        words.join(F.broadcast(cand), "word")
        .groupBy("word")
        .agg(F.count("*").alias("nb"))
    )
    return (
        counted.crossJoin(F.broadcast(tot))
        .filter(F.col("nb") * inv_support >= F.col("n_tokens"))
        .select(
            "word",
            "nb",
            "n_tokens",
            round_half_up(
                F.col("nb").cast("double") / F.col("n_tokens"), 6
            ).alias("share"),
        )
        .orderBy(F.desc("nb"), F.asc("word"))
    )


def q_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return heavy_hitters(docs)


ORACLE_HEAVY_HITTERS = f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM w)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS nb,
       tot.n_tokens AS n_tokens,
       {sql_round_half_up("CAST(COUNT(*) AS DOUBLE) / tot.n_tokens", 6)} AS share
FROM w CROSS JOIN tot
GROUP BY word, tot.n_tokens
HAVING COUNT(*) * {_INV_SUPPORT} >= tot.n_tokens
ORDER BY nb DESC, word ASC
"""


QUERIES = {"text_heavy_hitters": q_text_heavy_hitters}
ORACLES = {"text_heavy_hitters": ORACLE_HEAVY_HITTERS}
