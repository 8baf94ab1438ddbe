"""Deterministic sampling & dataset splitting for training-data
pipelines (beyond the reference surface — the corpus-assembly step
that precedes every training run).

Spark's ``df.sample`` / ``randomSplit`` / ``sampleBy`` draw from a
per-partition RNG stream: the selected rows change whenever the
partitioning changes, a stage is recomputed, or the upstream order
shifts — the same failure mode the ranking layer eliminated
(functions/ranking.py). These operators instead decide membership by
HASHING the row's stable key (``xxhash64``), so

- the selected set is a pure function of the data (resumable jobs,
  lost-executor recomputation, AQE re-partitioning all reproduce the
  identical sample);
- train/val/test assignment is stable across runs AND across tables —
  any row joining on the same key lands in the same split, so
  features computed in later jobs can never leak across splits;
- no shuffle is introduced: membership is a scan-level codegen
  predicate, and Catalyst pushes the split filter down with every
  other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table

# Hash-space denominator. 2^20 buckets give rate granularity ~1e-6
# while keeping the modulo a cheap power-of-two mask.
_BUCKETS = 1 << 20


def _bucket(key_cols: list[Column | str], salt: str) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.pmod(F.xxhash64(F.lit(salt), *cols), F.lit(_BUCKETS))


def deterministic_split(
    df: DataFrame,
    key_cols: list[Column | str],
    weights: dict[str, float],
    salt: str = "split-v1",
    col_name: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) from
    contiguous hash-bucket ranges proportional to ``weights``.

    ``key_cols`` must identify the unit of assignment (document id,
    user id, ...). Rows sharing the key always share the split —
    including rows of OTHER tables split with the same key and salt,
    which is how feature/label tables stay leak-free. Changing the
    salt re-draws the assignment; nothing else does.
    """
    total = sum(weights.values())
    b = _bucket(key_cols, salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label]
        threshold = int(_BUCKETS * acc / total)
        cond = b < F.lit(threshold)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(col_name, out)


def stratified_sample(
    df: DataFrame,
    key_cols: list[Column | str],
    stratum_col: str,
    fractions: dict[str, float],
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: stratum s
    keeps rows whose key-hash bucket falls under
    ``fractions[s] * _BUCKETS``; strata absent from ``fractions`` are
    dropped. The per-stratum threshold rides a literal map — scan-level
    predicate, no join, no shuffle, recompute-stable.
    """
    entries: list[Column] = []
    for stratum, frac in fractions.items():
        entries.extend([F.lit(stratum), F.lit(int(_BUCKETS * frac))])
    thresholds = F.create_map(*entries)
    limit = F.element_at(thresholds, F.col(stratum_col))
    return df.where(limit.isNotNull() & (_bucket(key_cols, salt) < limit))


def q_corpus_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 document split keyed on doc_id, summarized per
    (split, lang). Rows-only in the driver gate (xxhash64 has no
    DuckDB twin); determinism, disjointness, leak-freedom, and rate
    accuracy are asserted in tests/test_operators.py."""
    docs = read_table(spark, sf_dir, "documents")
    split = deterministic_split(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return (
        split.groupBy("split", "lang")
        .agg(F.count("*").alias("nb_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split", "lang")
    )


QUERIES = {
    "corpus_split_summary": q_corpus_split_summary,
}

ORACLES: dict = {}
