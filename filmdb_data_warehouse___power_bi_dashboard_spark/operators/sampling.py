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


def _bucket(
    key_cols: list[Column | str], salt: str, portable: bool = False
) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    if portable:
        # Cross-engine twin: md5 over 'salt:key[:key...]' via the
        # 60-bit h60 hash (operators/dedup.py) so a SQL oracle can
        # recompute the identical bucket. ~3x the hash cost of
        # xxhash64 — the fast path stays the scale default.
        #
        # NULL keys get an explicit sentinel BEFORE concat_ws:
        # concat_ws silently skips NULL args, so ('a', NULL) and
        # ('a',) would otherwise collide — and diverge from the
        # xxhash64 fast path, which hashes NULL as a distinct input.
        # Non-null values are untouched (coalesce is identity), so
        # existing oracle assignments are unchanged.
        from .dedup import h60

        safe = [F.coalesce(c.cast("string"), F.lit("\x00null\x00")) for c in cols]
        return F.pmod(h60(F.concat_ws(":", F.lit(salt), *safe)), F.lit(_BUCKETS))
    return F.pmod(F.xxhash64(F.lit(salt), *cols), F.lit(_BUCKETS))


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper bucket bound) per split, in declaration
    order; the last label owns the remainder. Shared by the Spark
    split expression and the SQL oracle so bucket edges can never
    drift between engines."""
    total = sum(weights.values())
    out: list[tuple[str, int]] = []
    acc = 0.0
    for label in list(weights)[:-1]:
        acc += weights[label]
        out.append((label, int(_BUCKETS * acc / total)))
    out.append((list(weights)[-1], _BUCKETS))
    return out


def deterministic_split(
    df: DataFrame,
    key_cols: list[Column | str],
    weights: dict[str, float],
    salt: str = "split-v1",
    col_name: str = "split",
    portable: bool = False,
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) from
    contiguous hash-bucket ranges proportional to ``weights``.

    ``key_cols`` must identify the unit of assignment (document id,
    user id, ...). Rows sharing the key always share the split —
    including rows of OTHER tables split with the same key and salt,
    which is how feature/label tables stay leak-free. Changing the
    salt re-draws the assignment; nothing else does.

    ``portable=True`` swaps the bucket hash from xxhash64 to the
    md5-based cross-engine h60 so a SQL oracle can replay the
    assignment (feeds ``corpus_split_portable``).
    """
    b = _bucket(key_cols, salt, portable=portable)
    expr = None
    for label, threshold in split_thresholds(weights)[:-1]:
        cond = b < F.lit(threshold)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(list(weights)[-1])
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


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_corpus_split_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/10/10 doc_id split with the cross-engine md5 bucket
    hash: the ENTIRE assignment — bucket values, range edges, label
    mapping — is replayed by the DuckDB oracle, upgrading the split
    family from rows-only (xxhash64 fast path, pytest-asserted) to
    full driver hash evidence. Same range-split math; only the hash
    family differs."""
    docs = read_table(spark, sf_dir, "documents")
    split = deterministic_split(
        docs, ["doc_id"], _SPLIT_WEIGHTS, portable=True
    )
    return (
        split.groupBy("split", "lang")
        .agg(F.count("*").alias("nb_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split", "lang")
    )


def _sql_split_case(salt: str = "split-v1") -> str:
    edges = split_thresholds(_SPLIT_WEIGHTS)
    b = (
        f"CAST('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 15)"
        f" AS BIGINT) % {_BUCKETS}"
    )
    whens = " ".join(
        f"WHEN {b} < {threshold} THEN '{label}'"
        for label, threshold in edges[:-1]
    )
    return f"CASE {whens} ELSE '{edges[-1][0]}' END"


ORACLE_SPLIT_PORTABLE = f"""
SELECT {_sql_split_case()} AS split, lang,
       COUNT(*) AS nb_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


def epoch_order(
    docs: DataFrame, n_epochs: int = 2, seed: str = "epoch"
) -> DataFrame:
    """Deterministic per-epoch training order: for each epoch e, every
    document gets a position in a pseudo-random permutation keyed by
    md5(seed:e:doc_id) — the reproducible "shuffle each epoch
    differently" a data loader needs, computed once as a table instead
    of at load time.

    Scale shape: the rank over (epoch, key) rides
    ``functions.ranking.global_row_number`` (range-bucketed, no
    single-partition window), and the within-epoch position is
    recovered by subtracting each epoch's minimum global rank — an
    ``n_epochs``-row broadcast join, never a per-epoch sort. md5 (not
    xxhash64) keys keep a DuckDB twin possible.
    """
    from ..functions.ranking import global_row_number

    e = docs.select("doc_id").withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.lit(n_epochs)))
    )
    e = e.withColumn(
        "__key",
        F.md5(F.concat_ws(":", F.lit(seed), F.col("epoch"), F.col("doc_id"))),
    )
    ranked = global_row_number(
        e, ["epoch", "__key", "doc_id"], alias="__g"
    )
    base = ranked.groupBy("epoch").agg(F.min("__g").alias("__base"))
    return (
        ranked.join(F.broadcast(base), "epoch")
        .select(
            "epoch",
            (F.col("__g") - F.col("__base") + F.lit(1)).alias("position"),
            "doc_id",
        )
        .orderBy("epoch", "position")
    )


def q_corpus_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return epoch_order(docs, n_epochs=2)


ORACLE_EPOCH_ORDER = """
WITH e AS (
  SELECT doc_id, epoch
  FROM documents, unnest([1, 2]) AS t(epoch)
), k AS (
  SELECT epoch, doc_id,
         md5('epoch:' || epoch || ':' || doc_id) AS key
  FROM e
)
SELECT epoch,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY key, doc_id)
            AS BIGINT) AS position,
       doc_id
FROM k
ORDER BY epoch, position
"""


QUERIES = {
    "corpus_split_summary": q_corpus_split_summary,
    "corpus_split_portable": q_corpus_split_portable,
    "corpus_epoch_order": q_corpus_epoch_order,
}

ORACLES: dict = {
    "corpus_split_portable": ORACLE_SPLIT_PORTABLE,
    "corpus_epoch_order": ORACLE_EPOCH_ORDER,
}
