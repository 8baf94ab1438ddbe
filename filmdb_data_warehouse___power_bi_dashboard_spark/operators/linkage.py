"""Record linkage / entity resolution: blocked fuzzy matching.

The operator every warehouse dedup and every metadata-merge pipeline
eventually needs: "which of these names refer to the same entity?"
Naive fuzzy matching is an all-pairs edit-distance join — O(n²) and
instantly dead at scale. This module implements the canonical
three-tier record-linkage shape instead:

1. **Exact collapse** — group identical strings first. The fuzzy
   quadratic then rides the DISTINCT-NAME frame, not the row frame;
   for dimension-like name columns the vocabulary is orders of
   magnitude smaller than the table (here it is literally constant:
   64 names at every SF) and each fuzzy name-pair expands back to
   row-pair counts by multiplying the collapsed multiplicities.
2. **Blocking** — candidate pairs form only inside an equality
   bucket (first name token), the standard blocking key; the join is
   an equi-join Catalyst can hash/broadcast, never a cartesian.
   Missed-pair tradeoff (two names differing in their first token
   are never compared) is inherent to blocking and documented here.
3. **Metric prefilter + early-exit distance** — inside a block,
   pairs must first pass ``|len(a)−len(b)| ≤ T`` (a provable
   levenshtein lower bound, so it never drops a true match —
   pytest-asserted with hypothesis) and only then pay the edit
   distance, spelled with Spark's THRESHOLD form
   ``levenshtein(a, b, T)`` which abandons a row as soon as the DP
   band exceeds T — the 100 TB spelling. The oracle replays it as
   plain ``levenshtein(a,b) <= T`` (same predicate, no early-exit).

Everything in the report is an exact integer (counts, pair counts,
min/max distance), so the cross-engine comparison is bit-exact with
no float anywhere.

Scale shape: one map-side-combined groupBy collapses rows to the
name frame; the self-join strategy is left to AQE — broadcast when
the collapsed vocabulary is small (the dimension-name norm), shuffle
hash join on the blocking key when a free-text column makes it large
(no forced hint, so the big-vocabulary case degrades to a shuffle
instead of an OOM); per-block aggregates land on ≤ |blocks| keys.
Raw rows are scanned exactly once with a two-column projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import track_persist
from ..sources.catalog import read_table

# Edit-distance match threshold AND the length-band prefilter bound
# (|len(a)-len(b)| <= true distance, so the same constant is a safe
# prefilter for the same threshold).
_FUZZY_T = 3


def fuzzy_match_report(part: DataFrame, threshold: int = _FUZZY_T) -> DataFrame:
    """Per-block entity-resolution report over ``p_name``.

    Columns (one row per block that has ≥1 fuzzy match, so no NULL
    numeric outputs): ``block_token`` (the blocking key), ``n_rows``,
    ``n_names`` (distinct names in the block), ``exact_dup_pairs``
    (row pairs sharing an identical name, Σ cnt·(cnt−1)/2),
    ``fuzzy_name_pairs`` (distinct-name pairs with
    1 ≤ levenshtein ≤ T inside the block), ``fuzzy_row_pairs``
    (those expanded by multiplicity, Σ cntₐ·cnt_c), ``min_dist`` /
    ``max_dist`` over the matched name pairs.
    """
    # Persist the collapsed name frame: it feeds three consumers
    # (block stats + both self-join sides) and without the persist
    # each would re-scan the raw table.
    names = track_persist(
        part.select(
            F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
            F.col("p_name").alias("nm"),
        )
        .groupBy("blk", "nm")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    base = names.groupBy("blk").agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_names"),
        # cnt·(cnt−1) is always even; shiftright(·,1) halves it while
        # staying in integer space (no double round-trip).
        F.shiftright(F.sum(F.col("cnt") * (F.col("cnt") - 1)), 1).alias(
            "exact_dup_pairs"
        ),
    )
    a, c = names.alias("a"), names.alias("c")
    # Threshold levenshtein returns −1 past the bound (early-exit DP)
    # — the scale spelling; ≥0 therefore means "distance ≤ threshold".
    dist = F.levenshtein(F.col("a.nm"), F.col("c.nm"), threshold)
    # No explicit broadcast hint: the collapsed name frame is usually
    # vocabulary-small (dimension-like name columns), but nothing
    # BOUNDS it — a high-cardinality free-text column would OOM a
    # forced broadcast. AQE sees the collapsed frame's actual size at
    # runtime and picks broadcast when it fits, shuffle hash join when
    # it doesn't (the blk equi-key makes either strategy valid).
    pairs = (
        a.join(
            c,
            on=[
                F.col("a.blk") == F.col("c.blk"),
                F.col("a.nm") < F.col("c.nm"),
                F.abs(F.length("a.nm") - F.length("c.nm")) <= threshold,
            ],
        )
        .select(
            F.col("a.blk").alias("blk"),
            (F.col("a.cnt") * F.col("c.cnt")).alias("row_pairs"),
            dist.alias("d"),
        )
        .where(F.col("d") >= 0)
    )
    fuzzy = pairs.groupBy("blk").agg(
        F.count(F.lit(1)).alias("fuzzy_name_pairs"),
        F.sum("row_pairs").alias("fuzzy_row_pairs"),
        F.min("d").alias("min_dist"),
        F.max("d").alias("max_dist"),
    )
    return (
        base.join(fuzzy, "blk")
        .select(
            F.col("blk").alias("block_token"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_names").cast("long").alias("n_names"),
            F.col("exact_dup_pairs").cast("long").alias("exact_dup_pairs"),
            F.col("fuzzy_name_pairs").cast("long").alias("fuzzy_name_pairs"),
            F.col("fuzzy_row_pairs").cast("long").alias("fuzzy_row_pairs"),
            F.col("min_dist").cast("long").alias("min_dist"),
            F.col("max_dist").cast("long").alias("max_dist"),
        )
        .orderBy("block_token")
    )


def q_part_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuzzy_match_report(read_table(spark, sf_dir, "part"))


ORACLE_FUZZY_MATCHES = f"""
WITH n AS (
  SELECT split_part(p_name, ' ', 1) AS blk, p_name AS nm,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM part GROUP BY 1, 2
),
base AS (
  SELECT blk,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_names,
         CAST(SUM(cnt * (cnt - 1)) // 2 AS BIGINT) AS exact_dup_pairs
  FROM n GROUP BY blk
),
fuzzy AS (
  SELECT a.blk AS blk,
         CAST(COUNT(*) AS BIGINT) AS fuzzy_name_pairs,
         CAST(SUM(a.cnt * c.cnt) AS BIGINT) AS fuzzy_row_pairs,
         CAST(MIN(levenshtein(a.nm, c.nm)) AS BIGINT) AS min_dist,
         CAST(MAX(levenshtein(a.nm, c.nm)) AS BIGINT) AS max_dist
  FROM n a JOIN n c
    ON a.blk = c.blk AND a.nm < c.nm
   AND abs(length(a.nm) - length(c.nm)) <= {_FUZZY_T}
   AND levenshtein(a.nm, c.nm) <= {_FUZZY_T}
  GROUP BY a.blk
)
SELECT base.blk AS block_token, n_rows, n_names, exact_dup_pairs,
       fuzzy_name_pairs, fuzzy_row_pairs, min_dist, max_dist
FROM base JOIN fuzzy ON base.blk = fuzzy.blk
ORDER BY block_token
"""


QUERIES = {
    "part_fuzzy_matches": q_part_fuzzy_matches,
}

ORACLES = {
    "part_fuzzy_matches": ORACLE_FUZZY_MATCHES,
}
