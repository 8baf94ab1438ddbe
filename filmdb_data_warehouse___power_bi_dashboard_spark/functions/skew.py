"""Key-skew mitigation for shuffles AQE can't fix.

Spark already handles most skew: map-side partial aggregation absorbs
skewed ``groupBy`` keys before the shuffle, and AQE's skew-join
splits oversized sort-merge partitions at runtime. The cases left
over — a skewed SHUFFLE HASH join, a skewed ``groupBy`` with an
algebraic-but-wide state (collect_list, count-distinct), stateful
streaming keys — need the classic salting rewrite: spread each hot
key over ``n_salts`` synthetic sub-keys, replicate the other side to
match, and fold the salt back out afterwards.

Cost model: salting multiplies the SMALL side by ``n_salts`` and
rewrites the big side's partitioning — worth it exactly when one
key's row count exceeds what one task can hold. Equality with the
unsalted plan is pytest-asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame, small: DataFrame, on: list[str], n_salts: int = 8
) -> DataFrame:
    """Inner equi-join robust to skewed ``on``-keys in ``big``.

    The big side gets a DETERMINISTIC salt — ``xxhash64`` over the
    full row, so re-runs and retries salt identically (a ``rand()``
    salt breaks task-retry idempotence) — and the small side is
    exploded ``n_salts``-fold so every (key, salt) bucket finds its
    match. Join keys become (key..., salt): the hot key's rows now
    land on ``n_salts`` reducers instead of one.
    """
    salted_big = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated, [*on, _SALT]).drop(_SALT)


def salted_collect_set(
    df: DataFrame, keys: list[str], value_col: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase ``collect_set`` for skewed keys: per-(key, salt)
    partial sets first (bounded per task), then a final merge of
    ``n_salts`` partial sets per key. Partial aggregation can't help
    collect_set the way it helps SUM — the map-side state IS the
    payload — so the two-phase rewrite is what bounds task memory.
    Output: (keys..., values array, sorted for determinism).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast(
        "int"
    )
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(F.collect_set(value_col).alias("__partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("__partial")))
            ).alias(f"{value_col}_set")
        )
    )
