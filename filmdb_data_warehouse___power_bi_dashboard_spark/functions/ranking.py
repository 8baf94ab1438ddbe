"""Scale-safe global ordering primitives.

A bare ``row_number() OVER (ORDER BY …)`` / ``NTILE(k) OVER (ORDER BY
…)`` forces Spark to move the whole input through ONE partition — the
canonical window anti-pattern at 100 TB. These helpers produce the
identical ranks with a range-partitioned sort:

1. ``repartitionByRange`` on the order key (parallel TeraSort-style
   shuffle — each partition holds a contiguous key range);
2. per-partition ``row_number`` (local window, no data movement);
3. add each partition's global offset (a tiny driver-side cumsum over
   per-partition counts).

The input is persisted while the offsets are computed because range
partitioning is sampling-based: recomputing the plan could re-draw
boundaries and misalign the offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..runtime import track_persist

_PID = "__sg_pid"
_OFF = "__sg_off"


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    alias: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` over a total order, without a
    single-partition sort.

    ``order_cols`` must be a total order (include a unique tiebreaker)
    or ranks within ties are partition-placement-dependent.

    Returns ``df`` with an extra long column ``alias``. The ordering
    matches ``ROW_NUMBER() OVER (ORDER BY order_cols)`` exactly.
    """
    spark = df.sparkSession
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = track_persist(
        df.repartitionByRange(n_parts, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = ranged.groupBy(_PID).agg(F.count("*").alias("c")).collect()
    acc = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r[_PID]):
        offsets.append((row[_PID], acc))
        acc += row["c"]
    offs = spark.createDataFrame(offsets, f"{_PID} int, {_OFF} long")
    w = Window.partitionBy(_PID).orderBy(*cols)
    return (
        ranged.join(F.broadcast(offs), _PID)
        .withColumn(alias, (F.row_number().over(w) + F.col(_OFF)).cast("long"))
        .drop(_PID, _OFF)
    )


def ntile_from_rank(rank: Column, n_rows: Column | int, k: int) -> Column:
    """SQL ``NTILE(k)`` bucket from a global 1-based rank and the total
    row count — the first ``n % k`` buckets get one extra row, exactly
    Spark's/Postgres'/DuckDB's NTILE semantics. Lets NTILE ride on
    :func:`global_row_number` instead of a single-partition window.
    """
    n = F.lit(n_rows) if isinstance(n_rows, int) else n_rows
    base = (n / k).cast("long")
    rem = n - base * k
    threshold = rem * (base + 1)
    in_big = rank <= threshold
    bucket_big = F.floor((rank - 1) / (base + 1)) + 1
    bucket_small = rem + F.floor((rank - threshold - 1) / F.greatest(base, F.lit(1))) + 1
    return F.when(in_big, bucket_big).otherwise(bucket_small).cast("int")
