"""Scale-safe global ordering primitives.

A bare ``row_number() OVER (ORDER BY …)`` / ``NTILE(k) OVER (ORDER BY
…)`` forces Spark to move the whole input through ONE partition — the
canonical window anti-pattern at 100 TB. These helpers produce the
identical ranks with a range-bucketed sort:

1. assign each row a DETERMINISTIC range bucket (boundaries picked
   from a hash-based pseudo-sample of the order key — a pure function
   of the data, not of partition placement or a sampling seed);
2. per-bucket ``row_number`` (hash shuffle on the bucket id + local
   sort — Spark plans this from the window spec);
3. add each bucket's global offset (a tiny driver-side cumsum over
   per-bucket counts, injected as a literal map).

Unlike ``repartitionByRange`` + collected offsets (the previous
spelling), NOTHING here depends on a persisted intermediate staying
cached: every step is a deterministic function of the input rows, so
recomputation — an evicted cache block, a lost executor re-running a
partition at 100 TB — reproduces the exact same ranks. (The old
spelling pinned determinism with a ``persist()``; releasing it while a
memoized downstream frame was still live silently corrupted surrogate
keys.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__sg_bucket"

# Pseudo-sample granularity: expected boundary-sample size per bucket.
# 128 samples/bucket bounds the rank-skew of any bucket to ~±10% with
# high probability — the same regime Spark's RangePartitioner targets.
_SAMPLES_PER_BUCKET = 128
_HASH_MOD = 1 << 20


OrderSpec = "Column | str | tuple[Column | str, bool]"


def _normalize_order(order_cols) -> list[tuple[Column, bool]]:
    """Each entry: a str/Column (ascending) or an explicit
    ``(col, ascending)`` tuple. Value expressions only — pass
    ``("x", False)`` instead of ``F.desc("x")`` (a SortOrder cannot be
    compared against boundary literals)."""
    pairs: list[tuple[Column, bool]] = []
    for entry in order_cols:
        if isinstance(entry, tuple):
            c, asc = entry
        else:
            c, asc = entry, True
        pairs.append((F.col(c) if isinstance(c, str) else c, bool(asc)))
    return pairs


def _ge_boundary(pairs: list[tuple[Column, bool]], boundary: tuple) -> Column:
    """Lexicographic ``key >= boundary`` honoring per-column direction
    (a DESC column contributes with the comparison flipped)."""
    acc = F.lit(True)
    for (c, asc), v in reversed(list(zip(pairs, boundary))):
        lit_v = F.lit(v)
        after = (c > lit_v) if asc else (c < lit_v)
        acc = after | ((c == lit_v) & acc)
    return acc


def global_row_number(
    df: DataFrame,
    order_cols,
    alias: str = "rn",
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` over a total order, without a
    single-partition sort.

    ``order_cols`` entries are strings/Columns (ascending) or
    ``(col, ascending)`` tuples; together they must be a non-null
    total order (include a unique tiebreaker) or ranks within ties are
    placement-dependent.

    Returns ``df`` with an extra long column ``alias``. The ordering
    matches ``ROW_NUMBER() OVER (ORDER BY order_cols)`` exactly, and
    the assignment is stable under recomputation (no sampling seed, no
    cache dependence).

    ``n_rows``: pass the known exact row count to skip the count job
    (callers that already materialized a count, e.g. RFM's shared
    aggregate).
    """
    pairs = _normalize_order(order_cols)
    sort_cols = [c if asc else c.desc() for c, asc in pairs]
    bucketed, _ = _assign_range_buckets(df, pairs, num_partitions, n_rows)

    # 3. Per-bucket counts → offsets (deterministic: bucket assignment
    #    is a pure function of the row). n_parts rows — trivially
    #    collectable at any scale.
    counts = bucketed.groupBy(_PID).agg(F.count("*").alias("c")).collect()
    acc = 0
    offset_map: list[Column] = []
    for row in sorted(counts, key=lambda r: r[_PID]):
        offset_map.extend([F.lit(row[_PID]), F.lit(acc)])
        acc += row["c"]
    offs = F.create_map(*offset_map) if offset_map else F.create_map()

    w = Window.partitionBy(_PID).orderBy(*sort_cols)
    return (
        bucketed.withColumn(
            alias,
            (F.row_number().over(w) + F.element_at(offs, F.col(_PID))).cast("long"),
        )
        .drop(_PID)
    )


def _pick_boundaries(
    sample_keys: list[tuple], n_pairs: int, n_parts: int
) -> tuple[int, list[tuple]]:
    """Boundary selection from a collected key sample (tuples of key
    values, full order width ``n_pairs``).

    Bucketing only needs a PREFIX of the sort key: rows tied on the
    prefix compare equal against every boundary, so they land in the
    same bucket together, and the within-bucket window still sorts
    by the FULL order — ranks are exact regardless of prefix length.
    A short prefix matters: the bucket expression is evaluated per
    row per boundary, and 31 boundaries x 7-column lexicographic
    chains measured 3.2x the scan cost of 31 single-column
    comparisons. Pick the shortest prefix whose sampled distinct
    count supports n_parts balanced buckets.

    Python-side sort order need not match Spark's: boundary PICKING
    only affects bucket balance, never correctness (the bucket
    expression compares in Spark's semantics)."""
    prefix_len = n_pairs
    for p in range(1, n_pairs + 1):
        if len({t[:p] for t in sample_keys}) >= 4 * n_parts:
            prefix_len = p
            break
    keys = sorted({t[:prefix_len] for t in sample_keys}, key=lambda t: tuple(map(str, t)))
    n_buckets = min(n_parts, max(1, len(keys)))
    boundaries = [
        keys[(i * len(keys)) // n_buckets] for i in range(1, n_buckets)
    ] if keys else []
    return prefix_len, boundaries


def _bucket_expr(
    pairs: list[tuple[Column, bool]], prefix_len: int, boundaries: list[tuple]
) -> Column:
    """bucket = count of boundaries <= key-prefix, compared
    lexicographically in SPARK's semantics with per-column direction.
    Monotonic in the sort order whatever order the boundaries were
    picked in, so bucket ranges partition the total order into
    contiguous runs. Pure codegen expressions — no join, no extra
    shuffle."""
    bucket = F.lit(0)
    for b in boundaries:
        bucket = bucket + F.when(_ge_boundary(pairs[:prefix_len], b), 1).otherwise(0)
    return bucket.cast("int")


def _sample_predicate(cols: list[Column], n: int, target: int) -> Column | None:
    """The deterministic hash predicate selecting boundary-sample rows
    (None = collect every key): a pure row predicate, so the sample
    set is a function of the data alone."""
    if n <= target:
        return None
    threshold = max(1, int(_HASH_MOD * target / n))
    return F.pmod(F.xxhash64(*cols), F.lit(_HASH_MOD)) < threshold


def _assign_range_buckets(
    df: DataFrame,
    pairs: list[tuple[Column, bool]],
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> tuple[DataFrame, int]:
    """Steps 1-2 of the range-bucketed sort, shared by every global-
    order primitive (row_number, running sum): returns ``df`` with the
    deterministic contiguous-range bucket id column ``_PID`` attached,
    plus the total row count (already paid for by the boundary
    sample)."""
    spark = df.sparkSession
    cols = [c for c, _ in pairs]
    n_parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # 1. Deterministic boundary sample. Two cheap jobs (count + sample
    #    collect) touch only the key columns (column-pruned scans).
    n = n_rows if n_rows is not None else df.count()
    target = n_parts * _SAMPLES_PER_BUCKET
    keyed = df.select(*[c.alias(f"f{i}") for i, c in enumerate(cols)])
    pred = _sample_predicate([F.col(f"f{i}") for i in range(len(cols))], n, target)
    sample = (keyed.where(pred) if pred is not None else keyed).collect()
    prefix_len, boundaries = _pick_boundaries(
        [tuple(r) for r in sample], len(pairs), n_parts
    )
    return df.withColumn(_PID, _bucket_expr(pairs, prefix_len, boundaries)), n


def global_row_numbers(
    df: DataFrame,
    specs: dict[str, list],
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Several global row_number columns over the SAME frame in one
    fused pass (round-16 optimization, guide §1.2 step 1 / §2.4).

    ``specs`` maps each output column name to its order spec (same
    entries :func:`global_row_number` takes). Each alias's ranks are
    bit-identical to ``global_row_number(df, specs[alias], alias)`` —
    same deterministic hash sample, same boundary picking, same
    within-bucket window — but the driver pays ONE boundary-sample job
    and ONE per-bucket-count job for all specs instead of two per
    spec, and the ranks land as window columns chained in a single
    plan, so callers that previously ranked k times and joined the
    results back (k joins, k redundant scans) get one join-free plan.
    """
    spark = df.sparkSession
    pairs_by = {alias: _normalize_order(order) for alias, order in specs.items()}
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    n = n_rows if n_rows is not None else df.count()
    target = n_parts * _SAMPLES_PER_BUCKET

    # 1. ONE fused boundary-sample job: every spec's key columns ride
    #    the same collect, each spec keeping exactly the rows its own
    #    hash predicate selects — the per-spec sample multiset is
    #    identical to the single-spec spelling's.
    sel: list[Column] = []
    for alias, pairs in pairs_by.items():
        cols = [c for c, _ in pairs]
        pred = _sample_predicate(cols, n, target)
        sel.append(
            F.struct(
                (F.lit(True) if pred is None else pred).alias("keep"),
                *[c.alias(f"f{i}") for i, c in enumerate(cols)],
            ).alias(alias)
        )
    collected = df.select(*sel)
    # Keep rows where ANY spec sampled them; each struct's "keep"
    # field is that spec's own predicate.
    keep = None
    for alias in pairs_by:
        flag = F.col(alias).getField("keep")
        keep = flag if keep is None else (keep | flag)
    sample_rows = collected.where(keep).collect()

    buckets: dict[str, tuple[int, list[tuple]]] = {}
    for alias, pairs in pairs_by.items():
        keys = [tuple(r[alias])[1:] for r in sample_rows if r[alias][0]]
        buckets[alias] = _pick_boundaries(keys, len(pairs), n_parts)

    bucket_cols = {alias: f"{_PID}_{alias}" for alias in pairs_by}
    out = df
    for alias, pairs in pairs_by.items():
        prefix_len, boundaries = buckets[alias]
        out = out.withColumn(
            bucket_cols[alias], _bucket_expr(pairs, prefix_len, boundaries)
        )

    # 2. ONE fused per-bucket-count job: explode (spec, bucket) pairs,
    #    count each cell — <= n_parts cells per spec, trivially
    #    collectable at any scale.
    cells = (
        out.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(alias).alias("a"),
                            F.col(bucket_cols[alias]).alias("b"),
                        )
                        for alias in pairs_by
                    ]
                )
            ).alias("x")
        )
        .groupBy(F.col("x.a").alias("a"), F.col("x.b").alias("b"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    offs: dict[str, Column] = {}
    for alias in pairs_by:
        acc = 0
        offset_map: list[Column] = []
        for row in sorted((r for r in cells if r["a"] == alias), key=lambda r: r["b"]):
            offset_map.extend([F.lit(row["b"]), F.lit(acc)])
            acc += row["c"]
        offs[alias] = F.create_map(*offset_map) if offset_map else F.create_map()

    # 3. Per-spec windows chained in one plan (each partitions by its
    #    own bucket id — same exchanges the single-spec spelling pays,
    #    minus the k result-joins).
    for alias, pairs in pairs_by.items():
        sort_cols = [c if asc else c.desc() for c, asc in pairs]
        w = Window.partitionBy(bucket_cols[alias]).orderBy(*sort_cols)
        out = out.withColumn(
            alias,
            (
                F.row_number().over(w)
                + F.element_at(offs[alias], F.col(bucket_cols[alias]))
            ).cast("long"),
        )
    return out.drop(*bucket_cols.values())


def global_running_sum(
    df: DataFrame,
    order_cols,
    value_col: str,
    alias: str = "running_sum",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` over a total order, without
    a single-partition window — the prefix-sum twin of
    :func:`global_row_number` (same deterministic range buckets;
    per-bucket SUMS instead of counts feed the offset map).

    ``exclusive=True`` yields ``SUM(...) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` (0 for the first row) —
    the packing/offset-assignment shape; ``False`` includes the
    current row. The value column must be non-null numeric; sums are
    computed in the column's own type. Integral inputs return a long
    column and are EXACT (order-independent BIGINT sums); fractional
    inputs keep their floating type, with the usual caveat that
    per-bucket partial sums reassociate the addition order.
    """
    pairs = _normalize_order(order_cols)
    sort_cols = [c if asc else c.desc() for c, asc in pairs]
    bucketed, _ = _assign_range_buckets(df, pairs, num_partitions)
    integral = dict(df.dtypes).get(value_col) in (
        "tinyint", "smallint", "int", "bigint",
    )

    sums = bucketed.groupBy(_PID).agg(F.sum(value_col).alias("s")).collect()
    acc = 0
    offset_map: list[Column] = []
    for row in sorted(sums, key=lambda r: r[_PID]):
        offset_map.extend([F.lit(row[_PID]), F.lit(acc)])
        acc += row["s"] or 0
    offs = F.create_map(*offset_map) if offset_map else F.create_map()

    w = Window.partitionBy(_PID).orderBy(*sort_cols)
    frame = w.rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    local = F.coalesce(F.sum(value_col).over(frame), F.lit(0))
    total = local + F.element_at(offs, F.col(_PID))
    return (
        bucketed.withColumn(alias, total.cast("long") if integral else total)
        .drop(_PID)
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
