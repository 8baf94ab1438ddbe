"""Streaming jobs over the ``events`` table.

- :func:`stream_tumbling_agg` — the canonical ingestion shape:
  ``readStream`` (file source, pinned schema) → ``withWatermark`` →
  tumbling ``window()`` aggregation → memory sink, driven to
  completion with ``Trigger.AvailableNow`` so the result is a normal
  DataFrame. On a cluster the same code points at an arriving-files
  directory (or Kafka) and a parquet/Delta sink, and runs forever —
  the watermark bounds state for late data.

- :func:`sessionize_batch` — gap-based sessionization as plain window
  functions (LAG + cumulative sum of new-session flags). This is the
  batch/oracle twin.

- :func:`sessionize_stream` — the same semantics as a CUSTOM STATEFUL
  operator via ``applyInPandasWithState`` (GroupStateTimeout on the
  event-time watermark): per-user open-session state carried across
  micro-batches. Streaming≡batch equivalence is pytest-asserted.

Scale: the tumbling agg shuffles once on (window, event_type);
sessionization shuffles once on user_id — state per user is O(1)
(last ts + open-session accumulator), so total state is bounded by
the active-user cardinality, not the event volume.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.scalar import round_half_up, sql_round_half_up
from ..sources.catalog import convert_event_ts, events_disk_schema

_GAP_MINUTES = 30

# Streaming state sizing: the number of state-store partitions is
# pinned by spark.sql.shuffle.partitions at FIRST query start and
# baked into the checkpoint — it is a deliberate sizing decision, not
# something AQE can fix later (AQE does not re-plan stateful stages).
# Each per-partition store costs task + commit-file overhead every
# micro-batch, so size to expected STATE volume: the bounded test
# corpus wants few, a production firehose wants many. Measured at
# sf0.1: the stream-stream interval join at 32 stores took 23.5 s,
# at 4 stores 2.9 s — identical results.
_STATE_PARTITIONS = 8


@contextmanager
def _sized_state(spark: SparkSession, n: int | None = _STATE_PARTITIONS):
    """Scope spark.sql.shuffle.partitions around a streaming run (the
    conf is read at query start; batch queries built outside the
    scope are unaffected)."""
    if n is None:
        yield
        return
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)



def _stage_slices(
    df: DataFrame, key: str, staged: str, n_slices: int
) -> None:
    """Stage ``df`` as ``n_slices`` single-file parquets under
    ``staged`` (the arriving-files directory stand-in every file-source
    streaming entry consumes), slice b = rows with ``key % n == b``.

    Round-16 optimization (guide §2.6 — overlap independent jobs): the
    slice writes are independent filtered scans of the same source and
    used to run as n sequential Spark jobs (n full scans end to end);
    they now run from a thread pool. Each job writes to its own
    private subdirectory — concurrent writes into ONE directory race
    on the shared ``_temporary`` committer staging — and the part
    files are then renamed into ``staged`` with the slice index in the
    name and strictly increasing mtimes, so the file stream source
    sees exactly the arrival order (slice 0 first) the sequential
    writes produced: identical micro-batch composition, identical
    folds."""
    import glob as _glob
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    def _write(b: int) -> str:
        d = os.path.join(staged, f".slice-{b}")
        df.where(F.pmod(F.col(key), F.lit(n_slices)) == b).coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        return d

    with ThreadPoolExecutor(max_workers=min(4, n_slices)) as pool:
        dirs = list(pool.map(_write, range(n_slices)))
    base = _time.time()
    for b, d in enumerate(dirs):
        parts = [
            p
            for p in _glob.glob(os.path.join(d, "part-*"))
            if not p.endswith(".crc")
        ]
        if len(parts) != 1:  # coalesce(1) guarantees one part file
            raise RuntimeError(f"expected 1 part file in {d}, got {parts}")
        dst = os.path.join(staged, f"slice-{b:05d}.parquet")
        os.rename(parts[0], dst)
        os.utime(dst, (base + b, base + b))
        shutil.rmtree(d, ignore_errors=True)


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # File-source stream over the events parquet; schema pinned
    # (streams never infer), one file per micro-batch at most. The
    # on-disk ts shape drifts by runtime (int64 nanos vs native
    # timestamp) — footer-probe one file batch-side, pin THAT schema
    # on the stream, and normalize in convert_event_ts.
    # The file stream source requires a DIRECTORY; select just the
    # events file from the sf dir with a glob filter. In production
    # this is the arriving-files landing directory.
    import glob as _glob

    sample = sorted(_glob.glob(os.path.join(sf_dir, "events*.parquet")))[0]
    raw = (
        spark.readStream.schema(events_disk_schema(spark, sample))
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    return convert_event_ts(raw)


def stream_tumbling_agg(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Run the watermarked tumbling aggregation to completion and
    return the result as a batch DataFrame.

    Output: one row per (window_start, event_type) with event count
    and value sum — the streaming twin of a GROUP BY date_trunc.
    Complete output mode: every window is emitted at the final commit,
    so a bounded input yields exactly the batch answer.
    """
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "nb_events",
            "total_value",
        )
    )
    name = f"stream_agg_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def sessionize_batch(events: DataFrame, gap_minutes: int = _GAP_MINUTES) -> DataFrame:
    """Gap-based sessions per user with window functions: a session
    breaks when the inter-event gap exceeds ``gap_minutes``.

    Windows are PARTITIONED BY user_id — parallel across users, never
    a global sort. Output: one row per session.

    Keyless (NULL user_id) events are dropped: sessions belong to an
    entity, and a NULL in the BIGINT key column is unrepresentable
    under the driver comparator (round-8; the oracle mirrors).
    """
    events = events.filter(F.col("user_id").isNotNull())
    gap = float(gap_minutes * 60)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Fractional-second epochs: gap tests must see microseconds, or
    # boundary events land in different sessions than the oracle's.
    epoch = F.col("ts").cast("double")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(epoch - F.lag(epoch, 1).over(w) > gap, F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_no", F.sum("new_session").over(w) + 1
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
        .withColumn(
            "duration_sec",
            (
                F.floor(F.col("session_end").cast("double"))
                - F.floor(F.col("session_start").cast("double"))
            ).cast("int"),
        )
        .orderBy("user_id", "session_no")
    )


def sessionize_builtin(events: DataFrame, gap_minutes: int = _GAP_MINUTES) -> DataFrame:
    """Gap sessionization via the BUILT-IN ``F.session_window`` — the
    operator :func:`sessionize_batch` (window functions) and
    :func:`sessionize_stream` (applyInPandasWithState) hand-build.
    Same output minus the per-user session numbering (session windows
    are identified by their bounds, not an ordinal).

    In batch this plans as a regular aggregation after session-merge
    (one shuffle on user_id); in streaming the same expression runs
    with a watermark in append mode and Spark manages the
    merge-adjacent-sessions state natively — when the built-in
    semantics fit (they do here), prefer it over custom state code.

    Boundary note: session_window starts a NEW session when a gap is
    exactly == the gap duration (half-open window), while the
    LAG-based twin breaks only when gap > duration. Microsecond
    timestamps make an exact-boundary gap measure-zero (none in the
    fixtures, so the three spellings agree row-for-row; asserted in
    pytest and against the oracle).

    Same keyless-event guard as :func:`sessionize_batch`.
    """
    events = events.filter(F.col("user_id").isNotNull())
    sw = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy("user_id", sw.alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
        .withColumn(
            "duration_sec",
            (
                F.floor(F.col("session_end").cast("double"))
                - F.floor(F.col("session_start").cast("double"))
            ).cast("int"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "nb_events",
            "total_value",
            "duration_sec",
        )
        .orderBy("user_id", "session_start")
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_no", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("nb_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("duration_sec", T.IntegerType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),  # epoch µs, exact
        T.StructField("last_us", T.LongType(), False),
        T.StructField("nb_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def _sessionize_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        (user_id,) = key
        if state.exists:
            session_no, start_us, last_us, nb, total = state.get
        else:
            session_no, start_us, last_us, nb, total = 0, None, None, 0, 0.0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                # Exact integer microseconds — float epoch seconds
                # would carry ~0.2 µs of noise at 2024 magnitudes.
                t = ts.value // 1000
                v = float(value) if pd.notna(value) else 0.0
                if start_us is None:
                    session_no, start_us, last_us, nb, total = 1, t, t, 1, v
                elif t - last_us > gap_us:
                    out.append((user_id, session_no, start_us, last_us, nb, total))
                    session_no, start_us, last_us, nb, total = session_no + 1, t, t, 1, v
                else:
                    last_us, nb, total = t, nb + 1, total + v
        state.update((session_no, start_us, last_us, nb, total))
        # Bounded input (availableNow): flush the open session too so
        # the result equals the batch answer — an unbounded deployment
        # would emit it on event-time state timeout instead (the
        # watermark never passes the final sessions on bounded input,
        # so a timeout-only formulation would silently drop them).
        # The open session ALSO stays in state, so with input split
        # across micro-batches the same (user, session_no) is emitted
        # once per batch as a PROGRESSIVE SNAPSHOT; sessionize_stream
        # consolidates snapshots after the sink (keep the final one).
        if start_us is not None:
            out.append((user_id, session_no, start_us, last_us, nb, total))
        yield pd.DataFrame(
            [
                {
                    "user_id": u,
                    "session_no": s,
                    "session_start": pd.Timestamp(st * 1000).tz_localize("UTC"),
                    "session_end": pd.Timestamp(lt * 1000).tz_localize("UTC"),
                    "nb_events": n,
                    # Same floor(x*100+0.5)/100 + floor-second duration
                    # as the batch twin, for exact equivalence.
                    "total_value": math.floor(tv * 100.0 + 0.5) / 100.0,
                    "duration_sec": int(lt // 1_000_000 - st // 1_000_000),
                }
                for (u, s, st, lt, n, tv) in out
            ],
            columns=[f.name for f in _SESSION_SCHEMA.fields],
        )

    return fn


def sessionize_stream(
    spark: SparkSession, sf_dir: str, gap_minutes: int = _GAP_MINUTES
) -> DataFrame:
    """Custom stateful streaming sessionization via
    applyInPandasWithState, driven to completion with availableNow.
    Same keyless-event guard as the two batch spellings."""
    events = _read_events_stream(spark, sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    sessions = (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_minutes),
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Consolidate progressive snapshots: with input split across
    # micro-batches (maxFilesPerTrigger=1), an open session is flushed
    # once per batch with growing stats and possibly closed later —
    # one row per (user, session_no) emerges by keeping the snapshot
    # with the most events (nb_events is monotone per session). With
    # single-batch input this is a no-op aggregation.
    raw = spark.table(name)
    return (
        raw.groupBy("user_id", "session_no")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.max("nb_events").alias("nb_events"),
            F.max_by("total_value", "nb_events").alias("total_value"),
            F.max_by("duration_sec", "nb_events").alias("duration_sec"),
        )
        .select([f.name for f in _SESSION_SCHEMA.fields])
    )


def stream_tumbling_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """The PRODUCTION shape of the tumbling aggregation: append-mode
    windowed agg into a parquet sink with a checkpoint — the pipeline
    you would actually deploy (swap the file source for Kafka and the
    path for object storage; exactly-once via checkpoint + sink
    idempotence).

    Append-mode semantics on bounded input, stated honestly: a window
    is emitted only once the WATERMARK passes its end, so the trailing
    windows (younger than max(ts) - watermark) remain in state when
    the availableNow run stops — they'd be emitted when more data
    arrives. The memory-sink/complete-mode variant
    (:func:`stream_tumbling_agg`) exists precisely because a bounded
    demo wants every window; this writer exists to prove the
    unbounded-deployment plan end-to-end. The equality contract
    (tests/test_streaming.py) is: parquet rows == batch GROUP BY
    restricted to watermark-finalized windows.
    """
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "nb_events",
            "total_value",
        )
    )
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir)


def stream_dedup_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ingestion dedup — the at-least-once-delivery guard a
    continuous training-data pipeline puts in front of everything
    else: ``dropDuplicatesWithinWatermark`` on the event key, append
    mode, parquet sink. A redelivered event (same ``event_id``) inside
    the watermark horizon is dropped by dedup state; one older than
    the watermark is dropped as late data — either way the sink sees
    each event at most once, and state is bounded by the watermark
    horizon (keys expire), NOT by the stream length, which is what
    makes this runnable forever. Returns the deduped sink read back as
    a batch DataFrame, aggregated to (event_type, nb_events,
    total_value) so callers/oracles compare a stable summary.

    On bounded single-batch input nothing is late and nothing is
    duplicated, so the result equals the plain batch GROUP BY; the
    redelivery behavior (second identical file -> no new rows) is
    pytest-asserted with a two-file directory.
    """
    events = _read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="dedup-sink-")
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

from ..sources.catalog import read_table  # noqa: E402


def q_stream_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-hour aggregation — oracle-checked against a
    plain GROUP BY date_trunc('hour'): the stream must produce the
    batch answer on bounded input."""
    return stream_tumbling_agg(spark, sf_dir, window="1 hour", watermark="1 hour").orderBy(
        "window_start", "event_type"
    )


ORACLE_STREAM_TUMBLING = f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS nb_events,
       {sql_round_half_up("SUM(value)", 2)} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return sessionize_batch(events, gap_minutes=_GAP_MINUTES)


ORACLE_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
           AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS nb_events,
       {sql_round_half_up("SUM(value)", 2)} AS total_value,
       CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS INT) AS duration_sec
FROM sessions
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup, oracle-checked: on the single-batch
    bounded input nothing is late or duplicated, so the deduped-sink
    summary must equal the batch GROUP BY (event_ids are unique in the
    corpus; redelivery is exercised in tests/test_streaming.py)."""
    return stream_dedup_ingest(spark, sf_dir)


ORACLE_STREAM_DEDUP = f"""
SELECT event_type,
       COUNT(DISTINCT event_id) AS nb_events,
       {sql_round_half_up("SUM(value)", 2)} AS total_value
FROM events
GROUP BY 1
ORDER BY 1
"""


def q_sessionize_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return sessionize_builtin(events, gap_minutes=_GAP_MINUTES)


ORACLE_SESSIONIZE_BUILTIN = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS nb_events,
       {sql_round_half_up("SUM(value)", 2)} AS total_value,
       CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS INT) AS duration_sec
FROM sessions
GROUP BY user_id, session_no
ORDER BY 1, 2
"""


def stream_interval_join(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    lookback_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL JOIN: attribute each
    ``right_type`` event (purchase) to every ``left_type`` event
    (click) by the same user within the preceding
    ``lookback_minutes`` — the canonical Structured Streaming
    join shape (Spark docs: inner join with watermarks + time-range
    condition).

    Scale semantics: both sides carry an event-time watermark and the
    join condition bounds click_ts to a window around purchase_ts, so
    the state store retains each side only ``watermark + lookback``
    long — state is O(arrival rate x horizon), never O(stream
    length). Inner-join matches emit as they form (append mode); on
    bounded availableNow input the result equals the batch interval
    join exactly (oracle-checked).
    """
    clicks = (
        _read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        _read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            user_id = click_user
            AND click_ts >= purchase_ts - INTERVAL {lookback_minutes} MINUTES
            AND click_ts <= purchase_ts
            """
        ),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "click_ts", "purchase_ts", "purchase_value")
    name = f"stream_ij_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase <- clicks within 30 min),
    oracle-checked against the batch interval join."""
    return stream_interval_join(spark, sf_dir).orderBy("purchase_id", "click_id")


ORACLE_STREAM_INTERVAL_JOIN = """
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id AS user_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       CAST(p.value AS DOUBLE) AS purchase_value
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
ORDER BY 1, 2
"""


def stream_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: the events stream joined to
    the customer→nation dim and aggregated per (pays, event_type).

    The static side is read per micro-batch and BROADCAST — the join
    is STATELESS (no watermark, no state store), which is why
    stream-static is the default shape for attaching dimensions to a
    stream at any scale: state never grows, and dim updates between
    micro-batches are picked up automatically. The aggregation state
    is bounded by the group-key cardinality (nations × event types),
    so complete mode is safe.
    """
    events = _read_events_stream(spark, sf_dir)
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
    ).select(F.col("c_custkey"), F.col("n_name").alias("pays"))
    agg = (
        events.join(F.broadcast(dim), events.user_id == dim.c_custkey, "left")
        .groupBy("pays", "event_type")
        .agg(
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_stream_enriched_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, oracle-checked: on bounded input
    the streaming answer must equal the batch join + GROUP BY."""
    return stream_enrich_events(spark, sf_dir).orderBy("pays", "event_type")


ORACLE_STREAM_ENRICH = f"""
SELECT n_name AS pays,
       event_type,
       COUNT(*) AS nb_events,
       {sql_round_half_up("SUM(value)", 2)} AS total_value
FROM events
LEFT JOIN customer ON user_id = c_custkey
LEFT JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def stream_summary_maintenance(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming maintenance of a warehouse summary table: a
    watermarked tumbling aggregation in UPDATE output mode, sunk
    through ``foreachBatch`` into a parquet summary via the same
    merge-upsert the batch ETL uses (sources/sinks.merge_upsert +
    stage-and-swap) — the production shape where a stream keeps a BI
    summary current instead of landing raw rows.

    Semantics: update mode re-emits a (window, event_type) row each
    micro-batch its aggregate changes; the merge keeps the LATEST row
    per key, so after a bounded (availableNow) run the summary equals
    the batch GROUP BY over all NON-LATE rows, and re-running is
    idempotent. Rows later than ``watermark`` behind the stream's
    max event time are dropped by the aggregation — correct streaming
    semantics, NOT a merge property — so exact batch equality holds
    when the watermark covers the input's disorder: trivially true
    for a single-file landing dir (one micro-batch, oracle-checked),
    and for multi-file redelivery the caller sizes ``watermark`` to
    the lateness horizon (tests/test_streaming_maintenance.py does
    exactly this for its round-robin split). State is bounded by the watermark; the merge per
    micro-batch touches only the keys that changed — at scale with a
    month-partitioned summary this is the dynamic-partition-overwrite
    of plans/etl.refresh_summary_incremental driven by arrival
    instead of by batch schedule (multi-batch redelivery + late-key
    update asserted in tests/test_streaming_maintenance.py).
    """
    from ..sources.sinks import merge_upsert, stage_and_swap_write

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="stream-summary-")
    table_path = os.path.join(out_dir, "v_agg_events_jour")
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("jour"),
            "event_type",
            "nb_events",
            "total_value",
        )
    )

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        existing = None
        if os.path.exists(table_path):
            existing = spark.read.parquet(table_path)
        merged = merge_upsert(
            existing, batch_df, ["jour", "event_type"], do_update=True
        )
        stage_and_swap_write(merged, table_path)

    name = f"stream_sm_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .queryName(name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(table_path)


def q_stream_summary_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_summary_maintenance(spark, sf_dir).orderBy("jour", "event_type")


ORACLE_STREAM_SUMMARY = f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS jour,
       event_type,
       COUNT(*) AS nb_events,
       {sql_round_half_up("SUM(value)", 2)} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def stream_sliding_agg(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """SLIDING-window aggregation (overlapping windows: every event
    lands in duration/slide windows) — the trend-smoothing shape
    tumbling windows can't express (a 1 h metric refreshed every
    15 min).

    This bounded demo runs in COMPLETE mode so every window is emitted
    at the final commit and the result equals the batch answer
    (oracle: each event replicated to its duration/slide windows);
    complete mode retains all window state, so it is only for bounded
    runs / small window domains. The production unbounded shape is
    the same expression in APPEND mode, where the watermark closes
    windows ``watermark`` past their end and state is bounded by
    (active windows × group keys) with the duration/slide multiplier
    — identical to stream_tumbling_to_parquet's deployment story.
    """
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "nb_events",
            "total_value",
        )
    )
    name = f"stream_slide_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_stream_sliding_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_sliding_agg(spark, sf_dir).orderBy("window_start", "event_type")


# Sliding-window membership in ANSI SQL: an event at ts belongs to the
# 4 slide-aligned (epoch-anchored, like Spark's window()) starts
# bucket15(ts) - k*15min, k = 0..3. The bucket is built from
# date_trunc so fractional seconds can't leak into the window start.
ORACLE_STREAM_SLIDING = f"""
WITH exploded AS (
  SELECT date_trunc('hour', ts)
            + (CAST(minute(ts) AS BIGINT) // 15) * INTERVAL 15 MINUTE
            - k * INTERVAL 15 MINUTE AS window_start,
         event_type, value
  FROM events, (SELECT unnest(generate_series(0, 3)) AS k)
)
SELECT window_start, event_type,
       COUNT(*) AS nb_events,
       {sql_round_half_up("SUM(value)", 2)} AS total_value
FROM exploded
GROUP BY 1, 2
ORDER BY 1, 2
"""


def stream_left_interval_join(
    spark: SparkSession,
    sf_dir: str,
    lookback_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join: every
    purchase emits — attributed to each click by the same user in the
    preceding ``lookback_minutes``, or once with a -1 click sentinel
    when no click matched. The distinct semantics vs the inner join
    (:func:`stream_interval_join`): unmatched left rows are HELD in
    state until the watermark proves no future match can arrive, then
    emitted null-padded — so the outer result is late by exactly the
    watermark, the price of correctness under out-of-order arrival.
    The sentinel projection (post-join, stateless) keeps numeric
    outputs NULL-free for the cross-engine comparator.
    """
    clicks = (
        _read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        _read_events_stream(spark, sf_dir)
        # A keyless purchase can never be attributed AND would emit a
        # NULL in the BIGINT user_id output (driver-unrepresentable);
        # drop it on both engines (round-8). The inner-join variant
        # drops such rows implicitly (NULL never equi-joins).
        .where((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = (
        purchases.join(
            clicks,
            F.expr(
                f"""
                user_id = click_user
                AND click_ts >= purchase_ts - INTERVAL {lookback_minutes} MINUTES
                AND click_ts <= purchase_ts
                """
            ),
            "leftOuter",
        )
        .select(
            "purchase_id",
            F.coalesce("click_id", F.lit(-1)).alias("click_id"),
            "user_id",
            "purchase_ts",
            "purchase_value",
        )
    )
    name = f"stream_loj_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def q_stream_left_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer stream-stream interval join, oracle-checked against
    the batch LEFT JOIN (unmatched purchases carry click_id = -1).

    Compared over the CLOSED region of the stream only: a left-outer
    result for purchase p is final once the click-side watermark has
    passed p's match horizon. The engine's global watermark is the MIN
    across the two watermark operators (each computed from ITS side's
    max event time), so the provably-emitted region ends at
    least(max_click_ts, max_purchase_ts) - (watermark + lookback),
    minus one minute of slack for the frontier's boundary strictness.
    Purchases newer than that may still be held in state when a
    bounded run terminates (their no-match verdict isn't provable
    yet); both engines restrict to the closed region with the
    identical cutoff timestamp. This mirrors how an outer-join stream
    is consumed in production: downstream reads are correct up to the
    watermark frontier, never ahead of it."""
    from ..sources.catalog import read_table

    result = stream_left_interval_join(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    maxes = ev.groupBy().agg(
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("mc"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("mp"),
    ).collect()[0]
    if maxes["mc"] is None or maxes["mp"] is None:
        # One side never arrived: no watermark frontier exists, so the
        # closed region is empty (matches the oracle's LEAST(NULL, ...)
        # cutoff filtering everything out).
        return result.filter(F.lit(False)).orderBy("purchase_id", "click_id")
    import datetime as _dt

    cutoff = min(maxes["mc"], maxes["mp"]) - _dt.timedelta(minutes=91)
    return result.filter(F.col("purchase_ts") <= F.lit(cutoff)).orderBy(
        "purchase_id", "click_id"
    )


ORACLE_STREAM_LEFT_JOIN = """
SELECT p.event_id AS purchase_id,
       COALESCE(c.event_id, -1) AS click_id,
       p.user_id AS user_id,
       p.ts AS purchase_ts,
       CAST(p.value AS DOUBLE) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'purchase'
        AND user_id IS NOT NULL
        AND ts <= (SELECT LEAST(
                     MAX(ts) FILTER (WHERE event_type = 'click'),
                     MAX(ts) FILTER (WHERE event_type = 'purchase'))
                   FROM events) - INTERVAL 91 MINUTE) p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Streaming near-dup dedup — the continuous-ingest twin of
# dedup_incremental_minhash: every arriving micro-batch of documents
# probes the LSH index accumulated from all earlier batches, emits its
# near-dup pairs, and appends its own signatures to the index.
# ---------------------------------------------------------------------------


def stream_minhash_dedup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    n_slices: int = 4,
    files_per_trigger: int = 2,
) -> DataFrame:
    """MinHash+LSH near-dup detection as a streaming maintenance job.

    The corpus is staged as ``n_slices`` parquet files (doc_id % n
    slices — stands in for an arriving-files directory) and consumed
    with ``maxFilesPerTrigger=files_per_trigger``, so the index
    genuinely GROWS across micro-batches. The registry entry defaults
    to 2 files/trigger (2 micro-batches — each trigger+checkpoint
    commit costs ~real seconds and the pair math is batch-count
    independent); the pytest property run uses 1 file/trigger so batch
    membership equals slice membership and the cross-batch-pair
    assertion stays maximally strong. Per batch (foreachBatch,
    driver-side plan over normal DataFrames):

    1. portable md5 signatures for the batch's docs;
    2. cross probe: batch band-buckets join the INDEX band source
       (:func:`..operators.dedup.minhash_probe_pairs` — no self-join,
       cost bounded by the batch's bucket occupancy, exactly the
       ingest shape a 100 TB steady state needs);
    3. within-batch pairs via the standard banded self-join;
    4. pairs append to the result table, signatures append to the
       index table.

    Every pair (a, b) is discovered exactly once — at the LATER
    member's batch — so the final pair SET equals the one-shot batch
    pipeline's regardless of file arrival order: the oracle is the
    very same portable minhash SQL replay (``ORACLE_MINHASH_PORTABLE``
    modulo column order), which is what upgrades this from a
    streaming demo to a driver-hash-attested operator. A redelivered
    batch (restart mid-run) would re-append the same rows; the final
    read deduplicates on the pair key, so the result is idempotent
    under at-least-once delivery — including the half-committed case
    where the batch's signatures reached the index before the
    checkpoint commit: the re-run then probes an index containing its
    own docs, so the cross probe drops ``new_doc == old_doc``
    self-collisions explicitly. (With the round-17 concurrent appends
    a retry can also leave DUPLICATE signature rows in the index; the
    probe dropDuplicates on the pair key, so the pair set is still
    unchanged.) All staging, index, pairs and
    checkpoint directories are temporary; the result is materialized
    (``localCheckpoint``) before they are removed, so repeated bench
    runs don't accumulate corpus-sized trees in /tmp.
    """
    from ..operators.dedup import (
        minhash_lsh_pairs,
        minhash_probe_pairs,
        minhash_signatures,
    )
    from ..sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    staged = tempfile.mkdtemp(prefix="docstream-")
    work = tempfile.mkdtemp(prefix="minhash-stream-")
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    index_path = os.path.join(work, "index")
    pairs_path = os.path.join(work, "pairs")
    try:
        _stage_slices(docs, "doc_id", staged, n_slices)

        doc_schema = docs.schema
        stream = (
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(staged)
        )

        def ingest(batch_df: DataFrame, _batch_id: int) -> None:
            # Round-17 (guide §2.6, r16 "not yet optimized" item 1):
            # the batch signatures are EAGERLY materialized (one
            # checkpoint job) instead of lazily persisted, which kills
            # the cache-fill race that forced the two state appends to
            # run sequentially — the pairs append (probe join + banded
            # self-join) and the signature-index append now both read
            # the checkpointed frame and run TOGETHER from a 2-thread
            # pool. Same rows appended to the same tables in the same
            # fold; only the job schedule changes. batch_df itself is
            # read exactly once (by the signature build), so its
            # persist was pure overhead and is dropped.
            from concurrent.futures import ThreadPoolExecutor

            sigs_new = minhash_signatures(batch_df, portable=True).localCheckpoint(
                eager=True
            )
            out = None
            if os.path.exists(index_path):
                index_sigs = spark.read.parquet(index_path)
                cross = (
                    minhash_probe_pairs(
                        index_sigs, sigs_new, threshold=threshold, portable=True
                    )
                    .where(F.col("new_doc") != F.col("old_doc"))
                    .select(
                        F.least("new_doc", "old_doc").alias("doc_a"),
                        F.greatest("new_doc", "old_doc").alias("doc_b"),
                        "est_jaccard",
                    )
                )
                out = cross
            within = minhash_lsh_pairs(
                batch_df, threshold=threshold, portable=True, sigs=sigs_new
            ).select("doc_a", "doc_b", "est_jaccard")
            out = within if out is None else out.unionByName(within)
            with ThreadPoolExecutor(max_workers=2) as wpool:
                f_pairs = wpool.submit(
                    lambda: out.write.mode("append").parquet(pairs_path)
                )
                f_idx = wpool.submit(
                    lambda: sigs_new.write.mode("append").parquet(index_path)
                )
            f_pairs.result()
            f_idx.result()

        name = f"stream_mh_{uuid.uuid4().hex[:8]}"
        with _sized_state(spark):
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(ingest)
                .queryName(name)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        if not os.path.exists(pairs_path):
            return spark.createDataFrame(
                [], "doc_a long, doc_b long, est_jaccard double"
            )
        return (
            spark.read.parquet(pairs_path)
            .dropDuplicates(["doc_a", "doc_b"])
            .localCheckpoint(eager=True)
            .orderBy("doc_a", "doc_b")
        )
    finally:
        for d in (staged, work, checkpoint):
            shutil.rmtree(d, ignore_errors=True)


def q_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_minhash_dedup(spark, sf_dir)


def _oracle_stream_minhash() -> str:
    from ..operators.dedup import ORACLE_MINHASH_PORTABLE

    return ORACLE_MINHASH_PORTABLE


def stream_hll_daily_users(
    spark: SparkSession, sf_dir: str, watermark: str = "1 day"
) -> DataFrame:
    """Streaming distinct-user cardinality per day via the portable
    HyperLogLog (operators/sketches.py) — the operator exact streaming
    COUNT(DISTINCT) cannot be: exact distinct state grows with the
    key universe, while the HLL register frame is a CONSTANT
    m-registers-per-window state, and its merge is MAX — a built-in
    streaming aggregate, no applyInPandasWithState needed. The rho
    projection is stateless scan arithmetic; the only stateful op is
    groupBy(window, bucket).max(rho), watermark-bounded like every
    other stream here. This is the standard production answer to
    "unique users per window over an unbounded stream".

    Complete-mode memory sink on bounded input yields every window;
    the estimate tail (spine fill, exact-BIGINT harmonic fold,
    small-range correction) runs batch-side on the final register
    frame. ``n_exact`` comes from a batch read of the same input —
    the quality yardstick the stream itself could not afford.
    """
    from ..operators.sketches import hll_estimate, hll_rho_projection

    events = _read_events_stream(spark, sf_dir).filter(F.col("user_id").isNotNull())
    proj = hll_rho_projection(
        events.withWatermark("ts", watermark), key="user_id", group_cols=["ts"]
    )
    reg = (
        proj.groupBy(F.window("ts", "1 day").alias("w"), "bucket")
        .agg(F.max("rho").alias("m_j"))
        .select(F.col("w.start").cast("date").alias("day"), "bucket", "m_j")
    )
    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    with _sized_state(spark):
        q = (
            reg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    registers = spark.table(name)
    est = hll_estimate(registers, ["day"])
    exact = (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    return (
        est.join(exact, "day")
        .select("day", "n_exact", round_half_up(F.col("hll_raw"), 4).alias("n_hll"))
        .orderBy("day")
    )


def q_stream_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_hll_daily_users(spark, sf_dir)


def _oracle_stream_hll() -> str:
    from ..operators.sketches import _oracle_hll_grouped

    return _oracle_hll_grouped(
        "CAST(date_trunc('day', ts) AS DATE)", "day", with_rel_err=False
    )


def stream_media_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    files_per_trigger: int = 2,
    max_hamming: int = 3,
) -> DataFrame:
    """Continuous multimodal ingest dedup — the media twin of
    :func:`stream_minhash_dedup` (round-12 verdict item 7): the media
    corpus is staged as ``n_slices`` arriving parquet files and
    consumed with ``maxFilesPerTrigger``, so the perceptual
    fingerprint index (image dHash bands + audio energy-sign bands,
    one unified 4-band frame — operators/multimodal.media_fp_frame)
    genuinely GROWS across micro-batches. Per batch (foreachBatch):

    1. fingerprints for the batch's images and audio clips;
    2. cross probe: the batch's band buckets join the INDEX band
       source — cost bounded by the batch's bucket occupancy, never a
       corpus self-join (the 100 TB steady-state ingest shape);
    3. within-batch pairs via the banded self-join;
    4. pairs append to the result table, fingerprints to the index.

    Every pair is discovered exactly once — at the later member's
    batch — so the final pair SET equals the one-shot batch
    pipelines' (image_dhash_pairs ∪ audio_fp_pairs), and the oracle
    is the UNION of those two batch replays: a streaming job attested
    by the same value hash as the batch path. Idempotent under
    at-least-once redelivery: the cross probe drops same-id
    collisions (covering the half-committed signatures-before-
    checkpoint case) and the final read deduplicates on
    (kind, media_a, media_b). All staging/index/pairs/checkpoint
    directories are temporary; the result is materialized
    (localCheckpoint) before removal.
    """
    from ..operators.multimodal import (
        ascii_guarded,
        media_banded,
        media_fp_frame,
        synthesize_media,
    )
    from ..sources.catalog import read_table

    media = ascii_guarded(synthesize_media(read_table(spark, sf_dir, "documents")))
    staged = tempfile.mkdtemp(prefix="mediastream-")
    work = tempfile.mkdtemp(prefix="media-dedup-stream-")
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    index_path = os.path.join(work, "index")
    pairs_path = os.path.join(work, "pairs")

    def _ham(left: str, right: str):
        return (
            sum(
                F.bit_count(
                    F.col(f"{left}.c{k}").bitwiseXOR(F.col(f"{right}.c{k}"))
                )
                for k in range(4)
            )
        ).cast("int")

    try:
        _stage_slices(media, "media_id", staged, n_slices)

        stream = (
            spark.readStream.schema(media.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(staged)
        )

        def ingest(batch_df: DataFrame, _batch_id: int) -> None:
            fps_new = media_fp_frame(batch_df).persist()
            new_b = media_banded(fps_new)
            out = None
            if os.path.exists(index_path):
                old_b = media_banded(spark.read.parquet(index_path))
                n, o = new_b.alias("n"), old_b.alias("o")
                out = n.join(
                    o,
                    (F.col("n.kind") == F.col("o.kind"))
                    & (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.val") == F.col("o.val"))
                    & (F.col("n.media_id") != F.col("o.media_id")),
                ).select(
                    F.col("n.kind").alias("kind"),
                    F.least("n.media_id", "o.media_id").alias("media_a"),
                    F.greatest("n.media_id", "o.media_id").alias("media_b"),
                    _ham("n", "o").alias("hamming"),
                )
            x, y = new_b.alias("x"), new_b.alias("y")
            within = x.join(
                y,
                (F.col("x.kind") == F.col("y.kind"))
                & (F.col("x.band") == F.col("y.band"))
                & (F.col("x.val") == F.col("y.val"))
                & (F.col("x.media_id") < F.col("y.media_id")),
            ).select(
                F.col("x.kind").alias("kind"),
                F.col("x.media_id").alias("media_a"),
                F.col("y.media_id").alias("media_b"),
                _ham("x", "y").alias("hamming"),
            )
            out = within if out is None else out.unionByName(within)
            (
                out.filter(F.col("hamming") <= max_hamming)
                .dropDuplicates(["kind", "media_a", "media_b"])
                .write.mode("append")
                .parquet(pairs_path)
            )
            fps_new.write.mode("append").parquet(index_path)
            fps_new.unpersist()

        name = f"stream_media_{uuid.uuid4().hex[:8]}"
        with _sized_state(spark):
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(ingest)
                .queryName(name)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        if not os.path.exists(pairs_path):
            return spark.createDataFrame(
                [], "kind string, media_a long, media_b long, hamming int"
            )
        return (
            spark.read.parquet(pairs_path)
            .dropDuplicates(["kind", "media_a", "media_b"])
            .localCheckpoint(eager=True)
            .orderBy("kind", "media_a", "media_b")
        )
    finally:
        for d in (staged, work, checkpoint):
            shutil.rmtree(d, ignore_errors=True)


def q_stream_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_media_dedup(spark, sf_dir)


def _oracle_stream_media() -> str:
    from ..operators.multimodal import (
        _AFP_BANDS,
        _AFP_CAND_CTES,
        _DHASH_CAND_CTES,
        _DHASH_MAX_HAMMING,
    )

    return f"""
WITH {_DHASH_CAND_CTES},
{_AFP_CAND_CTES}
SELECT 'image' AS kind, media_a, media_b, hamming
FROM cand WHERE hamming <= {_DHASH_MAX_HAMMING}
UNION ALL
SELECT 'audio' AS kind, media_a, media_b, hamming
FROM acand WHERE hamming <= {_AFP_BANDS - 1}
ORDER BY kind, media_a, media_b
"""


# CDC waves for the streaming SCD2 job — (effective_date, key modulus,
# new segment), applied in date order. Keys hit by several waves stack
# versions (custkey % 70 == 0 accumulates all four).
_SCD2_WAVES = [
    ("1994-01-01", 7, "WAVE1"),
    ("1996-01-01", 5, "WAVE2"),
    ("1998-01-01", 10, "UPGRADED"),
]


def stream_scd2_maintenance(
    spark: SparkSession, sf_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """Streaming SCD2 dimension maintenance: CDC update waves arrive
    as files and fold into the versioned dimension via foreachBatch —
    the production shape where a warehouse dimension keeps full
    history current from a change stream instead of a batch refresh
    (the batch twin is plans/scd.scd2_apply; this entry drives the
    SAME apply through micro-batches and lands on the same table).

    Per micro-batch: read the current version table, apply the
    batch's updates GROUPED BY effective date in ascending order (a
    driver fold over the batch's bounded set of distinct dates — a
    batch may carry several waves when files_per_trigger > 1), then
    stage-and-swap the new version table (sinks.stage_and_swap_write
    materializes the new state fully before the atomic rename, so a
    reader never sees a half-applied wave).

    Ordering contract (same as the batch apply): waves must ARRIVE in
    effective-date order — scd2_apply's raise_error guard fires on an
    inverted interval rather than corrupting as-of lookups, and
    backfill is a different operation. Within that contract the job
    is idempotent under at-least-once redelivery: re-applying a wave
    whose segments are already in place is a no-op (the
    changed-attribute test), covering the half-committed
    state-before-checkpoint restart case.

    State is the dimension itself (parquet, key-partitionable at
    scale); per batch the apply is one broadcast join over the
    current table — at 100 TB the same fold runs with the update
    batch broadcast and the dimension scan pruned to affected
    partitions.
    """
    from ..plans.scd import OPEN_END, scd2_apply
    from ..sources.sinks import stage_and_swap_write

    customer = read_table(spark, sf_dir, "customer")
    seed = customer.select(
        F.col("c_custkey").alias("client_id"),
        F.col("c_name").alias("nom_client"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
    )
    staged = tempfile.mkdtemp(prefix="scd2stream-")
    work = tempfile.mkdtemp(prefix="scd2-state-")
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    table_path = os.path.join(work, "dim_client_versions")
    try:
        stage_and_swap_write(seed, table_path)
        assigned: dict[str, int] = {}
        for i, (eff, mod, seg) in enumerate(_SCD2_WAVES):
            wave = customer.where(F.col("c_custkey") % mod == 0).select(
                F.col("c_custkey").alias("client_id"),
                F.lit(seg).alias("segment"),
                F.lit(eff).alias("effective_date"),
            )
            wave.coalesce(1).write.mode("append").parquet(staged)
            # Distinct, increasing mtimes pin the file source's oldest-
            # first ordering (same-second writes would tie-break on
            # path, which the uuid part scrambles). Only files new in
            # this iteration get this wave's timestamp.
            for f in os.listdir(staged):
                fp = os.path.join(staged, f)
                if fp not in assigned:
                    assigned[fp] = 1_600_000_000 + i
                    os.utime(fp, (assigned[fp], assigned[fp]))

        stream = (
            spark.readStream.schema(
                "client_id long, segment string, effective_date string"
            )
            .option("maxFilesPerTrigger", files_per_trigger)
            .option("latestFirst", "false")
            .parquet(staged)
        )

        def ingest(batch_df: DataFrame, _batch_id: int) -> None:
            batch_df = batch_df.persist()
            effs = sorted(
                r["effective_date"]
                for r in batch_df.select("effective_date").distinct().collect()
            )
            state = spark.read.parquet(table_path)
            for e in effs:
                state = scd2_apply(
                    state,
                    batch_df.where(F.col("effective_date") == e),
                    key="client_id",
                    tracked=["segment"],
                )
            stage_and_swap_write(state, table_path)
            batch_df.unpersist()

        name = f"stream_scd2_{uuid.uuid4().hex[:8]}"
        with _sized_state(spark):
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(ingest)
                .queryName(name)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return (
            spark.read.parquet(table_path)
            .localCheckpoint(eager=True)
            .orderBy("client_id", "valid_from")
        )
    finally:
        for d in (staged, work, checkpoint):
            shutil.rmtree(d, ignore_errors=True)


def q_stream_scd2_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_scd2_maintenance(spark, sf_dir)


def _oracle_stream_scd2() -> str:
    from ..plans.scd import OPEN_END

    def step(src: str, mod: int, seg: str, eff: str) -> str:
        live_changed = (
            f"valid_to = '{OPEN_END}' AND client_id % {mod} = 0"
            f" AND segment <> '{seg}'"
        )
        return f"""
  SELECT client_id, nom_client, segment, valid_from, valid_to FROM {src}
  WHERE NOT ({live_changed})
  UNION ALL
  SELECT client_id, nom_client, segment, valid_from, '{eff}' FROM {src}
  WHERE {live_changed}
  UNION ALL
  SELECT client_id, nom_client, '{seg}', '{eff}', '{OPEN_END}' FROM {src}
  WHERE {live_changed}
"""

    ctes = [
        f"""v0 AS (
  SELECT c_custkey AS client_id, c_name AS nom_client,
         c_mktsegment AS segment,
         '1992-01-01' AS valid_from, '{OPEN_END}' AS valid_to
  FROM customer
)"""
    ]
    for i, (eff, mod, seg) in enumerate(_SCD2_WAVES):
        ctes.append(f"v{i + 1} AS ({step(f'v{i}', mod, seg, eff)})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT client_id, nom_client, segment, valid_from, valid_to
FROM v{len(_SCD2_WAVES)}
ORDER BY client_id, valid_from
"""
    )


def stream_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min maintenance — the frequency twin of
    :func:`stream_hll_daily_users`: per-user event counts a stream
    cannot afford to keep exactly (exact per-key state grows with the
    key universe) maintained as the CONSTANT d×w = 1024-row CMS
    counter table, whose merge is the built-in SUM aggregate — no
    custom state operator, no applyInPandasWithState.

    The rho-projection analog is a stateless d-way band projection in
    the scan; the only stateful op is groupBy(j, bucket).count() in
    complete mode. The report side (top-20 exact keys probed against
    the final counters, min over rows) runs batch-side on the 1024-row
    result — ``n_exact`` comes from a batch read, the quality
    yardstick the stream itself could not afford. The final counter
    table equals the batch build exactly (SUM is order-independent),
    so the oracle is the SAME sketch replay as the batch entry.
    """
    from ..operators.dedup import h60
    from ..operators.sketches import _CMS_D, _CMS_SALT, _CMS_TOPK, _CMS_W

    events = _read_events_stream(spark, sf_dir).filter(F.col("user_id").isNotNull())
    proj = events.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            h60(
                                F.concat(
                                    F.lit(f"{_CMS_SALT}:{j}:"),
                                    F.col("user_id").cast("string"),
                                )
                            ),
                            F.lit(_CMS_W),
                        ).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("x")
    ).select(F.col("x.j").alias("j"), F.col("x.bucket").alias("bucket"))
    counters_stream = proj.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    name = f"stream_cms_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    try:
        with _sized_state(spark):
            q = (
                counters_stream.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        counters = spark.table(name)
        ev = (
            read_table(spark, sf_dir, "events")
            .where(F.col("user_id").isNotNull())
            .select("user_id")
        )
        top = (
            ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
            .orderBy(F.desc("n_exact"), F.asc("user_id"))
            .limit(_CMS_TOPK)
        )
        probes = top.select(
            "user_id",
            "n_exact",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.pmod(
                                h60(
                                    F.concat(
                                        F.lit(f"{_CMS_SALT}:{j}:"),
                                        F.col("user_id").cast("string"),
                                    )
                                ),
                                F.lit(_CMS_W),
                            ).alias("bucket"),
                        )
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("x"),
        ).select(
            "user_id",
            "n_exact",
            F.col("x.j").alias("j"),
            F.col("x.bucket").alias("bucket"),
        )
        return (
            probes.join(counters, ["j", "bucket"])
            .groupBy("user_id", "n_exact")
            .agg(F.min("c").cast("long").alias("n_cms"))
            .select(
                "user_id",
                "n_exact",
                "n_cms",
                (F.col("n_cms") - F.col("n_exact")).alias("overestimate"),
            )
            .localCheckpoint(eager=True)
            .orderBy(F.desc("n_exact"), F.asc("user_id"))
        )
    finally:
        shutil.rmtree(checkpoint, ignore_errors=True)


def q_stream_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_cms_user_counts(spark, sf_dir)


def _oracle_stream_cms() -> str:
    from ..operators.sketches import _oracle_cms

    return _oracle_cms()


def stream_decontamination(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    files_per_trigger: int = 2,
) -> DataFrame:
    """Continuous crawl decontamination — the streaming twin of
    dedup_decontamination_containment (round-14): train documents
    arrive as micro-batches and are probed against a STATIC holdout
    window-hash index, the production shape where incoming crawl data
    is screened against evaluation benchmarks BEFORE it enters the
    corpus, instead of decontaminating after the fact.

    The holdout index — DISTINCT (test_doc, 60-bit window hash) plus
    per-doc window counts — is built once; benchmarks are small, so at
    any real scale it is broadcast-sized and the per-batch probe is a
    broadcast join against each batch's own window hashes: cost is
    bounded by the batch, the index never grows, and there is no
    corpus self-join anywhere.

    Every train document's windows land wholly inside its own batch
    and the holdout is static, so the flagged pair SET equals the
    batch operator's exactly — the streaming job is attested by the
    SAME value hash / oracle as dedup_decontamination_containment.
    Idempotent under at-least-once redelivery: re-processing a batch
    re-derives the identical pairs and the final read deduplicates on
    (train_doc, test_doc).
    """
    from ..functions.scalar import round_half_up
    from ..operators.dedup import _CONTAIN_T, _CONTAIN_W, _DECON_TEST_SOURCES
    from ..operators.segments import window_hashes
    from ..sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    is_test = F.col("source").isin(*_DECON_TEST_SOURCES)
    te = (
        window_hashes(docs.where(is_test), _CONTAIN_W)
        .select(F.col("doc_id").alias("test_doc"), "h")
        .distinct()
        .persist()
    )
    te_sz = te.groupBy("test_doc").agg(
        F.count(F.lit(1)).cast("long").alias("sz_te")
    )
    # NULL-source docs sit on neither side (matching the batch twin,
    # where a NULL is_test drops out of both posting sublists).
    train = docs.where(~is_test)
    staged = tempfile.mkdtemp(prefix="deconstream-")
    work = tempfile.mkdtemp(prefix="decon-stream-")
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    pairs_path = os.path.join(work, "pairs")
    try:
        # Round-17 (guide §2.6): pre-fill the static holdout index
        # while the train slices stage — disjoint inputs, and it moves
        # the te cache fill off the first micro-batch's critical path.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as tpool:
            te_fut = tpool.submit(te.count)
            _stage_slices(train, "doc_id", staged, n_slices)
        te_fut.result()

        stream = (
            spark.readStream.schema(train.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(staged)
        )

        def ingest(batch_df: DataFrame, _batch_id: int) -> None:
            b = (
                window_hashes(batch_df, _CONTAIN_W)
                .select(F.col("doc_id").alias("train_doc"), "h")
                .distinct()
            )
            inter = (
                b.join(te, "h")
                .groupBy("train_doc", "test_doc")
                .agg(F.count(F.lit(1)).cast("long").alias("inter"))
            )
            cont = round_half_up(
                F.col("inter").cast("double") / F.col("sz_te").cast("double"), 6
            )
            (
                inter.join(te_sz, "test_doc")
                .select("train_doc", "test_doc", cont.alias("containment"))
                .filter(F.col("containment") >= _CONTAIN_T)
                .write.mode("append")
                .parquet(pairs_path)
            )

        name = f"stream_decon_{uuid.uuid4().hex[:8]}"
        with _sized_state(spark):
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(ingest)
                .queryName(name)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        if not os.path.exists(pairs_path):
            return spark.createDataFrame(
                [], "train_doc long, test_doc long, containment double"
            )
        return (
            spark.read.parquet(pairs_path)
            .dropDuplicates(["train_doc", "test_doc"])
            .localCheckpoint(eager=True)
            .orderBy("train_doc", "test_doc")
        )
    finally:
        te.unpersist()
        for d in (staged, work, checkpoint):
            shutil.rmtree(d, ignore_errors=True)


def q_stream_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_decontamination(spark, sf_dir)


def stream_importance_weights(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    files_per_trigger: int = 2,
) -> DataFrame:
    """Ingest-time DSIR scoring — the streaming twin of
    corpus_importance_weights: documents arrive as micro-batches and
    are scored against a STATIC log-ratio model, the production shape
    where importance weights are stamped as data flows in (so
    selection can act at ingest) instead of re-scanning the corpus
    after the fact — the same static-index discipline as
    stream_decontamination.

    The model — the ≤4096-row (bucket, integer-scaled log-ratio)
    table from operators/dsir.log_ratio_table — is built once and
    broadcast into every batch's scoring join; per-batch cost is one
    feature explode + one broadcast join + one hash agg, bounded by
    the batch. Each document's features land wholly inside its own
    batch and the model is static, so the per-doc weights equal the
    batch operator's exactly — the streaming job is attested by the
    SAME oracle as corpus_importance_weights. Idempotent under
    at-least-once redelivery: re-processing a batch re-derives
    identical rows and the final read deduplicates on doc_id.
    """
    from ..operators.dsir import (
        _DSIR_TARGET_LANG,
        _feature_stream,
        log_ratio_table,
        score_against_model,
    )
    from ..sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    pred = F.col("lang") == _DSIR_TARGET_LANG
    staged = tempfile.mkdtemp(prefix="dsirstream-")
    work = tempfile.mkdtemp(prefix="dsir-stream-")
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    scored_path = os.path.join(work, "scored")
    lam = None
    try:
        # Round-17 (guide §2.6): the static model build (one full
        # feature-explode aggregation inside log_ratio_table) and the
        # slice staging are independent — overlap them; the model is
        # joined (materialized) before the stream starts.
        from concurrent.futures import ThreadPoolExecutor

        def _build_lam() -> DataFrame:
            table = log_ratio_table(_feature_stream(docs, pred)).persist()
            table.count()  # materialize the static model once
            return table

        with ThreadPoolExecutor(max_workers=1) as tpool:
            lam_fut = tpool.submit(_build_lam)
            _stage_slices(docs, "doc_id", staged, n_slices)
        lam = lam_fut.result()

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(staged)
        )

        def ingest(batch_df: DataFrame, _batch_id: int) -> None:
            occ = _feature_stream(batch_df, F.col("lang") == _DSIR_TARGET_LANG)
            score_against_model(occ, lam).write.mode("append").parquet(
                scored_path
            )

        name = f"stream_dsir_{uuid.uuid4().hex[:8]}"
        with _sized_state(spark):
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(ingest)
                .queryName(name)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return (
            spark.read.parquet(scored_path)
            .dropDuplicates(["doc_id"])
            .localCheckpoint(eager=True)
            .orderBy("doc_id")
        )
    finally:
        if lam is not None:
            lam.unpersist()
        for d in (staged, work, checkpoint):
            shutil.rmtree(d, ignore_errors=True)


def q_stream_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_importance_weights(spark, sf_dir)


def _oracle_stream_dsir() -> str:
    # Static model + batch-complete documents ⇒ per-doc weights equal
    # the batch operator's by construction; the oracle IS the batch
    # DSIR oracle.
    from ..operators.dsir import _oracle_importance_weights

    return _oracle_importance_weights()


def _oracle_stream_decon() -> str:
    # The streaming pair set equals the batch operator's by
    # construction (static holdout, per-batch-complete train windows),
    # so the oracle IS the batch containment oracle.
    from ..operators.dedup import _oracle_decon_containment

    return _oracle_decon_containment()


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    return spark.read.parquet(path) if os.path.exists(path) else None


# Round-16: the size-guarded driver union-find moved into
# operators/dedup.connected_components itself (shared by every batch
# clustering entry, not just this maintainer); the old jobs-local
# names stay as aliases for the equivalence tests.
from ..operators.dedup import _CC_LOCAL_EDGES as _LOCAL_CC_EDGES  # noqa: E402
from ..operators.dedup import local_components as _local_components  # noqa: E402


def _components_auto(spark: SparkSession, sub: DataFrame) -> DataFrame:
    """(doc_id, cluster_id) labels for an edge set: driver union-find
    under ``_LOCAL_CC_EDGES`` edges (one size-guarded limit+collect —
    fused, round-16, from the earlier count-then-collect pair), the
    distributed min-label loop beyond it; both paths now live inside
    connected_components."""
    from ..operators.dedup import connected_components

    return connected_components(sub, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def release_manifest_fold(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    te_hashes: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
) -> None:
    """ONE micro-batch of incremental release-manifest maintenance —
    the per-batch fold of :func:`stream_release_manifest`, split out so
    tests can drive it directly (redelivery, prefix equality).

    State tables under ``state_dir`` (grain in parentheses):

    - ``ledger`` (doc): enrichment computed ONCE per arriving doc —
      quality/lang (release._enriched), scrub stats vs the STATIC
      holdout window-hash set (decontamination_scrub's composition
      with the holdout half precomputed), token count of the cleaned
      text. Append-only; the raw text is never stored or re-scanned.
    - ``postings`` (shingle occurrence): the growing inverted index.
      Append-only. New pairs = batch postings ⨝ index on (block,
      shingle) + within-batch pairs — the batch×index collision
      discipline of stream_minhash_dedup, here with EXACT Jaccard
      (shared counts from the posting join, sizes from the postings)
      so the accumulated edge set equals the batch pair artifact's.
    - ``edges`` (near-dup pair): append-only.
    - ``clusters`` (clustered doc): membership labels, maintained
      INCREMENTALLY — only clusters touched by new edges are
      re-labelled (components run on the touched subgraph; untouched
      clusters keep their labels). Labels are min-member ids, a pure
      function of the final member set, so incremental maintenance
      converges to the batch labels whatever the batch boundaries.
    - ``survivors`` (release group): one row per dedup group carrying
      keeper id, weight, split, keeper facts, and the quality/lang
      verdict. Only groups whose member set changed are recomputed.
    - ``manifest`` (split × source): maintained by DELTA — removed
      group rows contribute negatively, recomputed ones positively;
      no corpus-scale scan happens after ingest. ``n_sequences`` is
      non-additive and derived at read time.

    Idempotent under at-least-once redelivery: arriving docs already
    present in the ledger are fenced out first, so a redelivered
    batch is a no-op (pytest-asserted).
    """
    from ..operators.dedup import (
        _CONTAIN_W,
        _build_postings,
        _jaccard_from_postings,
    )
    from ..operators.release import _REL_LANGS, _REL_MIN_QUALITY, _enriched
    from ..operators.sampling import _LEAK_SALT, _LEAK_WEIGHTS, deterministic_split
    from ..operators.segments import (
        remove_duplicated_spans,
        window_hashes,
        windows_to_spans,
    )
    from ..sources.sinks import stage_and_swap_write

    paths = {
        k: os.path.join(state_dir, k)
        for k in ("ledger", "postings", "edges", "clusters", "survivors", "manifest")
    }
    batch = batch_df.where(F.col("text").isNotNull())
    ledger_old = _read_or_none(spark, paths["ledger"])
    if ledger_old is not None:
        batch = batch.join(ledger_old.select("doc_id"), "doc_id", "left_anti")
    batch = batch.localCheckpoint(eager=True)
    if not batch.take(1):
        return

    # Pin every old-state file listing BEFORE any mutation starts
    # (spark.read.parquet lists files eagerly, so these frames read
    # exactly the pre-batch state even while appends/swaps to the same
    # paths run in the background below).
    oldpost = _read_or_none(spark, paths["postings"])
    clusters_old = _read_or_none(spark, paths["clusters"])
    edges_old = _read_or_none(spark, paths["edges"])
    surv_old = _read_or_none(spark, paths["survivors"])

    # 1. Per-doc enrichment, once at arrival (the only text scans).
    def _write_ledger() -> None:
        hits = (
            window_hashes(batch, _CONTAIN_W)
            .join(te_hashes, "h")
            .select("doc_id", "pos")
        )
        scrub = remove_duplicated_spans(
            batch, spans=windows_to_spans(hits, _CONTAIN_W)
        ).select("doc_id", "removed_chars", "cleaned_text")
        led_new = (
            _enriched(batch)
            .join(scrub, "doc_id")
            .select(
                "doc_id",
                "source",
                "quality_score",
                "lang_detected",
                F.col("removed_chars").cast("long").alias("removed_chars"),
                F.size(F.split(F.col("cleaned_text"), " "))
                .cast("long")
                .alias("n_tokens"),
            )
        )
        led_new.write.mode("append").parquet(paths["ledger"])

    # Round-17 restructure (advisor medium fix + guide §2.6/§1.2):
    #
    # - The ledger append is the batch's IDEMPOTENCY MARKER (the
    #   left_anti fence above). It is the FIRST state mutation again:
    #   led_fut is joined before ANY other state table is touched, so
    #   a mid-fold failure leaves the batch either fully unmarked or
    #   marked-before-mutation — never mutated-but-unmarked (which
    #   would double-append postings/edges on redelivery). Everything
    #   that mutates nothing — the postings/pair checkpoints, the
    #   take(1) probes, the touched-subgraph components, the
    #   clusters_new checkpoint and the aff/surv_old pins — runs
    #   UNDER the in-flight ledger write, so the fold's only text
    #   scans stay off the critical path without weakening the
    #   ordering guarantee.
    # - Once the marker is committed, the edges/postings appends and
    #   the clusters swap run in the background to the END of the
    #   fold: nothing later reads those paths (the touched subgraph is
    #   built from edges_old ∪ new_edges, and step 4 reads the
    #   checkpointed clusters_new, not the swapped files). All futures
    #   are joined in the finally block (advisor low fix: the worker
    #   is always joined and the pool shut down, even when a step
    #   raises, so no append can race stream teardown's rmtree).
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=5)
    pending: list = []
    errs: list = []
    try:
        led_fut = pool.submit(_write_ledger)
        pending.append(led_fut)
        pin_fut = (
            pool.submit(lambda: clusters_old.localCheckpoint(eager=True))
            if clusters_old is not None
            else None
        )
        if pin_fut is not None:
            pending.append(pin_fut)

        # 2. New near-dup pairs: within-batch + batch×index (pure
        # compute — overlaps the ledger write).
        newpost = _build_postings(batch, n).localCheckpoint(eager=True)
        pairs = _jaccard_from_postings(newpost, threshold=threshold)
        if oldpost is not None:
            o = oldpost.select(
                "block", "s", F.col("doc_id").alias("d_o"), F.col("sz").alias("sz_o")
            )
            nw = newpost.select(
                "block", "s", F.col("doc_id").alias("d_n"), F.col("sz").alias("sz_n")
            )
            inter = (
                o.join(nw, ["block", "s"])
                .groupBy("d_o", "d_n", "sz_o", "sz_n")
                .agg(F.count("*").alias("inter"))
            )
            jac = F.col("inter").cast("double") / (
                F.col("sz_o") + F.col("sz_n") - F.col("inter")
            )
            cross = (
                inter.select(
                    F.least("d_o", "d_n").alias("doc_a"),
                    F.greatest("d_o", "d_n").alias("doc_b"),
                    round_half_up(jac, 6).alias("jaccard"),
                )
                .filter(F.col("jaccard") >= threshold)
            )
            pairs = pairs.unionByName(cross)
        new_edges = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
        have_edges = bool(new_edges.take(1))
        if pin_fut is not None:
            clusters_old = pin_fut.result()

        # 3. Touched-cluster incremental components.
        if have_edges:
            ends = (
                new_edges.select(F.col("doc_a").alias("doc_id"))
                .unionByName(new_edges.select(F.col("doc_b").alias("doc_id")))
                .distinct()
            )
            if clusters_old is not None:
                touched = (
                    clusters_old.join(F.broadcast(ends), "doc_id")
                    .select("cluster_id")
                    .distinct()
                )
                touched_docs = (
                    clusters_old.join(F.broadcast(touched), "cluster_id")
                    .select("doc_id")
                    .unionByName(ends)
                    .distinct()
                )
                # Accumulated edge set WITHOUT reading the edges table
                # back: the pre-batch files ∪ this batch's checkpointed
                # edges — row-identical to the post-append read, and it
                # frees the append to run in the background.
                edges_all = (
                    edges_old.unionByName(new_edges)
                    if edges_old is not None
                    else new_edges
                )
                sub = edges_all.join(
                    F.broadcast(touched_docs.withColumnRenamed("doc_id", "doc_a")),
                    "doc_a",
                    "left_semi",
                )
            else:
                touched = None
                touched_docs = ends
                sub = new_edges
            comp = _components_auto(spark, sub)
            aff = touched_docs.unionByName(batch.select("doc_id")).distinct()
            # aff/surv_old pins are independent of clusters_new — run
            # them while the main thread checkpoints the new labels.
            f_aff = pool.submit(lambda: aff.localCheckpoint(eager=True))
            pending.append(f_aff)
            f_so = (
                pool.submit(lambda: surv_old.localCheckpoint(eager=True))
                if surv_old is not None
                else None
            )
            if f_so is not None:
                pending.append(f_so)
            if clusters_old is not None:
                clusters_new = clusters_old.join(
                    F.broadcast(touched), "cluster_id", "left_anti"
                ).unionByName(comp)
            else:
                clusters_new = comp
            clusters_new = clusters_new.localCheckpoint(eager=True)
        else:
            clusters_new = clusters_old
            aff = batch.select("doc_id")
            f_aff = pool.submit(lambda: aff.localCheckpoint(eager=True))
            pending.append(f_aff)
            f_so = (
                pool.submit(lambda: surv_old.localCheckpoint(eager=True))
                if surv_old is not None
                else None
            )
            if f_so is not None:
                pending.append(f_so)
        aff = f_aff.result()
        if f_so is not None:
            surv_old = f_so.result()

        # Ledger marker committed — every text-scan-free round above
        # overlapped the ledger write; only now may the other state
        # tables be mutated (advisor ordering), and all three
        # mutations run in the background to the fold's end (nothing
        # below reads their paths).
        led_fut.result()
        ledger = spark.read.parquet(paths["ledger"])
        pending.append(
            pool.submit(
                lambda: new_edges.write.mode("append").parquet(paths["edges"])
            )
        )
        pending.append(
            pool.submit(
                lambda: newpost.write.mode("append").parquet(paths["postings"])
            )
        )
        if have_edges:
            pending.append(
                pool.submit(stage_and_swap_write, clusters_new, paths["clusters"])
            )

        # 4. Recompute survivor rows for the affected groups only.
        if clusters_new is not None:
            old_group = (
                aff.join(
                    clusters_old
                    if clusters_old is not None
                    else spark.createDataFrame([], "doc_id long, cluster_id long"),
                    "doc_id",
                    "left",
                )
                .select(F.coalesce("cluster_id", F.col("doc_id")).alias("group_id"))
                .distinct()
            )
            aff_groups = (
                aff.join(clusters_new, "doc_id")
                .select("cluster_id")
                .distinct()
            )
            members = (
                clusters_new.join(F.broadcast(aff_groups), "cluster_id")
                .join(ledger.select("doc_id", "quality_score"), "doc_id")
            )
            # Round-17 (guide §2.4): group size and quality max come
            # from ONE aggregation over members (was two separate
            # aggregation passes joined back separately) — same rows,
            # same keeper argmax, one fewer shuffle+stage in the
            # per-batch fold. Mirrors the identical fusion in the
            # batch corpus_release.
            stats = members.groupBy("cluster_id").agg(
                F.count(F.lit(1)).cast("long").alias("weight"),
                F.max("quality_score").alias("__q_max"),
            )
            keepers = (
                members.join(F.broadcast(stats), "cluster_id")
                .where(F.col("quality_score") == F.col("__q_max"))
                .groupBy("cluster_id", "weight")
                .agg(F.min("doc_id").alias("doc_id"))
            )
            clustered = keepers.select(
                "doc_id", "weight", F.col("cluster_id").alias("group_id")
            )
            singleton_ids = aff.join(clusters_new, "doc_id", "left_anti")
        else:
            old_group = aff.select(F.col("doc_id").alias("group_id"))
            clustered = None
            singleton_ids = aff
        singles = singleton_ids.select(
            "doc_id",
            F.lit(1).cast("long").alias("weight"),
            F.col("doc_id").alias("group_id"),
        )
        new_surv = singles if clustered is None else clustered.unionByName(singles)
        new_rows = deterministic_split(
            new_surv.join(ledger, "doc_id"),
            ["group_id"],
            _LEAK_WEIGHTS,
            salt=_LEAK_SALT,
            portable=True,
        ).select(
            "group_id",
            "doc_id",
            "weight",
            "split",
            "source",
            "n_tokens",
            "removed_chars",
            (
                F.col("lang_detected").isin(list(_REL_LANGS))
                & (F.col("quality_score") >= _REL_MIN_QUALITY)
            ).alias("passes"),
        ).localCheckpoint(eager=True)

        removed = (
            surv_old.join(F.broadcast(old_group), "group_id")
            if surv_old is not None
            else None
        )
        surv_kept = (
            surv_old.join(F.broadcast(old_group), "group_id", "left_anti")
            if surv_old is not None
            else None
        )
        surv_all = (
            new_rows if surv_kept is None else surv_kept.unionByName(new_rows)
        )
        # 5. Manifest delta merge (removed rows negative, new positive).
        def _contrib(rows: DataFrame, sign: int) -> DataFrame:
            return rows.where("passes").select(
                "split",
                "source",
                F.lit(sign).cast("long").alias("n_docs"),
                (F.lit(sign) * F.col("weight")).cast("long").alias("sum_weight"),
                (F.lit(sign) * F.col("n_tokens")).cast("long").alias("total_tokens"),
                (F.lit(sign) * F.col("removed_chars"))
                .cast("long")
                .alias("removed_chars"),
            )

        delta = _contrib(new_rows, 1)
        if removed is not None:
            delta = delta.unionByName(_contrib(removed, -1))
        manifest_old = _read_or_none(spark, paths["manifest"])
        if manifest_old is not None:
            delta = delta.unionByName(manifest_old)
        manifest_new = delta.groupBy("split", "source").agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_weight").cast("long").alias("sum_weight"),
            F.sum("total_tokens").cast("long").alias("total_tokens"),
            F.sum("removed_chars").cast("long").alias("removed_chars"),
        )
        # Round-16 (guide §2.6): the survivors swap and the manifest swap
        # target different paths, and every input of the manifest delta
        # (new_rows, surv_old, aff, clusters_old) is CHECKPOINTED — the
        # manifest plan never reads the survivors table — so the two
        # stage-and-swap writes run together.
        pending.append(
            pool.submit(stage_and_swap_write, surv_all, paths["survivors"])
        )
        pending.append(
            pool.submit(stage_and_swap_write, manifest_new, paths["manifest"])
        )
    finally:
        # Join EVERY outstanding background future before returning
        # (or before the caller's teardown can rmtree the state dir);
        # errors are collected, never raised HERE — a raise in finally
        # would mask the fold's own exception. The pool is always shut
        # down, so no worker thread can race stream teardown.
        for f in pending:
            try:
                f.result()
            except Exception as exc:  # noqa: BLE001 — re-raised below
                errs.append(exc)
        pool.shutdown(wait=True)
    if errs:
        raise errs[0]


def read_release_manifest(
    spark: SparkSession, state_dir: str, seq_len: int = 512
) -> DataFrame:
    """The maintained manifest in the batch entry's exact shape:
    zero-count keys (groups that drained out of a (split, source)
    cell) are dropped, ``n_sequences`` derived from the running token
    total — non-additive, so it is computed at read, never folded.
    No-arrivals corpus (possible on degenerate inputs) reads as the
    empty manifest, matching the batch entry."""
    m = _read_or_none(spark, os.path.join(state_dir, "manifest"))
    if m is None:
        m = spark.createDataFrame(
            [],
            "split string, source string, n_docs long, sum_weight long,"
            " total_tokens long, removed_chars long",
        )
    return (
        m.where(F.col("n_docs") > 0)
        .withColumn(
            "n_sequences",
            F.expr(f"(total_tokens + {seq_len - 1}) div {seq_len}"),
        )
        .select(
            "split",
            "source",
            "n_docs",
            "sum_weight",
            "total_tokens",
            "removed_chars",
            "n_sequences",
        )
        .orderBy("split", "source")
    )


def stream_release_manifest(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    files_per_trigger: int = 2,
) -> DataFrame:
    """INCREMENTAL release-manifest maintenance — the streaming twin of
    the composed ``corpus_release`` chain: train documents arrive as
    micro-batches and a foreachBatch fold keeps the release manifest
    current, instead of re-running the whole detect→act pipeline from
    scratch per refresh (the reference's all-or-nothing refresh
    transaction — insertion_dataware.sql:1,197 — made continuous; at
    100 TB a pipeline re-releases incrementally or not at all).

    Static-before-stream (the discipline of stream_decontamination /
    stream_importance_weights): the benchmark holdout is known before
    ingestion starts, so its window-hash set is built once; everything
    train-side is incremental — see :func:`release_manifest_fold` for
    the per-batch state story. Every stage reuses its registered
    operator's exact spelling (shingles/postings/Jaccard rounding,
    quality/lang exprs, scrub composition, min-label components,
    quality-argmax keeper, portable group split), so after the last
    batch the maintained manifest equals the batch ``corpus_release``
    manifest bit-for-bit — attested by the SAME oracle, with per-batch
    prefix equality and redelivery idempotency pytest-asserted
    (tests/test_round16_ops.py).
    """
    from ..operators.dedup import _CONTAIN_W, _DECON_TEST_SOURCES
    from ..operators.segments import window_hashes
    from ..sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    test_pred = F.col("source").isin(*_DECON_TEST_SOURCES)
    te_hashes = (
        window_hashes(docs.where(test_pred), _CONTAIN_W)
        .select("h")
        .distinct()
        .persist()
    )
    train = docs.where(~test_pred)
    staged = tempfile.mkdtemp(prefix="relstream-")
    state_dir = tempfile.mkdtemp(prefix="rel-state-")
    checkpoint = tempfile.mkdtemp(prefix="ckpt-")
    try:
        # Round-17 (guide §2.6): the static holdout-hash
        # materialization and the train slice staging touch disjoint
        # document halves and no shared state — overlap them.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as tpool:
            te_fut = tpool.submit(te_hashes.count)
            _stage_slices(train, "doc_id", staged, n_slices)
        te_fut.result()  # holdout index materialized before any fold

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(staged)
        )

        def fold(batch_df: DataFrame, _batch_id: int) -> None:
            release_manifest_fold(spark, state_dir, batch_df, te_hashes)

        name = f"stream_rel_{uuid.uuid4().hex[:8]}"
        with _sized_state(spark):
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(fold)
                .queryName(name)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return read_release_manifest(spark, state_dir).localCheckpoint(
            eager=True
        )
    finally:
        te_hashes.unpersist()
        for d in (staged, state_dir, checkpoint):
            shutil.rmtree(d, ignore_errors=True)


def q_stream_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_release_manifest(spark, sf_dir)


def _oracle_stream_release() -> str:
    # Final maintained state = release over the full corpus (static
    # holdout, train-complete after the last batch), so the oracle IS
    # the batch corpus_release oracle.
    from ..operators.release import _oracle_corpus_release

    return _oracle_corpus_release()


QUERIES = {
    "stream_decontamination": q_stream_decontamination,
    "stream_importance_weights": q_stream_importance_weights,
    "stream_cms_user_counts": q_stream_cms_user_counts,
    "stream_hll_daily_users": q_stream_hll_daily_users,
    "stream_media_dedup": q_stream_media_dedup,
    "stream_scd2_maintenance": q_stream_scd2_maintenance,
    "stream_tumbling_hour": q_stream_tumbling_hour,
    "sessionize_events": q_sessionize_events,
    "stream_dedup_ingest": q_stream_dedup_ingest,
    "sessionize_builtin": q_sessionize_builtin,
    "stream_click_attribution": q_stream_click_attribution,
    "stream_enriched_profile": q_stream_enriched_profile,
    "stream_summary_maintenance": q_stream_summary_maintenance,
    "stream_sliding_hour": q_stream_sliding_hour,
    "stream_left_attribution": q_stream_left_attribution,
    "stream_minhash_dedup": q_stream_minhash_dedup,
    "stream_release_manifest": q_stream_release_manifest,
}

ORACLES = {
    "stream_decontamination": _oracle_stream_decon(),
    "stream_release_manifest": _oracle_stream_release(),
    "stream_importance_weights": _oracle_stream_dsir(),
    "stream_cms_user_counts": _oracle_stream_cms(),
    "stream_hll_daily_users": _oracle_stream_hll(),
    "stream_media_dedup": _oracle_stream_media(),
    "stream_scd2_maintenance": _oracle_stream_scd2(),
    "stream_tumbling_hour": ORACLE_STREAM_TUMBLING,
    "sessionize_events": ORACLE_SESSIONIZE,
    "stream_dedup_ingest": ORACLE_STREAM_DEDUP,
    "sessionize_builtin": ORACLE_SESSIONIZE_BUILTIN,
    "stream_click_attribution": ORACLE_STREAM_INTERVAL_JOIN,
    "stream_enriched_profile": ORACLE_STREAM_ENRICH,
    "stream_summary_maintenance": ORACLE_STREAM_SUMMARY,
    "stream_sliding_hour": ORACLE_STREAM_SLIDING,
    "stream_left_attribution": ORACLE_STREAM_LEFT_JOIN,
    "stream_minhash_dedup": _oracle_stream_minhash(),
}
