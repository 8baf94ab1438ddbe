"""Streaming layer: bounded streams must reproduce batch answers
(tumbling agg vs GROUP BY; stateful sessionization vs window-function
sessionization)."""

from __future__ import annotations

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table
from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
    sessionize_batch,
    sessionize_stream,
    stream_tumbling_agg,
    stream_tumbling_to_parquet,
)


def test_tumbling_stream_equals_batch(spark, sf_small):
    stream = {
        (r["window_start"], r["event_type"]): (r["nb_events"], r["total_value"])
        for r in stream_tumbling_agg(spark, sf_small).collect()
    }
    events = read_table(spark, sf_small, "events")
    batch = {
        (r["h"], r["event_type"]): (r["nb"], float(r["tv"]))
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count("*").alias("nb"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(stream) == set(batch)
    for k, (nb, tv) in stream.items():
        assert nb == batch[k][0]
        assert abs(tv - batch[k][1]) < 0.02


def test_parquet_sink_emits_watermark_finalized_windows(spark, sf_small, tmp_path):
    """Production shape (append mode + parquet sink): on bounded
    input, exactly the windows whose END the final watermark passed
    are written — equal to the batch GROUP BY restricted to those
    windows; trailing windows stay in state (append-mode semantics,
    documented on the writer)."""
    out = str(tmp_path / "agg_parquet")
    got = {
        (r["window_start"], r["event_type"]): (r["nb_events"], r["total_value"])
        for r in stream_tumbling_to_parquet(spark, sf_small, out).collect()
    }
    events = read_table(spark, sf_small, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = {
        (r["h"], r["event_type"]): (r["nb"], r["tv"])
        for r in events.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count("*").alias("nb"),
            F.floor(F.sum("value") * 100.0 + 0.5).cast("double").alias("tv_raw"),
        )
        .withColumn("tv", F.col("tv_raw") / 100.0)
        .drop("tv_raw")
        .collect()
    }
    import datetime

    watermark = max_ts - datetime.timedelta(hours=1)
    finalized = {
        k: v for k, v in batch.items() if k[0] + datetime.timedelta(hours=1) <= watermark
    }
    assert got, "parquet sink wrote nothing"
    assert got == finalized


def test_stream_dedup_drops_redelivered_file(spark, sf_small, tmp_path):
    """At-least-once redelivery: the SAME events file arriving twice
    (two micro-batches) must add zero rows to the deduped sink — every
    replayed event is dropped either by dedup state (inside the
    watermark horizon) or as late data (behind it). The summary must
    equal the single-copy batch GROUP BY."""
    import os
    import shutil

    src = f"{sf_small}/events.parquet"
    a, b = str(tmp_path / "events-a.parquet"), str(tmp_path / "events-b.parquet")
    shutil.copy(src, a)
    shutil.copy(src, b)
    now = 1_700_000_000
    os.utime(a, (now, now))
    os.utime(b, (now + 100, now + 100))

    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        stream_dedup_ingest,
    )

    got = {
        r["event_type"]: (r["nb_events"], r["total_value"])
        for r in stream_dedup_ingest(spark, str(tmp_path)).collect()
    }
    events = read_table(spark, sf_small, "events")
    want = {
        r["event_type"]: (r["nb"], r["tv"])
        for r in events.groupBy("event_type")
        .agg(
            F.count("*").alias("nb"),
            (F.floor(F.sum("value") * 100.0 + 0.5).cast("double") / 100.0).alias("tv"),
        )
        .collect()
    }
    assert got == want


def test_sessionize_builtin_equals_custom(spark, sf_small):
    """Three spellings of the same operator must agree: the built-in
    session_window aggregation vs the LAG-window batch sessionizer
    (modulo the ordinal session_no, which only the custom one has)."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        sessionize_builtin,
    )

    events = read_table(spark, sf_small, "events")
    builtin = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["nb_events"], r["total_value"], r["duration_sec"]
        )
        for r in sessionize_builtin(events).collect()
    }
    custom = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["nb_events"], r["total_value"], r["duration_sec"]
        )
        for r in sessionize_batch(events).collect()
    }
    assert builtin == custom


def test_sessionize_stream_equals_batch(spark, sf_small):
    events = read_table(spark, sf_small, "events")
    batch = {
        (r["user_id"], r["session_no"]): (
            r["session_start"],
            r["session_end"],
            r["nb_events"],
            r["duration_sec"],
        )
        for r in sessionize_batch(events).collect()
    }
    stream = {
        (r["user_id"], r["session_no"]): (
            r["session_start"],
            r["session_end"],
            r["nb_events"],
            r["duration_sec"],
        )
        for r in sessionize_stream(spark, sf_small).collect()
    }
    assert set(stream) == set(batch), (
        f"session keys differ: only-batch={sorted(set(batch)-set(stream))[:3]} "
        f"only-stream={sorted(set(stream)-set(batch))[:3]}"
    )
    mismatches = [
        (k, batch[k], stream[k]) for k in batch if batch[k] != stream[k]
    ]
    assert not mismatches, f"first mismatches: {mismatches[:3]}"


def test_sessionize_stream_multi_batch_no_duplicates(spark, sf_small, tmp_path):
    """Input split across TWO files (= two micro-batches under
    maxFilesPerTrigger=1): sessions spanning the file boundary are
    flushed in batch 1 as open snapshots and extended/closed in batch
    2 — the consolidated output must contain exactly one row per
    session and equal the batch answer."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # Read with whatever schema the runtime decodes (the stream reader
    # footer-probes the written files the same way).
    raw = spark.read.parquet(f"{sf_small}/events.parquet")
    pdf = raw.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    # pandas round-trips timestamps as ns; write back as µs — Spark 4.x
    # refuses TIMESTAMP(NANOS) parquet outright.
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    mid = len(pdf) // 2
    a, b = str(tmp_path / "events-a.parquet"), str(tmp_path / "events-b.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:mid], preserve_index=False), a)
    pq.write_table(pa.Table.from_pandas(pdf.iloc[mid:], preserve_index=False), b)
    # The file source orders batches by modification time: process the
    # earlier half first so state extension is exercised, not disorder.
    now = 1_700_000_000
    os.utime(a, (now, now))
    os.utime(b, (now + 100, now + 100))

    rows = sessionize_stream(spark, str(tmp_path)).collect()
    keys = [(r["user_id"], r["session_no"]) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate session snapshots leaked"

    events = read_table(spark, sf_small, "events")
    batch = {
        (r["user_id"], r["session_no"]): (
            r["session_start"], r["session_end"], r["nb_events"],
            r["total_value"], r["duration_sec"],
        )
        for r in sessionize_batch(events).collect()
    }
    stream = {
        (r["user_id"], r["session_no"]): (
            r["session_start"], r["session_end"], r["nb_events"],
            r["total_value"], r["duration_sec"],
        )
        for r in rows
    }
    assert stream == batch


def test_session_durations_nonnegative_and_gap_bounded(spark, sf_small):
    events = read_table(spark, sf_small, "events")
    rows = sessionize_batch(events, gap_minutes=30).collect()
    assert rows
    for r in rows:
        assert r["duration_sec"] >= 0
        assert r["session_start"] <= r["session_end"]


def test_stream_interval_join_multi_batch_matches_batch(spark, sf_small, tmp_path):
    """Input split across TWO files (two micro-batches under
    maxFilesPerTrigger=1): purchases arriving in batch 2 must still
    match clicks from batch 1 held in the join state store — the
    consolidated append output must equal the batch interval join."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
        stream_interval_join,
    )

    raw = spark.read.parquet(f"{sf_small}/events.parquet")
    pdf = raw.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    mid = len(pdf) // 2
    a, b = str(tmp_path / "events-a.parquet"), str(tmp_path / "events-b.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:mid], preserve_index=False), a)
    pq.write_table(pa.Table.from_pandas(pdf.iloc[mid:], preserve_index=False), b)
    now = 1_700_000_000
    os.utime(a, (now, now))
    os.utime(b, (now + 100, now + 100))

    streamed = {
        (r["purchase_id"], r["click_id"])
        for r in stream_interval_join(spark, str(tmp_path)).collect()
    }
    batch = {
        (p["event_id"], c["event_id"])
        for p in raw.where("event_type = 'purchase'").collect()
        for c in raw.where("event_type = 'click'").collect()
        if p["user_id"] == c["user_id"]
        and 0 <= (p["ts"] - c["ts"]).total_seconds() <= 1800
    }
    assert streamed == batch
    assert len(streamed) > 0
