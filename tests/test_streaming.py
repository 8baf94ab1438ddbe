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


def test_session_durations_nonnegative_and_gap_bounded(spark, sf_small):
    events = read_table(spark, sf_small, "events")
    rows = sessionize_batch(events, gap_minutes=30).collect()
    assert rows
    for r in rows:
        assert r["duration_sec"] >= 0
        assert r["session_start"] <= r["session_end"]
