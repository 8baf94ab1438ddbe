"""Streaming summary maintenance (foreachBatch merge sink): the
multi-batch path must genuinely exercise the merge — late batches for
an already-written key UPDATE it — and a re-run must be idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table
from filmdb_data_warehouse___power_bi_dashboard_spark.streaming.jobs import (
    stream_summary_maintenance,
)


def _batch_expected(spark, src_dir):
    ev = read_table(spark, src_dir, "events")
    from filmdb_data_warehouse___power_bi_dashboard_spark.functions.scalar import (
        round_half_up,
    )

    return (
        ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("jour"), "event_type"
        )
        .agg(
            F.count("*").alias("nb_events"),
            round_half_up(F.sum("value"), 2).alias("total_value"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_multi_batch_merge_updates_late_keys(spark, sf_small, tmp_path):
    # Split events into several files so maxFilesPerTrigger=1 yields
    # multiple micro-batches; interleaved days force UPDATE emissions
    # for keys earlier batches already wrote.
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = read_table(spark, sf_small, "events")
    # Round-robin split: every file carries every day -> every batch
    # after the first updates existing (jour, event_type) keys.
    ev.repartition(4).write.mode("overwrite").parquet(os.path.join(src, "staging"))
    import glob, shutil

    for i, f in enumerate(
        sorted(glob.glob(os.path.join(src, "staging", "*.parquet")))
    ):
        shutil.copy(f, os.path.join(src, f"events_part{i}.parquet"))
    shutil.rmtree(os.path.join(src, "staging"))

    # Watermark sized to the redelivery horizon: round-robin files
    # mean every batch carries arbitrarily "late" days, so a short
    # watermark would (correctly) drop them — the test wants the
    # merge path, not the late-drop path.
    out = str(tmp_path / "out")
    result = stream_summary_maintenance(spark, src, out_dir=out, watermark="3650 days")
    # Same rows as sf_small's events table, just split across files.
    expected = _batch_expected(spark, sf_small)
    assert _rows(result.select(*expected.columns)) == _rows(expected)

    # Idempotent: a full re-run over the same input converges to the
    # same summary (merge keeps latest per key).
    result2 = stream_summary_maintenance(spark, src, out_dir=out, watermark="3650 days")
    assert _rows(result2.select(*expected.columns)) == _rows(expected)
