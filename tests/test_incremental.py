"""Incremental summary maintenance (plans/etl.py): partition-level
refresh must equal a full rebuild, be idempotent, and leave unchanged
partitions untouched on disk."""

from __future__ import annotations

import os

from filmdb_data_warehouse___power_bi_dashboard_spark.plans.etl import (
    build_agg_mensuel_magasin,
    build_star_frames,
    refresh_summary_incremental,
    write_summary_partitioned,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _months(spark, sf_small):
    star = build_star_frames(spark, sf_small)
    months = [
        r["pay_month"]
        for r in star["fact_paiement"].select("pay_month").distinct().collect()
    ]
    months.sort()
    return star, months


def test_incremental_refresh_equals_full_rebuild(spark, sf_small, tmp_path):
    star, months = _months(spark, sf_small)
    dw = str(tmp_path / "dw")
    # Initial build is missing the last two months (late-arriving data).
    path = write_summary_partitioned(spark, sf_small, dw, months=months[:-2])
    partial = spark.read.parquet(path)
    assert partial.select("mois").distinct().count() == len(months) - 2

    # The late batch arrives: refresh only its months.
    refresh_summary_incremental(spark, sf_small, dw, changed_months=months[-2:])
    refreshed = spark.read.parquet(path)
    full = build_agg_mensuel_magasin(star)
    assert _rows(refreshed.select(*full.columns)) == _rows(full)


def test_incremental_refresh_is_idempotent_and_partition_scoped(
    spark, sf_small, tmp_path
):
    star, months = _months(spark, sf_small)
    dw = str(tmp_path / "dw")
    path = write_summary_partitioned(spark, sf_small, dw)

    # Fingerprint the untouched partitions' files before the refresh.
    untouched = {}
    for d in os.listdir(path):
        if d.startswith("mois=") and not d.endswith(tuple(m + "-01" for m in months[-1:])):
            pdir = os.path.join(path, d)
            untouched[d] = sorted(
                (f, os.path.getmtime(os.path.join(pdir, f)))
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )

    refresh_summary_incremental(spark, sf_small, dw, changed_months=[months[-1]])
    refresh_summary_incremental(spark, sf_small, dw, changed_months=[months[-1]])

    # Dynamic overwrite replaced only the changed month's partition.
    for d, before in untouched.items():
        pdir = os.path.join(path, d)
        after = sorted(
            (f, os.path.getmtime(os.path.join(pdir, f)))
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
        assert after == before, f"unchanged partition {d} was rewritten"

    full = build_agg_mensuel_magasin(star)
    assert _rows(spark.read.parquet(path).select(*full.columns)) == _rows(full)
