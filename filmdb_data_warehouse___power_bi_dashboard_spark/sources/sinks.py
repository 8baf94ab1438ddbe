"""Sinks: idempotent merge/upsert and transactional table swap.

Replicates the reference ETL's write semantics on Spark:

- ``merge_upsert``  — `INSERT ... ON CONFLICT (business_key) DO
  UPDATE / DO NOTHING` (sql/datawarehouse/insertion_dataware.sql:37,
  47-48, 73-80, 100-104, 138-143, 186-192) as a join-based merge.
  Delta's `MERGE INTO` would be the managed-table spelling; the jars
  aren't in this image, so the join rewrite is the portable path and
  produces identical results.
- ``stage_and_swap_write`` — the reference wraps the whole refresh in
  one transaction (insertion_dataware.sql:1,197); the Spark analog is
  write-to-staging + atomic directory rename (SURVEY.md §4 X11).

Scale notes: the merge join runs on the business key — at 100 TB the
existing side is large but the incoming batch is typically small, so
we broadcast the incoming side when it fits; otherwise both sides
hash-shuffle on the key once and AQE handles skew.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    existing: DataFrame | None,
    incoming: DataFrame,
    business_key: str | list[str],
    do_update: bool = True,
) -> DataFrame:
    """Merge ``incoming`` into ``existing`` on a unique business key.

    do_update=True  → ON CONFLICT DO UPDATE (incoming wins per key)
    do_update=False → ON CONFLICT DO NOTHING (existing wins; insert-if-absent)

    ``incoming`` must be unique on the key (the reference guarantees
    this with unique indexes — insertion_dataware.sql:13-17); callers
    dedupe first.
    """
    keys = [business_key] if isinstance(business_key, str) else list(business_key)
    if existing is None:
        return incoming
    if do_update:
        kept = existing.join(incoming.select(*keys), on=keys, how="left_anti")
        return kept.unionByName(incoming)
    new_rows = incoming.join(existing.select(*keys), on=keys, how="left_anti")
    return existing.unionByName(new_rows)


def stage_and_swap_write(
    df: DataFrame,
    final_path: str,
    partition_by: list[str] | None = None,
) -> None:
    """Write parquet to a staging dir, then swap into place.

    All-or-nothing like the reference's single-transaction refresh:
    the data is fully written before the live path changes, and a
    failure during the swap restores the previous table from backup.

    LOCAL-FS ONLY: the swap uses POSIX ``os.rename``. On HDFS/S3 the
    transactional analog is a metastore pointer swap or a table format
    with commit semantics (Delta/Iceberg) — this sandbox has neither,
    and the rest of the engine never assumes this sink's atomicity.
    """
    parent = os.path.dirname(final_path.rstrip("/"))
    staging = os.path.join(parent, f".staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    backup = final_path.rstrip("/") + ".old"
    if os.path.exists(backup):
        shutil.rmtree(backup)
    had_previous = os.path.exists(final_path)
    if had_previous:
        os.rename(final_path, backup)
    try:
        os.rename(staging, final_path)
    except BaseException:
        # Restore the previous table so readers never see a void.
        if had_previous and not os.path.exists(final_path):
            os.rename(backup, final_path)
        raise
    if os.path.exists(backup):
        shutil.rmtree(backup)


def read_warehouse_table(spark: SparkSession, dw_root: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(dw_root, name))
