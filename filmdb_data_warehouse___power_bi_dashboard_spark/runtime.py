"""Session-lifetime bookkeeping for intentional ``persist()`` calls.

Some operators MUST persist an intermediate (range-partitioned ranking
inputs: the sampled partition boundaries have to stay aligned with the
driver-side offsets; LSH banded frames: both sides of a self-join read
them). Nothing used to unpersist those blocks, so long sessions
(bench, metrics dashboards) accumulated MEMORY_AND_DISK cache until
eviction pressure cost more than the persists saved.

Every such persist is registered here; callers that know a result has
been FULLY materialized (a bench loop between queries, a test teardown)
call :func:`release_persisted`.

Every tracked persist is a pure PERFORMANCE pin: results must not
change when a block is dropped and its lineage recomputed. (The old
``global_row_number`` violated this — its collected offsets were only
valid for one sampling of ``repartitionByRange`` boundaries, so a
release + recompute silently corrupted surrogate keys. It is now
deterministic by construction: hash-sampled boundaries, no cache
dependence.) The memoized star cache (plans.etl.build_star_frames) is
deliberately NOT tracked — its persist is a cross-query feature, not a
leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Register an intentionally persisted frame for later release."""
    _LIVE.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = 0
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:
            pass
        n += 1
    return n
