"""Query registry: every implemented operator family from SURVEY.md §2
exposed as (spark, sf_dir) -> DataFrame, each paired with an ANSI-SQL
oracle string for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import corpus

QueryFn = Callable[[SparkSession, str], DataFrame]


def registry() -> dict[str, QueryFn]:
    reg: dict[str, QueryFn] = {}
    reg.update(corpus.QUERIES)
    from ..operators import QUERIES as OP_QUERIES

    reg.update(OP_QUERIES)
    from ..plans.etl import QUERIES as ETL_QUERIES

    reg.update(ETL_QUERIES)
    from ..plans.metrics import QUERIES as METRIC_QUERIES

    reg.update(METRIC_QUERIES)
    from ..plans.views import QUERIES as VIEW_QUERIES

    reg.update(VIEW_QUERIES)
    from ..streaming.jobs import QUERIES as STREAM_QUERIES

    reg.update(STREAM_QUERIES)
    return reg


def oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(corpus.ORACLES)
    from ..operators import ORACLES as OP_ORACLES

    out.update(OP_ORACLES)
    from ..plans.etl import ORACLES as ETL_ORACLES

    out.update(ETL_ORACLES)
    from ..plans.metrics import ORACLES as METRIC_ORACLES

    out.update(METRIC_ORACLES)
    from ..plans.views import ORACLES as VIEW_ORACLES

    out.update(VIEW_ORACLES)
    from ..streaming.jobs import ORACLES as STREAM_ORACLES

    out.update(STREAM_ORACLES)
    return out
