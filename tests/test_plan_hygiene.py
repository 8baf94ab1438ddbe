"""Plan-hygiene gate over the ENTIRE registry: structural red flags
that would sink a 100 TB run must never appear in any executed plan.

Hard zeros (round-8 sweep confirmed both hold across all 156 plans):

- ``CartesianProduct`` — an unbroadcast cross join is quadratic
  shuffle; every intentional cross join in this repo broadcasts a
  1-row/limit-bounded side and therefore plans as
  BroadcastNestedLoopJoin instead.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in any hot path;
  the repo's Python surface is Arrow-batched (ArrowEvalPython /
  mapInPandas / applyInPandas) exclusively.

BroadcastNestedLoopJoin and Exchange SinglePartition are deliberately
NOT gated: they appear only as the documented bounded patterns (1-row
scalar broadcasts; global/two-phase aggregates and bounded-domain
windows), and an exact-name allowlist would be brittle without adding
safety.
"""

from __future__ import annotations

import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.queries import registry
from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import release_persisted

_REG = registry()


@pytest.mark.parametrize("name", sorted(_REG))
def test_plan_has_no_scale_killers(spark, sf_small, name):
    plan = _REG[name](spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    release_persisted()
    assert "CartesianProduct" not in plan, f"{name}: unbroadcast cross join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
