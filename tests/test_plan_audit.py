"""Fleet-wide physical-plan audit over EVERY registered batch query.

The per-query plan tests pin specific shapes; this sweep enforces the
engine-wide scale invariants on all of them at once, so a new query
cannot quietly reintroduce a 100 TB scale-killer:

- no ``BatchEvalPython`` (row-at-a-time pickled Python UDF) anywhere —
  Python is allowed only Arrow-batched (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas*);
- no ``CartesianProduct`` — unbounded pair blowup (broadcast
  nested-loop joins of bounded sides are fine and appear as
  BroadcastNestedLoopJoin).

Streaming drains are excluded (calling them executes a streaming job;
their transformations are the batch twins audited here).
"""

from __future__ import annotations

import pytest

from aws_saas_etl_spark import registry
from tests.conftest import SF_SMOKE

_BATCH_QUERIES = sorted(
    name for name in registry.queries() if not name.startswith("stream_")
)


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_scale_killers_in_plan(spark, name):
    df = registry.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
