"""Registry-wide physical-plan invariant: Python appears ONLY in
Arrow-batched form (ArrowEvalPython / FlatMapGroupsInPandas /
MapInPandas). A BatchEvalPython node — the row-at-a-time Python UDF —
anywhere in any registered operator's plan is a hot-path bug: it
serializes row by row through pickle instead of Arrow batches and is
the single biggest self-inflicted slowdown a PySpark pipeline can ship.

Runs at sf0.001 so the ops that execute work when invoked (sink
round-trips, the k-means trainer) stay cheap; the assertion reads the
ANALYZED plan string, execution results are discarded.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from claim_analysis_engine_spark.registry import registry
from tests.conftest import SF_SMALL

REG = registry()
ALL_OPS = sorted(REG)


@pytest.mark.parametrize("op_id", ALL_OPS)
def test_no_row_at_a_time_python(spark, op_id):
    df = REG[op_id].query(spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan, (
        f"{op_id} ships a row-at-a-time Python UDF:\n{plan}"
    )
