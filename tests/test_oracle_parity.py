"""Every registered operator with an oracle must hash-match DuckDB on
sf0.01 — a local replica of the driver's CORRECTNESS gate. Ops without
an oracle must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from claim_analysis_engine_spark.registry import registry
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duck_connection

REG = registry()
WITH_ORACLE = sorted(op_id for op_id, op in REG.items() if op.oracle)
NO_ORACLE = sorted(op_id for op_id, op in REG.items() if not op.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("op_id", WITH_ORACLE)
def test_oracle_parity(spark, duck, op_id):
    op = REG[op_id]
    df = op.query(spark, SF_ORACLE)
    ok, msg = compare(df, duck, op.oracle)
    assert ok, f"{op_id}: {msg}"


@pytest.mark.parametrize("op_id", NO_ORACLE)
def test_runs_rows_only(spark, op_id):
    op = REG[op_id]
    df = op.query(spark, SF_ORACLE)
    assert df.columns, f"{op_id}: no columns"
    df.limit(5).collect()  # must execute without error
