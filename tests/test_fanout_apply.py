"""tables.fanout_apply contract: identical results to the naive
groupBy().applyInPandas it replaces, actually parallel (the naive form
serializes into one AQE-coalesced partition — the bug it exists to
fix), and faithful reconstruction of the group frame (values, key
columns, dtype-sensitive fields like dates).

The group function is defined INSIDE each test: a module-level def
would pickle by module reference, which Spark's workers cannot import
(the tests package is not on their path); closures serialize by value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from claim_analysis_engine_spark.operators.risk import _series
from claim_analysis_engine_spark.tables import fanout_apply
from tests.conftest import SF_ORACLE

SCHEMA = "status string, priority string, n_months int, total bigint, first_month string"


def _make_run():
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("month")
        return pd.DataFrame(
            {
                "status": [g["status"].iloc[0]],
                "priority": [g["priority"].iloc[0]],
                "n_months": [len(g)],
                "total": [int(g["n"].sum())],
                # date-typed column must survive the struct round trip
                "first_month": [str(g["month"].iloc[0])],
            }
        )

    return run


def test_fanout_apply_matches_applyinpandas(spark):
    s = _series(spark, SF_ORACLE)
    run = _make_run()
    naive = {
        tuple(r)
        for r in s.groupBy("status", "priority")
        .applyInPandas(run, SCHEMA)
        .collect()
    }
    fanned = {
        tuple(r)
        for r in fanout_apply(s, ["status", "priority"], run, SCHEMA).collect()
    }
    assert fanned == naive
    assert len(fanned) == 15  # every series produced exactly one row


def test_fanout_apply_actually_parallelizes(spark):
    """The group-function stage must run in >1 partition — the naive
    form collapses to one (AQE coalesces the tiny shuffle; this Spark
    also coalesces explicit hash repartitions, which is why the helper
    uses pack + round-robin)."""
    s = _series(spark, SF_ORACLE)
    out = fanout_apply(s, ["status", "priority"], _make_run(), SCHEMA).withColumn(
        "pid", F.spark_partition_id()
    )
    pids = {r.pid for r in out.select("pid").collect()}
    assert len(pids) > 1, "fanout_apply ran in a single partition"
