"""The relational decision tree must agree row-for-row with the numpy
engine behind rs_wrapper — two independent implementations of
reference core/analytics.py:214-426, one in Column math, one in Python."""

from __future__ import annotations

import pytest

from claim_analysis_engine_spark.operators.risk import rs_wrapper
from claim_analysis_engine_spark.operators.risk_tree import rs_tree_relational
from tests.conftest import SF_ORACLE, SF_SMALL


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_tree_matches_numpy_engine(spark, sf_dir):
    rel = {
        (r.status, r.priority): (r.grade, r.risk_status, r.score, r.reason)
        for r in rs_tree_relational(spark, sf_dir).collect()
    }
    ref = {
        (r.status, r.priority): (r.grade, r.risk_status, r.score, r.reason)
        for r in rs_wrapper(spark, sf_dir).collect()
    }
    assert rel.keys() == ref.keys()
    diffs = {k: (rel[k], ref[k]) for k in ref if rel[k] != ref[k]}
    assert not diffs, f"tree vs engine mismatches: {diffs}"
