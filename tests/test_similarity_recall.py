"""ANN quality checks: LSH and IVF top-k measured against the exact
brute-force baseline (recall@k), on the same deterministic query set."""

from __future__ import annotations

import pytest

from claim_analysis_engine_spark.operators.similarity import (
    ANN_K,
    sim_ann_lsh,
    sim_ivf,
    sim_topk_brute,
)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def truth(spark):
    rows = sim_topk_brute(spark, SF_ORACLE).collect()
    return {(r.query_id, r.neighbor_id) for r in rows if r.rank <= ANN_K}


def _recall(found, truth):
    return len(found & truth) / len(truth)


def test_lsh_ann_returns_ranked_neighbors(spark, truth):
    rows = sim_ann_lsh(spark, SF_ORACLE).collect()
    found = {(r.query_id, r.neighbor_id) for r in rows}
    assert rows, "LSH ANN returned no candidates"
    # random hyperplanes on weakly-clustered vectors: assert a loose
    # floor, report the number for the bench narrative
    assert _recall(found, truth) >= 0.2


def test_ivf_returns_ranked_neighbors(spark, truth):
    rows = sim_ivf(spark, SF_ORACLE).collect()
    found = {(r.query_id, r.neighbor_id) for r in rows}
    assert rows, "IVF returned no candidates"
    assert _recall(found, truth) >= 0.2
