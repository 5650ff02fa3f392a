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


def test_ivf_train_deterministic_and_improves_quantizer(spark):
    """Lloyd iterations are deterministic (no RNG anywhere) and the
    trained quantizer must not be worse than the untrained one: mean
    within-cell cosine (weighted by members) >= the seed-vector
    assignment that sim_ivf uses."""
    from claim_analysis_engine_spark.operators.similarity import (
        N_CELLS,
        _cos,
        sim_ivf_train,
    )
    from claim_analysis_engine_spark.tables import load
    from pyspark.sql import functions as F

    r1 = {(r.cell_id, r.n_members, r.mean_within_cos)
          for r in sim_ivf_train(spark, SF_ORACLE).collect()}
    r2 = {(r.cell_id, r.n_members, r.mean_within_cos)
          for r in sim_ivf_train(spark, SF_ORACLE).collect()}
    assert r1 == r2  # bit-stable across runs
    emb = load(spark, SF_ORACLE, "embeddings")
    n = emb.count()
    assert sum(m for _, m, _ in r1) == n  # every vector lands in a cell

    trained = sum(m * c for _, m, c in r1) / n

    # untrained baseline: assign to nearest of the 8 seed vectors
    cent = emb.where(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("ecent")
    )
    from pyspark.sql import Window as W

    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", _cos("embedding", "ecent").alias("cos"),
                F.row_number().over(
                    W.partitionBy("vec_id").orderBy(
                        F.round(_cos("embedding", "ecent"), 6).desc(), "cell_id")
                ).alias("rk"))
        .where("rk = 1")
    )
    baseline = assign.agg(F.avg("cos")).first()[0]
    assert trained >= baseline - 1e-6, f"trained {trained} < baseline {baseline}"
