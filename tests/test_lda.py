"""LDA family: planted-topic separation on a disjoint-vocabulary
corpus, structural contract sensitivity, and the measured
nondeterminism note that keeps the ops rows-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from claim_analysis_engine_spark.operators.similarity import (
    LDA_K,
    _lda_fit,
    ml_lda_topics,
)


import pytest


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory) -> str:
    """ONE planted corpus dir for the module: the LDA fit memo is
    keyed by (session, sf_dir), so the separation and report-shape
    tests share a single EM fit instead of paying it twice."""
    return _planted_corpus(spark, tmp_path_factory.mktemp("lda_corpus"))


def _planted_corpus(spark, tmp_path, with_empty_docs: bool = False) -> str:
    # 3 pools of 12 disjoint words; 30 docs of 24 words cycling their
    # pool (deterministic index arithmetic — no RNG)
    rows = []
    for d in range(30):
        pool = d % 3
        words = [f"t{pool}w{(d * 7 + j) % 12}" for j in range(24)]
        rows.append((d, " ".join(words), "en", "t", 120))
    if with_empty_docs:
        # the corpus shapes the contract must survive: a zero-length
        # text and a whitespace-only text (zero tokens either way)
        rows.append((90, "", "en", "t", 0))
        rows.append((91, "   ", "en", "t", 3))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_lda_separates_planted_disjoint_pools(spark, planted_sf):
    sf = planted_sf
    _vocab, lda, tf = _lda_fit(spark, sf)
    from pyspark.ml.functions import vector_to_array

    from pyspark.sql import Window as W

    assign = (
        lda.transform(tf)
        .select("doc_id", vector_to_array("topicDistribution").alias("d"))
        .select(
            "doc_id",
            F.expr("array_position(d, array_max(d)) - 1").alias("topic"),
        )
        .withColumn("pool", F.col("doc_id") % 3)
    )
    # majority topic per planted pool; with disjoint vocab the
    # alignment should be near-perfect and the 3 majorities distinct
    maj = (
        assign.groupBy("pool", "topic")
        .count()
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("pool").orderBy(F.desc("count"), "topic")
            ),
        )
        .where("rk = 1")
        .collect()
    )
    majority_topics = {r["pool"]: r["topic"] for r in maj}
    purity = sum(r["count"] for r in maj) / 30.0
    assert len(set(majority_topics.values())) == LDA_K
    assert purity >= 0.8


def test_lda_contract_survives_empty_and_whitespace_docs(spark, tmp_path):
    """The r11 ADVICE gap: the oracle's n_docs_modeled counts docs with
    >= 1 whitespace token, so an empty/whitespace-only document must be
    excluded from the fit — otherwise the Spark side counts its
    transform row and the gate hash-mismatches. Full oracle replay on a
    corpus that PLANTS both shapes."""
    import duckdb

    from claim_analysis_engine_spark.registry import registry
    from tests.oracle_harness import compare

    sf = _planted_corpus(spark, tmp_path, with_empty_docs=True)
    op = registry()["ml_lda_contract"]
    con = duckdb.connect()
    # Spark writes a DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    try:
        result = op.query(spark, sf).toPandas()
        ok, msg = compare(result, con, op.oracle)
        assert ok, msg
        # the planted empty docs are genuinely excluded, not coincidence
        assert int(result["n_docs_modeled"].iloc[0]) == 30
        assert bool(result["doc_distributions_valid"].iloc[0])
    finally:
        con.close()


def test_lda_topics_report_shape(spark, planted_sf):
    rows = ml_lda_topics(spark, planted_sf).collect()
    assert len(rows) == LDA_K * 5
    for r in rows:
        assert 0 <= r["topic"] < LDA_K and 1 <= r["term_rank"] <= 5
        assert 0 <= r["weight_bp"] <= 10000
