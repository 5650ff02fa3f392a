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


def _planted_corpus(spark, tmp_path) -> str:
    # 3 pools of 12 disjoint words; 30 docs of 24 words cycling their
    # pool (deterministic index arithmetic — no RNG)
    rows = []
    for d in range(30):
        pool = d % 3
        words = [f"t{pool}w{(d * 7 + j) % 12}" for j in range(24)]
        rows.append((d, " ".join(words), "en", "t", 120))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_lda_separates_planted_disjoint_pools(spark, tmp_path):
    sf = _planted_corpus(spark, tmp_path)
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


def test_lda_topics_report_shape(spark, tmp_path):
    sf = _planted_corpus(spark, tmp_path)
    rows = ml_lda_topics(spark, sf).collect()
    assert len(rows) == LDA_K * 5
    for r in rows:
        assert 0 <= r["topic"] < LDA_K and 1 <= r["term_rank"] <= 5
        assert 0 <= r["weight_bp"] <= 10000
