"""Behavioral contracts for the round-7 corpus ops that the DuckDB
oracle can't fully express: cross-epoch decorrelation of the
deterministic training shuffle, and determinism + held-out accuracy
of the learned quality/language classifier (its weights are learned
floats — no static SQL twin exists)."""

from __future__ import annotations

from claim_analysis_engine_spark.operators.pipeline_ops import (
    corpus_quality_lr,
    corpus_shuffle_epoch,
)
from tests.conftest import SF_SMALL


def test_shuffle_epochs_are_distinct_permutations(spark):
    """Each epoch must yield a DIFFERENT reading order (the whole point
    of reshuffling between epochs) while staying balanced: no shard
    may hold more than 3x the uniform share."""
    rows = corpus_shuffle_epoch(spark, SF_SMALL).collect()
    by_epoch: dict[int, dict[int, int]] = {}
    n_total: dict[int, int] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.shard] = r.first_doc
        n_total[r.epoch] = n_total.get(r.epoch, 0) + r.n_docs
    assert set(by_epoch) == {1, 2}
    assert n_total[1] == n_total[2]
    e1, e2 = by_epoch[1], by_epoch[2]
    shared_shards = set(e1) & set(e2)
    assert len(shared_shards) >= 8
    differing = sum(1 for s in shared_shards if e1[s] != e2[s])
    assert differing >= len(shared_shards) // 2, (e1, e2)
    # balance: uniform share is n/16 per shard
    for epoch, shards in by_epoch.items():
        cap = 3 * n_total[epoch] / 16
        for r in rows:
            if r.epoch == epoch:
                assert r.n_docs <= cap, (epoch, r.shard, r.n_docs)


def test_quality_lr_deterministic_and_accurate(spark):
    """Two invocations must produce byte-identical scores (zero-init,
    fixed-step training on a fixed hash-sample), and the learned
    classifier must actually separate the length-class target on
    HELD-OUT docs — the features carry that signal (measured ~95%
    separable), so anything below the bar means the training loop is
    broken, not the data."""
    a = sorted(corpus_quality_lr(spark, SF_SMALL).collect())
    b = sorted(corpus_quality_lr(spark, SF_SMALL).collect())
    assert a == b
    held_out = [r for r in a if not r.in_train]
    assert held_out
    acc = sum(1 for r in held_out if r.pred == r.label) / len(held_out)
    assert acc >= 0.88, acc
    # both classes must be present in the held-out evaluation
    assert {r.label for r in held_out} == {True, False}


def test_leakage_safe_split_is_cluster_atomic_where_naive_straddles(spark):
    """Every near-dup cluster must land in exactly one split
    (root-hashed buckets), singletons must agree with the naive
    doc-hash split, and — so the contrast isn't vacuous — at least one
    multi-doc cluster must ACTUALLY straddle splits under doc-id
    hashing (the leakage the op exists to close)."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.pipeline_ops import (
        _split_col,
        corpus_split_leakage_safe,
    )

    out = corpus_split_leakage_safe(spark, SF_SMALL).withColumn(
        "naive_split", _split_col("doc_id")
    )
    per_root = out.groupBy("root_id").agg(
        F.countDistinct("split").alias("n_safe"),
        F.countDistinct("naive_split").alias("n_naive"),
        F.count(F.lit(1)).alias("n"),
    )
    assert per_root.where(F.col("n_safe") > 1).count() == 0
    # non-vacuous: doc-id hashing splits at least one real cluster
    assert per_root.where((F.col("n") > 1) & (F.col("n_naive") > 1)).count() > 0
    # singletons: root == doc_id, so both assignments coincide
    assert (
        out.where(
            (F.col("cluster_size") == 1)
            & (F.col("split") != F.col("naive_split"))
        ).count()
        == 0
    )


def test_compress_ratio_is_deterministic_arrow_and_flags_repetition(spark):
    """The zlib quality score must be bit-deterministic across runs,
    ship as an Arrow-batched UDF (never row-at-a-time Python), and
    actually separate repetitive text from natural prose."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.textops import (
        COMPRESS_REPETITIVE_T,
        txt_compress_ratio,
    )

    df = txt_compress_ratio(spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    a = sorted((r.doc_id, r.compress_ratio) for r in df.collect())
    b = sorted((r.doc_id, r.compress_ratio) for r in df.collect())
    assert a == b
    # sensitivity: planted repetitive text scores under the threshold,
    # the natural-prose corpus stays above it
    import os
    import tempfile

    with tempfile.TemporaryDirectory(prefix="cae_zratio_") as d:
        spark.createDataFrame(
            [(0, "spam " * 400), (1, os.urandom(64).hex())],
            "doc_id long, text string",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: (r.compress_ratio, r.repetitive)
               for r in txt_compress_ratio(spark, d).collect()}
    assert got[0][0] < COMPRESS_REPETITIVE_T and got[0][1]
    assert got[1][0] > COMPRESS_REPETITIVE_T and not got[1][1]


def test_weighted_sample_is_length_biased_and_complete(spark):
    """Efraimidis-Spirakis with w = n_chars must (a) fill exactly k per
    stratum, (b) produce a sample whose mean weight exceeds the
    population mean (the whole point of weighting), and (c) be
    reproducible run-to-run (salted-hash uniform, no RNG state)."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.pipeline_ops import (
        WEIGHTED_SAMPLE_K,
        corpus_sample_weighted,
    )
    from claim_analysis_engine_spark.tables import load

    out = corpus_sample_weighted(spark, SF_SMALL)
    rows = out.collect()
    per_lang: dict = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    docs = load(spark, SF_SMALL, "documents")
    pop = {
        r.lang: r.mean_w
        for r in docs.groupBy("lang").agg(F.avg("n_chars").alias("mean_w")).collect()
    }
    n_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    biased = 0
    for lang, sample in per_lang.items():
        assert len(sample) == min(WEIGHTED_SAMPLE_K, n_lang[lang])
        assert sorted(r.rank for r in sample) == list(range(1, len(sample) + 1))
        if sum(r.w for r in sample) / len(sample) > pop[lang]:
            biased += 1
    # length bias must show in the majority of strata (fixed data, no flake)
    assert biased > len(per_lang) / 2, (biased, len(per_lang))
    again = sorted((r.lang, r.doc_id, r.rank) for r in corpus_sample_weighted(spark, SF_SMALL).collect())
    assert again == sorted((r.lang, r.doc_id, r.rank) for r in rows)


def test_compress_contract_flips_on_a_flat_scorer(spark, monkeypatch):
    """The monotonicity contract must read the SCORER, not the
    planting: stub the zlib UDF with a constant and the monotone and
    deepest-level booleans must flip (a constant is neither decreasing
    nor below the repetitive threshold)."""
    from pyspark.sql.functions import pandas_udf

    from claim_analysis_engine_spark.operators import textops as tx
    from tests.conftest import SF_SMALL

    def flat_udf():
        @pandas_udf("double")
        def flat(texts):
            return texts.map(lambda _t: 0.5, na_action="ignore")

        return flat

    monkeypatch.setattr(tx, "_compress_ratio_udf", flat_udf)
    rows = tx.txt_compress_ratio_contract(spark, SF_SMALL).collect()
    assert {r["level"] for r in rows} == set(range(tx.COMPRESS_LEVELS))
    assert all(not r["mean_monotone_decreasing"] for r in rows)
    assert all(not r["deepest_level_repetitive"] for r in rows)
    assert all(r["natural_above_threshold"] for r in rows)  # 0.5 > 0.30


def test_mllib_quality_gate_accuracy_and_classes(spark):
    """The distributed LR twin must clear its contract floor with both
    classes present in the held-out bucket, and the md5-bucket split
    must be the ~80/20 the contract's oracle recomputes."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.pipeline_ops import (
        MLLIB_LR_ACC_FLOOR_BP,
        corpus_quality_lr_mllib,
    )
    from tests.conftest import SF_SMALL

    scored = corpus_quality_lr_mllib(spark, SF_SMALL).cache()
    ho = scored.where("NOT in_train")
    row = ho.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
        F.countDistinct("label").alias("k"),
    ).first()
    assert row["k"] == 2
    assert row["acc"] * 10000 >= MLLIB_LR_ACC_FLOOR_BP
    n_total = scored.count()
    assert 0.7 < (n_total - row["n"]) / n_total < 0.9  # ~80% train bucket
    scored.unpersist()


def test_mllib_quality_contract_flips_on_an_inverted_gate(spark, monkeypatch):
    """Sensitivity: invert the gate's predictions and acc_ok must flip
    while the split accounting stays intact (the oracle would then
    hash-mismatch on the boolean, not the counts)."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators import pipeline_ops as po
    from tests.conftest import SF_SMALL

    real = po.corpus_quality_lr_mllib

    def inverted(spark_, sf_dir_):
        return real(spark_, sf_dir_).withColumn("pred", ~F.col("label"))

    monkeypatch.setattr(po, "corpus_quality_lr_mllib", inverted)
    row = po.corpus_quality_mllib_contract(spark, SF_SMALL).first()
    assert not row["acc_ok"]
    assert row["both_classes_ok"]
    assert row["n_docs"] == row["n_train"] + row["n_heldout"]
