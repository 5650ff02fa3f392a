"""Decode-stub contract tests: the mapInPandas plumbing must be
deterministic, schema-stable, and 1:1 with its input — so swapping the
fake decoder for a real codec changes nothing structural."""

from __future__ import annotations

from claim_analysis_engine_spark.operators.multimodal import (
    _fake_decode,
    mm_decode_stub,
)
from tests.conftest import SF_SMALL


def test_fake_decode_is_deterministic():
    a = _fake_decode(b"some payload bytes")
    b = _fake_decode(b"some payload bytes")
    assert a == b
    w, h, nf, mi = a
    assert 16 <= w <= 255 and 16 <= h <= 255 and 1 <= nf <= 16
    assert 0.0 <= mi <= 1.0


def test_decode_stub_schema_and_cardinality(spark):
    out = mm_decode_stub(spark, SF_SMALL)
    assert out.columns == ["doc_id", "width", "height", "n_frames", "mean_intensity"]
    rows = out.collect()
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs


def test_decode_stub_repeatable_across_runs(spark):
    a = {r.doc_id: (r.width, r.height, r.n_frames) for r in mm_decode_stub(spark, SF_SMALL).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_frames) for r in mm_decode_stub(spark, SF_SMALL).collect()}
    assert a == b
