"""Operator registry: every implemented operator from SURVEY.md §2
(plus the training-data-pipeline extensions) exposes

  - a Spark query  (spark, sf_dir) -> DataFrame
  - an equivalent DuckDB oracle SQL string (or None for ops whose
    semantics aren't ANSI-SQL-expressible — those get a rows-only check)

`__spark_entry__.py` re-exports this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    id: str
    query: QueryFn
    oracle: str | None
    doc: str = ""


class OpRegistry:
    """Per-module collector; modules create one and decorate queries."""

    def __init__(self) -> None:
        self.ops: dict[str, Op] = {}

    def op(self, op_id: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            if op_id in self.ops:
                raise ValueError(f"duplicate op id {op_id!r}")
            self.ops[op_id] = Op(op_id, fn, oracle, (fn.__doc__ or "").strip())
            return fn

        return deco


def registry() -> dict[str, Op]:
    """Merge all operator modules' registries. Imports happen here (not
    at package import) so the module list stays in one place; a failure
    in any module is FATAL by design — the correctness gate must see
    every registered op, and silently dropping a module would shrink
    the surface without any visible error."""
    from claim_analysis_engine_spark.operators import (
        aggregates,
        dashboards,
        dedup_text,
        events,
        joins_temporal,
        multimodal,
        pivots,
        relational,
        risk,
        risk_tree,
        rule_engine,
        sales,
        scalars,
        scale_patterns,
        similarity,
        storage_ops,
        pipeline_ops,
        streaming_gate,
        textops,
        tsforecast,
    )

    merged: dict[str, Op] = {}
    # Registry order drives the driver's correctness sampling window
    # (it takes the first ~50 entries). Round-5's rotation certified
    # risk/forecast/storage/sales/dedup; ROUND6_FRONT below finishes
    # the job at OP granularity — the 52 ops that have never had a
    # driver row (all of similarity/textops/pipeline_ops/multimodal/
    # scale_patterns/streaming_gate/dashboards/joins_temporal, the
    # non-r2 events ops, the scalars tail, pvt_cube) plus
    # evt_sessionize (whose only driver row ever is the r2 FAIL —
    # fixed in r3, locally green since, never re-certified). 53
    # candidates for a 50-slot window: the 3 with the simplest
    # semantics and strongest local oracles (f_math, f_polyfit_slope,
    # pvt_cube) sit last and absorb the overflow. Everything
    # driver-green in r1–r5 moves behind; the local DuckDB-oracle
    # replicas (tests/test_oracle_parity.py) keep covering every op
    # each run regardless of position.
    for mod in (
        risk,
        risk_tree,
        rule_engine,
        tsforecast,
        storage_ops,
        sales,
        dedup_text,
        similarity,
        textops,
        pipeline_ops,
        multimodal,
        scale_patterns,
        streaming_gate,
        dashboards,
        joins_temporal,
        events,
        scalars,
        relational,
        aggregates,
        pivots,
    ):
        for op_id, op in mod.REG.ops.items():
            if op_id in merged:
                raise ValueError(f"duplicate op id across modules: {op_id!r}")
            merged[op_id] = op

    missing = [op_id for op_id in ROUND6_FRONT if op_id not in merged]
    if missing:  # a typo here would silently shrink the sampling window
        raise ValueError(f"ROUND6_FRONT ids not in registry: {missing}")
    front = {op_id: merged[op_id] for op_id in ROUND6_FRONT}
    front.update((op_id, op) for op_id, op in merged.items() if op_id not in front)
    return front


# Exact driver-sampling order for round 6 (see comment in registry()).
ROUND6_FRONT: tuple[str, ...] = (
    # re-certification: the one historical driver FAIL (r2), fixed r3
    "evt_sessionize",
    # end-to-end dashboard compositions — the product's full semantics
    "ep2_risk_radar",
    "ep2_trend_3yr",
    "ep3_forecast_e2e",
    "ep1_ingest_e2e",
    "ep4_corpus_e2e",
    # similarity family
    "sim_ann_lsh",
    "sim_ivf",
    "sim_pairs_threshold",
    "sim_ivf_train",
    "emb_quantize_int8",
    "sim_ann_int8_rerank",
    "sim_pq_adc",
    "emb_drift_monitor",
    # text analysis
    "txt_tokens",
    "txt_quality",
    "txt_langid",
    "txt_fingerprint",
    "txt_corpus_ngrams",
    "txt_tokens_bpe",
    "txt_repetition",
    "txt_pii_scrub",
    "txt_boilerplate_frac",
    # corpus pipeline
    "corpus_split_hash",
    "corpus_contamination",
    "corpus_pack_shards",
    "corpus_quality_funnel",
    "corpus_sample_stratified",
    "corpus_budget_mix",
    # multimodal plumbing
    "mm_blob_meta",
    "mm_decode_stub",
    "mm_frame_sample",
    "mm_assembly_profile",
    "mm_bytes_histogram",
    # scale patterns
    "join_bucketed",
    "agg_salted",
    "prune_partition",
    "agg_approx_distinct",
    "agg_sketch_quantiles",
    # streaming gates
    "evt_dedup_stream",
    "evt_sessionize_stream",
    "evt_tumbling_stream",
    # temporal joins
    "join_asof",
    "join_range_bucketed",
    # batch events never sampled
    "evt_funnel",
    "evt_retention",
    "evt_error_burst",
    "evt_sessionize_native",
    # scalars tail
    "f_str_sanitize",
    "f_str_parse_label",
    # --- overflow boundary (~50-slot window) — simplest semantics last
    "f_math",
    "f_polyfit_slope",
    "pvt_cube",
)
