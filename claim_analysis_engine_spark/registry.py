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
    # (it takes the first ~50 entries). Rounds 1–5 certified the whole
    # §2 core (relational/aggregates/pivots/risk/forecast/storage/
    # sales/dedup). ROUND7_FRONT below queues everything that has
    # never had a driver row — the round-6 rotation targets
    # (similarity/textops/pipeline_ops/multimodal/scale_patterns/
    # streaming_gate/dashboards/joins_temporal/events/scalars-tail)
    # whose CORRECTNESS_r06 never materialized, PLUS every operator
    # added in rounds 6–7 (ep6/ep7 capstones, star CC, stream join +
    # mart refresh, layout/curation ops, dq_expectations, k-anon) —
    # 78 candidates for a ~50-slot window, ordered so the
    # product-critical compositions (dashboards, stream gates,
    # similarity, dedup variants, textops) land inside the window and
    # simple-scalar overflow sits last. Within a family,
    # oracle-bearing ops lead rows-only ones (a hash row certifies
    # more than a rows-only row). Everything driver-green in r1–r5
    # moves behind; the local DuckDB-oracle replicas
    # (tests/test_oracle_parity.py) keep covering every op each run
    # regardless of position.
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

    missing = [op_id for op_id in ROUND7_FRONT if op_id not in merged]
    if missing:  # a typo here would silently shrink the sampling window
        raise ValueError(f"ROUND7_FRONT ids not in registry: {missing}")
    front = {op_id: merged[op_id] for op_id in ROUND7_FRONT}
    front.update((op_id, op) for op_id, op in merged.items() if op_id not in front)
    return front


# Exact driver-sampling order for round 7 (see comment in registry()).
# Every entry has never had a driver correctness row (except
# evt_sessionize — re-certification of the fixed r2 FAIL). Ordered so
# a ~50-entry prefix covers: the product's end-to-end compositions,
# all five streaming gates, the similarity family, both new dedup
# variants, all of textops, the corpus pipeline core, multimodal
# metadata ops, and the headline scale patterns (bucketed join, DPP,
# partition pruning, data-quality gate). The tail past the window
# boundary holds ops whose local checks are strongest relative to
# what a driver row would add (rows-only model-state ops pinned by
# determinism/golden tests, trivial scalars).
ROUND7_FRONT: tuple[str, ...] = (
    # re-certification: the one historical driver FAIL (r2), fixed r3
    "evt_sessionize",
    # end-to-end compositions — the product's full semantics
    "ep2_risk_radar",
    "ep2_trend_3yr",
    "ep1_ingest_e2e",
    "ep4_corpus_e2e",
    "ep6_curation_e2e",
    "ep7_retrieval_e2e",
    "ep8_hybrid_retrieval",
    "ep3_forecast_e2e",
    # streaming gates (real availableNow runs, batch-equivalence oracles)
    "evt_tumbling_stream",
    "evt_sessionize_stream",
    "evt_dedup_stream",
    "evt_join_stream",
    "evt_mart_refresh_stream",
    "evt_scd2_refresh_stream",
    # similarity family (oracle-bearing first)
    "sim_ann_lsh",
    "sim_ivf",
    "sim_pairs_threshold",
    "emb_quantize_int8",
    "sim_ann_int8_rerank",
    "emb_drift_monitor",
    "sim_recall_report",
    "sim_ivf_train",
    # round-6/7 dedup variants + entity resolution
    "dedup_canonical_pick",
    "dedup_cluster_cc_star",
    "dedup_cross_snapshot",
    "join_fuzzy_entity",
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
    "txt_lm_perplexity",
    "txt_ngram_novelty",
    "txt_idf_topterms",
    "txt_compress_ratio",
    "txt_search_conjunctive",
    "txt_search_bm25",
    # corpus pipeline core
    "corpus_split_hash",
    "corpus_contamination",
    "corpus_pack_shards",
    "corpus_quality_funnel",
    "corpus_sample_stratified",
    "corpus_budget_mix",
    "corpus_dedup_chunks",
    "corpus_split_leakage_safe",
    "corpus_sample_weighted",
    # multimodal metadata ops
    "mm_blob_meta",
    "mm_phash_groups",
    "mm_bytes_histogram",
    # headline scale patterns
    "join_bucketed",
    "join_dpp",
    "prune_partition",
    "dim_scd2",
    "join_pit_scd2",
    "dq_expectations",
    "dq_referential",
    "dq_psi_drift",
    "evt_funnel",
    # --- overflow boundary (~50-slot window) ---
    "agg_salted",
    "join_skew_salted",
    "join_asof",
    "join_range_bucketed",
    "evt_retention",
    "evt_transitions",
    "evt_error_burst",
    "evt_sessionize_native",
    "src_schema_evolution",
    "snk_mart_diff",
    "agg_kanon_suppress",
    "sort_global_shards",
    "sort_zorder",
    "snk_compaction",
    "agg_approx_distinct",
    "agg_sketch_quantiles",
    "agg_hll_union_rollup",
    "corpus_shuffle_epoch",
    "corpus_pack_sequences",
    "corpus_quality_lr",
    "sim_ivf_search_trained",
    "sim_pq_adc",
    "mm_frame_sample",
    "mm_assembly_profile",
    "mm_decode_stub",
    "f_str_sanitize",
    "f_str_parse_label",
    "f_math",
    "f_polyfit_slope",
    "pvt_cube",
)
