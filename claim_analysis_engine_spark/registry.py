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
    # Module order drives the driver's correctness sampling window (it
    # takes the first N registry entries): rounds 1-4 exhausted the
    # window on relational/aggregates/pivots, so the never-sampled
    # surfaces — risk scoring, forecasting, sinks, the LLM-pipeline
    # families, streaming gates — now register FIRST. The previously
    # driver-verified relational/aggregates/pivots ops move to the back;
    # their local DuckDB-oracle replicas (tests/test_oracle_parity.py)
    # keep covering them every run regardless of position.
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
    return merged
