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
    for mod in (
        relational,
        aggregates,
        pivots,
        events,
        scalars,
        risk,
        risk_tree,
        sales,
        scale_patterns,
        storage_ops,
        tsforecast,
        dedup_text,
        similarity,
        pipeline_ops,
        textops,
        multimodal,
        dashboards,
        joins_temporal,
        streaming_gate,
    ):
        for op_id, op in mod.REG.ops.items():
            if op_id in merged:
                raise ValueError(f"duplicate op id across modules: {op_id!r}")
            merged[op_id] = op
    return merged
