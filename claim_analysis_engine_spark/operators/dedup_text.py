"""Placeholder module — operators land in a later milestone."""

from claim_analysis_engine_spark.registry import OpRegistry

REG = OpRegistry()
