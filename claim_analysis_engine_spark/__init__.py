"""claim_analysis_engine_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
graviton94/claim-analysis-engine (see SURVEY.md): claim ETL with a
54-column canonical schema, partitioned-parquet hub storage with
merge-upsert, monthly series mart, statistical risk scoring, pivot
dashboards and per-series ML forecasting — re-expressed Spark-first
(DataFrame API / Catalyst / pandas UDFs), plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
