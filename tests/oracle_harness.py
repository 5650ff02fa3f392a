"""Local replica of the driver's DuckDB-oracle correctness check:
run the Spark query and the oracle SQL on the same parquet tables,
sort columns by name, compare row count + order-insensitive values.

Used by tests/test_oracle_parity.py so every registered operator is
verified before the driver ever sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from claim_analysis_engine_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v: Any) -> Any:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        # collapse ulp-level drift; queries already round explicitly
        return round(v, 9)
    if hasattr(v, "isoformat"):  # date/datetime/timestamp
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    left = spark_df.toPandas()
    right = con.execute(sql).fetchdf()
    if sorted(left.columns) != sorted(right.columns):
        return False, f"columns differ: spark={sorted(left.columns)} duck={sorted(right.columns)}"
    if len(left) != len(right):
        return False, f"row counts differ: spark={len(left)} duck={len(right)}"
    ln, rn = normalize(left), normalize(right)
    if ln != rn:
        diffs = [(a, b) for a, b in zip(ln, rn) if a != b][:5]
        return False, f"values differ; first diffs (spark, duck): {diffs}"
    return True, "ok"
