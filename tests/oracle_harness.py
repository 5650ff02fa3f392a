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
import numpy as np
import pandas as pd

from claim_analysis_engine_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v: Any) -> Any:
    """Canonicalize one cell, PRESERVING the int/float distinction.

    The driver hashes the canonical text rendering of each cell, so a
    DuckDB HUGEINT that pandas renders as float64 ("3.0") does NOT match
    a Spark bigint ("3") even though the values are numerically equal.
    Python's `3.0 == 3` is True, which is exactly how the round-2 harness
    masked the evt_sessionize red row — tag numeric cells by kind so the
    local check is as strict as the driver's hash.
    """
    if v is None or (isinstance(v, (float, np.floating)) and math.isnan(v)):
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        # collapse ulp-level drift; queries already round explicitly
        return ("f", round(float(v), 9))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
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
    """spark_df may be a Spark DataFrame or an already-collected pandas
    frame — the parity test pre-collects so its wall-time guard stops
    the clock before the DuckDB oracle runs."""
    left = spark_df if isinstance(spark_df, pd.DataFrame) else spark_df.toPandas()
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
