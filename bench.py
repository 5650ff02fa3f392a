"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). Timings include plan + execution, not session
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from claim_analysis_engine_spark.registry import registry  # noqa: E402
from claim_analysis_engine_spark.session import get_spark  # noqa: E402

# Headline set: the shapes that dominate real workloads — wide scans,
# the monthly-count substrate, window dedup, fact-fact join, rollup,
# spine join, per-series scoring / text ops as they land.
HEADLINE = [
    "agg_monthly_count",
    "dedup_merge",
    "agg_lag_stats",
    "pvt_subtotals",
    "spine_zero",
    "topk_per_group",
    "agg_lot_alert",
    "pvt_months",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="cae-bench")

    reg = registry()
    queries = {}
    total = 0.0
    missing = [name for name in HEADLINE if name not in reg]
    if missing:
        # a typo'd or unregistered headline op must be an error, not a
        # silent shrink of headline_total_runtime
        raise KeyError(f"headline ops not in registry: {missing}")
    for name in HEADLINE:
        op = reg[name]
        t0 = time.perf_counter()
        op.query(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        queries[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
