"""Driver-gate rehearsal: run EVERY op in the current sampling front on
a stripped-conf session (Spark defaults — the environment the driver's
correctness gate uses, NOT session.get_spark's tuned one) at the
driver's sf, oracle-comparing where an oracle exists. Run this before
committing a front rotation; a FAIL here is a driver FAIL next round.

Usage: python scripts/rehearse_front.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main() -> int:
    from pyspark.sql import SparkSession

    from claim_analysis_engine_spark.registry import CURRENT_FRONT, registry
    from oracle_harness import compare, duck_connection

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("front-rehearsal")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    con = duck_connection(sf)
    bad: list[tuple[str, str]] = []
    t_all = time.time()
    for op_id in CURRENT_FRONT:
        op = reg[op_id]
        t0 = time.time()
        try:
            if op.oracle:
                ok, msg = compare(op.query(spark, sf), con, op.oracle)
            else:
                n = op.query(spark, sf).count()
                ok, msg = True, f"rows-only ran ({n} rows)"
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            ok, msg = False, f"{type(e).__name__}: {e}"
        el = time.time() - t0
        print(f"{op_id:36s} {el:6.1f}s  {'OK' if ok else 'FAIL: ' + str(msg)[:160]}")
        if not ok:
            bad.append((op_id, str(msg)))
    print(
        f"\n{len(CURRENT_FRONT)} ops rehearsed in {round(time.time() - t_all)}s; "
        f"failures: {bad or 'NONE'}"
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
