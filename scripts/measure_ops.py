"""Round-14 optimization measurement harness.

Isolates named ops with the noop sink (guide §1.4), labels jobs
(§1.5), times median-of-N, and captures .explain("formatted") to
plans/r14/<op>_<tag>.txt.  Usage:

    python scripts/measure_ops.py --tag before --runs 5 op1 op2 ...
    python scripts/measure_ops.py --tag before --plans-only op1 ...

Timings print per-op to stdout; the same bench session shape is used
(local[$SPARK_GRAFT_CPUS], $SPARK_GRAFT_SF_DIR) so numbers compare to
BENCH_DETAIL.json medians.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claim_analysis_engine_spark.registry import registry  # noqa: E402
from claim_analysis_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    import tempfile

    tempfile.tempdir = tempfile.mkdtemp(prefix=f"cae_meas_{os.getpid()}_")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="cae-measure",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    reg = registry()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    # JVM warm-up so the first op is not charged session startup
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderstatus")
        .count()
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    out: dict[str, dict] = {}
    for name in args.ops:
        if name not in reg:
            print(f"!! {name}: not in registry", flush=True)
            continue
        if not args.no_plans:
            df = reg[name].query(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        if args.plans_only:
            print(f"-- {name}: plan captured", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"measure:{name}")
        for _ in range(args.warmup):
            reg[name].query(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            reg[name].query(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = sorted(times)[len(times) // 2]
        out[name] = {"median": med, "runs": times}
        print(f"== {name}: median {med} runs {times}", flush=True)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
