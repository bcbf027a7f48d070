"""Per-query profiler for optimization rounds.

For each named query: time the BUILD (fn call, includes any scalar
collects the query does while constructing its plan), time N noop-sink
executions (the bench's timed action), and optionally dump
explain("formatted") to plans/<tag>/<name>_<suffix>.txt.

Run: PYTHONPATH=/root/repo python tools/profile_query.py name1,name2 \
        [--reps N] [--dump before|after] [--sf sf_dir]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rocketmq_flink_spark.plans.catalog import REGISTRY  # noqa: E402
from rocketmq_flink_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dump", default=None)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                       "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r08")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="profile")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = args.names.split(",")

    # warm-up to absorb JVM/codegen startup
    w = REGISTRY[names[0]].fn(spark, args.sf)
    w.write.format("noop").mode("overwrite").save()

    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, args.sf)
        build = time.perf_counter() - t0
        execs = []
        for r in range(args.reps):
            if args.fresh and r > 0:
                # bench-style: a fresh fn() per rep, so per-run
                # localCheckpoints are NOT reused across reps
                df = REGISTRY[name].fn(spark, args.sf)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        if args.dump:
            out_dir = os.path.join(here, "plans", args.tag)
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"{name}_{args.dump}.txt")
            with open(path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        print(
            f"{name}: build={build:.3f}s exec_min={min(execs):.3f} "
            f"exec_med={sorted(execs)[len(execs)//2]:.3f} "
            f"exec_max={max(execs):.3f} reps={args.reps}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
