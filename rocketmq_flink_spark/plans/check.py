"""Run every catalog query against its DuckDB oracle locally.

Usage: python -m rocketmq_flink_spark.plans.check [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

from rocketmq_flink_spark.plans.catalog import REGISTRY
from rocketmq_flink_spark.plans.oracle import check_query, duck_connect
from rocketmq_flink_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(REGISTRY)
    spark = get_spark(app_name="oracle-check")
    con = duck_connect(sf_dir)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            report = check_query(spark, name, sf_dir, con)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"[ERR ] {name}: {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        print(f"{report}  ({time.time() - t0:.1f}s)")
        if not report.ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match the oracle")
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
