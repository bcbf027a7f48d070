"""Driver-style gate: run every catalog query + oracle under a VANILLA
SparkSession (no engine configs) — what the grading driver actually does.
Usage: python tools/check_vanilla.py [sf_dir]
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import __spark_entry__ as e
from rocketmq_flink_spark.plans.oracle import compare_frames, duck_connect

spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "48g")
         .getOrCreate())  # vanilla otherwise
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duck_connect(sf)
q, o = e.queries(), e.oracle_sql()
fails = []
for name in q:
    try:
        sp = q[name](spark, sf).toPandas()
        du = con.execute(o[name]).df()
        r = compare_frames(name, sp, du)
        print(r, flush=True)
        if not r.ok:
            fails.append(name)
    except Exception as ex:
        print("[ERR ]", name, str(ex)[:200], flush=True)
        fails.append(name)
print("FAILS:", fails)
