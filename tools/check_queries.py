import sys
from rocketmq_flink_spark.session import get_spark
from rocketmq_flink_spark.plans.oracle import check_query
spark = get_spark(app_name="check", shuffle_partitions=16)
names = sys.argv[1].split(",")
sfs = sys.argv[2].split(",") if len(sys.argv) > 2 else ["0.001", "0.01"]
for name in names:
    for sf in sfs:
        print(check_query(spark, name, f"/root/testdata/sf{sf}"), flush=True)
