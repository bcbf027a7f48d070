"""The reference's flagship connector scenario as a runnable script:
typed rows -> sink encoder (keys + dynamic properties) -> partitioned
message log -> streaming source -> decode -> event-time windowed
aggregation -> results written back to an output topic, then read and
printed. Exercises S1/S3/S7/S8, D1/D3/D11, R5, W1/W11 end to end on a
local broker directory.

Run: PYTHONPATH=/root/repo python examples/streaming_connector_demo.py
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def run(spark, sf_dir: str, root: str) -> int:
    from rocketmq_flink_spark.functions import decode_envelope, encode_rows
    from rocketmq_flink_spark.session import load_tables
    from rocketmq_flink_spark.sources import register
    from rocketmq_flink_spark.streaming import (
        tumbling_window_agg,
        with_event_time,
        write_stream_foreach_batch,
    )

    register(spark)
    events = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "event_type", "value", "ts"
    )

    # 1. sink: typed rows -> message envelope -> partitioned message log
    env = encode_rows(
        events,
        options={"topic": "events", "keyColumns": "event_id",
                 "writeKeysToBody": "true"},
        born_ts_col="ts",
    )
    (env.write.format("rocketmq")
        .options(path=root, topic="events", numQueues=4)
        .mode("append").save())

    # 2. source: stream the log back, decode, window with a watermark
    raw = (spark.readStream.format("rocketmq")
           .options(path=root, topic="events").load())
    decoded = decode_envelope(
        raw,
        "event_id BIGINT, user_id BIGINT, event_type STRING,"
        " value DOUBLE, ts TIMESTAMP",
    )
    stream = with_event_time(decoded, "ts", "10 minutes")
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", ["event_type"],
        {"n": F.count(F.lit(1)),
         "sum_value": F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
         .cast("string")},
    ).select(
        F.col("window.start").cast("string").alias("win"), "event_type",
        F.col("n").cast("string").alias("n"), "sum_value",
    )

    # 3. write the aggregates to an OUTPUT topic via foreachBatch
    ckpt = tempfile.mkdtemp(prefix="demo_ckpt_")
    try:
        # default trigger + processAllAvailable, NOT a single availableNow
        # batch: append-mode windows only finalize in the FOLLOW-UP batch
        # after the watermark advances past their end
        q = write_stream_foreach_batch(
            agg,
            options={"path": root, "topic": "hourly_stats",
                     "keyColumns": "win", "writeKeysToBody": "true"},
            checkpoint_location=ckpt,
        )
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    # 4. read the output topic back (batch) and report
    out = (spark.read.format("rocketmq")
           .options(path=root, topic="hourly_stats").load())
    stats = decode_envelope(
        out, "win STRING, event_type STRING, n STRING, sum_value STRING"
    )
    return stats.count()


def main() -> None:
    from rocketmq_flink_spark.session import get_spark

    spark = get_spark(app_name="streaming_connector_demo")
    root = tempfile.mkdtemp(prefix="demo_broker_")
    try:
        n = run(spark, "/root/testdata/sf0.001", root)
        print(f"hourly_stats rows: {n}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
