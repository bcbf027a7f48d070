"""M3/M4 tests: event-time windows, streaming dedup, foreachBatch sink,
observe() metrics, delay levels, and the SQL view surface — streaming
results cross-checked against the identical batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rocketmq_flink_spark.functions import decode_envelope, encode_rows
from rocketmq_flink_spark.session import load_tables
from rocketmq_flink_spark.sources import register
from rocketmq_flink_spark.sql import create_stream_table, create_table
from rocketmq_flink_spark.streaming import (
    MSG_DELAY_LEVEL_SECONDS,
    ThroughputListener,
    delivery_time,
    filter_deliverable,
    observe_throughput,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
    with_event_time,
    write_stream_foreach_batch,
)

SF = "/root/testdata/sf0.001"
EVENT_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP"
)


@pytest.fixture(scope="module")
def broker_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("broker_m3"))


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, SF)["events"].select(
        "event_id", "user_id", "event_type", "value", "ts"
    )


@pytest.fixture(scope="module")
def event_topic(spark, broker_root, events):
    register(spark)
    env = encode_rows(
        events,
        options={"topic": "t_m3", "keyColumns": "event_id", "writeKeysToBody": "true"},
        born_ts_col="ts",
    )
    (
        env.write.format("rocketmq")
        .options(path=broker_root, topic="t_m3", numQueues=4)
        .mode("append")
        .save()
    )
    return "t_m3"


def _stream_decoded(spark, broker_root, topic):
    env = (
        spark.readStream.format("rocketmq")
        .options(path=broker_root, topic=topic)
        .load()
    )
    return decode_envelope(env, EVENT_SCHEMA).withColumn(
        "born_ts", F.col("ts")
    )


def _run_to_memory(df, name, tmp_path, output_mode="append"):
    """Drain the stream with the default trigger + processAllAvailable —
    unlike a single availableNow batch, this runs the follow-up batch in
    which the advanced watermark finalizes append-mode windows."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def test_tumbling_window_stream_matches_batch(
    spark, broker_root, event_topic, events, tmp_path
):
    aggs = {
        "n": F.count(F.lit(1)),
        "sum_value": F.round(F.sum("value"), 6),
    }
    stream = with_event_time(
        _stream_decoded(spark, broker_root, event_topic), "born_ts", "10 minutes"
    )
    _run_to_memory(
        tumbling_window_agg(stream, "born_ts", "1 hour", ["event_type"], aggs),
        "tumble_out",
        tmp_path,
    )
    got = spark.sql(
        "SELECT window.start AS ws, event_type, n, sum_value FROM tumble_out"
    )
    expect = tumbling_window_agg(
        events.withColumn("born_ts", F.col("ts")), "born_ts", "1 hour",
        ["event_type"], aggs,
    ).select(
        F.col("window.start").alias("ws"),
        F.col("window.end").alias("we"),
        "event_type", "n", "sum_value",
    )
    # append mode emits a window only once the watermark (max event time
    # - delay) passes its end — the trailing open window is withheld
    final_wm = events.agg(
        F.timestamp_add("MINUTE", F.lit(-10), F.max("ts"))
    ).first()[0]
    closed = expect.filter(F.col("we") < F.lit(final_wm)).drop("we")
    open_ = expect.filter(F.col("we") >= F.lit(final_wm)).drop("we")
    assert got.count() > 0 and open_.count() > 0
    assert got.exceptAll(closed).count() == 0
    assert closed.exceptAll(got).count() == 0


def test_sliding_and_session_windows_batch_semantics(events):
    slid = sliding_window_agg(
        events, "ts", "1 hour", "30 minutes", ["event_type"],
        {"n": F.count(F.lit(1))},
    )
    total = slid.agg(F.sum("n")).first()[0]
    assert total == 2 * events.count()  # each event in exactly 2 windows

    sess = session_window_agg(
        events, "ts", "30 minutes", ["user_id"], {"n": F.count(F.lit(1))}
    )
    n_sessions = sess.count()
    # must agree with the lag-based batch sessionization in the catalog
    from rocketmq_flink_spark.plans.catalog import REGISTRY

    lag_based = REGISTRY["sessionization_gap30m"].fn(events.sparkSession, SF)
    assert n_sessions == lag_based.agg(F.sum("n_sessions")).first()[0]


def test_streaming_dedup_within_watermark(spark, broker_root, event_topic, tmp_path):
    decoded = _stream_decoded(spark, broker_root, event_topic)
    # planted duplicates: read the topic twice and union -> every key twice
    doubled = decoded.unionByName(_stream_decoded(spark, broker_root, event_topic))
    deduped = streaming_dedup(
        doubled, ["event_id"], ts_col="born_ts",
        max_out_of_orderness="1 minute", within_watermark=True,
    )
    _run_to_memory(deduped, "dedup_out", tmp_path)
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").first().n
    n_src = spark.sql("SELECT count(DISTINCT event_id) AS n FROM dedup_out").first().n
    assert n == n_src == 1000


def test_foreach_batch_sink_roundtrip_and_idempotence(
    spark, broker_root, events, tmp_path
):
    stream = _stream_decoded(spark, broker_root, "t_m3").drop("born_ts")
    q = write_stream_foreach_batch(
        stream,
        options={
            "path": broker_root,
            "topic": "t_m3_out",
            "keyColumns": "event_id",
            "writeKeysToBody": "true",
        },
        checkpoint_location=str(tmp_path / "ckpt_feb"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    out = (
        spark.read.format("rocketmq")
        .options(path=broker_root, topic="t_m3_out")
        .load()
    )
    assert out.count() == 1000
    decoded = decode_envelope(out, EVENT_SCHEMA).select(*events.columns)
    assert decoded.exceptAll(events).count() == 0
    assert events.exceptAll(decoded).count() == 0

    # replaying the same epoch id must be a no-op (idempotent commit)
    env = encode_rows(
        events.limit(7),
        options={"topic": "t_m3_out", "keyColumns": "event_id",
                 "writeKeysToBody": "true"},
    )
    (
        env.write.format("rocketmq")
        .options(path=broker_root, topic="t_m3_out", _epoch="0")
        .mode("append")
        .save()
    )
    assert (
        spark.read.format("rocketmq")
        .options(path=broker_root, topic="t_m3_out")
        .load()
        .count()
        == 1000
    )


def test_observe_metrics_listener(spark, broker_root, event_topic, tmp_path):
    listener = ThroughputListener()
    spark.streams.addListener(listener)
    try:
        env = (
            spark.readStream.format("rocketmq")
            .options(path=broker_root, topic=event_topic)
            .load()
        )
        q = _run_to_memory(
            observe_throughput(env).select("offset"), "metrics_out", tmp_path
        )
        # listener delivery is async; progress arrives after termination
        import time

        for _ in range(50):
            if listener.totals["n_rows"] >= 1000:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    totals = listener.totals
    assert totals["n_rows"] == 1000
    assert totals["n_bytes"] > 0
    assert all(r["tps"] > 0 for r in listener.rates if r["n_rows"])


def test_delay_levels(spark):
    rows = spark.createDataFrame(
        [(i, ) for i in range(-1, 20)], "delay_level int"
    ).withColumn("born_ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    got = rows.select(
        "delay_level",
        F.unix_timestamp(delivery_time("born_ts", "delay_level")).alias("ts_s"),
    ).collect()
    base = 1767225600  # 2026-01-01 UTC
    for r in got:
        lvl = min(max(r.delay_level, 0), 18)
        assert r.ts_s - base == MSG_DELAY_LEVEL_SECONDS[lvl]

    as_of = F.to_timestamp(F.lit("2026-01-01 00:05:00"))  # +300s
    visible = filter_deliverable(rows, as_of).count()
    # levels with delay <= 300s: 0..9 (0,1,5,10,30,60,...,300) plus the
    # clamped -1 -> level 0
    assert visible == 11


def test_sql_view_surface(spark, broker_root, event_topic):
    create_table(
        spark,
        "msgs_raw",
        {"path": broker_root, "topic": event_topic},
    )
    assert spark.sql("SELECT count(*) AS n FROM msgs_raw").first().n == 1000

    create_table(
        spark,
        "msgs_typed",
        {"path": broker_root, "topic": event_topic},
        schema=EVENT_SCHEMA,
    )
    got = spark.sql(
        "SELECT event_type, count(*) AS n, round(sum(value), 4) AS s "
        "FROM msgs_typed GROUP BY event_type"
    )
    expect = (
        load_tables(spark, SF)["events"]
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s"))
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_sql_streaming_view(spark, broker_root, event_topic, tmp_path):
    create_stream_table(
        spark,
        "msgs_stream",
        {"path": broker_root, "topic": event_topic},
        schema=EVENT_SCHEMA,
    )
    agg = spark.sql(
        "SELECT event_type, count(*) AS n FROM msgs_stream GROUP BY event_type"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sql_stream_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sqlstream"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n = spark.sql("SELECT sum(n) AS total FROM sql_stream_out").first().total
    assert n == 1000


def test_stateful_sessionization_via_broker(spark, broker_root, event_topic, tmp_path):
    from pyspark.sql import Window as W

    from rocketmq_flink_spark.streaming import sessionize_with_state

    decoded = _stream_decoded(spark, broker_root, event_topic).withWatermark(
        "born_ts", "0 seconds"
    )
    sess = sessionize_with_state(decoded, "user_id", "born_ts", "30 minutes")
    # default trigger, not availableNow: the Python DataSource falls back
    # to single-batch execution under availableNow, which skips the
    # no-data batch where event-time timeouts fire
    _run_to_memory(sess, "stateful_sess_out", tmp_path)
    got = spark.table("stateful_sess_out")

    # expected: lag-based batch sessionization restricted to sessions the
    # final watermark (max ts, 0s delay, ms-truncated) closed
    ev = load_tables(spark, SF)["events"].select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    sessions = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    max_ms = ev.agg((F.unix_micros(F.max("ts")) / 1000).cast("long")).first()[0]
    expect = sessions.where(
        (F.col("session_end_us") / 1000).cast("long") + 30 * 60 * 1000 < max_ms
    ).select(
        F.col("user_id").alias("key"), "session_start_us", "session_end_us",
        "n_events",
    )
    assert got.count() == expect.count() > 0
    assert got.exceptAll(expect).count() == 0


def test_stream_stream_interval_join(spark, broker_root, event_topic, tmp_path):
    """Stream-stream interval join (SURVEY §2.5): purchases joined to the
    same user's clicks within the preceding 30 minutes, both sides read
    from the broker source with watermarks; verified against the batch
    range join on the same data."""
    decoded = _stream_decoded(spark, broker_root, event_topic)
    clicks = (
        decoded.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("born_ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        _stream_decoded(spark, broker_root, event_topic)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("born_ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 minute")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND click_ts BETWEEN purchase_ts - INTERVAL 30 MINUTES"
            " AND purchase_ts"
        ),
    ).select("purchase_id", "click_id")
    _run_to_memory(joined, "ssjoin_out", tmp_path)
    got = spark.table("ssjoin_out")

    ev = load_tables(spark, SF)["events"]
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expect = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select("purchase_id", "click_id")
    assert got.count() == expect.count() > 0
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_stream_static_dimension_join(spark, broker_root, event_topic, tmp_path):
    """Stream-static join (SURVEY §2.5): the event stream enriched with a
    static dimension (user -> nation via customer), broadcast per
    microbatch; verified against the batch join."""
    static_dim = (
        load_tables(spark, SF)["customer"]
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    )
    stream = _stream_decoded(spark, broker_root, event_topic)
    enriched = (
        stream.join(F.broadcast(static_dim), "user_id", "left")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run_to_memory(enriched, "ssdim_out", tmp_path, output_mode="complete")
    got = spark.table("ssdim_out")
    expect = (
        load_tables(spark, SF)["events"]
        .join(F.broadcast(static_dim), "user_id", "left")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_update_mode_agg_through_foreach_batch_sink(
    spark, broker_root, event_topic, tmp_path
):
    """P6 scenario: an update-mode aggregation written to the message log
    via foreachBatch. Spark update-mode output carries no UPDATE_BEFORE
    rows (the changelog-filter semantic holds by construction); the log
    receives one append per changed aggregate per epoch, and the LAST
    record per key equals the batch aggregate."""
    from pyspark.sql import Window as W

    decoded = _stream_decoded(spark, broker_root, event_topic)
    agg = decoded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("string")
        .alias("sum_value"),
    )

    def write_batch(batch_df, batch_id):
        from rocketmq_flink_spark.functions import encode_rows

        env = encode_rows(
            batch_df,
            options={"keyColumns": "event_type", "writeKeysToBody": "true"},
        )
        (
            env.write.format("rocketmq")
            .mode("append")
            .options(path=broker_root, topic="t_updates", _epoch=str(batch_id))
            .save()
        )

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_upd"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    out = (
        spark.read.format("rocketmq")
        .options(path=broker_root, topic="t_updates")
        .load()
    )
    decoded_out = decode_envelope(
        out.select("queue_id", "offset", "value"),
        "event_type STRING, n BIGINT, sum_value STRING",
        options={},
        metadata_columns=["queue_id", "offset"],
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("queue_id").desc(), F.col("offset").desc()
    )
    latest = (
        decoded_out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", "n", "sum_value")
    )
    expect = (
        load_tables(spark, SF)["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("string")
            .alias("sum_value"),
        )
    )
    assert latest.exceptAll(expect).count() == 0
    assert expect.exceptAll(latest).count() == 0


def test_punctuated_watermark_stream_matches_batch(
    spark, broker_root, events, tmp_path
):
    """W4: the stateful punctuated filter over arrival-ordered
    microbatches must equal the deterministic batch form. Marker rows
    (purchases) carry watermark = own event time; arrival order is the
    block-of-7 permutation of event_id (the fixture's ts is monotone in
    id, so the permutation stands in for network reordering). A single
    arrival-ordered queue + maxOffsetsPerTrigger gives order-respecting
    microbatch boundaries."""
    from rocketmq_flink_spark.streaming.ops import punctuated_filter_batch
    from rocketmq_flink_spark.streaming.stateful import (
        punctuated_filter_with_state,
    )

    arr = (
        F.col("event_id") - (F.col("event_id") % 7)
        + (F.lit(6) - F.col("event_id") % 7)
    )

    def annotate(df):
        return df.select(
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            arr.alias("arrival"),
            (F.col("user_id") % 4).alias("q"),
            (F.col("event_type") == "purchase").alias("is_marker"),
            F.unix_micros("ts").alias("wm_us"),
        )

    register(spark)
    env = encode_rows(
        events.withColumn("_arr", arr).orderBy("_arr").drop("_arr").coalesce(1),
        options={"topic": "t_punct", "keyColumns": "event_id",
                 "writeKeysToBody": "true"},
        born_ts_col="ts",
    )
    (
        env.write.format("rocketmq")
        .options(path=broker_root, topic="t_punct", numQueues=1)
        .mode("append")
        .save()
    )
    stream_env = (
        spark.readStream.format("rocketmq")
        .options(path=broker_root, topic="t_punct",
                 maxOffsetsPerTrigger=1500)
        .load()
    )
    decoded = annotate(decode_envelope(stream_env, EVENT_SCHEMA))
    kept = punctuated_filter_with_state(
        decoded, "q", "ts_us", "is_marker", "wm_us", arrival_col="arrival"
    )
    _run_to_memory(kept, "punct_out", tmp_path)
    got = spark.sql("SELECT * FROM punct_out")
    expect = punctuated_filter_batch(
        annotate(events), "q", "ts_us", "is_marker", "wm_us",
        arrival_col="arrival",
    )
    assert got.count() == expect.count() > 0
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    # something must actually have been dropped for the test to bite
    assert expect.count() < events.count()


def test_streaming_incremental_dedup_matches_batch(spark, tmp_path):
    """Streaming incremental dedup (the production arrival path): new
    documents stream in over several microbatches and probe the STATIC
    corpus MinHash band index per batch via foreachBatch. Signatures are
    map-only (array-fold minima — no stateful aggregation needed), and
    batches interact only with the index, so the union over all epochs
    must equal the batch incremental_minhash_dedup of the full new set."""
    from rocketmq_flink_spark.operators.dedup import incremental_minhash_dedup

    docs = load_tables(spark, SF)["documents"]
    idx = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    # multiple microbatches: split the new batch into 3 files
    src = tmp_path / "arrivals"
    new.withColumn("_f", F.col("doc_id") % 3).repartition(3, "_f").drop(
        "_f"
    ).write.parquet(str(src))
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    results: list = []

    def probe(batch_df, epoch_id):
        out = incremental_minhash_dedup(batch_df, idx, "doc_id", "text")
        results.append(out.toPandas())

    q = (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(results) >= 2, "expected multiple microbatches"

    import pandas as pd

    got = (
        pd.concat(results, ignore_index=True)
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    expect = (
        incremental_minhash_dedup(new, idx, "doc_id", "text")
        .toPandas()
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """W10: an event whose window was already finalized and evicted in an
    EARLIER microbatch is dropped by the watermark. (A late row whose
    window is still live merges into state — Spark finalizes windows at
    the end of the batch in which the watermark passes them — so the
    drop is only observable one batch after eviction.) Microbatch
    boundaries are pinned with maxOffsetsPerTrigger over a single queue,
    making the assertion exact, not racy."""
    import datetime as dt

    root = str(tmp_path / "late_broker")
    register(spark)

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m, 0)

    rows = [  # offset order == arrival order (single queue, 1 partition)
        (1, t(10, 0)),   # batch 0
        (2, t(11, 0)),   # batch 0 -> watermark 10:30 at batch-1 start
        (4, t(12, 0)),   # batch 1: end of batch finalizes win 10:00 (n=1)
        (6, t(12, 1)),   # batch 1 -> watermark 11:31 at batch-2 start
        (3, t(10, 10)),  # batch 2: win 10:00 already evicted -> DROPPED
        (5, t(13, 0)),   # batch 2 -> watermark 12:30 flushes win 12:00
    ]
    # one partition -> broker offsets follow row order (arrival order)
    df = spark.createDataFrame(rows, "event_id BIGINT, ts TIMESTAMP").coalesce(1)
    env = encode_rows(
        df,
        options={"topic": "t_late", "keyColumns": "event_id",
                 "writeKeysToBody": "true"},
        born_ts_col="ts",
    )
    (
        env.write.format("rocketmq")
        .options(path=root, topic="t_late", numQueues=1)
        .mode("append")
        .save()
    )
    env_s = (
        spark.readStream.format("rocketmq")
        .options(path=root, topic="t_late", maxOffsetsPerTrigger=2)
        .load()
    )
    decoded = decode_envelope(env_s, "event_id BIGINT, ts TIMESTAMP")
    agg = (
        decoded.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("ws"), "n")
    )
    _run_to_memory(agg, "late_out", tmp_path)
    got = sorted(
        ((r.ws.hour, r.ws.minute), r.n)
        for r in spark.table("late_out").collect()
    )
    # the late event (10:10) is dropped: exactly one (10:00) row with
    # n=1, no duplicate emission, and the 13:00 window is never closed
    assert got == [((10, 0), 1), ((11, 0), 1), ((12, 0), 2)], got


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Sketch-on-stream: HLL registers computed per microbatch and
    merged by register max must yield EXACTLY the batch estimate over
    the full data — the mergeability contract that lets a streaming
    job maintain a running cardinality sketch (and daily sketches roll
    up) with no replay. Registers are tiny (m rows per group), so the
    cross-batch state is a trivially small table."""
    import pandas as pd

    from rocketmq_flink_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    docs = load_tables(spark, SF)["documents"]
    src = tmp_path / "hll_arrivals"
    docs.withColumn("_f", F.col("doc_id") % 3).repartition(3, "_f").drop(
        "_f"
    ).write.parquet(str(src))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    acc: list = []

    def sketch_batch(batch_df, epoch_id):
        reg = hll_registers(batch_df, F.col("text"), ["source"])
        acc.append(reg.toPandas())

    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(acc) >= 2, "expected multiple microbatches"

    merged_pd = (
        pd.concat(acc, ignore_index=True)
        .groupby(["source", "bucket"], as_index=False)["m"]
        .max()
    )
    merged = hll_merge(spark.createDataFrame(merged_pd), ["source"])
    est_stream = {
        r.source: r.est_distinct
        for r in hll_estimate(merged, ["source"]).collect()
    }
    est_batch = {
        r.source: r.est_distinct
        for r in hll_estimate(
            hll_registers(docs, F.col("text"), ["source"]), ["source"]
        ).collect()
    }
    assert est_stream == est_batch and len(est_batch) > 1


def test_native_session_window_stream_matches_batch(spark, tmp_path):
    """Spark's built-in session_window (SURVEY W11) over the event
    stream: per-user 30-minute-gap sessions aggregated while streaming
    (availableNow, watermarked) must equal the same session_window
    aggregation run in batch — closed sessions are emitted once and
    never revised."""
    from pyspark.sql import Window as W

    events = load_tables(spark, SF)["events"].select(
        "user_id", "ts", "value"
    )
    src = tmp_path / "sw_arrivals"
    # order files by time so the watermark closes sessions across batches
    events.withColumn(
        "_f", F.ntile(3).over(W.orderBy("ts"))
    ).repartition(3, "_f").drop("_f").write.parquet(str(src))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    def sessions(df):
        return df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sv"),
        ).select(
            "user_id", F.col("w.start").alias("start"),
            F.col("w.end").alias("end"), "n", "sv",
        )

    out = []

    def collect(batch_df, epoch_id):
        out.append(batch_df.toPandas())

    q = (
        sessions(stream.withWatermark("ts", "1 minute"))
        .writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    import pandas as pd

    got = pd.concat(out, ignore_index=True)
    expect = sessions(events).toPandas()
    key = ["user_id", "start", "end"]
    got = got.sort_values(key).reset_index(drop=True)
    # append mode only emits sessions CLOSED by the final watermark; the
    # tail sessions after it are the (only) allowed difference
    wm_cut = got["end"].max()
    expect = (
        expect[expect["end"] <= wm_cut].sort_values(key).reset_index(drop=True)
    )
    assert len(got) > 100
    pd.testing.assert_frame_equal(got[key + ["n", "sv"]],
                                  expect[key + ["n", "sv"]])


def test_late_data_dead_letter_side_output(spark, tmp_path):
    """W10 optional path: instead of silently dropping late rows, a
    foreachBatch router carries the watermark across microbatches and
    side-outputs sub-watermark rows to a dead-letter topic (the Flink
    side-output analog). Pinned batches: the 10:10 row arrives after
    the carried watermark passed 11:30, so it must land in t_dead —
    and nothing else does; every other row reaches the main sink."""
    import datetime as dt

    from rocketmq_flink_spark.streaming.ops import dead_letter_router

    root = str(tmp_path / "dl_broker")
    register(spark)

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m, 0)

    rows = [
        (1, t(10, 0)),
        (2, t(11, 0)),
        (4, t(12, 0)),
        (6, t(12, 1)),
        (3, t(10, 10)),  # late once the watermark reached 11:31
        (5, t(13, 0)),
    ]
    df = spark.createDataFrame(rows, "event_id BIGINT, ts TIMESTAMP").coalesce(1)
    env = encode_rows(
        df,
        options={"topic": "t_in", "keyColumns": "event_id",
                 "writeKeysToBody": "true"},
        born_ts_col="ts",
    )
    (env.write.format("rocketmq")
        .options(path=root, topic="t_in", numQueues=1).mode("append").save())

    main_rows, dead_rows = [], []
    router = dead_letter_router(
        lambda d: main_rows.extend(d.select("event_id").collect()),
        lambda d: dead_rows.extend(d.select("event_id").collect()),
        ts_col="ts",
        delay_seconds=1800,
    )
    env_s = (
        spark.readStream.format("rocketmq")
        .options(path=root, topic="t_in", maxOffsetsPerTrigger=2)
        .load()
    )
    decoded = decode_envelope(env_s, "event_id BIGINT, ts TIMESTAMP")
    q = (
        decoded.writeStream.foreachBatch(router)
        .option("checkpointLocation", str(tmp_path / "dl_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r.event_id for r in dead_rows) == [3]
    assert sorted(r.event_id for r in main_rows) == [1, 2, 4, 5, 6]


def test_streaming_pq_probe_matches_batch(spark, tmp_path):
    """Vector-index production arrival path: new embeddings stream in
    over several microbatches and probe a STATIC PQ index (codebooks
    trained once on the indexed corpus, passed into every batch) for
    their nearest indexed neighbor. The union over epochs must equal
    the batch probe of the full new set — queries score independently,
    so microbatching cannot change results."""
    import pandas as pd

    from rocketmq_flink_spark.operators.similarity import pq_topk, pq_train

    emb = load_tables(spark, SF)["embeddings"]
    idx = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    books = pq_train(idx)  # trained ONCE — the static index model

    src = tmp_path / "pq_arrivals"
    new.withColumn("_f", F.col("vec_id") % 3).repartition(3, "_f").drop(
        "_f"
    ).write.parquet(str(src))
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    results: list = []

    def probe(batch_df, epoch_id):
        out = pq_topk(batch_df, idx, k=1, codebooks=books)
        results.append(out.toPandas())

    q = (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", str(tmp_path / "pq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(results) >= 2, "expected multiple microbatches"

    got = (
        pd.concat(results, ignore_index=True)
        .sort_values(["qid"]).reset_index(drop=True)
    )
    expect = (
        pq_topk(new, idx, k=1, codebooks=books)
        .toPandas().sort_values(["qid"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)
    assert len(got) == new.count()


def test_stream_stream_left_outer_interval_join(
    spark, broker_root, events, tmp_path
):
    """LEFT OUTER stream-stream interval join (the Flink interval-join
    null-emission semantics): purchases with no same-user click in the
    preceding 30 minutes must still emit — with a NULL click_id — once
    the watermark passes their join window. Two far-future sentinel
    rows (one per side) push both watermarks past every real event so
    append mode finalizes all outer results; the sentinels are excluded
    from the comparison. Verified against the batch left-outer range
    join on the same data."""
    register(spark)
    sent = spark.createDataFrame(
        [
            (990001, 1, "click", 0.0),
            (990002, 1, "purchase", 0.0),
        ],
        "event_id long, user_id long, event_type string, value double",
    ).withColumn(
        "ts",
        F.to_timestamp(F.lit("2031-01-01 00:00:00")),
    )
    all_events = events.unionByName(sent)
    env = encode_rows(
        all_events,
        options={
            "topic": "t_oj",
            "keyColumns": "event_id",
            "writeKeysToBody": "true",
        },
        born_ts_col="ts",
    )
    env.write.format("rocketmq").options(
        path=broker_root, topic="t_oj", numQueues=4
    ).mode("append").save()

    decoded = _stream_decoded(spark, broker_root, "t_oj")
    clicks = (
        decoded.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("born_ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        _stream_decoded(spark, broker_root, "t_oj")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("born_ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 minute")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND click_ts BETWEEN"
            " purchase_ts - INTERVAL 30 MINUTES AND purchase_ts"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id")
    _run_to_memory(joined, "ssoj_out", tmp_path)
    got = spark.table("ssoj_out").where(F.col("purchase_id") < 990000)

    ev = events
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expect = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
        )
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "leftOuter",
    ).select("purchase_id", "click_id")

    # outer rows actually exist (purchases with no click in-window)
    assert expect.where(F.col("click_id").isNull()).count() > 0
    assert got.where(F.col("click_id").isNull()).count() == expect.where(
        F.col("click_id").isNull()
    ).count()
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_streaming_histogram_bins_merge_to_batch(spark, tmp_path):
    """Sketch-on-stream for the quantile histogram: per-microbatch bin
    counts merged by bin-wise SUM must equal the batch histogram
    exactly (additive-merge contract — a streaming job maintains a
    running value distribution with nbins rows of state per group and
    no replay). Bin edges come from a FIXED domain, as a production
    stream must (min/max of future data is unknowable)."""
    import pandas as pd

    from rocketmq_flink_spark.operators.sketches import hist_bins

    ev = load_tables(spark, SF)["events"].select(
        "event_id", "event_type", "value"
    )
    src = tmp_path / "hist_arrivals"
    ev.withColumn("_f", F.col("event_id") % 3).repartition(3, "_f").drop(
        "_f"
    ).write.parquet(str(src))
    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src)).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    lo, hi = F.lit(0.0), F.lit(500.0)  # fixed sketch domain
    acc: list = []

    def sketch_batch(batch_df, epoch_id):
        h = hist_bins(batch_df, F.col("value"), ["event_type"], lo, hi)
        acc.append(h.toPandas())

    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", str(tmp_path / "hist_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(acc) >= 2, "expected multiple microbatches"

    merged = (
        pd.concat(acc, ignore_index=True)
        .groupby(["event_type", "bin"], as_index=False)["cnt"]
        .sum()
    )
    batch = hist_bins(
        ev, F.col("value"), ["event_type"], lo, hi
    ).toPandas()
    key = ["event_type", "bin"]
    m = merged.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        m[key + ["cnt"]], b[key + ["cnt"]], check_dtype=False
    )


def test_streaming_countmin_counters_merge_to_batch(spark, tmp_path):
    """Sketch-on-stream for Count-Min: per-microbatch (r, c) counters
    merged by cell-wise SUM equal the batch sketch exactly (additive-
    merge contract — d*w rows of cross-batch state, no replay), and the
    merged sketch still never undercounts."""
    import pandas as pd

    from rocketmq_flink_spark.operators.sketches import countmin_sketch

    docs = load_tables(spark, SF)["documents"]
    src = tmp_path / "cm_arrivals"
    docs.withColumn("_f", F.col("doc_id") % 3).repartition(3, "_f").drop(
        "_f"
    ).write.parquet(str(src))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    def toks(df):
        from rocketmq_flink_spark.operators.dedup import normalize_sql

        return df.select(
            F.explode(
                F.split(F.expr(normalize_sql("text")), r"\s+")
            ).alias("tok")
        ).where("tok <> ''")

    acc: list = []

    def sketch_batch(batch_df, epoch_id):
        acc.append(countmin_sketch(toks(batch_df), "tok").toPandas())

    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", str(tmp_path / "cm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(acc) >= 2, "expected multiple microbatches"

    merged = (
        pd.concat(acc, ignore_index=True)
        .groupby(["r", "c"], as_index=False)["cnt"]
        .sum()
        .sort_values(["r", "c"])
        .reset_index(drop=True)
    )
    batch = (
        countmin_sketch(toks(docs), "tok")
        .toPandas()
        .sort_values(["r", "c"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged[["r", "c", "cnt"]], batch[["r", "c", "cnt"]],
        check_dtype=False,
    )


def test_streaming_line_scrub_matches_batch(spark, tmp_path):
    """Streaming line-level boilerplate scrub: new documents stream in
    over several microbatches and probe the STATIC hot-line index
    (built once from the historical corpus) via foreachBatch — the
    incremental form of line_dedup for continuous ingest. Batches
    interact only with the index, so the union over epochs must equal
    the batch line_scrub of the full new set."""
    from rocketmq_flink_spark.operators.dedup import (
        line_hot_index,
        line_scrub,
    )

    docs = load_tables(spark, SF)["documents"]
    # re-chunk into pseudo-lines so cross-doc repeats exist (fixture
    # texts are single-line), as in the line_dedup_docs catalog query
    lined = docs.select(
        "doc_id", F.split("text", " ").alias("_t")
    ).select(
        "doc_id",
        F.expr(
            "array_join(transform("
            " sequence(0, greatest(CAST(ceil(size(_t) / 10.0) AS INT) - 1, 0)),"
            " i -> array_join(slice(_t, i*10 + 1, 10), ' ')), '\n')"
        ).alias("text"),
    )
    hist = lined.where(F.col("doc_id") % 2 == 0)
    new = lined.where(F.col("doc_id") % 2 == 1)
    idx = line_hot_index(hist, "doc_id", "text", min_docs=2)
    idx = idx.localCheckpoint()  # the persisted model a deployment ships

    src = tmp_path / "arrivals"
    new.withColumn("_f", F.col("doc_id") % 3).repartition(3, "_f").drop(
        "_f"
    ).write.parquet(str(src))
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    results: list = []

    def scrub(batch_df, epoch_id):
        out = line_scrub(batch_df, idx, "doc_id", "text")
        results.append(out.toPandas())

    q = (
        stream.writeStream.foreachBatch(scrub)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(results) >= 2, "expected multiple microbatches"

    import pandas as pd

    got = (
        pd.concat(results, ignore_index=True)
        .sort_values(["doc"])
        .reset_index(drop=True)
    )
    expect = (
        line_scrub(new, idx, "doc_id", "text")
        .toPandas()
        .sort_values(["doc"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)
    # the scrub is non-vacuous: boilerplate lines were actually removed
    n_lines_in = (
        new.select(
            F.size(F.split("text", "\n", -1)).alias("n")
        ).agg(F.sum("n")).collect()[0][0]
    )
    assert int(got["n_kept"].sum()) < n_lines_in


def test_per_queue_watermark_w2_equivalence(spark, tmp_path):
    """W2 (BoundedOutOfOrdernessGeneratorPerQueue.java:28-69): per-queue
    bounded out-of-orderness. The reference's INTENDED semantics keeps a
    per-queue max event time and emits watermark = min over seen queues
    minus the bound, so a queue lagging behind another does not get its
    in-order records declared late. (The literal reference code seeds
    its min at 0 — epoch-millis keep the watermark frozen at -bound
    forever; we model the intended min-over-queues semantics, which is
    also what Flink's per-partition watermarking produces.)

    Spark's single watermark is GLOBAL-max minus delay, so with the raw
    bound a fast queue advances the watermark over a slow queue's still
    in-order records — the documented equivalence mapping is
    delay = bound + max cross-queue skew. This test builds a two-queue
    topic with 2h of skew and asserts:
      1. a Python model of the reference semantics accepts the slow
         queue's record and fires {10:00 -> 3, 12:00 -> 2, 12:30 -> 1};
      2. Spark with the MAPPED delay (30min bound + 2h skew) produces
         exactly those windows;
      3. Spark with the RAW bound drops the slow-queue record
         (10:00 -> 2), demonstrating why the mapping is required.
    """
    import datetime as dt

    register(spark)
    root = str(tmp_path / "w2_broker")
    topic = "t_w2"

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    BOUND = dt.timedelta(minutes=30)
    WIN = dt.timedelta(minutes=15)
    waves = [
        [(0, t(10, 0)), (1, t(10, 5))],    # both queues register
        [(0, t(12, 0)), (0, t(12, 1))],    # fast queue jumps ~2h ahead
        [(1, t(10, 10))],                  # slow queue, in order for ITSELF
        [(1, t(12, 30))],                  # slow queue catches up
        [(0, t(15, 30)), (1, t(15, 35))],  # flush
    ]

    def reference_model():
        """Intended per-queue semantics at wave granularity: accept a
        record unless its window was already closed by the min-over-
        queues watermark; advance the (monotone) watermark after each
        wave; fire windows the watermark has passed."""
        qmax: dict[int, dt.datetime] = {}
        wm = None
        live: dict[dt.datetime, int] = {}
        fired: dict[dt.datetime, int] = {}
        for wave in waves:
            for q, ts in wave:
                ws = ts.replace(minute=(ts.minute // 15) * 15)
                if wm is None or ws + WIN > wm:
                    live[ws] = live.get(ws, 0) + 1
                qmax[q] = max(qmax.get(q, ts), ts)
            cand = min(qmax.values()) - BOUND
            wm = cand if wm is None else max(wm, cand)
            for ws in [w for w in list(live) if w + WIN <= wm]:
                fired[ws] = live.pop(ws)
        return fired

    expect_ref = reference_model()
    assert expect_ref == {t(10, 0): 3, t(12, 0): 2, t(12, 30): 1}

    def write_wave(rows, start):
        df = spark.createDataFrame(
            [(f"e{start + i}", q, ts) for i, (q, ts) in enumerate(rows)],
            "keys string, queue_id int, born_ts timestamp",
        ).withColumn("value", F.col("keys").cast("binary")).coalesce(1)
        (
            df.write.format("rocketmq")
            .options(path=root, topic=topic, numQueues=2)
            .mode("append")
            .save()
        )

    def windowed(delay):
        env = (
            spark.readStream.format("rocketmq")
            .options(path=root, topic=topic)
            .load()
        )
        return (
            env.withWatermark("born_ts", delay)
            .groupBy(F.window("born_ts", "15 minutes").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("ws"), "n")
        )

    q_map = (
        windowed("150 minutes")  # bound (30m) + max cross-queue skew (2h)
        .writeStream.format("memory").queryName("w2_mapped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_map"))
        .start()
    )
    q_raw = (
        windowed("30 minutes")   # the reference bound, unmapped
        .writeStream.format("memory").queryName("w2_raw")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_raw"))
        .start()
    )
    try:
        n = 0
        for wave in waves:
            write_wave(wave, n)
            n += len(wave)
            q_map.processAllAvailable()
            q_raw.processAllAvailable()
    finally:
        q_map.stop()
        q_raw.stop()

    def got(name):
        return {
            r.ws.replace(tzinfo=None): r.n
            for r in spark.table(name).collect()
        }

    # Spark + mapped delay == the reference's per-queue min semantics
    assert got("w2_mapped") == expect_ref
    # raw bound: the fast queue closed 10:00 before the slow queue's
    # in-order 10:10 arrived — one fewer event in that window
    assert got("w2_raw") == {t(10, 0): 2, t(12, 0): 2, t(12, 30): 1}
