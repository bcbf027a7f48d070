"""End-to-end tests for the broker + rocketmq DataSource (batch and
streaming, read and write), mirroring the reference's source/sink
semantics: offset bounds, tag filtering, bounded reads, epoch commits."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from rocketmq_flink_spark.functions import decode_envelope, encode_rows
from rocketmq_flink_spark.session import load_tables
from rocketmq_flink_spark.sources import Broker, register

SF = "/root/testdata/sf0.001"
EVENT_SCHEMA = "event_id BIGINT, user_id BIGINT, value DOUBLE, ts TIMESTAMP"


@pytest.fixture(scope="module")
def broker_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("broker"))


def _write_events(spark, root, topic, num_queues=4):
    ev = load_tables(spark, SF)["events"].select("event_id", "user_id", "value", "ts")
    env = encode_rows(
        ev,
        options={"topic": topic, "keyColumns": "event_id", "writeKeysToBody": "true"},
        born_ts_col="ts",
    )
    (
        env.write.format("rocketmq")
        .option("path", root)
        .option("topic", topic)
        .option("numQueues", num_queues)
        .mode("append")
        .save()
    )


def test_write_then_batch_read_roundtrip(spark, broker_root):
    register(spark)
    _write_events(spark, broker_root, "t_round")

    env = (
        spark.read.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_round")
        .load()
    )
    assert env.count() == 1000
    # metadata columns present and sane
    row = env.select("topic", "queue_id", "offset", "msg_id").first()
    assert row.topic == "t_round" and row.msg_id.startswith("t_round-")

    decoded = decode_envelope(env, EVENT_SCHEMA)
    src = load_tables(spark, SF)["events"].select(
        "event_id", "user_id", "value", "ts"
    )
    assert decoded.exceptAll(src).count() == 0
    assert src.exceptAll(decoded).count() == 0


def test_offsets_contiguous_per_queue(spark, broker_root):
    broker = Broker(broker_root)
    for q in broker.queues("t_round"):
        tbl = broker.read_range("t_round", q, 0, broker.latest_offset("t_round", q))
        offs = tbl.column("offset").to_pylist()
        assert offs == list(range(len(offs)))


def test_starting_offsets_latest_and_explicit(spark, broker_root):
    latest = (
        spark.read.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_round")
        .option("startingOffsets", "latest")
        .load()
    )
    assert latest.count() == 0

    broker = Broker(broker_root)
    q0 = broker.queues("t_round")[0]
    explicit = {str(q): 10**9 for q in broker.queues("t_round")}
    explicit[str(q0)] = broker.latest_offset("t_round", q0) - 5
    import json

    some = (
        spark.read.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_round")
        .option("startingOffsets", json.dumps(explicit))
        .load()
    )
    # 5 from q0; the 10**9 starts clamp to empty ranges
    assert some.count() == 5


def test_tag_filter_broker_side(spark, broker_root):
    ev = load_tables(spark, SF)["events"].select(
        "event_id", "user_id", "value", "ts", "event_type"
    )
    env = encode_rows(
        ev,
        options={
            "topic": "t_tags",
            "isDynamicTag": "true",
            "dynamicTagColumn": "event_type",
        },
        born_ts_col="ts",
    )
    env.write.format("rocketmq").option("path", broker_root).option(
        "topic", "t_tags"
    ).mode("append").save()

    got = (
        spark.read.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_tags")
        .option("tag", "purchase || click")
        .load()
    )
    want = ev.where(F.col("event_type").isin("purchase", "click")).count()
    assert got.count() == want
    assert set(r.tags for r in got.select("tags").distinct().collect()) == {
        "purchase",
        "click",
    }


def test_bounded_read_ending_timestamp(spark, broker_root):
    # two commits with distinct store timestamps
    df1 = spark.range(10).select(
        F.lit(None).cast("string").alias("keys"),
        F.lit(None).cast("string").alias("tags"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("value"),
        F.current_timestamp().alias("born_ts"),
    )
    for topic_write in range(2):
        df1.write.format("rocketmq").option("path", broker_root).option(
            "topic", "t_bounded"
        ).option("numQueues", 1).mode("append").save()
        if topic_write == 0:
            time.sleep(1.2)
            cut_ms = int(time.time() * 1000)
            time.sleep(1.2)

    bounded = (
        spark.read.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_bounded")
        .option("endingTimestamp", str(cut_ms))
        .load()
    )
    assert bounded.count() == 10  # only the first commit
    full = (
        spark.read.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_bounded")
        .load()
    )
    assert full.count() == 20


def test_streaming_read_available_now(spark, broker_root, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_round")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_read_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_read"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql("SELECT count(*) AS n FROM stream_read_out").first().n
    assert total == 1000


def test_streaming_read_with_rate_limit(spark, broker_root, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_round")
        .option("maxOffsetsPerTrigger", "300")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_rate_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    total = spark.sql("SELECT count(*) AS n FROM stream_rate_out").first().n
    assert total == 1000
    n_rows_per_batch = [
        p["numInputRows"] for p in (q.recentProgress or []) if p["numInputRows"] > 0
    ]
    assert max(n_rows_per_batch) <= 300
    assert len(n_rows_per_batch) >= 4  # 1000 / 300 -> at least 4 batches


def test_streaming_write_epochs(spark, broker_root, tmp_path):
    src_dir = str(tmp_path / "srcfiles")
    import shutil, os

    os.makedirs(src_dir)
    shutil.copy(f"{SF}/documents.parquet", f"{src_dir}/documents.parquet")

    docs = spark.read.parquet(src_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(src_dir)
        .select(
            F.col("doc_id").cast("string").alias("keys"),
            F.col("lang").alias("tags"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.encode(F.col("text"), "UTF-8").alias("value"),
            F.current_timestamp().alias("born_ts"),
        )
    )
    q = (
        stream.writeStream.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt_write"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.read.format("rocketmq")
        .option("path", broker_root)
        .option("topic", "t_stream_sink")
        .load()
    )
    assert got.count() == docs.count()
    # keys routed deterministically; tags carried through
    assert got.where(F.col("tags") == "en").count() == docs.where(
        F.col("lang") == "en"
    ).count()


# --- ACL (O3) --------------------------------------------------------------


def test_acl_enforced_on_read_and_write(spark, tmp_path):
    """Broker-side ACL (RocketMQConfig ACCESS_KEY/SECRET_KEY ->
    AclClientRPCHook analog): with an ACL installed, reads and writes
    without valid credentials fail; valid credentials round-trip."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from rocketmq_flink_spark.sources import register, set_acl

    register(spark)
    root = str(tmp_path / "acl_broker")
    df = spark.range(10).selectExpr(
        "'t_acl' AS topic", "CAST(id AS STRING) AS keys",
        "CAST(NULL AS STRING) AS tags",
        "CAST(NULL AS MAP<STRING,STRING>) AS props",
        "CAST(CAST(id AS STRING) AS BINARY) AS value",
        "current_timestamp() AS born_ts",
    )
    set_acl(root, {"user1": "s3cret"})

    write = (
        df.write.format("rocketmq").mode("append")
    )
    with pytest.raises(Exception) as ei:
        write.options(path=root, topic="t_acl").save()
    assert "ACL rejected" in str(ei.value)
    with pytest.raises(Exception) as ei:
        write.options(
            path=root, topic="t_acl", accessKey="user1", secretKey="wrong"
        ).save()
    assert "ACL rejected" in str(ei.value)

    write.options(
        path=root, topic="t_acl", accessKey="user1", secretKey="s3cret"
    ).save()

    read = spark.read.format("rocketmq")
    with pytest.raises(Exception) as ei:
        read.options(path=root, topic="t_acl").load().count()
    assert "ACL rejected" in str(ei.value)
    n = (
        read.options(
            path=root, topic="t_acl", accessKey="user1", secretKey="s3cret"
        ).load().count()
    )
    assert n == 10

    # disabling the ACL restores open access
    set_acl(root, {})
    assert read.options(path=root, topic="t_acl").load().count() == 10


def test_ending_offsets_snapshot_replay(spark, broker_root):
    """`endingOffsets` (round 8, W7 batch replay): a per-queue offset
    snapshot taken between two commits must split the topic exactly —
    read-to-snapshot returns precisely the first commit, read-from-
    snapshot precisely the second, with no loss or dup at the
    boundary."""
    import json

    topic = "replay_bound"
    ev = load_tables(spark, SF)["events"].select(
        "event_id", "user_id", "value", "ts"
    )

    def commit(cond):
        env = encode_rows(
            ev.where(cond),
            options={"topic": topic, "keyColumns": "event_id",
                     "writeKeysToBody": "true"},
            born_ts_col="ts",
        )
        env.write.format("rocketmq").option("path", broker_root).option(
            "topic", topic
        ).option("numQueues", "4").mode("append").save()

    commit(F.col("event_id") % 3 == 0)
    b = Broker(broker_root)
    snap = {str(q): b.latest_offset(topic, q) for q in b.queues(topic)}
    commit(F.col("event_id") % 3 != 0)

    def ids(**opts):
        df = (
            spark.read.format("rocketmq")
            .option("path", broker_root).option("topic", topic)
            .options(**opts).load()
        )
        dec = decode_envelope(df, EVENT_SCHEMA)
        return {r.event_id for r in dec.select("event_id").collect()}

    want_all = {r.event_id for r in ev.select("event_id").collect()}
    first = ids(endingOffsets=json.dumps(snap))
    second = ids(startingOffsets=json.dumps(snap))
    assert first == {i for i in want_all if i % 3 == 0}
    assert second == {i for i in want_all if i % 3 != 0}
    assert first | second == want_all and not (first & second)
    # "latest" spec and the "*" wildcard resolve too
    assert ids(endingOffsets="latest") == want_all
    assert ids(startingOffsets=json.dumps({"*": 0})) == want_all
