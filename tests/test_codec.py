"""Codec unit tests mirroring the reference's deserializer tests
(src/test/java/org/apache/rocketmq/flink/source/reader/deserializer/
RocketMQRowDeserializationSchemaTest.java) plus dirty-data policy
coverage the reference only exercises implicitly."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rocketmq_flink_spark.functions.codec import decode_envelope, encode_rows
from rocketmq_flink_spark.schema import time_field

FD = "\x01"  # default fieldDelimiter (reference RocketMQOptions.java:55)


def envelope(spark, bodies: list[str], props=None):
    rows = [
        Row(
            topic="t",
            queue_id=0,
            offset=i,
            msg_id=f"m{i}",
            keys=None,
            tags=None,
            born_ts=dt.datetime(2024, 1, 1),
            store_ts=dt.datetime(2024, 1, 1),
            props=props[i] if props else {},
            value=b.encode("utf-8"),
        )
        for i, b in enumerate(bodies)
    ]
    from rocketmq_flink_spark.schema import ENVELOPE_SCHEMA

    return spark.createDataFrame(rows, schema=ENVELOPE_SCHEMA)


WIDE_SCHEMA = T.StructType(
    [
        T.StructField("int", T.IntegerType()),
        T.StructField("varchar", T.StringType()),
        T.StructField("bool", T.BooleanType()),
        T.StructField("char", T.StringType()),
        T.StructField("tinyint", T.ByteType()),
        T.StructField("decimal", T.DecimalType(10, 5)),
        T.StructField("smallint", T.ShortType()),
        T.StructField("bigint", T.LongType()),
        T.StructField("float", T.FloatType()),
        T.StructField("double", T.DoubleType()),
        T.StructField("date", T.DateType()),
        time_field("time"),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def wide_body(ts="1704067200123"):
    return FD.join(
        [
            "42",
            "hello",
            "1",
            "abcde",
            "7",
            "12345.54321",
            "300",
            "9999999999",
            "1.5",
            "2.25",
            "2024-01-01",
            "3661000",
            ts,
        ]
    )


def test_wide_type_matrix(spark):
    df = decode_envelope(envelope(spark, [wide_body()]), WIDE_SCHEMA)
    row = df.collect()[0]
    assert row["int"] == 42
    assert row["varchar"] == "hello"
    assert row["bool"] is True
    assert row["tinyint"] == 7
    assert row["decimal"] == Decimal("12345.54321")
    assert row["smallint"] == 300
    assert row["bigint"] == 9999999999
    assert row["float"] == pytest.approx(1.5)
    assert row["double"] == pytest.approx(2.25)
    assert row["date"] == dt.date(2024, 1, 1)
    assert row["time"] == 3661000  # millis-of-day
    assert row["timestamp"] == dt.datetime(2024, 1, 1, 0, 0, 0, 123000)


def test_timestamp_dual_format(spark):
    body = wide_body(ts="2024-01-01 00:00:00.123")
    df = decode_envelope(envelope(spark, [body]), WIDE_SCHEMA)
    assert df.collect()[0]["timestamp"] == dt.datetime(2024, 1, 1, 0, 0, 0, 123000)


def test_bool_accepts_1_0_true_false(spark):
    schema = T.StructType([T.StructField("b", T.BooleanType())])
    df = decode_envelope(envelope(spark, ["true", "0", "FALSE", "1"]), schema)
    assert [r["b"] for r in df.collect()] == [True, False, False, True]


def test_multiline_body(spark):
    schema = "a INT, b STRING"
    body = f"1{FD}x\n2{FD}y\n3{FD}z"
    df = decode_envelope(envelope(spark, [body]), schema)
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (2, "y"), (3, "z")]


def test_null_sentinel(spark):
    schema = "a INT, b STRING"
    df = decode_envelope(envelope(spark, [f"\\N{FD}\\N"]), schema)
    row = df.collect()[0]
    assert row.a is None and row.b is None


def test_custom_delimiters(spark):
    schema = "a INT, b STRING"
    df = decode_envelope(
        envelope(spark, ["1|x;2|y"]),
        schema,
        options={"fieldDelimiter": "|", "lineDelimiter": ";"},
    )
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_varbinary_passthrough(spark):
    schema = T.StructType([T.StructField("value", T.BinaryType())])
    df = decode_envelope(envelope(spark, ["rawbytes"]), schema)
    assert bytes(df.collect()[0]["value"]) == b"rawbytes"


def test_all_header_fields(spark):
    schema = "k INT, v STRING"
    df = decode_envelope(
        envelope(spark, [""], props=[{"k": "5", "v": "hi"}]),
        schema,
        options={"headerFields": "k,v"},
    )
    row = df.collect()[0]
    assert (row.k, row.v) == (5, "hi")


def test_mixed_header_and_data_fields(spark):
    schema = "k INT, a INT, b STRING"
    df = decode_envelope(
        envelope(spark, [f"1{FD}x"], props=[{"k": "9"}]),
        schema,
        options={"headerFields": "k"},
    )
    row = df.collect()[0]
    assert (row.k, row.a, row.b) == (9, 1, "x")


def test_metadata_projection(spark):
    schema = "a INT, b STRING"
    df = decode_envelope(
        envelope(spark, [f"1{FD}x"]),
        schema,
        metadata_columns=["topic", "queue_id", "offset"],
    )
    row = df.collect()[0]
    assert (row.topic, row.queue_id, row.offset) == ("t", 0, 0)


# --- dirty data strategies -------------------------------------------------

DIRTY = ["1\x01x", "2", "3\x01y\x01EXTRA", "zz\x01w"]  # ok, missing, extra, bad-int


def test_length_check_none_defaults(spark):
    # defaults SKIP/SKIP/CUT: missing row dropped, extra cut, bad-int dropped
    df = decode_envelope(envelope(spark, DIRTY), "a INT, b STRING")
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (3, "y")]


def test_length_check_skip(spark):
    # SKIP everywhere: only the fully well-formed row survives
    df = decode_envelope(
        envelope(spark, DIRTY), "a INT, b STRING", options={"lengthCheck": "SKIP"}
    )
    assert [(r.a, r.b) for r in df.collect()] == [(1, "x")]


def test_length_check_pad(spark):
    # PAD: missing -> nulls, extra -> cut, bad field -> NULL
    df = decode_envelope(
        envelope(spark, DIRTY), "a INT, b STRING", options={"lengthCheck": "PAD"}
    )
    assert sorted(
        ((r.a, r.b) for r in df.collect()),
        key=lambda t: (t[0] is None, t),
    ) == [(1, "x"), (2, None), (3, "y"), (None, "w")]


def test_length_check_exception(spark):
    df = decode_envelope(
        envelope(spark, ["1"]), "a INT, b STRING", options={"lengthCheck": "EXCEPTION"}
    )
    with pytest.raises(Exception, match="fewer fields"):
        df.collect()


def test_unknown_option_rejected(spark):
    from rocketmq_flink_spark.config import OptionError

    with pytest.raises(OptionError, match="unsupported option"):
        decode_envelope(envelope(spark, ["1"]), "a INT", options={"bogus": "1"})


def test_option_case_insensitive(spark):
    df = decode_envelope(
        envelope(spark, ["1|x"]),
        "a INT, b STRING",
        options={"FIELDDELIMITER": "|"},
    )
    assert [(r.a, r.b) for r in df.collect()] == [(1, "x")]


# --- encode ----------------------------------------------------------------


def test_encode_decode_roundtrip(spark):
    src = spark.createDataFrame(
        [(1, "alice", 3.5, dt.datetime(2024, 1, 2, 3, 4, 5)), (2, None, None, None)],
        "id INT, name STRING, score DOUBLE, ts TIMESTAMP",
    )
    env = encode_rows(src, options={"topic": "rt"})
    back = decode_envelope(env, "id INT, name STRING, score DOUBLE, ts TIMESTAMP")
    got = sorted([tuple(r) for r in back.collect()])
    want = sorted([tuple(r) for r in src.collect()])
    assert got == want


def test_encode_key_and_dynamic_columns(spark):
    src = spark.createDataFrame(
        [("o1", "alice", "iphone 12", "hot")],
        "id STRING, user STRING, item STRING, tagcol STRING",
    )
    env = encode_rows(
        src,
        options={
            "topic": "orders",
            "keyColumns": "id",
            "isDynamicTag": "true",
            "dynamicTagColumn": "tagcol",
            "isDynamicProperty": "true",
            "dynamicPropertyColumns": "user,item",
        },
    )
    row = env.collect()[0]
    assert row.keys == "o1"
    assert row.tags == "hot"
    assert dict(row.props) == {"user": "alice", "item": "iphone 12"}
    # body excludes key and property columns; the dynamic tag column stays
    # because dynamicTagColumnWriteIncluded defaults TRUE
    # (reference RocketMQOptions.java:70)
    assert bytes(row.value) == b"hot"


def test_encode_dynamic_tag_excluded_when_not_included(spark):
    src = spark.createDataFrame(
        [("a", "hot")], "payload STRING, tagcol STRING"
    )
    env = encode_rows(
        src,
        options={
            "topic": "t",
            "isDynamicTag": "true",
            "dynamicTagColumn": "tagcol",
            "dynamicTagColumnWriteIncluded": "false",
        },
    )
    row = env.collect()[0]
    assert row.tags == "hot"
    assert bytes(row.value) == b"a"  # tag column excluded from the body


def test_decode_rejects_empty_field_delimiter(spark):
    with pytest.raises(ValueError, match="fieldDelimiter"):
        decode_envelope(
            envelope(spark, ["1,2"]),
            "a INT, b INT",
            options={"fieldDelimiter": ""},
        )


def test_encode_write_keys_to_body(spark):
    src = spark.createDataFrame([("k1", "v1")], "id STRING, payload STRING")
    env = encode_rows(
        src, options={"topic": "t", "keyColumns": "id", "writeKeysToBody": "true"}
    )
    row = env.collect()[0]
    assert bytes(row.value) == b"k1\x01v1"


def test_encode_null_sentinel_keeps_positions(spark):
    src = spark.createDataFrame([(None, "x")], "a STRING, b STRING")
    env = encode_rows(src, options={"topic": "t"})
    assert bytes(env.collect()[0].value) == b"\\N\x01x"
