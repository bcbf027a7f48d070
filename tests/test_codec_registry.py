"""Codec plug-point tests (SURVEY.md §2.7): user-registered codec
classes — the KeyValueDeserializationSchema analog
(reference legacy/common/serialization/KeyValueDeserializationSchema.java:25-27)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rocketmq_flink_spark.functions import (
    MessageCodec,
    decode_with,
    encode_with,
    get_codec,
    register_codec,
)


class JsonBodyCodec(MessageCodec):
    """User codec: message body is a JSON object of the row."""

    def encode(self, df, options=None):
        return df.select(
            F.lit(None).cast("string").alias("keys"),
            F.lit(None).cast("string").alias("tags"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.encode(F.to_json(F.struct(*df.columns)), "UTF-8").alias("value"),
            F.current_timestamp().alias("born_ts"),
        )

    def decode(self, df, schema=None, options=None):
        parsed = F.from_json(F.decode(F.col("value"), "UTF-8"), schema)
        return df.select(parsed.alias("_r")).select("_r.*")


def test_register_and_roundtrip_custom_codec(spark):
    register_codec("json-body", JsonBodyCodec)
    src = spark.createDataFrame(
        [(1, "alice", 3.5), (2, None, None)], "id INT, name STRING, score DOUBLE"
    )
    env = encode_with(src, "json-body")
    back = decode_with(env, "json-body", schema="id INT, name STRING, score DOUBLE")
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_codec_through_sql_surface_and_broker(spark, tmp_path):
    """End-to-end: custom codec rows through the broker sink, read back
    via create_table(codec=...) — the full SPI-style plug path."""
    from rocketmq_flink_spark.sources import register
    from rocketmq_flink_spark.sql import create_table

    register(spark)
    register_codec("json-body", JsonBodyCodec)
    root = str(tmp_path / "broker")

    src = spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, None)], "k INT, v STRING"
    )
    env = encode_with(src, "json-body")
    env.write.format("rocketmq").options(path=root, topic="j").mode("append").save()

    df = create_table(
        spark, "json_view",
        {"path": root, "topic": "j", "codec": "json-body"},
        schema="k INT, v STRING",
    )
    got = spark.sql("SELECT * FROM json_view")
    assert got.exceptAll(src).count() == 0 and src.exceptAll(got).count() == 0
    assert df.schema.simpleString() == "struct<k:int,v:string>"


def test_builtin_codecs_present_and_unknown_rejected(spark):
    for name in ("delimited", "simple-kv", "raw"):
        assert get_codec(name) is not None
    with pytest.raises(ValueError, match="unknown codec"):
        get_codec("nope")
    with pytest.raises(TypeError):
        register_codec("bad", object())


def test_simple_kv_codec_identity(spark):
    src = spark.createDataFrame([("a", "1"), ("b", "2")], "key STRING, value STRING")
    env = encode_with(src, "simple-kv")
    back = decode_with(env, "simple-kv")
    assert sorted((r.key, r.value) for r in back.collect()) == [("a", "1"), ("b", "2")]


def test_json_codec_roundtrip_through_registry(spark):
    from pyspark.sql import functions as F

    from rocketmq_flink_spark.functions.registry import (
        decode_with,
        encode_with,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, None)],
        "id BIGINT, s STRING, v DOUBLE",
    )
    env = encode_with(df, "json", {"topic": "t", "keyColumns": "id"})
    assert env.columns == ["topic", "keys", "tags", "props", "value", "born_ts"]
    assert [r.keys for r in env.orderBy("keys").collect()] == ["1", "2", "3"]
    back = decode_with(env, "json", schema="id BIGINT, s STRING, v DOUBLE")
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0
    # nulls survive (absent JSON fields decode to NULL)
    row = back.where(F.col("id") == 3).first()
    assert row.s is None and row.v is None
