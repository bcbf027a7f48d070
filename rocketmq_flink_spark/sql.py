"""SQL surface (SURVEY.md §7 M4).

The reference's Table/SQL integration is `CREATE TABLE ... WITH
('connector'='rocketmq', ...)` (README.md:144-156), resolved through the
DynamicTableSource/SinkFactory SPI. The Spark analog registers the
message log as a (temp) view over the DataSource, after which the full
Catalyst SQL surface — joins, windows, aggregates — applies, exactly as
Flink SQL applies to the reference's tables.

Why views and not `CREATE TABLE ... USING rocketmq`: probed directly
(round 5, pinned by test_sql_ddl_options_not_forwarded_probe) — on this
Spark build a SQL-created table over a Python DataSource hands the
reader an EMPTY options map at SELECT time, for all three spellings
(OPTIONS, TBLPROPERTIES, LOCATION), while the identical source through
`spark.read.format(...).options(...)` receives every option. Persistent
SQL tables over Python sources therefore cannot carry connector
options; the helpers below are the supported path and accept the same
option surface as `spark.read.format("rocketmq")` (PARITY S10a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rocketmq_flink_spark.config import normalize_options, require
from rocketmq_flink_spark.functions.codec import decode_envelope


def create_table(
    spark: SparkSession,
    name: str,
    options: dict,
    schema: str | None = None,
) -> DataFrame:
    """Register a bounded message-log scan as a temp view `name`.

    With `schema`, the view exposes decoded typed rows (header/data field
    projection, dirty-data policies — the deserializer path D1-D3);
    without it, the raw envelope (topic, queue_id, offset, keys, tags,
    props, born_ts, store_ts, value).

    The DDL analog (reference README.md:144-156):
        CREATE TABLE orders (...) WITH ('connector'='rocketmq', ...)
        -> create_table(spark, "orders", {...}, schema="...")
    """
    opts = normalize_options(options)
    require(opts, "path", "topic")
    df = spark.read.format("rocketmq").options(**options).load()
    df = _apply_codec(df, opts, schema, options)
    df.createOrReplaceTempView(name)
    return df


def create_stream_table(
    spark: SparkSession,
    name: str,
    options: dict,
    schema: str | None = None,
) -> DataFrame:
    """Streaming variant of create_table: the view is a streaming
    relation usable from `spark.sql` (windowed aggs need a watermark,
    added by the caller via with_event_time on the returned frame)."""
    opts = normalize_options(options)
    require(opts, "path", "topic")
    df = spark.readStream.format("rocketmq").options(**options).load()
    df = _apply_codec(df, opts, schema, options)
    df.createOrReplaceTempView(name)
    return df


def _apply_codec(df: DataFrame, opts, schema, options) -> DataFrame:
    """Resolve the decode step: a registered codec if the `codec` option
    names one (the user plug-point, SURVEY.md §2.7 — the
    KeyValueDeserializationSchema analog), else the default delimited
    deserializer when a schema is declared, else the raw envelope."""
    codec_name = opts.get("codec")
    if codec_name:
        from rocketmq_flink_spark.functions.registry import get_codec

        return get_codec(codec_name).decode(df, schema=schema, options=options)
    if schema is not None:
        return decode_envelope(df, schema=schema, options=options)
    return df
