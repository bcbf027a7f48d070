"""User-pluggable codec registry (SURVEY.md §2.7).

The reference's extension points are serde interfaces users implement
and hand to the connector:
- KeyValueDeserializationSchema (legacy/common/serialization/
  KeyValueDeserializationSchema.java:25-27)
- KeyValueSerializationSchema (.../KeyValueSerializationSchema.java:21-26)
- RocketMQDeserializationSchema (source/reader/deserializer/
  RocketMQDeserializationSchema.java:31-59)

The Spark-idiomatic equivalent is a registry of named codec objects,
each mapping the message ENVELOPE DataFrame (topic, keys, tags, props,
born_ts, value, ...) to typed rows and back with ordinary DataFrame
transformations — the codec author gets the whole Catalyst/pandas_udf
toolbox instead of a byte[]-level interface, and the codec stays on the
JVM/Arrow fast path instead of a per-row Python hop.

Codecs are resolved by name wherever the option surface accepts
`codec=<name>` (sql.create_table / create_stream_table, or directly via
decode_with/encode_with). Built-ins:
- "delimited": the reference's RowDeserializationSchema path (D1-D3) /
  RowDataConverter path (D11) — the default wire format.
- "simple-kv": SimpleKeyValue(De)SerializationSchema (D7/D9).
- "raw": ForwardMessageExtDeserialization (D10) — envelope passthrough.
- "json": JSON bodies via from_json/to_json (what a reference user
  hand-writes against KeyValueDeserializationSchema; here it is pure
  Catalyst expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "MessageCodec",
    "register_codec",
    "get_codec",
    "registered_codecs",
    "decode_with",
    "encode_with",
]


class MessageCodec:
    """Base interface (KeyValueDeserializationSchema analog).

    Subclass and override either or both directions; register with
    register_codec(name, instance). Both methods are DataFrame ->
    DataFrame so implementations compose with the whole relational
    surface and never force row-at-a-time Python.
    """

    def decode(
        self, df: DataFrame, schema=None, options: dict | None = None
    ) -> DataFrame:
        """Envelope frame -> typed rows."""
        raise NotImplementedError(f"{type(self).__name__} cannot decode")

    def encode(self, df: DataFrame, options: dict | None = None) -> DataFrame:
        """Typed rows -> envelope frame (keys/tags/props/value/born_ts)."""
        raise NotImplementedError(f"{type(self).__name__} cannot encode")


_REGISTRY: dict[str, MessageCodec] = {}


def register_codec(name: str, codec: MessageCodec) -> None:
    """Register (or replace) a codec under `name` — the SPI-registration
    analog (META-INF/services). Accepts a class too, instantiating it."""
    if isinstance(codec, type):
        codec = codec()
    if not isinstance(codec, MessageCodec):
        raise TypeError("codec must be a MessageCodec instance or subclass")
    _REGISTRY[name.lower()] = codec


def get_codec(name: str) -> MessageCodec:
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown codec {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_codecs() -> dict[str, MessageCodec]:
    return dict(_REGISTRY)


def decode_with(
    df: DataFrame, codec: str, schema=None, options: dict | None = None
) -> DataFrame:
    return get_codec(codec).decode(df, schema=schema, options=options)


def encode_with(df: DataFrame, codec: str, options: dict | None = None) -> DataFrame:
    return get_codec(codec).encode(df, options=options)


class _DelimitedCodec(MessageCodec):
    """Default wire format: delimited text + property-bag headers."""

    def decode(self, df, schema=None, options=None):
        from rocketmq_flink_spark.functions.codec import decode_envelope

        if schema is None:
            raise ValueError("delimited codec requires a schema")
        return decode_envelope(df, schema=schema, options=options)

    def encode(self, df, options=None):
        from rocketmq_flink_spark.functions.codec import encode_rows

        return encode_rows(df, options=options)


class _SimpleKVCodec(MessageCodec):
    def decode(self, df, schema=None, options=None):
        from rocketmq_flink_spark.functions.codec import decode_simple_key_value

        opts = options or {}
        return decode_simple_key_value(
            df,
            key_field=opts.get("keyField", "key"),
            value_field=opts.get("valueField", "value"),
            encoding=opts.get("encoding", "UTF-8"),
        )

    def encode(self, df, options=None):
        from rocketmq_flink_spark.functions.codec import encode_simple_key_value

        opts = options or {}
        return encode_simple_key_value(
            df,
            key_field=opts.get("keyField", "key"),
            value_field=opts.get("valueField", "value"),
            encoding=opts.get("encoding", "UTF-8"),
        )


class _RawCodec(MessageCodec):
    """Envelope passthrough (ForwardMessageExtDeserialization, D10)."""

    def decode(self, df, schema=None, options=None):
        return df

    def encode(self, df, options=None):
        return df


class _JsonCodec(MessageCodec):
    """JSON message bodies via Catalyst's from_json/to_json — the kind
    of codec a reference user would hand-write against
    KeyValueDeserializationSchema (byte[] -> POJO); here it stays
    whole-stage-codegen JVM expressions end to end. Options:
    `timestampFormat`/`dateFormat` pass through to the JSON reader;
    key columns route per `keyColumns` on encode."""

    def decode(self, df, schema=None, options=None):
        from pyspark.sql import functions as F

        from rocketmq_flink_spark.functions.codec import _as_struct_type

        if schema is None:
            raise ValueError("json codec requires a schema")
        struct = _as_struct_type(schema)
        opts = dict(options or {})
        json_opts = {
            k: opts[k]
            for k in ("timestampFormat", "dateFormat")
            if k in opts
        }
        parsed = F.from_json(
            F.decode(F.col("value"), opts.get("encoding", "UTF-8")),
            struct,
            json_opts,
        )
        return df.select(
            *[parsed.getField(f.name).alias(f.name) for f in struct.fields]
        )

    def encode(self, df, options=None):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from rocketmq_flink_spark.config import parse_csv

        opts = dict(options or {})
        key_columns = parse_csv(opts.get("keyColumns"))
        keys = (
            F.concat_ws(",", *[F.col(c).cast("string") for c in key_columns])
            if key_columns
            else F.lit(None).cast(T.StringType())
        )
        return df.select(
            F.lit(opts.get("topic", "")).alias("topic"),
            keys.alias("keys"),
            F.lit(opts.get("tag")).cast(T.StringType()).alias("tags"),
            F.lit(None)
            .cast(T.MapType(T.StringType(), T.StringType()))
            .alias("props"),
            F.encode(
                F.to_json(
                    F.struct(*df.columns),
                    {
                        k: opts[k]
                        for k in ("timestampFormat", "dateFormat")
                        if k in opts
                    },
                ),
                opts.get("encoding", "UTF-8"),
            ).alias("value"),
            F.current_timestamp().alias("born_ts"),
        )


register_codec("delimited", _DelimitedCodec())
register_codec("simple-kv", _SimpleKVCodec())
register_codec("raw", _RawCodec())
register_codec("json", _JsonCodec())
