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


register_codec("delimited", _DelimitedCodec())
register_codec("simple-kv", _SimpleKVCodec())
register_codec("raw", _RawCodec())
