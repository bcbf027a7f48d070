"""Message envelope schema and type mapping.

The reference models a message as body bytes + a flat string->string
user-property bag plus stamped metadata properties
(reference: src/main/java/org/apache/rocketmq/flink/source/reader/
deserializer/RocketMQRowDeserializationSchema.java:78-96 stamps
__topic__, __store_timestamp__, __born_timestamp__, __queue_id__,
__queue_offset__, __msg_id__, __keys__, __tags__). Here those are real
typed columns on the envelope DataFrame — Catalyst prunes the ones a
query doesn't select.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Column order mirrors FIXTURES.md A5.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("queue_id", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("msg_id", T.StringType(), True),
        T.StructField("keys", T.StringType(), True),
        T.StructField("tags", T.StringType(), True),
        T.StructField("born_ts", T.TimestampType(), True),
        T.StructField("store_ts", T.TimestampType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("value", T.BinaryType(), True),
    ]
)

ENVELOPE_COLUMNS = [f.name for f in ENVELOPE_SCHEMA.fields]

# Metadata columns a reader may project (reference's readable metadata is
# `topic`; we expose the full stamped set, Kafka-source style).
METADATA_COLUMNS = (
    "topic",
    "queue_id",
    "offset",
    "msg_id",
    "keys",
    "tags",
    "born_ts",
    "store_ts",
)

# Reference TIME columns have no Spark equivalent; a LongType field whose
# metadata carries this marker is parsed as millis-of-day
# (reference: source/util/StringSerializer.java:108-115 parses TIME from
# epoch-millis; SURVEY.md maps TIME -> LongType).
TIME_TYPE_MARKER = "rocketmq.type"
TIME_TYPE_VALUE = "TIME"


def time_field(name: str, nullable: bool = True) -> T.StructField:
    """Declare a TIME column (millis-of-day stored as LongType)."""
    return T.StructField(
        name, T.LongType(), nullable, metadata={TIME_TYPE_MARKER: TIME_TYPE_VALUE}
    )


def is_time_field(field: T.StructField) -> bool:
    try:
        return field.metadata.get(TIME_TYPE_MARKER) == TIME_TYPE_VALUE
    except AttributeError:
        return False
