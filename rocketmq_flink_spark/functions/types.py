"""String -> typed-value coercion matrix.

Re-expresses the reference's StringSerializer.deserialize
(src/main/java/org/apache/rocketmq/flink/source/util/StringSerializer.java:
41-135) as Catalyst expressions:

- numeric parseX           -> cast
- boolean true/false/1/0   -> explicit when-chain (lines 137-153)
- TIMESTAMP epoch-millis OR text (lines 87-99) -> regex dispatch
- DATE yyyy-MM-dd (100-107) -> to_date
- TIME epoch-millis-of-day (108-115) -> long, or HH:mm:ss text
- DECIMAL precision/scale (116-123) -> cast to DecimalType(p, s)
- VARBINARY raw bytes (59-70)       -> encode(value, charset)
- null-sentinel set (55-57)         -> isin -> NULL

Everything is a pure Column expression: JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rocketmq_flink_spark.schema import is_time_field

_INT_RE = r"^[+-]?\d+$"


def _nullify(raw: Column, null_values: list[str]) -> Column:
    cond = raw.isNull()
    if null_values:
        cond = cond | raw.isin(*null_values)
    return F.when(cond, F.lit(None).cast(T.StringType())).otherwise(raw)


def coerce_string(
    raw: Column,
    field: T.StructField,
    null_values: list[str] | None = None,
    encoding: str = "UTF-8",
) -> Column:
    """Coerce a raw string column to the declared field type.

    Returns NULL on unparseable input (the caller's dirty-data policy
    decides whether that nulls the field, drops the row, or raises).
    """
    null_values = null_values if null_values is not None else ["\\N"]
    raw = _nullify(raw, null_values)
    dt = field.dataType

    if is_time_field(field):
        # TIME: epoch millis-of-day, or HH:mm:ss[.SSS] text.
        as_text = F.try_to_timestamp(F.concat(F.lit("1970-01-01 "), raw))
        return (
            F.when(raw.rlike(_INT_RE), raw.cast(T.LongType()))
            .otherwise(
                (F.unix_micros(as_text) / 1000).cast(T.LongType())
            )
        )

    if isinstance(dt, T.StringType):
        return raw
    if isinstance(dt, T.BooleanType):
        lowered = F.lower(F.trim(raw))
        return (
            F.when(lowered.isin("true", "1"), F.lit(True))
            .when(lowered.isin("false", "0"), F.lit(False))
            .otherwise(F.lit(None).cast(T.BooleanType()))
        )
    if isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return F.when(raw.rlike(_INT_RE), raw.cast(dt)).otherwise(
            F.lit(None).cast(dt)
        )
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        # try_cast: unparseable -> NULL (ANSI mode is on in Spark 4; the
        # dirty-data policy decides what happens to the NULL).
        return raw.try_cast(dt)
    if isinstance(dt, T.DateType):
        return F.try_to_timestamp(raw, F.lit("yyyy-MM-dd")).cast(T.DateType())
    if isinstance(dt, T.TimestampType):
        # Epoch-millis integer or timestamp text (dual format, ref lines 87-99).
        return F.when(
            raw.rlike(_INT_RE), F.timestamp_millis(raw.cast(T.LongType()))
        ).otherwise(F.try_to_timestamp(raw))
    if isinstance(dt, T.BinaryType):
        return F.encode(raw, encoding)
    raise TypeError(f"unsupported declared type for codec: {dt}")


def stringify(col: Column, field: T.StructField) -> Column:
    """Typed value -> wire string, the inverse of coerce_string.

    Timestamps are written as ISO text with microseconds (the decoder's
    dual-format TIMESTAMP parse accepts text alongside epoch millis,
    reference StringSerializer.java:87-99) so encode -> decode round-trips
    losslessly; TIME is millis-of-day.
    """
    dt = field.dataType
    if is_time_field(field):
        return col.cast(T.StringType())
    if isinstance(dt, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if isinstance(dt, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dt, T.BinaryType):
        return F.decode(col, "UTF-8")
    return col.cast(T.StringType())
