"""Scalar/codec function layer (the connector's "functions" surface).

All implemented as built-in pyspark.sql.functions expressions so they stay
inside whole-stage codegen — no Python UDFs in the decode/encode hot path.
"""

from rocketmq_flink_spark.functions.codec import (  # noqa: F401
    decode_envelope,
    encode_rows,
)
from rocketmq_flink_spark.functions.types import coerce_string  # noqa: F401
