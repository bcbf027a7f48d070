"""rocketmq_flink_spark — a PySpark-native message-log analytics engine.

A from-scratch re-expression of the capabilities of the
shirukai/rocketmq-flink connector (reference: /root/reference), built
Spark-first:

- a partitioned, offset-addressed message-log source/sink implemented with
  the PySpark Python DataSource API (batch + Structured Streaming), with a
  deterministic local broker simulation standing in for RocketMQ;
- a codec layer (delimited-text/bytes <-> typed rows) with the reference's
  six dirty-data policies, header-vs-data field projection, and metadata
  columns — all pure DataFrame expressions (JVM-side, codegen'd);
- everything relational delegated to Catalyst, exactly as the reference
  delegates it to Flink;
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from rocketmq_flink_spark.session import get_spark  # noqa: F401
