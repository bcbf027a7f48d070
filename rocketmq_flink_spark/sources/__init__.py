"""Message-log source/sink: local broker simulation + Python DataSource.

The broker stands in for RocketMQ's nameserver/broker pair: topics are
directories, queues are subdirectories, messages live in immutable
offset-named parquet segments. The DataSource exposes it to Spark as
`spark.read/readStream/write/writeStream.format("rocketmq")`.
"""

from rocketmq_flink_spark.sources.broker import (  # noqa: F401
    Broker,
    check_acl,
    set_acl,
)
from rocketmq_flink_spark.sources.datasource import (  # noqa: F401
    RocketMQDataSource,
    register,
)
