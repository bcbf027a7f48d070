"""PySpark Python DataSource for the message log ("rocketmq" format).

Maps the reference's three integration levels onto Spark's unified one:
- FLIP-27 Source (RocketMQSource.java:52-181)          -> DataSourceStreamReader
- bounded table scan (RocketMQScanTableSource)          -> DataSourceReader
- SinkFunction / DynamicTableSink (RocketMQSink.java)   -> (Stream)Writer

Split model: one input partition per (queue, offset-range) — the analog
of RocketMQPartitionSplit. Partition discovery re-lists queue dirs every
batch (the enumerator's periodic discovery,
RocketMQSourceEnumerator.java:148-160, with interval 0). Reader->task
assignment is left to Spark's scheduler (the reference's getSplitOwner
hash exists only because Flink pins splits to readers).

Offset surface (reference: RocketMQOptions + RocketMQSourceFunction
initOffset, legacy/RocketMQSourceFunction.java:330-365):
  startingOffsets = earliest | latest | timestamp:<ms> | {"<queue>": off}
  endingTimestamp = <epoch ms>   (bounded read / stopInMs, W6)
  tag             = broker-side tag filter (P1) applied in read()
  maxOffsetsPerTrigger = per-microbatch rate cap across queues
  maxRecordsPerPartition = split large offset ranges for parallelism

Scale notes: read() yields Arrow RecordBatches (vectorized into Spark,
no per-row Python); ranges are chunked so a backlogged queue fans out
across tasks instead of serializing into one.
"""

from __future__ import annotations

import json
import time
import zlib

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from rocketmq_flink_spark.config import (
    normalize_options,
    parse_datetime_ms,
    require,
)
from rocketmq_flink_spark.sources.broker import SEGMENT_SCHEMA, Broker
from rocketmq_flink_spark.sources.retry import call_with_retry, retry_params

ENVELOPE_DDL = (
    "topic string, queue_id int, offset bigint, msg_id string, keys string, "
    "tags string, born_ts timestamp, store_ts timestamp, "
    "props map<string,string>, value binary"
)

ARROW_ENVELOPE = pa.schema(
    [
        ("topic", pa.string()),
        ("queue_id", pa.int32()),
        ("offset", pa.int64()),
        ("msg_id", pa.string()),
        ("keys", pa.string()),
        ("tags", pa.string()),
        ("born_ts", pa.timestamp("us")),
        ("store_ts", pa.timestamp("us")),
        ("props", pa.map_(pa.string(), pa.string())),
        ("value", pa.binary()),
    ]
)

class QueueRange(InputPartition):
    def __init__(self, root: str, topic: str, queue_id: int, start: int, end: int,
                 tag: str | None, sql: str | None = None):
        self.root = root
        self.topic = topic
        self.queue_id = queue_id
        self.start = start
        self.end = end
        self.tag = tag
        self.sql = sql


def _read_partition(part: QueueRange):
    """Executor-side scan of one queue offset-range -> Arrow batches."""
    broker = Broker(part.root)
    tbl = call_with_retry(
        lambda: broker.read_range(part.topic, part.queue_id, part.start, part.end)
    )
    if tbl.num_rows == 0:
        return
    if part.tag and part.tag != "*":
        import pyarrow.compute as pc

        # Broker-side tag filter analog (consumer.pull(mq, tag, ...),
        # RocketMQPartitionSplitReader.java:161-163). Tag option supports
        # the 'a || b' subscription syntax.
        tags = [t.strip() for t in part.tag.split("||")]
        tbl = tbl.filter(pc.is_in(tbl.column("tags"), value_set=pa.array(tags)))
        if tbl.num_rows == 0:
            return
    if part.sql:
        # SQL92 property filter (P2): the reference broker evaluates the
        # predicate per message when enablePropertyFilter=true; this
        # reader IS the broker side of the local simulation, so the
        # filter runs here, below the DataFrame layer. Compiled once per
        # partition, evaluated per message like the reference.
        from rocketmq_flink_spark.functions.sql92 import compile_sql92

        pred = compile_sql92(part.sql)
        props_rows = tbl.column("props").to_pylist()
        mask = pa.array([pred(dict(kvs or [])) for kvs in props_rows])
        tbl = tbl.filter(mask)
        if tbl.num_rows == 0:
            return
    n = tbl.num_rows
    arrays = [
        pa.array([part.topic] * n, pa.string()),
        pa.array([part.queue_id] * n, pa.int32()),
        tbl.column("offset").combine_chunks(),
        tbl.column("msg_id").combine_chunks(),
        tbl.column("keys").combine_chunks(),
        tbl.column("tags").combine_chunks(),
        tbl.column("born_ts").combine_chunks().cast(pa.timestamp("us")),
        tbl.column("store_ts").combine_chunks().cast(pa.timestamp("us")),
        tbl.column("props").combine_chunks(),
        tbl.column("body").combine_chunks(),
    ]
    yield pa.RecordBatch.from_arrays(arrays, schema=ARROW_ENVELOPE)


def _validated_sql(opts: dict) -> str | None:
    """Compile-check the SQL92 `sql` option at plan time (factory
    validation analog) and return it for executor-side evaluation."""
    sql = opts.get("sql")
    if not sql:
        return None
    from rocketmq_flink_spark.functions.sql92 import compile_sql92

    compile_sql92(sql)  # raises Sql92Error on malformed input
    return sql


def _starting_offsets_spec(opts: dict) -> str:
    """Resolve the starting-position option precedence (reference:
    RocketMQDynamicTableSourceFactory.java:114-148 + legacy initOffset,
    RocketMQSourceFunction.java:330-365): an explicit startingOffsets
    wins, then startMessageOffset, then startTimeMs, then startTime
    ('yyyy-MM-dd HH:mm:ss' in timeZone)."""
    spec = opts.get("startingOffsets")
    if spec and spec != "earliest":
        return spec
    if opts.get("startMessageOffset"):
        return '{"*": %d}' % int(opts["startMessageOffset"])
    if opts.get("startTimeMs"):
        return f"timestamp:{int(opts['startTimeMs'])}"
    if opts.get("startTime"):
        ms = parse_datetime_ms(opts["startTime"], opts.get("timeZone"))
        return f"timestamp:{ms}"
    return spec or "earliest"


def _ending_ts_ms(opts: dict) -> int | None:
    """endingTimestamp (epoch ms) or endTime datetime -> stopInMs (W6)."""
    if opts.get("endingTimestamp"):
        return int(opts["endingTimestamp"])
    if opts.get("endTime"):
        return parse_datetime_ms(opts["endTime"], opts.get("timeZone"))
    return None


def _resolve_start(broker: Broker, topic: str, queue_id: int, spec: str) -> int:
    spec = (spec or "earliest").strip()
    if spec == "earliest":
        return broker.earliest_offset(topic, queue_id)
    if spec == "latest":
        return broker.latest_offset(topic, queue_id)
    if spec.startswith("timestamp:"):
        ts_ms = int(spec.split(":", 1)[1])
        return broker.offset_for_timestamp(topic, queue_id, ts_ms * 1000)
    if spec.startswith("{"):
        explicit = json.loads(spec)
        return int(explicit.get(str(queue_id), explicit.get("*", 0)))
    raise ValueError(f"invalid startingOffsets: {spec!r}")


def _chunk(start: int, end: int, max_records: int):
    lo = start
    while lo < end:
        hi = min(lo + max_records, end)
        yield lo, hi
        lo = hi


class RocketMQBatchReader(DataSourceReader):
    """Bounded scan (reference boundedness: stopInMs / endTime, S14/W6)."""

    def __init__(self, options: dict):
        self.opts = normalize_options(dict(options))
        require(self.opts, "path", "topic")
        self.root = self.opts["path"]
        self.topic = self.opts["topic"]
        self.tag = self.opts.get("tag", "*")
        self.sql = _validated_sql(self.opts)
        self.max_records = int(self.opts.get("maxRecordsPerPartition", "500000"))

    def partitions(self):
        from rocketmq_flink_spark.sources.broker import check_acl

        check_acl(self.root, self.opts.get("accessKey"), self.opts.get("secretKey"))
        broker = Broker(self.root)
        ending_ts = _ending_ts_ms(self.opts)
        start_spec = _starting_offsets_spec(self.opts)
        parts = []
        for q in broker.queues(self.topic):
            start = _resolve_start(broker, self.topic, q, start_spec)
            if ending_ts is not None:
                end = broker.offset_for_timestamp(
                    self.topic, q, (ending_ts + 1) * 1000
                )
            else:
                end = broker.latest_offset(self.topic, q)
            for lo, hi in _chunk(start, max(end, start), self.max_records):
                parts.append(QueueRange(self.root, self.topic, q, lo, hi, self.tag,
                                        self.sql))
        return parts or [
            QueueRange(self.root, self.topic, -1, 0, 0, self.tag, self.sql)
        ]

    def read(self, partition: QueueRange):
        if partition.queue_id < 0:
            return iter(())
        return _read_partition(partition)


class RocketMQStreamReader(DataSourceStreamReader):
    """Microbatch streaming source; offsets are {queue_id: next_offset}
    JSON dicts checkpointed by Structured Streaming (the analog of the
    reference's union-state offset snapshot, W7)."""

    def __init__(self, options: dict):
        self.opts = normalize_options(dict(options))
        require(self.opts, "path", "topic")
        self.root = self.opts["path"]
        self.topic = self.opts["topic"]
        self.tag = self.opts.get("tag", "*")
        self.sql = _validated_sql(self.opts)
        self.max_records = int(self.opts.get("maxRecordsPerPartition", "500000"))
        self.max_per_trigger = self.opts.get("maxOffsetsPerTrigger")
        self._cursor: dict | None = None  # last end offsets handed to Spark

    def _broker(self) -> Broker:
        return Broker(self.root)

    def initialOffset(self) -> dict:
        from rocketmq_flink_spark.sources.broker import check_acl

        check_acl(self.root, self.opts.get("accessKey"), self.opts.get("secretKey"))
        broker = self._broker()
        init = {
            str(q): _resolve_start(
                broker, self.topic, q, _starting_offsets_spec(self.opts)
            )
            for q in broker.queues(self.topic)
        }
        self._cursor = dict(init)
        return init

    def latestOffset(self) -> dict:
        """Next batch end offsets. The maxOffsetsPerTrigger cap MUST be
        applied here (not in partitions()): whatever this returns goes
        into the offset log as the batch's committed end, so capping any
        later would silently skip messages."""
        broker = self._broker()
        latest = {
            str(q): broker.latest_offset(self.topic, q)
            for q in broker.queues(self.topic)
        }
        if not self.max_per_trigger:
            self._cursor = dict(latest)
            return latest
        cursor = self._cursor
        if cursor is None:
            # Spark calls latestOffset() BEFORE initialOffset() on a fresh
            # query, so seed the cursor from the configured start. After a
            # checkpoint restart the true position may be further ahead;
            # partitions() resyncs the cursor to max(start, end), costing
            # at most one undersized batch.
            broker2 = self._broker()
            cursor = {
                str(q): _resolve_start(
                    broker2, self.topic, q, _starting_offsets_spec(self.opts)
                )
                for q in broker2.queues(self.topic)
            }
        budget = int(self.max_per_trigger)
        capped = {}
        for q_str, latest_off in sorted(latest.items()):
            cur = int(cursor.get(q_str, 0))
            take = max(min(int(latest_off) - cur, budget), 0)
            capped[q_str] = cur + take
            budget -= take
        self._cursor = dict(capped)
        return capped

    def partitions(self, start: dict, end: dict):
        # resync the cap cursor (handles checkpoint restarts, where the
        # offset log's position is ahead of the configured start)
        self._cursor = {
            q: max(int(end.get(q, 0)), int(start.get(q, 0)))
            for q in set(start) | set(end)
        }
        parts = []
        for q_str, end_off in sorted(end.items()):
            q = int(q_str)
            start_off = int(start.get(q_str, 0))
            for lo, hi in _chunk(start_off, max(int(end_off), start_off),
                                 self.max_records):
                parts.append(QueueRange(self.root, self.topic, q, lo, hi, self.tag,
                                        self.sql))
        return parts or [
            QueueRange(self.root, self.topic, -1, 0, 0, self.tag, self.sql)
        ]

    def read(self, partition: QueueRange):
        if partition.queue_id < 0:
            return iter(())
        return _read_partition(partition)

    def commit(self, end: dict) -> None:
        # Offsets live in Spark's checkpoint (commit log); the reference's
        # broker-side commit (notifyCheckpointComplete) has no analog here.
        pass


class StagedBatch(WriterCommitMessage):
    def __init__(self, staged: list[tuple[str, int, str]]):
        self.staged = staged  # (topic, queue_id, tmp_path)


def _write_rows(root: str, topic: str, num_queues: int, iterator):
    """Task-side write: group rows by (topic, queue), stage one parquet
    per bucket.

    Input rows follow the encode_rows envelope (keys, tags, props, value,
    born_ts [, queue_id]). A non-empty `topic` column overrides the
    option topic per row — the TopicSelector surface (R1-R3), Kafka-sink
    style. Queue routing: explicit queue_id column if present, else
    hash(keys) % numQueues, else a per-task round-robin — mirroring the
    reference's MessageQueueSelector usage.
    """
    from pyspark.sql import Row  # noqa: F401

    buckets: dict[tuple[str, int], dict[str, list]] = {}
    rr = 0
    for row in iterator:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        row_topic = d.get("topic") or topic
        qid = d.get("queue_id")
        if qid is None:
            keys = d.get("keys")
            if keys is not None:
                # stable across processes (builtin hash is salted per run)
                qid = zlib.crc32(str(keys).encode("utf-8")) % num_queues
            else:
                qid = rr % num_queues
                rr += 1
        qid = int(qid)
        b = buckets.setdefault(
            (row_topic, qid),
            {"born_ts": [], "keys": [], "tags": [], "props": [], "body": []},
        )
        born = d.get("born_ts")
        b["born_ts"].append(
            int(born.timestamp() * 1_000_000) if born is not None else 0
        )
        b["keys"].append(d.get("keys"))
        b["tags"].append(d.get("tags"))
        props = d.get("props")
        b["props"].append(list(props.items()) if props else [])
        body = d.get("value")
        b["body"].append(bytes(body) if body is not None else b"")

    broker = Broker(root)
    staged = []
    for (btopic, qid), b in buckets.items():
        n = len(b["body"])
        tbl = pa.Table.from_arrays(
            [
                pa.array([0] * n, pa.int64()),  # offset: assigned at commit
                pa.array(b["born_ts"], pa.int64()),
                pa.array([0] * n, pa.int64()),  # store_ts: stamped at commit
                pa.array([""] * n, pa.string()),  # msg_id: stamped at commit
                pa.array(b["keys"], pa.string()),
                pa.array(b["tags"], pa.string()),
                pa.array(b["props"], pa.map_(pa.string(), pa.string())),
                pa.array(b["body"], pa.binary()),
            ],
            schema=SEGMENT_SCHEMA,
        )
        staged.append((btopic, qid, broker.write_tmp(btopic, tbl)))
    return StagedBatch(staged)


def _commit_staged(
    root: str,
    staged: list[tuple[str, int, str]],
    epoch_id: str | None,
    retry_opts: dict | None = None,
) -> None:
    """Commit staged batches grouped per topic (multi-topic sink).

    Commits retry with backoff (O1/RetryUtil; retryTimes/sleepTimeMs
    options override the exponential defaults, RocketMQSink-style)."""
    broker = Broker(root)
    store_ts_us = int(time.time() * 1_000_000)
    by_topic: dict[str, list[tuple[int, str]]] = {}
    for btopic, qid, path in staged:
        by_topic.setdefault(btopic, []).append((qid, path))
    kwargs = retry_params(retry_opts or {})
    for btopic, items in by_topic.items():
        call_with_retry(
            lambda t=btopic, i=items: broker.commit_tmp(
                t, i, store_ts_us=store_ts_us, epoch_id=epoch_id
            ),
            **kwargs,
        )


class RocketMQBatchWriter(DataSourceWriter):
    def __init__(self, options: dict):
        from rocketmq_flink_spark.sources.broker import check_acl

        self.opts = normalize_options(dict(options))
        require(self.opts, "path", "topic")
        self.root = self.opts["path"]
        self.topic = self.opts["topic"]
        self.num_queues = int(self.opts.get("numQueues", "8"))
        check_acl(self.root, self.opts.get("accessKey"), self.opts.get("secretKey"))

    def write(self, iterator):
        return _write_rows(self.root, self.topic, self.num_queues, iterator)

    def commit(self, messages):
        staged = [s for m in messages if m for s in m.staged]
        # `_epoch` (underscore-passthrough option) lets foreachBatch sinks
        # reuse the stream writer's idempotent-epoch commit (W9): a retried
        # epoch with the same id is a no-op instead of a duplicate.
        _commit_staged(self.root, staged, epoch_id=self.opts.get("_epoch"),
                       retry_opts=self.opts)

    def abort(self, messages):
        staged = [s for m in messages if m for s in m.staged]
        Broker(self.root).abort_tmp([(q, p) for _, q, p in staged])


class RocketMQStreamWriter(DataSourceStreamWriter):
    """Per-epoch commit (flush-on-checkpoint analog, W9); epoch markers
    make retried epochs idempotent."""

    def __init__(self, options: dict):
        from rocketmq_flink_spark.sources.broker import check_acl

        self.opts = normalize_options(dict(options))
        require(self.opts, "path", "topic")
        self.root = self.opts["path"]
        self.topic = self.opts["topic"]
        self.num_queues = int(self.opts.get("numQueues", "8"))
        check_acl(self.root, self.opts.get("accessKey"), self.opts.get("secretKey"))

    def write(self, iterator):
        return _write_rows(self.root, self.topic, self.num_queues, iterator)

    def commit(self, messages, batchId):
        staged = [s for m in messages if m for s in m.staged]
        _commit_staged(self.root, staged, epoch_id=str(batchId),
                       retry_opts=self.opts)

    def abort(self, messages, batchId):
        staged = [s for m in messages if m for s in m.staged]
        Broker(self.root).abort_tmp([(q, p) for _, q, p in staged])


class RocketMQDataSource(DataSource):
    """format("rocketmq") — batch + streaming, read + write."""

    @classmethod
    def name(cls) -> str:
        return "rocketmq"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema):
        return RocketMQBatchReader(self.options)

    def streamReader(self, schema):
        return RocketMQStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return RocketMQBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return RocketMQStreamWriter(self.options)


def register(spark) -> None:
    """Register the DataSource (the SPI META-INF/services analog, S13)."""
    spark.dataSource.register(RocketMQDataSource)
