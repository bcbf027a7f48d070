"""Bucketed (co-located) joins — pre-shuffle once, join forever free.

At 100 TB the dominant cost of a repeated big-big join is re-shuffling
both sides every query. Bucketing pays that shuffle once at write time:
both tables hash-partitioned into the same number of buckets on the
join key, so Catalyst plans the join with ZERO Exchange nodes (verified
in tests by inspecting the physical plan). This is the Spark-native
analog of co-partitioned message queues on matching keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Persist df as a bucketed (optionally sort-bucketed) table.

    Sorting within buckets additionally enables exchange-AND-sort-free
    sort-merge joins. num_buckets should divide evenly into cluster
    parallelism; at 100 TB pick buckets so one bucket's join side fits
    an executor (e.g. 4096 buckets for ~25 GB/bucket)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the plan
    contains no Exchange on either side."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan — the
    metric bucketing is meant to drive to zero. BroadcastExchange is not
    counted (broadcasting a small side is not a shuffle of the data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
