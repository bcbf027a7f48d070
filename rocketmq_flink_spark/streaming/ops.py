"""Event-time operators: watermarks, windows, dedup, delay levels.

Reference parity map (paths under src/main/java/org/apache/rocketmq/flink):
- with_event_time      <- BoundedOutOfOrdernessGenerator.java:25-59 (W1) and
  the per-queue variant BoundedOutOfOrdernessGeneratorPerQueue.java:28-69
  (W2). W2 mapping (tested: test_per_queue_watermark_w2_equivalence):
  Spark's watermark is GLOBAL max event time minus delay, while the
  reference's per-queue generator takes the MIN over per-queue maxima —
  a queue lagging the fastest queue by S keeps its in-order records
  un-late. Reproduce that in Spark by setting
  delay = bound + max expected cross-queue skew (the test demonstrates
  exact window-result equality under the mapping and the divergence
  without it).
- tumbling/sliding/session windows <- not in the connector (host-engine
  Flink windows, SURVEY.md §2.6 W11); Spark built-ins window()/
  session_window().
- streaming_dedup      <- W12; dropDuplicates[WithinWatermark].
- delay levels         <- legacy/RocketMQConfig.java:95-114 MSG_DELAY_LEVEL
  (R8): 18 broker-fixed delay levels, level 0 = immediate delivery.

All helpers are DataFrame -> DataFrame and work identically on batch and
streaming frames (watermarks are a no-op in batch), so the same pipeline
definition can be oracle-checked in batch mode and deployed streaming.

Scale notes: windowed aggregations shuffle on (key, window) — Spark
computes partial aggregates map-side first, so the shuffle carries one
row per (key, window, partition), not per event. State store size is
bounded by the watermark; at 100 TB/day the knobs that matter are the
watermark delay (state retention) and shuffle partition count, both left
to the caller's session config.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_MAX_OUT_OF_ORDERNESS = "5 seconds"  # W1 default, 5000 ms

# RocketMQ broker delay levels (public: store config messageDelayLevel
# "1s 5s 10s 30s 1m 2m 3m 4m 5m 6m 7m 8m 9m 10m 20m 30m 1h 2h"); the
# reference exposes them as sink option MSG_DELAY_LEVEL00..18
# (legacy/RocketMQConfig.java:95-114). Index = level, [0] = no delay.
MSG_DELAY_LEVEL_SECONDS = (
    0,
    1, 5, 10, 30,
    60, 120, 180, 240, 300, 360, 420, 480, 540, 600,
    1200, 1800,
    3600, 7200,
)


def with_event_time(
    df: DataFrame,
    ts_col: str = "born_ts",
    max_out_of_orderness: str = DEFAULT_MAX_OUT_OF_ORDERNESS,
) -> DataFrame:
    """Declare event time + bounded out-of-orderness (W1/W2).

    On a streaming frame this is `withWatermark`; on a batch frame
    Spark accepts and ignores it, keeping pipelines dual-mode.
    """
    return df.withWatermark(ts_col, max_out_of_orderness)


def with_processing_time_lag(
    df: DataFrame,
    max_time_lag: str,
    ts_col: str = "proc_ts",
) -> DataFrame:
    """Processing-time-lag watermark approximation (W3,
    TimeLagWatermarkGenerator.java:29-53: watermark = now - maxTimeLag).

    Spark has no processing-time watermark generator, so this stamps
    each row with an ingestion timestamp (current_timestamp(), evaluated
    per microbatch) and declares the watermark on that column: the
    watermark then trails the max observed processing time by
    max_time_lag — the reference's semantics, at microbatch granularity.

    Documented divergence from the reference: the lag is measured from
    the INGESTION batch's wall clock, not from a continuously running
    timer, so between microbatches the watermark holds still instead of
    advancing with the clock (Spark watermarks only move when data moves
    — the same holds for the reference only while messages flow).
    Punctuated watermarks (W4, PunctuatedAssigner.java:37-48) remain
    inexpressible: Spark provides no per-record watermark injection;
    with_event_time(delay=0) on the marker property's timestamp is the
    closest construction.
    """
    return df.withColumn(ts_col, F.current_timestamp()).withWatermark(
        ts_col, max_time_lag
    )


def _grouped_agg(df, window_col, keys, aggs):
    named = [c.alias(n) if n else c for n, c in aggs.items()] if isinstance(
        aggs, dict
    ) else list(aggs)
    return df.groupBy(window_col, *[F.col(k) for k in keys]).agg(*named)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Tumbling event-time window aggregation (W11).

    Output has `window.start`/`window.end` struct + keys + aggregates.
    """
    return _grouped_agg(df, F.window(F.col(ts_col), duration), keys, aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Sliding event-time window aggregation (W11). Each event lands in
    duration/slide windows; Spark expands them map-side before the
    partial aggregation, so the shuffle stays one row per (key, window,
    partition)."""
    return _grouped_agg(df, F.window(F.col(ts_col), duration, slide), keys, aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Session (gap-based) window aggregation (W11). Sessions merge at
    aggregation time; on streams a watermark is required upstream."""
    return _grouped_agg(df, F.session_window(F.col(ts_col), gap), keys, aggs)


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    max_out_of_orderness: str = DEFAULT_MAX_OUT_OF_ORDERNESS,
    within_watermark: bool = False,
) -> DataFrame:
    """Exact dedup on key columns (W12).

    With `ts_col`, a watermark bounds the dedup state; `within_watermark`
    switches to dropDuplicatesWithinWatermark (state per key is dropped
    once the watermark passes it — the only state-size-bounded variant,
    and the right one at 100 TB where the key space is unbounded).
    """
    out = df
    if ts_col is not None:
        out = out.withWatermark(ts_col, max_out_of_orderness)
    if within_watermark:
        return out.dropDuplicatesWithinWatermark(keys)
    return out.dropDuplicates(keys)


def delivery_time(
    born_ts: Column | str, delay_level: Column | str
) -> Column:
    """Deliver-at timestamp for a message given its delay level (R8).

    Levels outside [0, 18] clamp to the nearest valid level, mirroring
    broker behavior (a too-large level is treated as the max level).
    """
    born = F.col(born_ts) if isinstance(born_ts, str) else born_ts
    level = F.col(delay_level) if isinstance(delay_level, str) else delay_level
    level = F.greatest(
        F.lit(0), F.least(level.cast("int"), F.lit(len(MSG_DELAY_LEVEL_SECONDS) - 1))
    )
    seconds = F.element_at(
        F.array(*[F.lit(s) for s in MSG_DELAY_LEVEL_SECONDS]), level + 1
    )
    return F.timestamp_add("SECOND", seconds, born)


def filter_deliverable(
    df: DataFrame,
    as_of: Column,
    born_ts: str = "born_ts",
    delay_level: str = "delay_level",
) -> DataFrame:
    """Keep messages whose delay-level delivery time has arrived (R8).

    The broker-sim analog of delayed delivery: the consumer view at
    `as_of` excludes messages still in the delay queue. Plain filter —
    pushed past scans by Catalyst where possible.
    """
    return df.filter(delivery_time(born_ts, delay_level) <= as_of)


def punctuated_filter_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    marker_col: str,
    wm_col: str,
    arrival_col: str,
) -> DataFrame:
    """Punctuated-watermark late filter, batch/deterministic form (W4,
    PunctuatedAssigner.java:37-48: certain elements CARRY a watermark;
    the stream's watermark jumps to each carried value as the marker is
    processed, and elements at-or-before the watermark are late).

    Spark exposes no per-record watermark injection, so the semantics
    are re-expressed directly: the running watermark for a row is the
    max carried value over STRICTLY EARLIER rows of its key partition
    (markers themselves included — a marker late w.r.t. an earlier
    marker is dropped, but its carried value still advances the
    watermark, matching Flink where checkAndGetNextWatermark runs on
    every element). "Earlier" means earlier in ARRIVAL order — the
    essential ingredient of punctuated watermarks: lateness is judged
    on event time, but the watermark advances in processing order, so
    `arrival_col` must be a total order per key (an offset / sequence
    column; NOT the event time, in which nothing is ever late). With a
    deterministic arrival column the result is oracle-checkable; the
    streaming twin (stateful.punctuated_filter_with_state) applies the
    same rule per microbatch with the watermark carried in state.

    ts_col/wm_col are LONG epoch micros. One window shuffle on the key.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(arrival_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_wm = F.max(F.when(F.col(marker_col), F.col(wm_col))).over(w)
    return (
        df.withColumn("_run_wm", run_wm)
        .where(F.col("_run_wm").isNull() | (F.col(ts_col) > F.col("_run_wm")))
        .drop("_run_wm")
    )


def dead_letter_router(
    on_time_sink,
    dead_sink,
    ts_col: str = "ts",
    delay_seconds: int = 1800,
):
    """Late-data side output (W10's optional dead-letter path — the
    Flink side-output analog): a foreachBatch function that carries the
    watermark ACROSS microbatches (max event time seen so far minus the
    allowed delay, exactly Spark's bounded-out-of-orderness rule) and
    routes each batch's rows below it to `dead_sink` instead of
    silently dropping them; on-time rows go to `on_time_sink`.

    Both sinks are callables df -> None (e.g. a broker-topic batch
    write), so the router composes with any downstream. State is ONE
    timestamp on the driver — checkpoint-friendly and identical under
    restart replay because the watermark is a running max.

    Use with: stream.writeStream.foreachBatch(router).start().
    """
    state: dict = {"wm": None}

    def route(batch_df, epoch_id):
        wm = state["wm"]
        if wm is None:
            late = batch_df.where(F.lit(False))
            on_time = batch_df
        else:
            late = batch_df.where(F.col(ts_col) < F.lit(wm))
            on_time = batch_df.where(~(F.col(ts_col) < F.lit(wm)))
        dead_sink(late)
        on_time_sink(on_time)
        mx = batch_df.agg(F.max(ts_col)).first()[0]
        if mx is not None:
            import datetime as _dt

            cand = mx - _dt.timedelta(seconds=delay_seconds)
            if wm is None or cand > wm:
                state["wm"] = cand

    return route
