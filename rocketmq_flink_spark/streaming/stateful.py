"""Custom stateful streaming operator (SURVEY.md §2.6 W12).

The reference has no custom state (Flink users write ProcessFunctions);
the Spark-idiomatic extension point is applyInPandasWithState. The
showcase operator is a per-key session aggregator: it maintains the
current open session per key, emits a (key, session_start, session_end,
n_events) row when a gap closes a session, and uses EVENT-TIME TIMEOUTS
to flush sessions once the watermark passes session_end + gap — so state
size stays bounded by the number of concurrently-open sessions, never by
history. That bound is what makes the operator viable on an unbounded
100 TB stream; the shuffle is one hash partitioning on the key.

Batch-mode equivalence (tested + oracle-checked): emitted sessions match
lag-based SQL sessionization restricted to sessions the final watermark
closed (the trailing open session per key stays in state, exactly like
an append-mode window that never finalizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _gap_to_ms(gap: str) -> int:
    qty, unit = gap.strip().split()
    mult = {
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit.lower()]
    return int(qty) * mult


def sessionize_with_state(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator.

    `df` must be a streaming frame with a watermark on `ts_col`.
    Output (append mode): one row per CLOSED session —
    (key, session_start_us, session_end_us, n_events), timestamps as
    epoch micros so results hash identically across engines.
    """
    gap_ms = _gap_to_ms(gap)

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        k = key[0]
        if state.hasTimedOut:
            # watermark passed last event + gap: the open session is final
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [k],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                }
            )
            return

        ts_list = []
        for pdf in pdf_iter:
            ts_list.append(pdf[ts_col])
        ts_us = (
            pd.concat(ts_list).astype("datetime64[us]").astype("int64").sort_values()
        )

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = int(ts_us.iloc[0])
            n = 0

        closed = {"key": [], "session_start_us": [], "session_end_us": [],
                  "n_events": []}
        for t in ts_us:
            t = int(t)
            if n > 0 and t - last_us > gap_ms * 1000:
                closed["key"].append(k)
                closed["session_start_us"].append(start_us)
                closed["session_end_us"].append(last_us)
                closed["n_events"].append(n)
                start_us = t
                n = 0
            # late-but-in-watermark events from a later microbatch can
            # carry t < last_us; merging with max/min keeps the open
            # session's bounds monotone instead of moving session_end
            # backward (which would also set the event-time timeout
            # before last_event+gap and split a live session)
            last_us = max(last_us, t)
            start_us = min(start_us, t) if n > 0 else start_us
            n += 1

        state.update((start_us, last_us, n))
        # flush when the watermark passes session_end + gap; clamp above
        # the current watermark (Spark rejects non-advancing timeouts)
        timeout_ms = max(
            last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed["key"]:
            yield pd.DataFrame(closed)

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def punctuated_filter_with_state(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    marker_col: str,
    wm_col: str,
    arrival_col: str,
) -> DataFrame:
    """Punctuated-watermark late filter as a custom stateful operator
    (W4 streaming twin of ops.punctuated_filter_batch — see its
    docstring for the semantics contract).

    State per key is ONE long (the current carried watermark), so state
    size is bounded by key cardinality forever — no timeout needed.
    Rows inside a microbatch are sorted by arrival_col before the rule
    is applied; across microbatches the watermark rides in state.
    Equals the batch form whenever microbatch boundaries respect
    arrival order (true for an offset-ordered source read, which is
    how the equivalence test feeds it).

    Output: the surviving rows, schema unchanged. ts_col/wm_col are
    LONG epoch micros.
    """
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("wm_us", T.LongType())])
    cols = [f.name for f in df.schema.fields]
    sort_cols = [arrival_col]

    def fn(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:  # no timeouts configured; defensive
            return
        pdfs = [pdf for pdf in pdf_iter if len(pdf)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs).sort_values(sort_cols, kind="mergesort")
        state_wm = state.get[0] if state.exists else None
        lo = np.iinfo("int64").min
        carried = pdf[wm_col].where(pdf[marker_col].astype(bool), lo)
        run_prev = carried.cummax().shift(1, fill_value=lo).astype("int64")
        eff = np.maximum(run_prev, lo if state_wm is None else state_wm)
        keep = pdf[ts_col].astype("int64") > eff
        batch_max = int(carried.max()) if len(carried) else lo
        new_wm = max(batch_max, lo if state_wm is None else state_wm)
        if new_wm != lo:
            state.update((new_wm,))
        out = pdf[keep][cols]
        if len(out):
            yield out

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
