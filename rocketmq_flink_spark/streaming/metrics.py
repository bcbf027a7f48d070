"""Throughput metrics (SURVEY.md §2.8 O2).

The reference wires dropwizard meters/gauges into the source and sink
(legacy/common/util/MetricUtils.java:29-87: source `tps`, sink
`inTps`/`outTps`/`outBps`/`outLatency`). Spark's idiomatic equivalents:
- `df.observe(...)` — aggregates computed inside the running plan, free
  (no extra pass), surfaced per microbatch;
- a StreamingQueryListener that turns observed values + batch wall time
  into rates.

Metrics flow driver-side only as tiny aggregate rows — nothing here
adds shuffles or driver collects, so it is 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION = "rocketmq_metrics"


def observe_throughput(df: DataFrame, name: str = OBSERVATION) -> DataFrame:
    """Attach row/byte counters to the plan (works batch + streaming).

    Emits `n_rows` and, when a binary `value` column exists, `n_bytes` —
    the inputs for tps/Bps rates.
    """
    cols = [F.count(F.lit(1)).alias("n_rows")]
    if "value" in df.columns:
        cols.append(
            F.coalesce(F.sum(F.octet_length(F.col("value"))), F.lit(0)).alias(
                "n_bytes"
            )
        )
    return df.observe(name, *cols)


class ThroughputListener(StreamingQueryListener):
    """Collects per-batch observed metrics into rates.

    `rates` grows one dict per finished microbatch:
    {batchId, n_rows, n_bytes, batch_s, tps, bps}. The reference's
    outLatency maps to batch_s (epoch wall time); inTps == outTps here
    because an epoch either fully commits or fully retries (W9).
    """

    def __init__(self, observation: str = OBSERVATION):
        self.observation = observation
        self.rates: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        obs = (p.observedMetrics or {}).get(self.observation)
        if obs is None:
            return
        row = obs.asDict()
        batch_s = (p.batchDuration or 0) / 1000.0
        n_rows = row.get("n_rows", 0) or 0
        n_bytes = row.get("n_bytes", 0) or 0
        self.rates.append(
            {
                "batchId": p.batchId,
                "n_rows": n_rows,
                "n_bytes": n_bytes,
                "batch_s": batch_s,
                "tps": n_rows / batch_s if batch_s > 0 else float(n_rows),
                "bps": n_bytes / batch_s if batch_s > 0 else float(n_bytes),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def totals(self) -> dict:
        return {
            "n_rows": sum(r["n_rows"] for r in self.rates),
            "n_bytes": sum(r["n_bytes"] for r in self.rates),
            "batches": len(self.rates),
        }
