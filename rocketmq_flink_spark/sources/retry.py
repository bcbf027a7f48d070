"""Retry with exponential backoff (SURVEY.md §2.8 O1).

Reference: legacy/common/util/RetryUtil.java:30-55 — 5 attempts,
200 ms doubling to a 5 s cap. The legacy sink separately retries sends
retryTimes (10) times sleeping sleepTimeMs (5000) between attempts
(RocketMQSink defaults, common/RocketMQOptions.java:63-65); both shapes
are the same loop with different parameters.

Used around broker I/O (stage/commit/read) — the operations a real
deployment would see transient failures on.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

DEFAULT_ATTEMPTS = 5
DEFAULT_BASE_MS = 200
DEFAULT_CAP_MS = 5000


def call_with_retry(
    fn: Callable[[], T],
    attempts: int = DEFAULT_ATTEMPTS,
    base_ms: int = DEFAULT_BASE_MS,
    cap_ms: int = DEFAULT_CAP_MS,
    retry_on: tuple[type[BaseException], ...] = (OSError,),
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run `fn`, retrying transient errors with exponential backoff.

    Only `retry_on` exceptions are retried (I/O errors by default);
    logic errors propagate immediately. The last failure re-raises.
    """
    delay_ms = base_ms
    for attempt in range(attempts):
        try:
            return fn()
        except retry_on:
            if attempt == attempts - 1:
                raise
            sleep(min(delay_ms, cap_ms) / 1000.0)
            delay_ms *= 2
    raise AssertionError("unreachable")


def retry_params(options: dict) -> dict:
    """Map connector options (retryTimes/sleepTimeMs) to retry kwargs —
    the legacy sink's fixed-sleep shape (base == cap == sleepTimeMs)."""
    out: dict = {}
    if options.get("retryTimes"):
        out["attempts"] = int(options["retryTimes"])
    if options.get("sleepTimeMs"):
        out["base_ms"] = int(options["sleepTimeMs"])
        out["cap_ms"] = int(options["sleepTimeMs"])
    return out
