"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch engine exposes sessionization as a window-function query
(``__spark_entry__.q_user_sessions``); this is the *streaming* equivalent
for unbounded event feeds: per-key (user) state carries the last-seen
timestamp and the running session count across micro-batches, new sessions
open when the gap exceeds ``gap_seconds``, and idle users are evicted via
processing-time timeouts. This is the `applyInPandasWithState` pattern the
north star's "custom stateful operators" maps to — an operator Spark's
built-in session windows cannot express when you need custom per-key
outputs (running counts, not windows).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_STATE_SCHEMA = "last_ts long, n_sessions long, n_events long"
SESSION_OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"


def make_sessionizer(gap_seconds: int = 1800, evict: bool = False):
    """Returns the per-group update function for applyInPandasWithState."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = -1, 0, 0
        # applyInPandasWithState may deliver one group's micro-batch as
        # several unsorted Arrow chunks — concatenate and sort ONCE, then a
        # vectorized gap scan (np.diff-style running max) replaces the
        # per-event Python loop; the gap is measured against the running max
        # seen so far, so late (out-of-order) events never open sessions.
        import numpy as np

        frames = [pdf["ts_epoch"] for pdf in pdfs if len(pdf)]
        if frames:
            arr = np.sort(pd.concat(frames).to_numpy(dtype=np.int64))
            if last_ts < 0:
                n_sessions += 1
                seed, rest = int(arr[0]), arr[1:]
            else:
                seed, rest = int(last_ts), arr
            if rest.size:
                prev_max = np.maximum.accumulate(
                    np.concatenate(([seed], rest))
                )[:-1]
                n_sessions += int(((rest - prev_max) > gap_seconds).sum())
            last_ts = max(int(last_ts), int(arr[-1]))
            n_events += int(arr.size)
        state.update((last_ts, n_sessions, n_events))
        if evict:
            state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return update


def sessionize_stream(events, gap_seconds: int = 1800, evict_idle: bool = False):
    """events: streaming DataFrame with (user_id long, ts timestamp).

    Returns a streaming DataFrame (user_id, n_sessions, n_events) in
    update mode — one row per user per micro-batch with the running totals.

    ``evict_idle``: enable processing-time timeouts to drop idle users'
    state (unbounded-key hygiene for production feeds). NOTE: with
    processing-time timeouts the query continuously schedules
    state-cleanup micro-batches, so ``processAllAvailable()`` blocks —
    drive such queries with explicit triggers, not the test-style
    drain-everything call.
    """
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id", F.unix_timestamp("ts").alias("ts_epoch")
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if evict_idle else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds, evict=evict_idle),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
