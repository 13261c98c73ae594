"""Custom stateful streaming operator via applyInPandasWithState.

§2.7 coverage: arbitrary per-key streaming state beyond windowed
aggregation. The operator here is a per-user running profile (event
count, value sum, last-seen timestamp) that emits an updated row per
key per micro-batch and expires idle keys via processing-time timeout
— the canonical shape for sessionizers, rate trackers, and online
feature stores.

State size is O(active keys); the timeout bounds it against key churn.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
STATE_SCHEMA = "n_events long, total_value double, last_seen timestamp"


def _make_update_profile(idle_timeout_ms: int | None):
    def _update_profile(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last = state.get() if state.exists else (0, 0.0, None)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            m = pdf["ts"].max()
            last = m if last is None or m > last else last
        state.update((n, total, last))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_seen": [last],
            }
        )

    return _update_profile


def user_profiles(
    stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Running per-user profile over an event stream.

    ``idle_timeout_ms`` enables processing-time expiry of idle keys —
    the state-size bound for unbounded key spaces. Leave ``None`` for
    bounded/test streams: with a timeout registered, the micro-batch
    engine keeps scheduling state-cleanup batches even with no data,
    so ``processAllAvailable`` never quiesces.

    Note: Spark 4.1's checksum checkpoint file manager deadlocks this
    operator's state commit in single-JVM local mode (state-store
    delta write awaits a checksum task that never runs); disable it
    for the query's session — cluster deployments with a real DFS can
    re-enable.
    """
    stream.sparkSession.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_profile(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
