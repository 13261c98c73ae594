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
        # GroupState.get is a PROPERTY in pyspark (calling it calls the
        # returned tuple): latent until a key appears in 2+ batches
        n, total, last = state.get if state.exists else (0, 0.0, None)
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


EWMA_OUTPUT_SCHEMA = "user_id long, n_events long, ewma_q long"
EWMA_STATE_SCHEMA = "n_events long, ewma_q long"


def _trunc_half(x: int) -> int:
    """Truncating integer halving (toward zero) — matches DuckDB's
    integer ``//`` so the oracle's list_reduce replay is bit-identical
    even on negative cents (Python's ``//`` floors instead)."""
    return x // 2 if x >= 0 else -((-x) // 2)


def _update_ewma(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, None)
    # `batches` yields ARROW CHUNKS, not whole groups: a key whose
    # micro-batch rows span multiple chunks (maxRecordsPerBatch) would
    # fold out of order under per-chunk sorting — concatenate first,
    # sort ONCE. Event-time order within the batch; cross-batch order
    # is the replay's time-split contract (earlier batch = earlier rows).
    chunks = [pdf for pdf in batches]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for v in pdf["cents"].astype("int64"):
            v = int(v)
            s = v if n == 0 else _trunc_half(s + v)
            n += 1
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ewma_q": [s]}
    )


TOPK_OUTPUT_SCHEMA = (
    "user_id long, n_events long,"
    " top_types array<string>, top_counts array<long>"
)
TOPK_STATE_SCHEMA = "types array<string>, counts array<long>"


def _make_update_topk(k: int):
    def _update_topk(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        types, counts = state.get if state.exists else ([], [])
        d = {t: int(c) for t, c in zip(types, counts)}
        for pdf in batches:
            for t, c in pdf["event_type"].value_counts().items():
                d[t] = d.get(t, 0) + int(c)
        items = sorted(d.items())  # deterministic state layout
        state.update(
            ([t for t, _ in items], [c for _, c in items])
        )
        top = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [sum(d.values())],
                "top_types": [[t for t, _ in top]],
                "top_counts": [[c for _, c in top]],
            }
        )

    return _update_topk


def topk_type_profiles(stream: DataFrame, k: int = 3) -> DataFrame:
    """Per-user streaming top-k event types by EXACT count — the state
    is the full (type, count) map per key, carried across micro-batches
    and re-ranked on every update. Exact counting keeps the state
    VALUE-verifiable against a batch SQL oracle (the approximate
    production variant for unbounded type spaces swaps the map for a
    SpaceSaving summary of bounded size; the event_type domain here is
    small and bounded so the exact map IS the right structure).

    State layout sorts by type so the stored arrays are deterministic
    regardless of batch arrival chunking. Same local-mode checksum
    caveat as :func:`user_profiles`."""
    stream.sparkSession.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    return (
        stream.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_topk(k),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_profiles(stream: DataFrame) -> DataFrame:
    """Per-user integer EWMA (alpha = 1/2) of event value-cents — an
    online per-key feature a windowed aggregate cannot express (the
    state is a RECURRENCE over the full history, not a window fold).

    The alpha=1/2 recurrence s' = trunc((s + v) / 2) runs entirely on
    the integer cents grid, so unlike float EWMA the streaming state
    is exactly replayable in SQL: the oracle folds the same recurrence
    with DuckDB's list_reduce over the (ts, event_id)-ordered cents —
    a custom stateful operator whose per-key state VALUE-verifies
    cross-engine, not just row counts.

    Scale shape: state is 2 bigints per active key; each micro-batch
    touches only keys present in the batch. Same local-mode checksum
    caveat as :func:`user_profiles`."""
    stream.sparkSession.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    return (
        stream.selectExpr(
            "user_id", "ts", "event_id",
            "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
