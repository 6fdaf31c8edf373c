"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md Part B "custom stateful"; the escape hatch the reference never
needed because its pipeline is stateless per record).

Built-in windows/dedup cover the standard cases (streaming/windows.py);
this module demonstrates the arbitrary-state path: a per-key running
aggregate that survives across micro-batches, with idle-state timeout so
abandoned keys are evicted (bounded state — mandatory for an unbounded
keyed stream at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RUNNING_OUT_SCHEMA = "key string, n bigint, total double"
RUNNING_STATE_SCHEMA = "n bigint, total double"


def running_totals(
    events: DataFrame,
    key: str = "event_type",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) emitted each micro-batch the key is
    active. State is two numbers per key — constant-size, spill-friendly
    under the RocksDB provider (session.get_spark(rocksdb_state=True)).

    ``idle_timeout_ms`` evicts keys not seen for that long (processing
    time); None keeps state forever (only safe for bounded key domains).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, float(round(total, 6))))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"key": [key_tuple[0]], "n": [n], "total": [round(total, 6)]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key).applyInPandasWithState(
        fn, RUNNING_OUT_SCHEMA, RUNNING_STATE_SCHEMA, "update", timeout
    )
