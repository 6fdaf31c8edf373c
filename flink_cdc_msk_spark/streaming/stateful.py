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


TWS_OUT_SCHEMA = (
    "user_id bigint, n bigint, total double, v_min double, v_max double"
)


def user_stats_tws(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Per-user running stats via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (successor of applyInPandasWithState:
    typed state handles, timers, and schema-evolvable state instead of a
    single opaque tuple). State is one fixed-width ValueState row per
    user; requires the RocksDB state-store provider (the API rejects the
    default HDFS-backed one), which is also the provider you'd run at
    scale — state spills off-heap instead of executor memory.

    ENVIRONMENT NOTE: the transformWithState Python worker speaks a
    protobuf protocol to the state server; this container has no real
    ``google.protobuf`` install, so the repo ships a namespace shim
    (``google/`` at the repo root) that aliases the machine's cloud-sdk
    protobuf 4.23 runtime and stubs the ``runtime_version`` check. With
    the shim the operator runs end-to-end and is REGISTERED as
    ``streaming_tws_user_stats`` (oracle = the batch groupBy); the
    env-gated ``tests/test_streaming.py::test_user_stats_tws`` passes
    wherever protobuf (real or shimmed) is importable.

    Emits the cumulative (n, total, min, max) per user each micro-batch;
    after an availableNow run the max-n row per user equals the batch
    groupBy, which is what the registered query's oracle checks."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n bigint, total double, v_min double, v_max double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, v_min, v_max = self._state.get()
            else:
                n, total, v_min, v_max = 0, 0.0, None, None
            for pdf in rows:
                vals = pdf[value_col].astype(float)
                n += len(pdf)
                total += float(vals.sum())
                lo, hi = float(vals.min()), float(vals.max())
                v_min = lo if v_min is None else min(v_min, lo)
                v_max = hi if v_max is None else max(v_max, hi)
            self._state.update((n, total, v_min, v_max))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n": [n],
                    "total": [total],
                    "v_min": [v_min],
                    "v_max": [v_max],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
