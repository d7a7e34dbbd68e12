"""transformWithStateInPandas surface (Spark 4 arbitrary-state API).

The successor to applyInPandasWithState: typed state variables
(ValueState/ListState/MapState), timers, and TTL on the RocksDB state
store. This module carries the engine's sessionization processor for that
API so the surface is real, typed and tested — but it is ENVIRONMENT-
GATED: the TWS Python worker protocol needs ``google.protobuf``
(pyspark/sql/streaming/proto/StateMessage_pb2), and this container ships
no protobuf wheel, so the worker crashes at init
(STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — verified round 6).
``tws_available()`` reports whether the current environment can run it;
the pytest exercises the full pipeline when it can and documents the
gate when it cannot. The applyInPandasWithState twin
(queries/streaming_judged.stream_stateful_sessions) remains the judged
path everywhere.
"""

from __future__ import annotations

GAP_NS = 30 * 60 * 1_000_000_000


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run here (the
    API exists AND its protobuf wire dependency is importable)."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    return True


def make_session_processor():
    """Per-key 30-minute-gap sessionization StatefulProcessor: state =
    (last event ns, session count, event count) in a typed ValueState;
    emits the running (key, n_sessions, n_events) per batch (update
    mode). Exactly the applyInPandasWithState update fn re-expressed in
    the TWS API."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "sess", "last_ns long, sessions long, events long"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                last_ns, sessions, events = self._state.get()
            else:
                last_ns, sessions, events = -1, 0, 0
            ts_ns = (
                pd.concat(list(rows))["ts"]
                .sort_values()
                .astype("datetime64[ns]")
                .astype("int64")
            )
            for t in ts_ns:
                if last_ns < 0 or t - last_ns > GAP_NS:
                    sessions += 1
                last_ns = int(t)
                events += 1
            self._state.update((last_ns, sessions, events))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_sessions": [sessions],
                    "n_events": [events],
                }
            )

        def close(self) -> None:
            pass

    return SessionProcessor()


def session_counts_tws(stream_df, gap_col: str = "ts"):
    """Wire the processor onto a (user_id, ts) stream; caller supplies
    watermark/trigger/sink. Requires tws_available()."""
    return (
        stream_df.withWatermark(gap_col, "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_session_processor(),
            outputStructType="user_id long, n_sessions long, n_events long",
            outputMode="Update",
            timeMode="None",
        )
    )
