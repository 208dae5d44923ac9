"""Custom stateful streaming sessionization via ``applyInPandasWithState``.

Spark's built-in ``session_window`` covers gap-based sessions for
*aggregates it knows*; this operator is the general form — per-key session
state that any custom accumulator could ride on — and the canonical
example of the applyInPandasWithState pattern the engine uses for custom
stateful operators (SURVEY.md §2.8 beyond-reference surface; batch-twin
semantics in plans/streaming_batch.py::events_sessionize_30m).

Per key, state holds the one OPEN session (start, last, n, total). Each
micro-batch's events are sorted and split at gaps > ``gap`` with
vectorized pandas (diff/cumsum — no Python row loop); every session
closed by the batch is emitted immediately, the trailing open session
goes back to the state store. A processing-time timeout flushes open
sessions on idle keys, so results are complete without waiting for the
next event.

Late events: an event continues the open session when ``ts - last <=
gap`` (events older than `last` always merge and may extend the session
start backwards). Events later than that close the session — the same
decision the batch LAG-based twin makes on sorted data.

Scale: state = one fixed-width row per ACTIVE key (not per event);
hash-partitioned by the streaming groupBy, RocksDB-backed on a cluster.
Timeout bounds state lifetime for abandoned keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "start bigint, last bigint, n bigint, total double"


def sessionize_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap: int,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Emit closed sessions ``(key, session_start, session_end, n_events,
    total_value)``; the per-key open session lives in the state store.

    ``gap`` is in the units of ``ts_col`` (the events table: int64 ns).
    With ``timeout_ms`` set, idle keys flush their open session after that
    much processing time; otherwise open sessions emit only when a
    later-than-gap event closes them.
    """

    def _sessionize(key, pdf_iter, state):
        import pandas as pd

        if timeout_ms is not None and state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        batches = [pdf for pdf in pdf_iter]
        events = pd.concat(batches, ignore_index=True)
        # NULL-ts drop (r11 nulls wave): the batch twin's convention — an
        # untimestamped event has no place on the gap timeline; a NaT/NaN
        # here would poison the run-split arithmetic below
        events = events[events[ts_col].notna()].sort_values(
            ts_col, kind="mergesort"
        )
        ts = events[ts_col].to_numpy()
        vals = events[value_col].to_numpy()
        open_sess = state.get if state.exists else None

        if len(ts) == 0:
            if open_sess is not None:
                state.update(open_sess)
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)
            return

        import numpy as np

        # gap-split into runs; run 0 (no leading break) continues the open
        # session from state
        breaks = np.zeros(len(ts), dtype=bool)
        breaks[1:] = (ts[1:] - ts[:-1]) > gap
        breaks[0] = open_sess is None or (ts[0] - open_sess[1]) > gap
        run_id = np.cumsum(breaks)

        closed = []
        for r in range(int(run_id[0]), int(run_id[-1]) + 1):
            mask = run_id == r
            r_ts = ts[mask]
            r_vals = vals[mask]
            if r == 0 and open_sess is not None:
                start, last, n, total = open_sess
                open_sess = (
                    min(start, int(r_ts[0])),
                    max(last, int(r_ts[-1])),
                    n + int(mask.sum()),
                    total + float(r_vals.sum()),
                )
            else:
                if open_sess is not None:
                    closed.append(open_sess)
                open_sess = (
                    int(r_ts[0]),
                    int(r_ts[-1]),
                    int(mask.sum()),
                    float(r_vals.sum()),
                )
        # the trailing run stays open in state
        state.update(open_sess)
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        _sessionize,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
