"""Streaming Holt-Winters — the live counterpart of the batch seasonal
forecast (SURVEY.md §2.8 beyond-reference; batch semantics:
``plans/ops_analytics.py::holt_winters_daily``).

Per-key state carries the FULL forecaster: (level, trend, rotating
7-slot seasonal vector) plus a fixed 14-slot warm-up buffer (values AND
day ids) for the classic two-season initialization. Once a key has seen
14 days it initializes exactly as the batch solver does
(left-associated 7-day means) and replays days 8..14 through the
recursion; every later day is one O(1) state update. Emitted rows start
at observed day 8 (the first recursion step) and carry the post-update
(level, trend) plus the one-step-ahead forecast ``l + b + s[0]`` — the
row a monitoring sink alerts on.

State is fixed-width per key (23 doubles + 16 longs) — the
runs-forever-at-100 TB/day discipline, same as the EWMA twin. The
init/step bodies are LINE-FOR-LINE the batch ``_hw_solve`` formulas
(alpha = beta = gamma = 1/2; identical op order), so the streamed
float64 sequence is bit-identical to the batch solver — the equality
``tests/test_streaming_holtwinters.py`` pins per day.

Cross-batch caveat (same as ewma.py): per-key day order across
micro-batches is assumed; within a batch rows are re-sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

_DAY_NS = 86_400_000_000_000

_HW_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", LongType()),
        StructField("day_cents", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_next", DoubleType()),
    ]
)

# fixed-width per key: observed-day count, last day, the (l, b, s0..s6)
# forecaster, and the 14-slot warm-up buffer (cent values + day ids)
_HW_STATE = (
    "n_seen bigint, last_day bigint, l double, b double, "
    + ", ".join(f"s{i} double" for i in range(7))
    + ", "
    + ", ".join(f"w{i} double" for i in range(14))
    + ", "
    + ", ".join(f"d{i} bigint" for i in range(14))
)


def holt_winters_stream(stream: DataFrame) -> DataFrame:
    """Per-event-type daily additive Holt-Winters (m=7, constants 1/2),
    streaming. Input: events stream with ``event_type``, ``ts`` (int64
    ns), ``value``."""

    def _hw(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        batches = list(pdf_iter)
        if not batches:
            return
        events = pd.concat(batches, ignore_index=True)
        if len(events) == 0:
            return
        # HALF_UP to match the batch twin's Spark ROUND(value*100, 0)
        # (np.rint is half-to-even; a *100 landing exactly on .5 would
        # break the pinned batch/stream bit-equality). Sign-aware so
        # negative values round away from zero like Spark.
        v100 = events["value"].to_numpy(dtype=np.float64) * 100
        cents = (np.sign(v100) * np.floor(np.abs(v100) + 0.5)).astype(np.int64)
        days = (events["ts"].to_numpy(dtype=np.int64) // _DAY_NS).astype(
            np.int64
        )
        per_day = (
            pd.DataFrame({"day": days, "cents": cents})
            .groupby("day", sort=True)["cents"]
            .sum()
        )
        if state.exists:
            st = list(state.get)
        else:
            st = [0, -1, 0.0, 0.0] + [0.0] * 7 + [0.0] * 14 + [-1] * 14
        n_seen = int(st[0])
        l, b = float(st[2]), float(st[3])
        s = [float(v) for v in st[4:11]]
        warm = [float(v) for v in st[11:25]]
        warm_day = [int(v) for v in st[25:39]]
        last_day = int(st[1])

        # line-for-line the batch _hw_solve formulas (the test pins the
        # bit-equality; do not re-associate)
        def _init(xs):
            l0 = (
                ((((xs[0] + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5] + xs[6]
            ) / 7.0
            m2 = (
                ((((xs[7] + xs[8]) + xs[9]) + xs[10]) + xs[11]) + xs[12] + xs[13]
            ) / 7.0
            return l0, (m2 - l0) / 7.0, [xs[i] - l0 for i in range(7)]

        def _step(l, b, s, x):
            ln = 0.5 * (x - s[0]) + 0.5 * (l + b)
            b = 0.5 * (ln - l) + 0.5 * b
            s = s[1:] + [0.5 * (x - ln) + 0.5 * s[0]]
            return ln, b, s

        rows = []
        for day, c in per_day.items():
            x = float(c)
            n_seen += 1
            last_day = int(day)
            if n_seen <= 14:
                warm[n_seen - 1] = x
                warm_day[n_seen - 1] = int(day)
                if n_seen == 14:
                    l, b, s = _init(warm)
                    for j in range(7, 14):  # replay days 8..14
                        l, b, s = _step(l, b, s, warm[j])
                        rows.append(
                            (
                                key[0],
                                warm_day[j],
                                int(warm[j]),
                                l,
                                b,
                                l + b + s[0],
                            )
                        )
            else:
                l, b, s = _step(l, b, s, x)
                rows.append((key[0], int(day), int(c), l, b, l + b + s[0]))
        state.update(
            tuple(
                [n_seen, last_day, float(l), float(b)]
                + [float(v) for v in s]
                + [float(v) for v in warm]
                + [int(v) for v in warm_day]
            )
        )
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "event_type",
                    "day",
                    "day_cents",
                    "level",
                    "trend",
                    "forecast_next",
                ],
            )

    return stream.groupBy("event_type").applyInPandasWithState(
        _hw,
        outputStructType=_HW_OUT,
        stateStructType=_HW_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
