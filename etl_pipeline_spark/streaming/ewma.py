"""Streaming EWMA — the live counterpart of the batch control chart
(SURVEY.md §2.8 beyond-reference; batch semantics:
``plans/ops_analytics.py::ewma_control_chart_daily``).

The batch plan can only expand the recursion as a truncated window (SQL
has no recursive window); a stream computes the TRUE recursion
``z_d = λ·x_d + (1−λ)·z_{d−1}`` because per-key state carries ``z``
across micro-batches — the one shape where streaming is *more* exact
than batch, not less. State is one (day, z) pair per key — the
fixed-width-per-key discipline that runs forever at 100 TB/day.

Determinism: day sums are exact integer cents (int64); λ = 1/2 keeps
every multiply a pure exponent shift, and the recursion is applied in
ascending-day order one step at a time, so the float64 sequence is
bit-identical to any reference implementation applying the same
recursion (the equality the tests pin).

Cross-batch caveat (same as sessions.py/funnel.py): per-key correctness
across micro-batches assumes a key's days arrive in event-time order
across batches (within a batch any order is fine — rows are re-sorted);
a production deployment bounds disorder with a watermark upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

_DAY_NS = 86_400_000_000_000

_EWMA_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", LongType()),
        StructField("day_cents", LongType()),
        StructField("ewma_cents", DoubleType()),
    ]
)

# one fixed-width row per key: last processed day + its EWMA value
_EWMA_STATE = "last_day bigint, z double"


def ewma_stream(stream: DataFrame, lam: float = 0.5) -> DataFrame:
    """Per-event-type daily EWMA of ``value``, streaming.

    Input: an events stream with ``event_type``, ``ts`` (int64 ns) and
    ``value``. Emits one row per (key, observed day) with the day's
    exact cent sum and the recursive EWMA over the key's observed-day
    series (gaps collapse — the batch day-domain adjacency rule).
    """

    def _ewma(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        batches = list(pdf_iter)
        if not batches:
            return
        events = pd.concat(batches, ignore_index=True)
        if len(events) == 0:
            return
        # HALF_UP to match the batch twin's ROUND(value*100, 0) (np.rint
        # is half-to-even — the advisor-flagged midpoint parity class)
        v100 = events["value"].to_numpy(dtype=np.float64) * 100
        cents = (np.sign(v100) * np.floor(np.abs(v100) + 0.5)).astype(np.int64)
        days = (events["ts"].to_numpy(dtype=np.int64) // _DAY_NS).astype(np.int64)
        per_day = (
            pd.DataFrame({"day": days, "cents": cents})
            .groupby("day", sort=True)["cents"]
            .sum()
        )
        if state.exists:
            last_day, z = state.get
        else:
            last_day, z = None, None
        out_days, out_cents, out_z = [], [], []
        for day, c in per_day.items():
            x = float(c)
            z = x if z is None else lam * x + (1.0 - lam) * z
            last_day = int(day)
            out_days.append(last_day)
            out_cents.append(int(c))
            out_z.append(z)
        state.update((last_day, float(z)))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "day": np.array(out_days, dtype=np.int64),
                "day_cents": np.array(out_cents, dtype=np.int64),
                "ewma_cents": np.array(out_z, dtype=np.float64),
            }
        )

    return stream.groupBy("event_type").applyInPandasWithState(
        _ewma,
        outputStructType=_EWMA_OUT,
        stateStructType=_EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
