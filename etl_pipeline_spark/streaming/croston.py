"""Streaming Croston — the live counterpart of the batch intermittent-
demand forecast (SURVEY.md §2.8 beyond-reference; batch semantics:
``plans/commerce.py::croston_demand_forecast``).

Input is the demand-epoch stream: one row per (part, month) with any
shipment, carrying the month's total quantity — the relation the batch
query derives with its single fact pass. Per-key state is FOUR scalars
(epoch count, last month, smoothed size z, smoothed interval y): Croston
is a pair of EWMAs over demand epochs, so unlike Holt-Winters no warm-up
buffer is needed — the first epoch initializes (z = q, y = first gap)
and every later epoch is one O(1) update

    z <- q/2 + z/2,   y <- gap/2 + y/2        (alpha = 1/2 exactly)

with all weights binary fractions, so the streamed float64 sequence is
bit-identical to the batch query's closed-form weighted sum (the
unrolled S_n = a x_n + (1-a) S_{n-1} recursion — verified exact over the
test corpus; ``tests/test_streaming_croston.py`` pins the equality).
Emission starts at the second epoch (batch excludes single-epoch parts:
no interval to smooth) and carries the same rounded columns the batch
emits, so a monitoring sink sees each part's forecast revise per epoch.

The first inter-demand interval is anchored at the stream epoch ``m0``
(batch: the corpus-wide MIN month) — a deployment constant passed to the
constructor, the same role as a stream's start-of-history config.

State is fixed-width per key (2 longs + 2 doubles) — the
runs-forever-at-100 TB/day discipline shared by the EWMA and
Holt-Winters twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

CROSTON_OUT = StructType(
    [
        StructField("l_partkey", LongType()),
        StructField("m", LongType()),
        StructField("n_epochs", LongType()),
        StructField("size_ewma", DoubleType()),
        StructField("interval_ewma", DoubleType()),
        StructField("croston_forecast", DoubleType()),
    ]
)

_CR_STATE = "n bigint, last_m bigint, z double, y double"


def croston_stream(stream: DataFrame, m0: int) -> DataFrame:
    """Per-part streaming Croston over a demand-epoch stream with columns
    ``l_partkey`` (bigint), ``m`` (bigint month index), ``q`` (bigint
    month-total quantity). ``m0`` anchors the first interval (the batch
    query's corpus-wide MIN month)."""

    def _cr(key, pdf_iter, state):
        import decimal

        import pandas as pd

        _Q6 = decimal.Decimal("1e-6")

        def _r6(v: float) -> float:
            # Spark F.round convention: HALF_UP on the SHORTEST decimal
            # repr (BigDecimal.valueOf path) — the batch twin rounds with
            # F.round, so the stream must use the same convention or
            # repr-level 6-dp midpoints diverge. NOT round6_half_up
            # (that one is the binary-scaled DuckDB ROUND convention —
            # see utils/rounding.py for which helper matches which
            # engine). Inlined so the closure ships by value — executors
            # never import this package, README design rule 2. The widened
            # context keeps quantize total over all finite doubles (the
            # default 28-digit context raises for |v| >= ~1e22; croston
            # state is demand-bounded, but totality is free).
            with decimal.localcontext(decimal.Context(prec=350)):
                return float(
                    decimal.Decimal(repr(v)).quantize(
                        _Q6, rounding=decimal.ROUND_HALF_UP
                    )
                )

        batches = list(pdf_iter)
        if not batches:
            return
        cells = pd.concat(batches, ignore_index=True)
        if len(cells) == 0:
            return
        # month order within the batch; cross-batch order is assumed
        # (same caveat as the EWMA / Holt-Winters twins)
        cells = cells.sort_values("m")
        if state.exists:
            n, last_m, z, y = state.get
            n, last_m, z, y = int(n), int(last_m), float(z), float(y)
        else:
            n, last_m, z, y = 0, -1, 0.0, 0.0
        rows = []
        for m, q in zip(cells["m"].astype("int64"), cells["q"].astype("int64")):
            m, q = int(m), int(q)
            if n == 0:
                z = float(q)
                y = float(m - m0 + 1)
            else:
                # do not re-associate: bit-parity with the batch sum
                z = 0.5 * q + 0.5 * z
                y = 0.5 * (m - last_m) + 0.5 * y
            n += 1
            last_m = m
            if n >= 2:
                rows.append(
                    (
                        key[0],
                        m,
                        n,
                        _r6(z),
                        _r6(y),
                        _r6(z / y),
                    )
                )
        state.update((n, last_m, float(z), float(y)))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "l_partkey",
                    "m",
                    "n_epochs",
                    "size_ewma",
                    "interval_ewma",
                    "croston_forecast",
                ],
            )

    return stream.groupBy("l_partkey").applyInPandasWithState(
        _cr,
        outputStructType=CROSTON_OUT,
        stateStructType=_CR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
