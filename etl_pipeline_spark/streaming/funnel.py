"""Streaming twins of the funnel/attribution pair (SURVEY.md §2.8).

Batch semantics are DuckDB-oracle-checked in
``plans/advanced_analytics.py``:

- ``funnel_latency_quantiles``'s conversion relation (latest view
  strictly before each purchase, per user) is the as-of device — ONE
  user-keyed RANGE window. Its streaming form is per-key state: the
  last seen view timestamp, carried in ``applyInPandasWithState``
  (``asof_latency_stream``). State is one bigint per active user —
  the fixed-width-per-key discipline that runs forever at 100 TB/day.
- ``attribution_credit_events``'s touch↔purchase pairing is the
  bucketed interval join; its streaming form is a watermarked
  stream-stream interval join (``touches_before_purchases``), state
  bounded by watermark delay + horizon. The exact ns-strict bound
  (``tt < tp``) rides as a residual filter on the int64-ns payload
  columns, so the streamed pairs are bit-identical to the batch
  pairing even when two events share a microsecond (stream event-time
  is µs precision; the payload keeps ns).

Tests pin both: availableNow drain over the same events parquet must
equal the batch device row-for-row (and, composed with the same credit
windows, the registered attribution query's output).

Cross-batch caveat (same as sessions.py): per-key correctness across
micro-batches assumes batches arrive in event-time order per key; the
watermark bounds how late a view may arrive and still precede a
purchase in a later batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_ASOF_OUT = StructType(
    [
        StructField("p_id", LongType()),
        StructField("user_id", LongType()),
        StructField("latency_sec", LongType()),
    ]
)

# one fixed-width row per active user: the latest view timestamp (ns)
_ASOF_STATE = "last_view bigint"

_NS_PER_SEC = 1_000_000_000


def asof_latency_stream(
    stream: DataFrame,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-user view→purchase conversion latencies, streaming.

    Input: an events stream with ``user_id``, ``event_id``, ``ts``
    (int64 ns) and ``event_type`` columns. For each purchase with at
    least one strictly-earlier view by the same user, emits
    ``(p_id, user_id, latency_sec)`` — the same conversion relation the
    batch as-of window computes (strict ``tv < tp``: a view sharing the
    purchase's exact ns timestamp does not count, in either engine).
    """

    def _latency(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        if timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return

        events = pd.concat(list(pdf_iter), ignore_index=True)
        if len(events) == 0:
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            return
        events = events.sort_values(["ts", "event_id"], kind="mergesort")
        ts = events["ts"].to_numpy(dtype=np.int64)
        is_view = (events["event_type"] == "view").to_numpy()
        prior = state.get[0] if state.exists else -1

        # exclusive-by-timestamp running max of view times: pm[k] is the
        # max view ts over state + the first k batch rows; searchsorted
        # 'left' counts rows with ts STRICTLY below each row's ts, so
        # equal-ts views never attribute (the batch RANGE(-1) bound)
        view_ts = np.where(is_view, ts, np.int64(-1))
        pm = np.maximum.accumulate(np.concatenate(([np.int64(prior)], view_ts)))
        last_view = pm[np.searchsorted(ts, ts, side="left")]

        is_purchase = (events["event_type"] == "purchase").to_numpy()
        # last_view < ts keeps the bound strict ACROSS batches too: a
        # state-carried view with ts equal to this batch's purchase
        # would otherwise attribute (searchsorted only excludes
        # same-batch ties; pm[0] is the carried state)
        emit = is_purchase & (last_view >= 0) & (last_view < ts)

        new_last = int(max(prior, view_ts.max()))
        if new_last >= 0:
            state.update((new_last,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)

        if emit.any():
            yield pd.DataFrame(
                {
                    "p_id": events["event_id"].to_numpy(dtype=np.int64)[emit],
                    "user_id": np.full(int(emit.sum()), key[0], dtype=np.int64),
                    "latency_sec": (ts[emit] - last_view[emit]) // _NS_PER_SEC,
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _latency,
            outputStructType=_ASOF_OUT,
            stateStructType=_ASOF_STATE,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def touches_before_purchases(
    stream: DataFrame,
    horizon_ns: int,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Watermarked interval join: each purchase with every same-user
    view/click touch in the strictly-preceding ``horizon_ns``.

    Returns ``(p_id, t_id, event_type, tp, tt)`` with ``tp``/``tt`` as
    the original int64-ns timestamps. One shared device
    (``joins.same_user_interval_pairs``) carries both the event-time
    join condition (state eviction after watermark + horizon; the µs
    prefilter is derived FROM horizon_ns, rounded up, so it can never
    silently narrow the residual) and the exact
    ``tp - horizon_ns <= tt < tp`` ns bound — the identical pair set
    ``bucketed_interval_join`` produces in the batch plan.
    """
    from etl_pipeline_spark.streaming.joins import same_user_interval_pairs

    return same_user_interval_pairs(
        stream,
        "purchase",
        ("view", "click"),
        horizon_ns=horizon_ns,
        watermark_delay=watermark_delay,
        strict_upper=True,
    ).select("p_id", "t_id", "event_type", "tp", "tt")
