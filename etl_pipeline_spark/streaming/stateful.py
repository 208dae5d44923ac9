"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming (SURVEY.md §2.8); this is the
beyond-reference surface a continuous training-data pipeline needs: exact
dedup across an unbounded stream. Per-key state (one boolean per key) lives
in the state store; only a key's first-ever occurrence is emitted. State is
the engine-managed, checkpointable kind — restart-safe, unlike a Python
set on the driver.

Scale: state size = |distinct keys| × a few bytes, hash-partitioned across
executors by the streaming groupBy; the state store spills via RocksDB on a
real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import StructType


def dedupe_stream(stream: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """Emit exactly the first occurrence (min ``order_col``) of each key
    across all micro-batches; later occurrences are dropped via state."""
    out_schema: StructType = stream.schema
    state_schema = "seen boolean"
    cols = [f.name for f in stream.schema.fields]

    def _first_only(key, pdf_iter, state):
        import pandas as _pd

        if state.exists:
            return iter(())  # key already emitted in an earlier batch
        batches = [pdf for pdf in pdf_iter]
        state.update((True,))
        all_rows = _pd.concat(batches, ignore_index=True)
        first = all_rows.sort_values(order_col, kind="mergesort").head(1)
        return iter([first[cols]])

    return stream.groupBy(key_col).applyInPandasWithState(
        _first_only,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
