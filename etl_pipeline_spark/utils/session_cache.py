"""Session-scoped memo caches for persisted relations, with a lifecycle.

Several plan modules memoize a written-once relation per (session,
dataset) — the shingle table (plans/llm.py), the co-supplier edge set
(plans/corpus_quality.py), ANN index artifacts (operators/similarity.py).
The memo is the honest production shape (an index is built once and
queried many times), but it needs two disciplines this module centralizes:

- **Keying**: ``spark.sparkContext.applicationId`` — a stable per-session
  identity. Keying on ``id(spark)`` is unsound: after a session is
  stopped and GC'd, a NEW SparkSession can reuse the same CPython id and
  resurrect persisted DataFrames bound to the dead context.
- **Eviction**: ``clear_caches(spark)`` unpersists everything a session's
  memos pinned and drops the entries. Bench/driver runs are short-lived
  and never need it; a long-lived service calls it between workloads so
  executors' storage memory doesn't accumulate dead relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# every memo dict registers here so clear_caches can reach it
_CACHES: list[dict] = []


def register_cache(cache: dict) -> dict:
    _CACHES.append(cache)
    return cache


def session_key(spark: SparkSession) -> str:
    """Stable identity for this session's cache entries."""
    return spark.sparkContext.applicationId


def clear_caches(spark: SparkSession | None = None) -> int:
    """Unpersist and evict memoized relations; returns entries dropped.

    With ``spark`` given, only that session's entries (cache keys lead
    with ``session_key(spark)``); with ``None``, everything.
    """
    sid = None if spark is None else session_key(spark)
    dropped = 0
    for cache in _CACHES:
        for key in list(cache):
            if sid is not None and key[0] != sid:
                continue
            val = cache.pop(key)
            members = val if isinstance(val, tuple) else (val,)
            for v in members:
                if isinstance(v, DataFrame):
                    try:
                        v.unpersist()
                    except Exception:  # noqa: BLE001 — session already stopped
                        pass
            dropped += 1
    return dropped
