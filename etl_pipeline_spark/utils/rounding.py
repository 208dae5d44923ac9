"""Driver-side rounding with engine ROUND semantics.

Spark's ``F.round`` and DuckDB's ``ROUND`` round HALF AWAY FROM ZERO on
the scaled binary value; Python's ``round()`` and numpy's
``round``/``rint`` are HALF-TO-EVEN. Any driver-side code that builds
rows compared against an engine ``ROUND`` (the markov/Holt-Winters
chain solves, the streaming twins' cent quantization) must use these
helpers or a value landing exactly on a rounding midpoint silently
diverges between engines — the advisor-flagged latent parity class.
"""

from __future__ import annotations

import math


def round6_half_up(x: float) -> float:
    """ROUND(x, 6) — half away from zero on the scaled binary value,
    matching Spark/DuckDB ROUND for engine-shared outputs."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def cents_half_up(v: float) -> int:
    """CAST(ROUND(v * 100, 0) AS BIGINT) — the cent quantization both
    batch twins apply before exact-integer accumulation."""
    y = v * 100
    return int(math.copysign(math.floor(abs(y) + 0.5), y))
