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
    matching Spark/DuckDB ROUND for engine-shared outputs. (Streaming
    closures inline this one-liner instead of importing it, so they
    ship by value — README design rule 2; the vectorized form is
    ``np.sign(y) * np.floor(np.abs(y) + 0.5)`` on the scaled array.)"""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)
