"""Driver-side rounding with engine ROUND semantics.

Two engine conventions exist, and they differ on repr-level midpoints:

* **DuckDB ``ROUND``** rounds half away from zero on the SCALED BINARY
  value — ``floor(|x| * 10^d + 0.5)``. Match it with
  :func:`round6_half_up` below.
* **Spark ``F.round``** rounds HALF_UP on the SHORTEST DECIMAL
  REPRESENTATION of the double (the Java ``BigDecimal.valueOf`` path),
  so e.g. a double whose repr is ``...0000005`` rounds up even when its
  exact binary value sits a hair below the midpoint. Match it with
  ``operators.similarity._round6`` (``Decimal(repr(x)).quantize(1e-6,
  ROUND_HALF_UP)``) — `tests/test_edge_round7.py::
  test_similarity_round6_matches_spark_fround` pins the distinction.

Python's ``round()`` and numpy's ``round``/``rint`` are HALF-TO-EVEN
and match NEITHER engine. Any driver-side code that builds rows
compared against an engine ``ROUND`` (the markov/Holt-Winters chain
solves, the streaming twins' cent quantization) must pick the helper
matching its comparison target, or a value landing exactly on a
rounding midpoint silently diverges between engines — the
advisor-flagged latent parity class. On non-midpoint values (the
overwhelming bulk) the two conventions agree.
"""

from __future__ import annotations

import math


def round6_half_up(x: float) -> float:
    """ROUND(x, 6) — half away from zero on the scaled binary value,
    matching DuckDB ROUND (NOT Spark ``F.round``, which uses the
    shortest-repr convention — see module docstring). (Streaming
    closures inline this one-liner instead of importing it, so they
    ship by value — README design rule 2; the vectorized form is
    ``np.sign(y) * np.floor(np.abs(y) + 0.5)`` on the scaled array.)"""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)
