"""Driver-side resilience: retry with exponential backoff + circuit breaker.

The reference's resilience layer is ~2k LoC (retry: etl/utils/retry.py:32-264,
circuit breaker: etl/utils/circuit_breaker.py:25-241, plus a duplicate
implementation at etl/utils/retry.py:97-170). In a Spark engine only the
*driver-side fetch* path needs this — executor work is covered by Spark task
retries (`spark.task.maxFailures`) — so the layer shrinks to two small,
deterministic-testable primitives. The reference's semantics kept:

- exponential backoff ``base * factor^(n-1)`` capped at ``max_delay``, with
  optional jitter (etl/utils/retry.py:85-94);
- recoverable-exception classification via an exception whitelist;
- breaker states CLOSED → OPEN (threshold failures) → HALF_OPEN (after
  recovery timeout) → CLOSED on success (etl/utils/circuit_breaker.py:132-136).

Clock and sleep are injectable so tests run instantly and deterministically.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class RetryPolicy:
    max_attempts: int = 5
    base_delay: float = 2.0
    factor: float = 2.0
    max_delay: float = 120.0
    jitter: Callable[[float], float] | None = None  # delay → jittered delay

    def delay_for(self, attempt: int) -> float:
        """Delay before retry #attempt (1-based)."""
        d = min(self.base_delay * (self.factor ** (attempt - 1)), self.max_delay)
        return self.jitter(d) if self.jitter else d


def retry_call(
    fn: Callable[[], Any],
    policy: RetryPolicy = RetryPolicy(),
    recoverable: tuple[type[BaseException], ...] = (ConnectionError, TimeoutError, OSError),
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> Any:
    """Call ``fn`` with retries; unrecoverable exceptions raise immediately."""
    last: BaseException | None = None
    for attempt in range(1, policy.max_attempts + 1):
        try:
            return fn()
        except recoverable as exc:
            last = exc
            if attempt == policy.max_attempts:
                break
            if on_retry:
                on_retry(attempt, exc)
            sleep(policy.delay_for(attempt))
    assert last is not None
    raise last


class CircuitOpenError(RuntimeError):
    pass


@dataclass
class CircuitBreaker:
    """CLOSED/OPEN/HALF_OPEN breaker guarding one external dependency."""

    failure_threshold: int = 5
    recovery_timeout: float = 60.0
    clock: Callable[[], float] = time.monotonic
    _failures: int = field(default=0, init=False)
    _state: str = field(default="CLOSED", init=False)
    _opened_at: float = field(default=0.0, init=False)

    @property
    def state(self) -> str:
        if self._state == "OPEN" and self.clock() - self._opened_at >= self.recovery_timeout:
            return "HALF_OPEN"
        return self._state

    def call(self, fn: Callable[[], Any]) -> Any:
        state = self.state
        if state == "OPEN":
            raise CircuitOpenError(
                f"circuit open ({self._failures} failures); retry after recovery timeout"
            )
        try:
            result = fn()
        except BaseException:
            self._failures += 1
            if self._failures >= self.failure_threshold or state == "HALF_OPEN":
                self._state = "OPEN"
                self._opened_at = self.clock()
            raise
        else:
            self._failures = 0
            self._state = "CLOSED"
            return result
