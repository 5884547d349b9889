"""Tracing / profiling utilities.

The reference has no tracing beyond tqdm bars and RSS logging (SURVEY.md
section 5).  Here: ``jax.profiler`` trace capture (TensorBoard format) and a
lightweight phase timer used by the searcher when ``progress`` is set.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a device profile into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.warning("device trace written to %s", log_dir)


class PhaseTimer:
    """Accumulates wall time per named phase; prints a summary on demand."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        parts = [
            f"{name}={self.totals[name]:.2f}s/{self.counts[name]}x"
            for name in sorted(self.totals, key=lambda n: -self.totals[n])
        ]
        return " ".join(parts)

    def log_summary(self):
        if self.enabled and self.totals:
            logger.warning("phase timings: %s", self.summary())
