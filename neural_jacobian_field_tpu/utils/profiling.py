"""Profiling / tracing helpers (SURVEY.md §5: the reference has almost none —
one record_function annotation; here we expose jax.profiler properly)."""

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces (the XLA analog of the
    reference's torch record_function, model_components/resnet_fc.py:71)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing with warmup skip; feeds the metrics stream."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self._count = 0
        self._t0 = None
        self._total = 0.0

    def tick(self):
        now = time.perf_counter()
        if self._t0 is not None and self._count >= self.skip:
            self._total += now - self._t0
        self._t0 = now
        self._count += 1

    @property
    def mean_step_time(self) -> Optional[float]:
        steps = self._count - 1 - self.skip
        return self._total / steps if steps > 0 else None
