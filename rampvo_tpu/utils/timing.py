"""Section timing (ref: ramp/utils.py:22-44 CUDA-event Timer).

TPU equivalent: `block_until_ready` fencing + optional
`jax.profiler.TraceAnnotation` so sections appear in profile traces.
"""

from __future__ import annotations

import time

import jax


class Timer:
    """with Timer("BA", enabled=True): ... — prints section wall time after
    forcing device completion."""

    def __init__(self, name: str, enabled: bool = True, results: dict | None = None):
        self.name = name
        self.enabled = enabled
        self.results = results
        self._annotation = None

    def __enter__(self):
        if self.enabled:
            self._annotation = jax.profiler.TraceAnnotation(self.name)
            self._annotation.__enter__()
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            (jax.device_put(0) + 0).block_until_ready()  # fence
            dt = time.perf_counter() - self.t0
            self._annotation.__exit__(*exc)
            if self.results is not None:
                self.results.setdefault(self.name, []).append(dt)
            else:
                print(f"{self.name}: {dt*1e3:.2f} ms")
        return False
