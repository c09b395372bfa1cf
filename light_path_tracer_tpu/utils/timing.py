"""Per-stage wall-clock instrumentation.

Parity: the reference brackets every pipeline stage with perf_counter
(image_lens.py:443-512) and reports MPix/s (image_lens.py:404-425). On an
async backend like JAX, a stage is only "done" when its outputs are
materialized, so `stage()` calls block_until_ready on whatever the stage
returns before stopping the clock.
"""

from __future__ import annotations

import contextlib
from time import perf_counter

import jax


class StageTimer:
    def __init__(self):
        self.timings: dict[str, float] = {}
        self._total_start = perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        start = perf_counter()
        out: list = []
        try:
            yield out
        finally:
            if out:
                jax.block_until_ready(out)
            self.timings[name] = self.timings.get(name, 0.0) + (
                perf_counter() - start)

    def finish(self):
        self.timings["total"] = perf_counter() - self._total_start
        return self.timings
