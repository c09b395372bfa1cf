"""Integration kernels: batched lock-step ODE tracers + Pallas kernels."""

from light_path_tracer_tpu.ops.types import TraceResult
from light_path_tracer_tpu.ops.schwarzschild_trace import (
    trace_rays_schwarzschild)
from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr
from light_path_tracer_tpu.ops.batch import trace_batch

__all__ = [
    "TraceResult",
    "trace_rays_schwarzschild",
    "trace_rays_kerr",
    "trace_batch",
]
