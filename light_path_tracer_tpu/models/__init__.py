"""Spacetime metric model families."""

from light_path_tracer_tpu.models.base import Metric
from light_path_tracer_tpu.models.schwarzschild import Schwarzschild
from light_path_tracer_tpu.models.kerr import Kerr


def make_metric(M: float = 1.0, a: float = 0.0) -> Metric:
    """Metric selection by spin: a == 0 -> Schwarzschild, else Kerr.

    Parity: /root/reference/image_lens.py:435-438.
    """
    if a == 0:
        return Schwarzschild(M=M)
    return Kerr(M=M, a=a)


__all__ = ["Metric", "Schwarzschild", "Kerr", "make_metric"]
