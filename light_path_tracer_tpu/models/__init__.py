"""Spacetime metric model families."""

from light_path_tracer_tpu.models.base import Metric
from light_path_tracer_tpu.models.schwarzschild import Schwarzschild
from light_path_tracer_tpu.models.kerr import Kerr
from light_path_tracer_tpu.models.reissner_nordstrom import (
    ReissnerNordstrom)
from light_path_tracer_tpu.models.kerr_newman import KerrNewman


def make_metric(M: float = 1.0, a: float = 0.0,
                Q: float = 0.0) -> Metric:
    """Metric selection: a and Q -> Kerr-Newman, a -> Kerr,
    Q -> Reissner-Nordstrom, else Schwarzschild (spin dispatch parity:
    /root/reference/image_lens.py:435-438).
    """
    if a != 0 and Q != 0:
        return KerrNewman(M=M, a=a, Q=Q)
    if a != 0:
        return Kerr(M=M, a=a)
    if Q != 0:
        return ReissnerNordstrom(M=M, Q=Q)
    return Schwarzschild(M=M)


__all__ = ["Metric", "Schwarzschild", "Kerr", "ReissnerNordstrom",
           "KerrNewman", "make_metric"]
