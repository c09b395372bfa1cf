"""Spacetime metric model families."""

from light_path_tracer_tpu.models.base import Metric
from light_path_tracer_tpu.models.schwarzschild import Schwarzschild
from light_path_tracer_tpu.models.kerr import Kerr
from light_path_tracer_tpu.models.reissner_nordstrom import (
    ReissnerNordstrom)
from light_path_tracer_tpu.models.kerr_newman import KerrNewman
from light_path_tracer_tpu.models.johannsen_psaltis import (
    JohannsenPsaltis)
from light_path_tracer_tpu.models.custom import (
    CustomMetric, kerr_covariant, reissner_nordstrom_covariant,
    load_covariant_fn, load_user_metric)


def make_metric(M: float = 1.0, a: float = 0.0,
                Q: float = 0.0, eps3: float = 0.0) -> Metric:
    """Metric selection: eps3 -> Johannsen-Psaltis (deformed Kerr,
    test-GR), a and Q -> Kerr-Newman, a -> Kerr,
    Q -> Reissner-Nordstrom, else Schwarzschild (spin dispatch parity:
    /root/reference/image_lens.py:435-438).
    """
    if eps3 != 0:
        if Q != 0:
            raise ValueError("eps3 (Johannsen-Psaltis) and Q (charge) "
                             "are mutually exclusive")
        return JohannsenPsaltis(M=M, a=a, eps3=eps3)
    if a != 0 and Q != 0:
        return KerrNewman(M=M, a=a, Q=Q)
    if a != 0:
        return Kerr(M=M, a=a)
    if Q != 0:
        return ReissnerNordstrom(M=M, Q=Q)
    return Schwarzschild(M=M)


__all__ = ["Metric", "Schwarzschild", "Kerr", "ReissnerNordstrom",
           "KerrNewman", "JohannsenPsaltis", "CustomMetric",
           "kerr_covariant", "reissner_nordstrom_covariant",
           "load_covariant_fn", "load_user_metric", "make_metric"]
