"""Numeric (trace-based) geometry for metrics without closed forms.

Kerr-family metrics get their shadow geometry analytically (Bardeen
photon-orbit band, reference metrics.py:893-930). Families without
Carter separability — Johannsen-Psaltis, and arbitrary user metrics
plugged in through `models.custom.CustomMetric` — have no closed form,
so the critical angle is measured from the integrator itself: per
screen azimuth, bisect the capture/escape boundary in viewing angle
and return the envelope maximum. This is host-side analysis (a few
dozen compiled trace calls over `n_azimuth` rays), not a render path;
it validates against Kerr's analytic envelope to <1e-3 in
tests/test_johannsen_psaltis.py and against Reissner-Nordstrom's
analytic b_crit in tests/test_custom_metric.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def alpha_crit_traced(metric, r_obs, theta_obs=None, n_azimuth: int = 16,
                      iters: int = 26, max_steps: int = 60000) -> float:
    """Shadow-envelope critical angle by bisection on TRACED outcomes.

    Works for any metric the 5-D Kerr-machinery tracer accepts (the
    two Killing symmetries are the only requirement). INVALID /
    step-exhausted lanes sit in the pathological inner region — for
    boundary purposes they count as captured (a clean escape always
    classifies).
    """
    from light_path_tracer_tpu.ops.kerr_trace import (
        trace_rays_kerr, ESCAPED)
    if theta_obs is None:
        theta_obs = np.pi / 2
    thetas = jnp.asarray(
        np.linspace(0.0, 2.0 * np.pi, n_azimuth, endpoint=False)
        + 0.05, jnp.float64)
    refine = jnp.zeros(n_azimuth, bool)

    def not_escaped(angles):
        res = trace_rays_kerr(
            metric, float(r_obs), jnp.asarray(angles, jnp.float64),
            thetas, float(theta_obs), refine,
            lambda_max=max(5000.0, 6.0 * float(r_obs)),
            max_steps=max_steps)
        return np.asarray(res.status) != ESCAPED

    # Bracket: alpha -> 0 is certainly captured; start the upper edge
    # at 3x the Schwarzschild critical angle and EXPAND it while any
    # azimuth's boundary ray is still not escaping (strong deformations
    # can grow the shadow past any fixed guess).
    b_schw = 3.0 * np.sqrt(3.0) * metric.M
    if b_schw <= 0.0:
        # Massless metric (e.g. the Ellis wormhole example): the only
        # intrinsic scale is the capture surface itself.
        b_schw = max(3.0 * float(metric.capture_radius()),
                     0.05 * float(r_obs))
    hi0 = min(np.pi / 2, 3.0 * np.arcsin(
        min(1.0, b_schw / float(r_obs))))
    lo = np.full(n_azimuth, 1e-5)
    hi = np.full(n_azimuth, hi0)
    for _ in range(6):
        if not not_escaped(hi).any() or hi.max() >= np.pi / 2:
            break
        hi = np.minimum(hi * 2.0, np.pi / 2)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        cap = not_escaped(mid)
        lo = np.where(cap, mid, lo)
        hi = np.where(cap, hi, mid)
    return float(np.max(0.5 * (lo + hi)))
