"""Ellis-Bronnikov massless wormhole through the CustomMetric plug-in
(examples/user_metric.py:ellis_wormhole) — the HORIZONLESS exercise of
the user-metric surface: no mass, no horizon, the capture sphere comes
from the signature scan finding the throat (g_rr flips sign at r = b),
and alpha_crit bisection seeds its bracket from that surface instead
of 3*sqrt(3)*M (models/numeric.py massless fallback).

Physics oracles (exact, closed-form — the metric is that simple):
  * shadow edge at arcsin(b / r_obs): the light ring sits AT the
    throat with critical impact parameter exactly b, and g_tt = -1
    makes b_imp = r_obs * sin(alpha) exact at ANY radius.
  * weak-field deflection is QUADRATIC: bend = pi b^2 / (4 b_imp^2)
    + 9 pi b^4 / (64 b_imp^4) + O((b/b_imp)^6) — the standard
    massless-lens discriminator vs Schwarzschild's 4M/b_imp.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import CustomMetric, load_user_metric
from light_path_tracer_tpu.ops.kerr_trace import (trace_rays_kerr,
                                                  ESCAPED, CAPTURED)

_EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

R_OBS = 60.0
B_THROAT = 2.0
ALPHA_EDGE = np.arcsin(B_THROAT / R_OBS)      # 0.03334 rad
N_FAN = 24
A_FAN = np.linspace(0.4, 1.6, N_FAN) * ALPHA_EDGE
A_WEAK = np.arcsin(np.array([12.0, 16.0, 20.0]) / R_OBS)


@pytest.fixture(scope="module")
def metric():
    m = load_user_metric(
        os.path.join(_EXAMPLES, "user_metric.py") + ":ellis_wormhole")
    assert isinstance(m, CustomMetric)
    assert m.M == 0.0
    return m


@pytest.fixture(scope="module")
def fan(metric):
    alphas = np.concatenate([A_FAN, A_WEAK])
    res = trace_rays_kerr(
        metric, R_OBS, jnp.asarray(alphas, jnp.float64),
        jnp.zeros(alphas.size, jnp.float64), np.pi / 2,
        jnp.zeros(alphas.size, bool), 5000.0, 20000)
    return np.asarray(res.status), np.asarray(res.final_alpha)


def test_throat_becomes_capture_surface(metric):
    # Signature scan: g_rr < 0 below r = b -> capture at 1.02 b.
    assert metric.capture_radius() == pytest.approx(
        1.02 * B_THROAT, rel=0.02)


def test_shadow_edge_at_arcsin_b_over_r(fan):
    st, _ = fan
    inside = A_FAN < 0.97 * ALPHA_EDGE
    outside = A_FAN > 1.05 * ALPHA_EDGE
    assert inside.sum() >= 8 and outside.sum() >= 8
    assert (st[:N_FAN][inside] == CAPTURED).all()
    assert (st[:N_FAN][outside] == ESCAPED).all()


def test_alpha_crit_bisection_massless(metric):
    # The traced bisection (with the massless bracket fallback) must
    # land on the exact closed form arcsin(b / r_obs).
    got = metric.alpha_crit(R_OBS)
    assert abs(got - ALPHA_EDGE) < 1e-3


def test_quadratic_deflection_law(fan):
    st, fa = fan
    for i, a0 in enumerate(A_WEAK):
        assert st[N_FAN + i] == ESCAPED
        b_imp = R_OBS * np.sin(a0)
        x = B_THROAT / b_imp
        bend = abs(fa[N_FAN + i] - a0)
        oracle = np.pi * x * x / 4.0 + 9.0 * np.pi * x ** 4 / 64.0
        assert abs(bend - oracle) / oracle < 0.05
