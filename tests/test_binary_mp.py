"""Majumdar-Papapetrou BINARY black hole through the CustomMetric
plug-in (examples/user_metric.py:mp_binary) — the instance form of
--metric-py, exercising captured_fn (non-spherical trapped region:
each extremal horizon is a POINT on the axis in isotropic
coordinates) and alpha_crit_override.

One trace, many oracles (the autodiff-RHS compile dominates, so all
rays ride one batch): a vertical screen fan through both holes at
r_obs = 60M, m1 = m2 = 0.5, s = 6M (holes at z = +-6M, angular
position arctan(6/60) = 0.0997 rad on the screen):

  * ESCAPE CORRIDOR between the holes: small-alpha rays thread the
    binary and escape — the signature that distinguishes a resolved
    binary from one merged shadow (capture there would mean the
    shadows overlap).
  * CAPTURE BAND centered on each hole's angular position, width
    ~ 2 b_crit / r_obs with b_crit ~ 4m for an isolated extremal hole
    (photon sphere of extremal RN).
  * Up/down symmetry at m1 = m2 (exact reflection isometry).
  * Weak-field deflection of far rays: |bend| = 4M/b + 15 pi M^2/4b^2
    with M = m1 + m2 (the binary's monopole), to a few %.

Capture classification happens in the EPILOGUE (captured_fn fires at
the step budget — throat-bound rays never cross a capture sphere), so
n_steps == max_steps whenever anything is captured.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import CustomMetric, load_user_metric
from light_path_tracer_tpu.ops.kerr_trace import (trace_rays_kerr,
                                                  ESCAPED, CAPTURED)

_EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

R_OBS = 60.0
M_HOLE = 0.5
SEP = 6.0
HOLE_ANGLE = np.arctan(SEP / R_OBS)          # 0.0997 rad
N_BAND = 40
A_BAND = np.linspace(0.003, 0.28, N_BAND)
A_WEAK = np.array([0.5, 0.6, 0.8])


@pytest.fixture(scope="module")
def fan():
    metric = load_user_metric(
        os.path.join(_EXAMPLES, "user_metric.py") + ":mp_binary")
    assert isinstance(metric, CustomMetric)
    assert metric.captured_fn is not None
    assert metric.M == 2 * M_HOLE and metric.a == 0.0
    alphas = np.concatenate([A_BAND, A_BAND, A_WEAK])
    thetas = np.concatenate([np.zeros(N_BAND),        # screen up
                             np.full(N_BAND, np.pi),  # screen down
                             np.zeros(3)])
    res = trace_rays_kerr(
        metric, R_OBS, jnp.asarray(alphas, jnp.float64),
        jnp.asarray(thetas, jnp.float64), np.pi / 2,
        jnp.zeros(alphas.size, bool), 5000.0, 1500)
    return np.asarray(res.status), np.asarray(res.final_alpha)


def test_escape_corridor_between_the_holes(fan):
    st, _ = fan
    corridor = A_BAND < 0.07
    assert corridor.sum() >= 8
    assert (st[:N_BAND][corridor] == ESCAPED).all()
    assert (st[N_BAND:2 * N_BAND][corridor] == ESCAPED).all()


def test_capture_band_at_each_hole(fan):
    st, _ = fan
    band = (A_BAND > 0.095) & (A_BAND < 0.135)
    assert band.sum() >= 4
    assert (st[:N_BAND][band] == CAPTURED).all()
    assert (st[N_BAND:2 * N_BAND][band] == CAPTURED).all()
    # Band width ~ 2 b_crit / r_obs = 8 m / r_obs = 0.067 rad: the
    # measured captured set must sit inside a generous bracket around
    # the hole angle and not leak past it.
    outer = A_BAND > 0.17
    assert (st[:N_BAND][outer] == ESCAPED).all()
    cap_alphas = A_BAND[st[:N_BAND] == CAPTURED]
    assert cap_alphas.size > 0
    assert abs(cap_alphas.mean() - HOLE_ANGLE) < 0.03


def test_equal_mass_updown_symmetry(fan):
    st, fa = fan
    up, down = st[:N_BAND], st[N_BAND:2 * N_BAND]
    np.testing.assert_array_equal(up, down)
    ok = (up == ESCAPED) & (down == ESCAPED)
    d = np.abs(fa[:N_BAND][ok] - fa[N_BAND:2 * N_BAND][ok])
    assert d.max() < 1e-3


def test_weak_field_deflection_oracle(fan):
    st, fa = fan
    M_tot = 2 * M_HOLE
    for i, a0 in enumerate(A_WEAK):
        assert st[2 * N_BAND + i] == ESCAPED
        b = R_OBS * np.sin(a0)
        bend = abs(fa[2 * N_BAND + i] - a0)
        oracle = 4 * M_tot / b + 15 * np.pi * M_tot**2 / (4 * b * b)
        assert abs(bend - oracle) / oracle < 0.05


def test_loader_rejects_non_metric_non_callable(tmp_path):
    bad = tmp_path / "bad_metric.py"
    bad.write_text("NOT_A_METRIC = 42\n")
    with pytest.raises(TypeError):
        load_user_metric(str(bad) + ":NOT_A_METRIC")


def test_callable_spec_still_wraps(tmp_path):
    metric = load_user_metric(
        os.path.join(_EXAMPLES, "user_metric.py") + ":hayward",
        M=1.0, a=0.0)
    assert isinstance(metric, CustomMetric)
    assert metric.captured_fn is None and metric.covariant_fn is not None
