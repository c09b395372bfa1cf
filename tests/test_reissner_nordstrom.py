"""Reissner-Nordstrom (charged BH) tests — the third metric family.

Oracles: analytic closed forms (photon sphere, critical impact
parameter, horizon), the exact Q -> 0 Schwarzschild limit (the traced
orbits must be bitwise-identical — the RN orbit RHS reduces exactly),
the scipy-analogue 8-D Hamiltonian path cross-check, and the known
monotone physics (charge shrinks the shadow)."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import (
    Schwarzschild, ReissnerNordstrom, make_metric)
from light_path_tracer_tpu.ops.batch import trace_batch
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig


def test_closed_forms():
    rn = ReissnerNordstrom(M=1.0, Q=0.6)
    # Horizon r_+ = M + sqrt(M^2 - Q^2).
    assert np.isclose(rn.R_S, 1.0 + np.sqrt(1.0 - 0.36), rtol=1e-12)
    # Photon sphere (3M + sqrt(9M^2 - 8Q^2))/2 and its defining
    # property: the effective-potential extremum f'(r) r = 2 f(r)
    # <=> 2 r^2 - ... — check directly that b(r) = r/sqrt(f) is
    # stationary at r_ph.
    r_ph = rn.R_PHOTON
    assert np.isclose(r_ph, 0.5 * (3 + np.sqrt(9 - 8 * 0.36)),
                      rtol=1e-12)
    b = lambda r: r / np.sqrt(rn.f(r))
    eps = 1e-6
    assert abs(b(r_ph + eps) - b(r_ph - eps)) < 1e-9
    assert np.isclose(rn.B_CRIT, b(r_ph), rtol=1e-12)
    # Extremal limits: Q = M -> r_ph = 2M, b_crit = 4M, r_+ = M.
    ext = ReissnerNordstrom(M=1.0, Q=1.0)
    assert np.isclose(ext.R_PHOTON, 2.0, rtol=1e-12)
    assert np.isclose(ext.B_CRIT, 4.0, rtol=1e-12)
    assert np.isclose(ext.R_S, 1.0, rtol=1e-12)


def test_naked_singularity_rejected():
    with pytest.raises(ValueError, match="naked"):
        ReissnerNordstrom(M=1.0, Q=1.1)
    from light_path_tracer_tpu.models import KerrNewman
    assert isinstance(make_metric(1.0, a=0.5, Q=0.5), KerrNewman)


def test_q_zero_is_exactly_schwarzschild():
    """Q = 0 traces bitwise-identically to Schwarzschild: the orbit
    RHS gains only a -2 Q^2 u^3 = -0 term and the closed forms reduce
    exactly."""
    sch = Schwarzschild(M=1.0)
    rn0 = ReissnerNordstrom(M=1.0, Q=0.0)
    assert rn0.R_S == sch.R_S
    assert np.isclose(rn0.B_CRIT, sch.B_CRIT, rtol=1e-14)  # 1-ulp: the
    # RN form evaluates r_ph/sqrt(f) numerically vs 3*sqrt(3) exactly
    alphas = jnp.asarray(np.linspace(0.01, 0.2, 64), jnp.float64)
    r_s = trace_batch(sch, 100.0, alphas)
    r_q = trace_batch(rn0, 100.0, alphas)
    np.testing.assert_array_equal(np.asarray(r_s.final_alpha),
                                  np.asarray(r_q.final_alpha))
    np.testing.assert_array_equal(np.asarray(r_s.status),
                                  np.asarray(r_q.status))


def test_charge_shrinks_shadow():
    """b_crit (and hence alpha_crit and the captured set) decreases
    monotonically with |Q| — the known RN shadow-shrinking result."""
    bs = [ReissnerNordstrom(M=1.0, Q=q).B_CRIT
          for q in (0.0, 0.3, 0.6, 0.9, 1.0)]
    assert all(b1 > b2 for b1, b2 in zip(bs, bs[1:]))
    assert np.isclose(bs[0], 3 * np.sqrt(3), rtol=1e-12)
    # Traced capture sets agree with the analytic threshold.
    rn = ReissnerNordstrom(M=1.0, Q=0.9)
    a_crit = rn.alpha_crit(100.0)
    alphas = jnp.asarray(np.linspace(0.5, 1.5, 41) * a_crit,
                         jnp.float64)
    res = trace_batch(rn, 100.0, alphas)
    captured = np.isnan(np.asarray(res.final_alpha))
    expected = np.asarray(alphas) < a_crit
    assert (captured == expected).mean() > 0.95


def test_orbit_path_matches_8d_hamiltonian():
    """Escape headings from the reduced orbit equation agree with the
    full 8-D Hamiltonian integration (independent formulation of the
    same geodesics — the SURVEY's redundant-implementation oracle)."""
    from light_path_tracer_tpu.trajectory import trace_ray_trajectory
    rn = ReissnerNordstrom(M=1.0, Q=0.8)
    a_crit = rn.alpha_crit(50.0)
    for mult in (1.4, 2.5):
        alpha = float(a_crit * mult)
        res = trace_batch(rn, 50.0, jnp.asarray([alpha], jnp.float64))
        assert int(res.status[0]) == 1       # escaped
        traj, outcome = trace_ray_trajectory(rn, 50.0, alpha,
                                             dtype=jnp.float64)
        assert outcome == "escaped"
        # Escape heading agreement (both paths compute the deflected
        # final direction; tolerance dominated by the 8-D path's step
        # resolution near the escape radius).
        fa_orbit = float(res.final_alpha[0])
        n = int(traj.n_valid)
        states = np.asarray(traj.states)[:n]
        r = states[:, 1]
        phi = states[:, 3]
        x, y = r * np.cos(phi), r * np.sin(phi)
        v = np.array([x[-1] - x[-2], y[-1] - y[-2]])
        v /= np.linalg.norm(v)
        fa_8d = float(np.arccos(np.clip(-v[0], -1, 1)))
        assert abs(fa_orbit - fa_8d) < 5e-3, (mult, fa_orbit, fa_8d)


def test_rn_shadow_renders_and_is_smaller():
    """End-to-end: the RN pipeline shadow is strictly smaller than the
    Schwarzschild one at the same mass."""
    from light_path_tracer_tpu.pipeline import render_shadow
    cfg = RenderConfig(dtype="float64", backend="xla")
    img_s, _ = render_shadow(SceneConfig(M=1.0), (48, 48), cfg)
    img_q, st = render_shadow(SceneConfig(M=1.0, Q=0.9), (48, 48), cfg)
    dark_s = float((np.asarray(img_s) < 0.5).sum())
    dark_q = float((np.asarray(img_q) < 0.5).sum())
    assert 0 < dark_q < dark_s
