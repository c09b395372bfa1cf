"""Integrator tests: oracle agreement, equivalences, conservation laws."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import Schwarzschild, Kerr
from light_path_tracer_tpu.ops import (
    trace_rays_schwarzschild, trace_rays_kerr, trace_batch)
from light_path_tracer_tpu.trajectory import integrate_geodesic_8d
from oracles.numpy_reference import (
    schw_trace_scalar, integrate_kerr_scipy, kerr_escape_angle,
    kerr_hamiltonian)

R_OBS = 100.0


def _angles(metric, n=24, spread=4.0):
    ac = metric.alpha_crit(R_OBS)
    return np.linspace(ac / 8, spread * ac, n)


def test_schwarzschild_matches_scalar_oracle_f64():
    m = Schwarzschild(M=1.0)
    angles = _angles(m)
    res = trace_rays_schwarzschild(m, R_OBS, jnp.asarray(angles, jnp.float64))
    for i, a in enumerate(angles):
        s, fa, nh = schw_trace_scalar(1.0, R_OBS, a)
        assert int(res.status[i]) == s, f"alpha={a}"
        if s == 1:
            assert np.isclose(float(res.final_alpha[i]), fa,
                              rtol=1e-10, atol=1e-10), f"alpha={a}"
            assert int(res.n_half_orbits[i]) == nh
        else:
            assert np.isnan(float(res.final_alpha[i]))


def test_schwarzschild_capture_boundary():
    m = Schwarzschild(M=1.0)
    ac = m.alpha_crit(R_OBS)
    res = trace_rays_schwarzschild(
        m, R_OBS, jnp.asarray([ac * 0.97, ac * 1.03], jnp.float64))
    assert int(res.status[0]) == -1   # inside critical angle -> captured
    assert int(res.status[1]) == 1    # outside -> escaped


def test_schwarzschild_invalid_center_ray():
    m = Schwarzschild(M=1.0)
    res = trace_rays_schwarzschild(m, R_OBS, jnp.asarray([0.0], jnp.float64))
    assert int(res.status[0]) == 0
    assert np.isnan(float(res.final_alpha[0]))


def test_kerr_a0_equatorial_matches_schwarzschild_f64():
    """a=0 Kerr DP45 vs the Schwarzschild orbit tracer (SURVEY §4.2c)."""
    mk = Kerr(M=1.0, a=0.0)
    ms = Schwarzschild(M=1.0)
    angles = _angles(ms, n=16)
    alphas = jnp.asarray(angles, jnp.float64)
    thetas = jnp.full_like(alphas, np.pi / 2)   # equatorial screen axis
    rk = trace_rays_kerr(mk, R_OBS, alphas, thetas, np.pi / 2,
                         jnp.zeros(alphas.shape, bool), 5000.0, 200000)
    rs = trace_rays_schwarzschild(ms, R_OBS, alphas)
    assert np.array_equal(np.asarray(rk.status), np.asarray(rs.status))
    esc = np.asarray(rk.status) == 1
    fa_k = np.asarray(rk.final_alpha)[esc]
    fa_s = np.asarray(rs.final_alpha)[esc]
    # Different ODE forms + integrators; Hermite event interpolation keeps
    # the cross-implementation gap well under 1e-4 rad (the reference's
    # linear event lerp loses ~2.5e-3 rad on far-field rays).
    assert np.max(np.abs(fa_k - fa_s)) < 2e-4


def test_kerr_matches_scipy_oracle_f64():
    """DP45 tracer vs scipy RK45 on complex-step RHS, escaped rays."""
    M, a = 1.0, 0.9
    m = Kerr(M=M, a=a)
    ac = m.alpha_crit(R_OBS)
    angles = np.array([1.3 * ac, 1.8 * ac, 3.0 * ac])
    screen = np.array([0.4, 1.9, -2.3])
    alphas = jnp.asarray(angles, jnp.float64)
    thetas = jnp.asarray(screen, jnp.float64)
    res = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                          jnp.zeros(alphas.shape, bool), 5000.0, 200000)
    (r0, th0, phi0, pr0, pth0), p_t, p_phi, _inv = (
        m.initial_conditions_5d(R_OBS, alphas, thetas, np.pi / 2))
    for i in range(len(angles)):
        y0 = [float(v[i]) for v in (r0, th0, phi0, pr0, pth0)]
        y_f, outcome = integrate_kerr_scipy(
            M, a, y0, float(p_t[i]), float(p_phi[i]), R_OBS)
        assert outcome == "escaped"
        assert int(res.status[i]) == 1
        fa_oracle = kerr_escape_angle(M, a, y_f, float(p_t[i]),
                                      float(p_phi[i]))
        # Residual = cubic-Hermite interpolation order on the (huge)
        # escape-crossing step; the reference's linear lerp sits at ~2e-3.
        assert np.isclose(float(res.final_alpha[i]), fa_oracle,
                          atol=1e-4), f"ray {i}"


def test_kerr_capture_inside_shadow():
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    alphas = jnp.asarray([0.2 * ac], jnp.float64)
    thetas = jnp.asarray([0.7], jnp.float64)
    res = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                          jnp.zeros(alphas.shape, bool), 5000.0, 200000)
    assert int(res.status[0]) == -1
    assert np.isnan(float(res.final_alpha[0]))


@pytest.mark.slow
def test_kerr_frame_dragging_asymmetry():
    """Frame dragging: left/right screen edges behave differently for
    a > 0 (the shadow is displaced); a = 0 is symmetric."""
    ac9 = Kerr(M=1.0, a=0.9).alpha_crit(R_OBS)
    alphas = jnp.asarray([ac9, ac9], jnp.float64)
    thetas = jnp.asarray([np.pi / 2, -np.pi / 2], jnp.float64)  # right/left

    m9 = Kerr(M=1.0, a=0.9)
    r9 = trace_rays_kerr(m9, R_OBS, alphas, thetas, np.pi / 2,
                         jnp.zeros(alphas.shape, bool), 5000.0, 200000)
    # Near the envelope angle, one side must capture or deflect far more
    # than the other.
    s = np.asarray(r9.status)
    fa = np.asarray(r9.final_alpha)
    assert (s[0] != s[1]) or (abs(fa[0] - fa[1]) > 0.1)

    m0 = Kerr(M=1.0, a=0.0)
    r0 = trace_rays_kerr(m0, R_OBS, alphas, thetas, np.pi / 2,
                         jnp.zeros(alphas.shape, bool), 5000.0, 200000)
    s0 = np.asarray(r0.status)
    fa0 = np.asarray(r0.final_alpha)
    assert s0[0] == s0[1]
    if s0[0] == 1:
        assert np.isclose(fa0[0], fa0[1], atol=1e-8)


def test_conservation_along_trajectory():
    """E, L conserved exactly (cyclic); H = 0 drifts slowly (SURVEY §4.3)."""
    m = Kerr(M=1.0, a=0.9)
    alphas = jnp.asarray([0.06], jnp.float64)
    thetas = jnp.asarray([1.0], jnp.float64)
    s8, inv = m.initial_conditions_8d(R_OBS, alphas, thetas)
    assert not bool(inv[0])
    traj = integrate_geodesic_8d(m, s8[0], r_obs=R_OBS, n_steps=3000,
                                 h_base=0.5)
    n = int(traj.n_valid)
    states = np.asarray(traj.states[:n])
    # Cyclic momenta exactly constant under the flow.
    np.testing.assert_allclose(states[:, 4], states[0, 4], rtol=0, atol=0)
    np.testing.assert_allclose(states[:, 7], states[0, 7], rtol=0, atol=0)
    # Null condition along the path.
    H = np.array([
        kerr_hamiltonian(1.0, 0.9, s[1], s[2], s[4], s[5], s[6], s[7])
        for s in states])
    assert np.max(np.abs(H)) < 1e-6


@pytest.mark.slow
def test_chunked_and_sorted_equal_unchunked():
    m = Kerr(M=1.0, a=0.8)
    rng = np.random.default_rng(3)
    n = 300
    alphas = jnp.asarray(rng.uniform(0.005, 0.12, n), jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    full = trace_batch(m, R_OBS, alphas, thetas, chunk_size=None)
    chunked = trace_batch(m, R_OBS, alphas, thetas, chunk_size=128,
                          sort_by_difficulty=True)
    np.testing.assert_array_equal(np.asarray(full.status),
                                  np.asarray(chunked.status))
    # Last-ulp only: different batch shapes may pick different FMA
    # contraction in the compiled RHS.
    np.testing.assert_allclose(np.asarray(full.final_alpha),
                               np.asarray(chunked.final_alpha),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(full.n_half_orbits),
                                  np.asarray(chunked.n_half_orbits))


@pytest.mark.slow
def test_f32_close_to_f64():
    """float32 path accuracy vs float64 (drives the RMSE<1e-3 gate)."""
    m = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(7)
    n = 200
    ac = m.alpha_crit(R_OBS)
    alphas64 = rng.uniform(1.1 * ac, 5 * ac, n)
    thetas64 = rng.uniform(-np.pi, np.pi, n)
    r64 = trace_rays_kerr(m, R_OBS, jnp.asarray(alphas64, jnp.float64),
                          jnp.asarray(thetas64, jnp.float64), np.pi / 2,
                          jnp.zeros(n, bool), 5000.0, 200000)
    r32 = trace_rays_kerr(m, R_OBS, jnp.asarray(alphas64, jnp.float32),
                          jnp.asarray(thetas64, jnp.float32), np.pi / 2,
                          jnp.zeros(n, bool), 5000.0, 200000)
    s64 = np.asarray(r64.status)
    s32 = np.asarray(r32.status)
    # Outcome flips only possible right at the critical boundary.
    assert np.mean(s64 != s32) < 0.02
    both = (s64 == 1) & (s32 == 1)
    fa64 = np.asarray(r64.final_alpha)[both]
    fa32 = np.asarray(r32.final_alpha)[both]
    err = np.abs(fa64 - fa32)
    assert np.sqrt(np.mean(err**2)) < 2e-3
    assert np.median(err) < 5e-4


def test_axis_refine_tightens_result():
    """Refined tolerances must not change escaped/captured classification
    and should stay consistent with the unrefined result."""
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    alphas = jnp.asarray([1.5 * ac, 3.0 * ac], jnp.float64)
    thetas = jnp.asarray([0.05, -0.1], jnp.float64)
    base = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                           jnp.zeros(2, bool), 5000.0, 200000)
    fine = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                           jnp.ones(2, bool), 5000.0, 200000)
    np.testing.assert_array_equal(np.asarray(base.status),
                                  np.asarray(fine.status))
    np.testing.assert_allclose(np.asarray(base.final_alpha),
                               np.asarray(fine.final_alpha), atol=1e-4)


@pytest.mark.slow
def test_rk4_agrees_with_dp45():
    """Adaptive-vs-fixed-step cross-check (SURVEY §4.2b)."""
    from light_path_tracer_tpu.ops.kerr_rk4 import trace_rays_kerr_rk4
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(9)
    n = 40
    alphas = jnp.asarray(
        np.concatenate([rng.uniform(0.3 * ac, 0.8 * ac, n // 2),
                        rng.uniform(1.2 * ac, 4.0 * ac, n // 2)]),
        jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    refine = jnp.zeros(n, bool)
    r_dp = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2, refine,
                           5000.0, 200000)
    r_rk = trace_rays_kerr_rk4(m, R_OBS, alphas, thetas, np.pi / 2, refine,
                               5000.0, 200000)
    s_dp, s_rk = np.asarray(r_dp.status), np.asarray(r_rk.status)
    # Away from the critical angle the outcomes must agree.
    assert (s_dp == s_rk).mean() > 0.95
    both = (s_dp == 1) & (s_rk == 1)
    d = np.abs(np.asarray(r_dp.final_alpha)[both]
               - np.asarray(r_rk.final_alpha)[both])
    # RK4 h=1.0 fixed step + linear event lerp: ~1e-2 agreement is the
    # expected fidelity of the comparison path (as in the reference).
    assert np.median(d) < 5e-3
    assert np.percentile(d, 90) < 3e-2


def test_negative_spin_mirror():
    """a < 0 mirrors the frame-dragging: the shadow displacement flips."""
    ac_p = Kerr(M=1.0, a=0.9).alpha_crit(R_OBS)
    alphas = jnp.asarray([ac_p, ac_p], jnp.float64)
    thetas = jnp.asarray([np.pi / 2, -np.pi / 2], jnp.float64)
    rp = trace_rays_kerr(Kerr(M=1.0, a=0.9), R_OBS, alphas, thetas,
                         np.pi / 2, jnp.zeros(2, bool), 5000.0, 200000)
    rm = trace_rays_kerr(Kerr(M=1.0, a=-0.9), R_OBS, alphas, thetas,
                         np.pi / 2, jnp.zeros(2, bool), 5000.0, 200000)
    # Swapping the spin sign swaps the left/right roles.
    np.testing.assert_array_equal(np.asarray(rp.status),
                                  np.asarray(rm.status)[::-1])
    fa_p = np.asarray(rp.final_alpha)
    fa_m = np.asarray(rm.final_alpha)[::-1]
    both = np.isfinite(fa_p) & np.isfinite(fa_m)
    np.testing.assert_allclose(fa_p[both], fa_m[both], atol=5e-5)


def test_polar_observer_no_nans():
    """Observer near the spin axis exercises the sin^2 floors; results
    must stay finite and classify sanely."""
    m = Kerr(M=1.0, a=0.7)
    rng = np.random.default_rng(17)
    n = 64
    alphas = jnp.asarray(rng.uniform(0.01, 0.15, n), jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    res = trace_rays_kerr(m, R_OBS, alphas, thetas, 0.05,  # ~3 deg
                          jnp.zeros(n, bool), 5000.0, 200000)
    s = np.asarray(res.status)
    fa = np.asarray(res.final_alpha)
    assert set(np.unique(s)).issubset({-1, 0, 1})
    assert np.isfinite(fa[s == 1]).all()
    assert (s == 1).sum() > 0 and (s == -1).sum() > 0


@pytest.mark.slow
def test_early_capture_equivalence():
    """Certain-plunge termination changes no outcome or escaped angle."""
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(23)
    n = 400
    alphas = jnp.asarray(rng.uniform(0.05 * ac, 3 * ac, n), jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    on = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                         jnp.zeros(n, bool), 5000.0, 200000,
                         early_capture=True)
    off = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                          jnp.zeros(n, bool), 5000.0, 200000,
                          early_capture=False)
    np.testing.assert_array_equal(np.asarray(on.status),
                                  np.asarray(off.status))
    esc = np.asarray(on.status) == 1
    np.testing.assert_allclose(np.asarray(on.final_alpha)[esc],
                               np.asarray(off.final_alpha)[esc],
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(on.n_half_orbits)[esc],
                                  np.asarray(off.n_half_orbits)[esc])
    # The optimization must actually engage: captured rays stop earlier.
    assert (np.asarray(on.status) == -1).sum() > 20

    # Extremal spin: plunge radius degenerates below the capture radius
    # and silently disables — still correct.
    m1 = Kerr(M=1.0, a=0.999)
    r1 = trace_rays_kerr(m1, R_OBS, alphas[:50], thetas[:50], np.pi / 2,
                         jnp.zeros(50, bool), 5000.0, 200000)
    assert set(np.unique(np.asarray(r1.status))).issubset({-1, 0, 1})


def test_adaptive_trajectory_recorder():
    """Adaptive 8-D path recorder (scipy-path equivalent): conservation
    along the path, sensible termination, agreement with the angle
    tracer's classification."""
    from light_path_tracer_tpu.trajectory import (
        integrate_geodesic_8d_adaptive)
    m = Kerr(M=1.0, a=0.9)
    alphas = jnp.asarray([0.06, 0.02], jnp.float64)   # escape, capture
    thetas = jnp.asarray([1.0, 0.5], jnp.float64)
    s8, inv = m.initial_conditions_8d(R_OBS, alphas, thetas)
    assert not bool(inv.any())
    traj = integrate_geodesic_8d_adaptive(m, s8, r_obs=R_OBS,
                                          n_steps=2000)
    out = np.asarray(traj.outcome)
    assert out[0] == 1 and out[1] == -1

    # Conservation + monotonic lambda on the compacted escaped path.
    n = int(traj.n_valid[0])
    assert 10 < n < 2000
    states = np.asarray(traj.states[:n, 0])
    lams = np.asarray(traj.lambdas[:n, 0])
    assert (np.diff(lams) > 0).all()
    np.testing.assert_allclose(states[:, 4], states[0, 4], rtol=0, atol=0)
    np.testing.assert_allclose(states[:, 7], states[0, 7], rtol=0, atol=0)
    H = np.array([
        kerr_hamiltonian(1.0, 0.9, s[1], s[2], s[4], s[5], s[6], s[7])
        for s in states])
    assert np.max(np.abs(H)) < 1e-6   # incl. the Hermite-interpolated end

    # Terminates at the escape radius (within the last interpolated step).
    assert abs(states[-1, 1] - 2 * R_OBS) < 1e-2


@pytest.mark.slow
def test_mu_and_theta_formulations_agree():
    """Full-trace equivalence of the production mu-form and the
    reference-parity theta-form (same geodesics, different step
    sequences -> agreement to integration tolerance)."""
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(100.0)
    rng = np.random.default_rng(11)
    n = 64
    alphas = jnp.asarray(rng.uniform(0.2 * ac, 4.0 * ac, n), jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    refine = jnp.zeros(n, bool)

    r_mu = trace_rays_kerr(m, 100.0, alphas, thetas, np.pi / 2, refine,
                           5000.0, 200000, formulation="mu")
    r_th = trace_rays_kerr(m, 100.0, alphas, thetas, np.pi / 2, refine,
                           5000.0, 200000, formulation="theta")

    np.testing.assert_array_equal(np.asarray(r_mu.status),
                                  np.asarray(r_th.status))
    esc = np.asarray(r_mu.status) == 1
    d = np.abs(np.asarray(r_mu.final_alpha)[esc]
               - np.asarray(r_th.final_alpha)[esc])
    # Two equally-valid adaptive step sequences differ by ~the global
    # integration error (rtol=1e-6 accumulated over ~1e3 steps): the
    # same order as the theta-form's own deviation from the scipy oracle
    # (test_kerr_matches_scipy_oracle_f64).
    assert np.median(d) < 1e-4
    assert np.max(d) < 1e-3   # near-critical grazers amplify tolerance
    np.testing.assert_array_equal(np.asarray(r_mu.n_half_orbits)[esc],
                                  np.asarray(r_th.n_half_orbits)[esc])


@pytest.mark.slow
def test_dop853_agrees_with_dp45_f64():
    """Higher-order pair cross-check: DOP853 and DP45 integrate the same
    geodesics (both at f64 reference tolerances)."""
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(11)
    n = 32
    alphas = jnp.asarray(
        np.concatenate([rng.uniform(0.3 * ac, 0.9 * ac, n // 2),
                        rng.uniform(1.1 * ac, 4.0 * ac, n // 2)]),
        jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    refine = jnp.zeros(n, bool)
    r_dp = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2, refine,
                           5000.0, 200000)
    r_d8 = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2, refine,
                           5000.0, 200000, method="dop853")
    s_dp, s_d8 = np.asarray(r_dp.status), np.asarray(r_d8.status)
    np.testing.assert_array_equal(s_dp, s_d8)
    both = s_dp == 1
    d = np.abs(np.asarray(r_dp.final_alpha)[both]
               - np.asarray(r_d8.final_alpha)[both])
    # Agreement is bounded by DP45's own global error at rtol 1e-6.
    assert np.median(d) < 1e-4
    assert d.max() < 2e-3
    # The 8th-order pair must take (a lot) fewer lock-step iterations.
    assert int(r_d8.n_steps) < int(r_dp.n_steps)


@pytest.mark.slow
def test_dop853_f32_no_nan_freeze():
    """Regression: f32 DOP853 stage derivatives can overflow to inf with
    y5 still finite; the resulting NaN error estimate must reject the
    attempt, not freeze the lane at constant h until max_steps (found as
    200k-step grinds on these exact rays — ops/kerr_trace.py)."""
    m = Kerr(M=1.0, a=0.9)
    alphas = jnp.asarray([0.12012033, 0.05478825, 0.05211393, 0.13118355,
                          0.24906693, 0.06807395], jnp.float32)
    thetas = jnp.asarray([2.7104206, -0.48213091, 0.4013553, 2.8982608,
                          -3.0726397, -2.5031316], jnp.float32)
    refine = jnp.zeros(6, bool)
    res = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2, refine,
                          5000.0, 20000, method="dop853")
    # All lanes resolve (no 20k-step exhaustion) to a real outcome.
    assert int(res.n_steps) < 5000
    assert set(np.asarray(res.status).tolist()) <= {-1, 1}
