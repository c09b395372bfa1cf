"""Physics-formula unit tests: analytic invariants as oracles (SURVEY §4.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import Schwarzschild, Kerr
from oracles.numpy_reference import (
    kerr_rhs5_complex_step, kerr_hamiltonian)


def test_schwarzschild_constants():
    m = Schwarzschild(M=2.0)
    assert m.R_S == 4.0
    assert m.R_PHOTON == 6.0
    assert np.isclose(m.B_CRIT, 3 * np.sqrt(3) * 2.0)
    assert np.isclose(m.capture_radius(), 4.0 * 1.01)


def test_schwarzschild_alpha_crit_formula():
    m = Schwarzschild(M=1.0)
    r_obs = 50.0
    expected = np.arcsin(3 * np.sqrt(3) * np.sqrt(1 - 2 / 50) / 50)
    assert np.isclose(m.alpha_crit(r_obs), expected)


def test_kerr_spin_bound():
    with pytest.raises(ValueError):
        Kerr(M=1.0, a=1.5)


def test_kerr_horizon():
    m = Kerr(M=1.0, a=0.9)
    assert np.isclose(m.r_plus, 1 + np.sqrt(1 - 0.81))
    assert np.isclose(Kerr(M=1.0, a=0.0).r_plus, 2.0)
    assert np.isclose(Kerr(M=1.0, a=1.0).r_plus, 1.0)


def test_bardeen_photon_radii_limits():
    # a=0: both photon orbits at 3M; a=M: prograde M, retrograde 4M.
    m0 = Kerr(M=1.0, a=0.0)
    assert np.allclose(m0.unstable_photon_radii(), (3.0, 3.0))
    m1 = Kerr(M=1.0, a=1.0)
    r_pro, r_ret = m1.unstable_photon_radii()
    assert np.isclose(r_pro, 1.0, atol=1e-12)
    assert np.isclose(r_ret, 4.0, atol=1e-12)


def test_kerr_alpha_crit_a0_equals_schwarzschild():
    r_obs = 100.0
    assert np.isclose(Kerr(M=1.0, a=0.0).alpha_crit(r_obs),
                      Schwarzschild(M=1.0).alpha_crit(r_obs))
    # Continuity: tiny spin stays near the Schwarzschild value.
    assert np.isclose(Kerr(M=1.0, a=1e-4).alpha_crit(r_obs),
                      Schwarzschild(M=1.0).alpha_crit(r_obs), rtol=1e-3)


def test_impact_parameter_a0():
    r_obs, alpha = 100.0, 0.01
    k = Kerr(M=1.0, a=0.0)
    s = Schwarzschild(M=1.0)
    assert np.isclose(k.viewing_angle_to_impact_parameter(alpha, r_obs),
                      s.viewing_angle_to_impact_parameter(alpha, r_obs))


def test_kerr_rhs_vs_complex_step():
    """Analytic RHS == complex-step derivative of the Hamiltonian."""
    M, a = 1.0, 0.85
    m = Kerr(M=M, a=a)
    rng = np.random.default_rng(42)
    n = 64
    r = rng.uniform(2.2, 80.0, n)
    th = rng.uniform(0.3, np.pi - 0.3, n)
    p_r = rng.uniform(-1.5, 1.5, n)
    p_th = rng.uniform(-8.0, 8.0, n)
    p_t = np.full(n, -1.0)
    p_phi = rng.uniform(-8.0, 8.0, n)

    state = tuple(jnp.asarray(v) for v in
                  (r, th, np.zeros(n), p_r, p_th))
    got = m.rhs5(state, jnp.asarray(p_t), jnp.asarray(p_phi))

    for i in range(n):
        want = kerr_rhs5_complex_step(
            M, a, r[i], th[i], p_r[i], p_th[i], p_t[i], p_phi[i])
        for comp, (g, w) in enumerate(zip(got, want)):
            assert np.isclose(float(g[i]), w, rtol=1e-10, atol=1e-12), (
                f"component {comp} ray {i}: {float(g[i])} vs {w}")


def test_kerr_rhs_frozen_inside_horizon():
    m = Kerr(M=1.0, a=0.5)
    r_in = m.r_plus * 1.0005
    state = tuple(jnp.asarray([v]) for v in
                  (r_in, np.pi / 2, 0.0, -0.5, 0.3))
    out = m.rhs5(state, jnp.asarray([-1.0]), jnp.asarray([2.0]))
    for comp in out:
        assert float(comp[0]) == 0.0


def test_initial_conditions_null():
    """ICs must satisfy the null condition g^{mu nu} p_mu p_nu = 0."""
    m = Kerr(M=1.0, a=0.9)
    r_obs = 100.0
    alphas = jnp.asarray(np.radians([0.5, 1.5, 3.0, 6.0]), jnp.float64)
    thetas = jnp.asarray([0.3, 1.2, 2.5, -0.8], jnp.float64)
    (r, th, phi, p_r, p_th), p_t, p_phi, invalid = (
        m.initial_conditions_5d(r_obs, alphas, thetas, np.pi / 2))
    assert not bool(invalid.any())
    for i in range(4):
        H = kerr_hamiltonian(1.0, 0.9, float(r[i]), float(th[i]),
                             float(p_t[i]), float(p_r[i]),
                             float(p_th[i]), float(p_phi[i]))
        assert abs(H) < 1e-10


def test_initial_conditions_8d_matches_5d():
    m = Kerr(M=1.0, a=0.7)
    alphas = jnp.asarray([0.01, 0.03], jnp.float64)
    thetas = jnp.asarray([0.4, 2.0], jnp.float64)
    s8, inv8 = m.initial_conditions_8d(100.0, alphas, thetas)
    (r, th, phi, p_r, p_th), p_t, p_phi, inv5 = m.initial_conditions_5d(
        100.0, alphas, thetas, np.pi / 2)
    np.testing.assert_allclose(np.asarray(s8[:, 1]), np.asarray(r))
    np.testing.assert_allclose(np.asarray(s8[:, 5]), np.asarray(p_r))
    np.testing.assert_allclose(np.asarray(s8[:, 6]), np.asarray(p_th))
    np.testing.assert_allclose(np.asarray(s8[:, 7]), np.asarray(p_phi))
    np.testing.assert_allclose(np.asarray(s8[:, 4]), np.asarray(p_t))


def test_kerr_a0_rhs_matches_schwarzschild_8d():
    """Kerr RHS at a=0 equals the Schwarzschild Hamiltonian RHS."""
    mk = Kerr(M=1.0, a=0.0)
    ms = Schwarzschild(M=1.0)
    state = jnp.asarray(
        [[0.0, 30.0, np.pi / 2, 0.3, -1.0, -0.7, 0.2, 4.0],
         [0.0, 5.0, 1.1, 1.0, -1.0, 0.4, -1.3, 2.0]], jnp.float64)
    dk = np.asarray(mk.geodesic_equations(0.0, state))
    ds = np.asarray(ms.geodesic_equations(0.0, state))
    np.testing.assert_allclose(dk, ds, rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_mass_scale_invariance():
    """GR scale invariance: scaling (M, r_obs) together leaves all
    angular results unchanged — validates M enters every formula only
    through dimensionless ratios."""
    from light_path_tracer_tpu.ops import trace_rays_kerr
    alphas = jnp.asarray([0.05, 0.09, 0.13], jnp.float64)
    thetas = jnp.asarray([0.4, -1.0, 2.2], jnp.float64)
    r1 = trace_rays_kerr(Kerr(M=1.0, a=0.9), 100.0, alphas, thetas,
                         np.pi / 2, jnp.zeros(3, bool), 5000.0, 200000)
    r2 = trace_rays_kerr(Kerr(M=2.0, a=1.8), 200.0, alphas, thetas,
                         np.pi / 2, jnp.zeros(3, bool), 10000.0, 200000)
    np.testing.assert_array_equal(np.asarray(r1.status),
                                  np.asarray(r2.status))
    esc = np.asarray(r1.status) == 1
    # Invariance holds to integrator tolerance, not exactly: the
    # controller's absolute atol is not scale-free, so the accepted step
    # sequences differ between the two scalings.
    np.testing.assert_allclose(np.asarray(r1.final_alpha)[esc],
                               np.asarray(r2.final_alpha)[esc], rtol=1e-4)
    # Host-side scalar geometry scales identically.
    assert np.isclose(Kerr(M=1.0, a=0.9).alpha_crit(100.0),
                      Kerr(M=2.0, a=1.8).alpha_crit(200.0))


def test_kerr_rhs_mu_matches_theta_by_chain_rule():
    """The rational mu-form RHS is the exact canonical transform of the
    theta-form: dmu = -sin(th) dth and
    dp_mu = -dp_th/sin + p_th cos/sin^2 dth."""
    k = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(0)
    n = 512
    r = jnp.asarray(rng.uniform(2.2, 150.0, n))
    th = jnp.asarray(rng.uniform(0.05, np.pi - 0.05, n))
    phi = jnp.asarray(rng.uniform(-10, 10, n))
    p_r = jnp.asarray(rng.normal(0, 1, n))
    p_th = jnp.asarray(rng.normal(0, 5, n))
    p_t = jnp.full((n,), -1.0)
    p_phi = jnp.asarray(rng.normal(0, 5, n))

    y_th = (r, th, phi, p_r, p_th)
    d_th = k.rhs5(y_th, p_t, p_phi)
    y_mu = k.state_to_mu(y_th)
    d_mu = k.rhs5_mu(y_mu, p_t, p_phi)

    sin, cos = np.sin(np.asarray(th)), np.cos(np.asarray(th))
    np.testing.assert_allclose(d_mu[0], d_th[0], rtol=1e-11)
    np.testing.assert_allclose(d_mu[2], d_th[2], rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(d_mu[3], d_th[3], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(d_mu[1]), -sin * np.asarray(d_th[1]), rtol=1e-11,
        atol=1e-14)
    exp_dpmu = (-np.asarray(d_th[4]) / sin
                + np.asarray(p_th) * cos / sin**2 * np.asarray(d_th[1]))
    np.testing.assert_allclose(np.asarray(d_mu[4]), exp_dpmu, rtol=1e-9,
                               atol=1e-10)

    # Round-trip state conversion is the identity.
    back = k.state_from_mu(y_mu)
    for ours, orig in zip(back, y_th):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(orig),
                                   rtol=1e-12, atol=1e-12)
