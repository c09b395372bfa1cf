"""Timelike (massive-particle) orbits: physics oracles.

Beyond-reference capability (the reference traces photons only), but the
integrator under test is the SAME 8-D Hamiltonian DP45 recorder the photon
trajectory path uses (parity surface /root/reference/geodesic_tracer.py:57-67)
— the Hamiltonian flow is mass-independent, so every oracle here also
exercises the photon engine at timelike momenta.

Oracles (all closed-form, independent of the implementation):
  * Schwarzschild circular orbits: E = (1-2M/r)/sqrt(1-3M/r),
    L = sqrt(M r)/sqrt(1-3M/r), Omega = sqrt(M/r^3).
  * Kerr ISCO (Bardeen-Press-Teukolsky 1972): circular-orbit energy is
    minimized at r_isco; a=0 gives 6M with E = sqrt(8/9).
  * Weak-field periapsis advance 6 pi M / p, reduced (prograde) /
    increased (retrograde) by frame dragging 8 pi a sqrt(M) / p^1.5.
  * Lense-Thirring nodal precession 4 pi a sqrt(M) / r^1.5 for a
    slightly inclined near-circular orbit.
  * H = (1/2) g^{mu nu} p_mu p_nu conserved at -mu^2/2 along the flow.
  * Kerr(a=0) orbits coincide with Schwarzschild orbits.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import Kerr, Schwarzschild
from light_path_tracer_tpu import particles as pt


M = 1.0


# ---------------------------------------------------------------------------
# Circular-orbit integrals (host-side closed forms)
# ---------------------------------------------------------------------------

def test_circular_orbit_schwarzschild_analytic():
    s = Schwarzschild(M)
    for r in (8.0, 10.0, 20.0):
        E, L, omega = pt.circular_orbit(s, r)
        assert E == pytest.approx((1 - 2 * M / r) / np.sqrt(1 - 3 * M / r),
                                  rel=1e-12)
        assert L == pytest.approx(np.sqrt(M * r) / np.sqrt(1 - 3 * M / r),
                                  rel=1e-12)
        assert omega == pytest.approx(np.sqrt(M / r ** 3), rel=1e-12)


def test_circular_orbit_energy_minimum_is_isco():
    # BPT: E(r) along the circular-orbit sequence is minimized at the ISCO.
    s = Schwarzschild(M)
    rr = np.linspace(4.5, 12.0, 2001)
    E = np.array([pt.circular_orbit(s, r)[0] for r in rr])
    r_min = rr[np.argmin(E)]
    assert r_min == pytest.approx(6.0, abs=0.02)
    E6, _, _ = pt.circular_orbit(s, 6.0)
    assert E6 == pytest.approx(np.sqrt(8.0 / 9.0), rel=1e-12)

    # Kerr a=0.9 prograde ISCO (Bardeen formula) = 2.3209 M.
    a = 0.9
    k = Kerr(M, a)
    z1 = 1 + (1 - a * a) ** (1 / 3) * ((1 + a) ** (1 / 3)
                                       + (1 - a) ** (1 / 3))
    z2 = np.sqrt(3 * a * a + z1 * z1)
    r_isco = M * (3 + z2 - np.sqrt((3 - z1) * (3 + z1 + 2 * z2)))
    rr = np.linspace(r_isco - 0.6, r_isco + 2.0, 2001)
    E = np.array([pt.circular_orbit(k, r)[0] for r in rr])
    assert rr[np.argmin(E)] == pytest.approx(r_isco, abs=0.02)


def test_circular_orbit_raises_inside_photon_orbit():
    with pytest.raises(ValueError):
        pt.circular_orbit(Schwarzschild(M), 2.5)  # photon sphere at 3M


def test_orbit_from_apsides_roots_radial_potential():
    k = Kerr(M, 0.7)
    r_p, r_a = 8.0, 14.0
    E, L = pt.orbit_from_apsides(k, r_p, r_a)
    # R(r) = -mu^2 - quad must vanish at both turning points.
    for r in (r_p, r_a):
        g_tt, g_tphi, _, _, g_pp = (
            np.asarray(t, np.float64)
            for t in pt.inverse_metric_at(k, jnp.asarray([r], jnp.float64),
                                          jnp.asarray([np.pi / 2],
                                                      jnp.float64)))
        quad = g_tt * E * E - 2 * g_tphi * E * L + g_pp * L * L
        assert abs(-1.0 - quad[0]) < 1e-10
    # Degenerate apsides = circular orbit.
    E_c, L_c = pt.orbit_from_apsides(k, 10.0, 10.0)
    E_ref, L_ref, _ = pt.circular_orbit(k, 10.0)
    assert (E_c, L_c) == (E_ref, L_ref)


def test_timelike_initial_conditions_forbidden_region_flagged():
    s = Schwarzschild(M)
    E, L = pt.orbit_from_apsides(s, 10.0, 20.0)
    r0 = jnp.asarray([12.0, 25.0, 8.0], jnp.float64)  # in / above / below
    state8, invalid = pt.timelike_initial_conditions(s, r0, E, L)
    assert list(np.asarray(invalid)) == [False, True, True]
    # Normalization holds where valid.
    h = np.asarray(pt.hamiltonian(s, state8))
    assert abs(h[0] + 0.5) < 1e-12


# ---------------------------------------------------------------------------
# Integrated orbits (the shared DP45 recorder at timelike momenta)
# ---------------------------------------------------------------------------

def _orbit(metric, r_p, r_a, n_steps=4000, prograde=True, **ic_kw):
    E, L = pt.orbit_from_apsides(metric, r_p, r_a, prograde=prograde)
    state8, invalid = pt.timelike_initial_conditions(
        metric, jnp.asarray(r_p, jnp.float64), E, L, **ic_kw)
    assert not bool(np.asarray(invalid))
    return pt.integrate_orbit(metric, state8, n_steps=n_steps)


def test_circular_orbit_stays_circular_at_bpt_omega():
    k = Kerr(M, 0.9)
    r = 6.0
    E, L, omega = pt.circular_orbit(k, r)
    state8, _ = pt.timelike_initial_conditions(
        k, jnp.asarray(r, jnp.float64), E, L)
    traj = pt.integrate_orbit(k, state8, n_steps=3000)
    states, _ = pt._valid_path(traj)
    assert states.shape[0] > 100
    # r constant.
    assert np.max(np.abs(states[:, 1] - r)) < 1e-6
    # dphi/dt = Omega along the whole path.
    t, phi = states[:, 0], np.unwrap(states[:, 3])
    assert t[-1] > 2 * (2 * np.pi / omega)  # at least two revolutions
    fit = np.polyfit(t, phi, 1)[0]
    assert fit == pytest.approx(omega, rel=1e-8)


def test_hamiltonian_conserved_along_orbit():
    traj = _orbit(Kerr(M, 0.9), 4.0, 12.0, n_steps=4000)
    states, _ = pt._valid_path(traj)
    h = np.asarray(pt.hamiltonian(Kerr(M, 0.9), jnp.asarray(states)))
    assert np.max(np.abs(h + 0.5)) < 1e-8


def _schwarzschild_exact_advance(r_p, r_a):
    """Exact periapsis advance per orbit via the radial quadrature.

    V(u) = E^2 - (1 - 2Mu)(1 + L^2 u^2) is a cubic with roots
    u1 = 1/r_a, u2 = 1/r_p, u3 = 1/(2M) - u1 - u2;  dphi = L du / sqrt(V).
    The substitution u = (u1+u2)/2 - (u2-u1)/2 cos(psi) removes both
    endpoint singularities, leaving a smooth integrand
    1/sqrt(2M (u3 - u)). Independent of the integrator under test.
    """
    u1, u2 = 1.0 / r_a, 1.0 / r_p
    u3 = 1.0 / (2.0 * M) - u1 - u2
    psi = np.linspace(0.0, np.pi, 200001)
    u = 0.5 * (u1 + u2) - 0.5 * (u2 - u1) * np.cos(psi)
    integrand = 1.0 / np.sqrt(2.0 * M * (u3 - u))
    return 2.0 * np.trapezoid(integrand, psi) - 2.0 * np.pi


def test_periapsis_precession_schwarzschild():
    r_p, r_a = 40.0, 60.0
    traj = _orbit(Schwarzschild(M), r_p, r_a, n_steps=6000)
    adv = pt.periapsis_precession(traj)
    assert len(adv) >= 2
    exact = _schwarzschild_exact_advance(r_p, r_a)
    assert np.mean(adv) == pytest.approx(exact, rel=2e-3)
    # The leading-order 6 pi M / p formula is ~10% low at p=48 (the 2PN
    # (M/p)(18+e^2) term); it bounds from below.
    pred = pt.weak_field_periapsis_advance(M, 0.0, r_p, r_a)
    assert pred < np.mean(adv) < 1.2 * pred
    # Turning points hit the requested apsides.
    _, r_peri, _, _ = pt.apsis_passages(traj, "peri")
    _, r_apo, _, _ = pt.apsis_passages(traj, "apo")
    # Parabolic lambda-refinement of the extrema is sampling-limited (the
    # adaptive stepper strides widest exactly at apoapsis): ~5e-3 on r=60.
    assert np.max(np.abs(r_peri - r_p)) < 1e-2
    assert np.max(np.abs(r_apo - r_a)) < 1e-2


def _kerr_equatorial_exact_advance(a, E, L, r_p, r_a):
    """Exact equatorial Kerr periapsis advance via the radial quadrature.

    r^4 (dr/dtau)^2 = R(r) = (E^2-1) r [r^3 + 2M r^2/(E^2-1)
    + (a^2 - L^2/(E^2-1)) r + 2M (L-aE)^2/(E^2-1)]; the cubic factor has
    roots (r_a, r_p, r3).  dphi/dr = (L - aE + a P / Delta) / sqrt(R),
    P = E (r^2+a^2) - a L.  The cos(psi) substitution cancels the
    sqrt((r-r_p)(r_a-r)) endpoint singularities. Independent oracle.
    """
    c = E * E - 1.0  # < 0 for bound orbits
    roots = np.roots([c, 2.0 * M, a * a * c - L * L,
                      2.0 * M * (L - a * E) ** 2])
    r3 = min((z.real for z in roots if abs(z.imag) < 1e-9
              and not np.isclose(z.real, r_p, atol=1e-6)
              and not np.isclose(z.real, r_a, atol=1e-6)),
             key=lambda z: abs(z))
    psi = np.linspace(0.0, np.pi, 200001)[1:-1]
    r = 0.5 * (r_p + r_a) - 0.5 * (r_a - r_p) * np.cos(psi)
    delta = r * r - 2.0 * M * r + a * a
    p_int = E * (r * r + a * a) - a * L
    num = L - a * E + a * p_int / delta
    den = 0.5 * (r_a - r_p) * np.sqrt((1.0 - E * E) * r * (r - r3))
    dphi = 2.0 * np.trapezoid(num / den, psi) * 0.5 * (r_a - r_p)
    return abs(dphi) - 2.0 * np.pi


def test_frame_dragging_shifts_periapsis_advance():
    r_p, r_a = 40.0, 60.0
    a = 0.9
    adv, exact = {}, {}
    for key, metric, pro in (("schw", Schwarzschild(M), True),
                             ("pro", Kerr(M, a), True),
                             ("retro", Kerr(M, a), False)):
        E, L = pt.orbit_from_apsides(metric, r_p, r_a, prograde=pro)
        traj = _orbit(metric, r_p, r_a, n_steps=6000, prograde=pro)
        adv[key] = float(np.mean(pt.periapsis_precession(traj)))
        a_m = 0.0 if key == "schw" else a
        exact[key] = _kerr_equatorial_exact_advance(a_m, E, L, r_p, r_a)
    # Prograde frame dragging REDUCES the advance; retrograde increases it.
    assert adv["pro"] < adv["schw"] < adv["retro"]
    # Integrated advance matches the exact quadrature in all three cases.
    for key in adv:
        assert adv[key] == pytest.approx(exact[key], rel=2e-3), key
    # And the half-difference is the leading frame-dragging term
    # 8 pi a sqrt(M) / p^1.5 (up to its own ~20% 2PN cross corrections).
    p_lat = 2.0 * r_p * r_a / (r_p + r_a)
    spin_term = 8.0 * np.pi * a * np.sqrt(M) / p_lat ** 1.5
    measured = 0.5 * (adv["retro"] - adv["pro"])
    assert measured == pytest.approx(spin_term, rel=0.3)


def test_kerr_a0_orbit_matches_schwarzschild():
    s, k = Schwarzschild(M), Kerr(M, 0.0)
    E, L = pt.orbit_from_apsides(s, 8.0, 15.0)
    st_s, _ = pt.timelike_initial_conditions(s, 8.0, E, L)
    st_k, _ = pt.timelike_initial_conditions(k, 8.0, E, L)
    np.testing.assert_allclose(np.asarray(st_s), np.asarray(st_k),
                               atol=1e-12)
    ts = pt.integrate_orbit(s, st_s, n_steps=2000)
    tk = pt.integrate_orbit(k, st_k, n_steps=2000)
    ns, nk = int(ts.n_valid), int(tk.n_valid)
    n = min(ns, nk)
    # Compare at common affine parameters (step sequences may differ).
    lam_s = np.asarray(ts.lambdas[:ns])
    lam_k = np.asarray(tk.lambdas[:nk])
    lam_common = np.linspace(0, min(lam_s[-1], lam_k[-1]), 200)
    for col in (1, 2, 3):  # r, theta, phi
        vs = np.interp(lam_common, lam_s, np.asarray(ts.states[:ns, col]))
        vk = np.interp(lam_common, lam_k, np.asarray(tk.states[:nk, col]))
        np.testing.assert_allclose(vs, vk, atol=5e-7)
    assert n > 100


def test_nodal_precession_lense_thirring():
    a, r = 0.9, 20.0
    k = Kerr(M, a)
    E, L, _ = pt.circular_orbit(k, r)
    # Tilt the orbit by inclination i: L_z = L cos i, p_theta = L sin i at
    # the node. The normalization solve then keeps it (near-)spherical.
    inc = 0.15
    state8, invalid = pt.timelike_initial_conditions(
        k, r, E, L * np.cos(inc), p_theta=L * np.sin(inc))
    assert not bool(np.asarray(invalid))
    traj = pt.integrate_orbit(k, state8, n_steps=6000)
    drift, _ = pt.nodal_precession(traj)
    assert len(drift) >= 2
    pred = 4.0 * np.pi * a * np.sqrt(M) / r ** 1.5
    assert np.all(drift > 0)  # prograde node drag
    assert np.mean(drift) == pytest.approx(pred, rel=0.25)


def test_plunge_below_isco_is_captured():
    s = Schwarzschild(M)
    # Inside the ISCO no stable circular orbit exists: take the circular
    # (unstable) integrals at r=4.5 and nudge inward — the orbit must
    # plunge and the recorder must report capture.
    E, L, _ = pt.circular_orbit(s, 4.5)
    state8, _ = pt.timelike_initial_conditions(
        s, 4.4, E, L, outward=False)
    traj = pt.integrate_orbit(s, state8, n_steps=3000)
    assert int(traj.outcome) == -1  # captured
    # While an above-ISCO orbit with the same machinery stays bound.
    traj2 = _orbit(s, 8.0, 15.0, n_steps=2000)
    states, _ = pt._valid_path(traj2)
    assert int(traj2.outcome) != -1
    assert np.all(states[:, 1] > 6.0)
