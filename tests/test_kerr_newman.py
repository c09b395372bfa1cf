"""Kerr-Newman (charged + rotating) tests — the fourth metric family.

The decisive oracle: KerrNewman.rhs5 comes from jax.grad of the
Hamiltonian, while Kerr.rhs5 is the hand-derived, chain-rule-verified
parity form — at Q = 0 the two must agree to roundoff on random
states, which validates the autodiff construction end to end. At
a = 0, traced escape angles must match the INDEPENDENT
Reissner-Nordstrom orbit-equation path (different state space,
different integrator)."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import (
    Kerr, KerrNewman, ReissnerNordstrom, make_metric)
from light_path_tracer_tpu.ops.batch import trace_batch


def test_rhs_autodiff_matches_kerr_hand_form_at_q0():
    kn = KerrNewman(M=1.0, a=0.9, Q=0.0)
    k = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(5)
    n = 256
    state = (jnp.asarray(rng.uniform(2.5, 80.0, n)),
             jnp.asarray(rng.uniform(0.2, np.pi - 0.2, n)),
             jnp.asarray(rng.uniform(-np.pi, np.pi, n)),
             jnp.asarray(rng.uniform(-1.0, 1.0, n)),
             jnp.asarray(rng.uniform(-6.0, 6.0, n)))
    p_t = jnp.full((n,), -1.0)
    p_phi = jnp.asarray(rng.uniform(-6.0, 6.0, n))
    out_kn = kn.rhs5(state, p_t, p_phi)
    out_k = k.rhs5(state, p_t, p_phi)
    for d_kn, d_k in zip(out_kn, out_k):
        np.testing.assert_allclose(np.asarray(d_kn), np.asarray(d_k),
                                   rtol=2e-12, atol=1e-12)


def test_closed_forms_and_limits():
    kn = KerrNewman(M=1.0, a=0.6, Q=0.5)
    assert np.isclose(kn.r_plus,
                      1.0 + np.sqrt(1 - 0.36 - 0.25), rtol=1e-12)
    # xi/eta general-Delta form reduces to Kerr's Bardeen expressions.
    k = Kerr(M=1.0, a=0.6)
    kn0 = KerrNewman(M=1.0, a=0.6, Q=0.0)
    for r in np.linspace(2.1, 4.0, 7):
        xi_g, eta_g = kn0._xi_eta(r)
        xi_b, eta_b = k._xi_eta(r)
        assert np.isclose(xi_g, xi_b, rtol=1e-12)
        assert np.isclose(eta_g, eta_b, rtol=1e-10)
    # Photon-orbit band reduces to Bardeen's radii at Q=0.
    np.testing.assert_allclose(kn0.unstable_photon_radii(),
                               k.unstable_photon_radii(), rtol=1e-8)
    with pytest.raises(ValueError, match="naked"):
        KerrNewman(M=1.0, a=0.8, Q=0.7)


def test_charge_shrinks_kerr_shadow():
    crits = [KerrNewman(M=1.0, a=0.6, Q=q).alpha_crit(100.0)
             for q in (0.0, 0.3, 0.6, 0.79)]
    assert all(c1 > c2 for c1, c2 in zip(crits, crits[1:]))
    assert np.isclose(crits[0], Kerr(M=1.0, a=0.6).alpha_crit(100.0),
                      rtol=1e-9)


def test_a_zero_matches_reissner_nordstrom_orbit_path():
    """KN(a=0, Q) 5-D Hamiltonian trace vs RN's reduced orbit-equation
    trace: independent formulations of the same geodesics."""
    kn = KerrNewman(M=1.0, a=0.0, Q=0.8)
    rn = ReissnerNordstrom(M=1.0, Q=0.8)
    assert np.isclose(kn.alpha_crit(100.0), rn.alpha_crit(100.0),
                      rtol=1e-10)
    a_crit = rn.alpha_crit(100.0)
    alphas = jnp.asarray(np.linspace(1.2, 3.0, 9) * a_crit,
                         jnp.float64)
    # Equatorial-plane rays (screen azimuth pi/2): the 5-D path's
    # winding counts BL phi, which only matches the orbit path's
    # in-plane |phi|/pi when the orbit plane IS the phi-plane
    # (reference-parity convention, metrics.py:363-416).
    res_kn = trace_batch(kn, 100.0, alphas,
                         jnp.full_like(alphas, np.pi / 2),
                         backend="xla")
    res_rn = trace_batch(rn, 100.0, alphas)
    ok = (np.asarray(res_kn.status) == 1) & (np.asarray(res_rn.status)
                                             == 1)
    assert ok.sum() >= 7
    d = np.abs(np.asarray(res_kn.final_alpha)[ok]
               - np.asarray(res_rn.final_alpha)[ok])
    # Two different integrators (adaptive 5-D DP45 vs fixed-step 2-D
    # orbit RK4) at their default tolerances.
    assert np.median(d) < 2e-4, d
    # Winding counts agree too.
    assert (np.asarray(res_kn.n_half_orbits)[ok]
            == np.asarray(res_rn.n_half_orbits)[ok]).all()


def test_kn_trace_q0_matches_kerr():
    """Q = 0 KN traces match Kerr's XLA path closely (same dynamics,
    autodiff vs hand RHS — bitwise-identical derivatives up to op
    order)."""
    kn = KerrNewman(M=1.0, a=0.9, Q=0.0)
    k = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(11)
    n = 64
    alphas = jnp.asarray(rng.uniform(0.02, 0.1, n), jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    r_kn = trace_batch(kn, 100.0, alphas, thetas, backend="xla")
    r_k = trace_batch(k, 100.0, alphas, thetas, backend="xla")
    same = np.asarray(r_kn.status) == np.asarray(r_k.status)
    assert same.mean() > 0.98
    esc = same & (np.asarray(r_k.status) == 1)
    d = np.abs(np.asarray(r_kn.final_alpha)[esc]
               - np.asarray(r_k.final_alpha)[esc])
    assert np.median(d) < 1e-8


def test_kn_pallas_request_rejected_cleanly():
    kn = KerrNewman(M=1.0, a=0.5, Q=0.5)
    alphas = jnp.asarray([0.05], jnp.float32)
    with pytest.raises(ValueError, match="Pallas"):
        trace_batch(kn, 100.0, alphas, jnp.asarray([0.3], jnp.float32),
                    backend="pallas")


def test_kn_shadow_end_to_end():
    """make_metric dispatch + pipeline shadow: the KN shadow sits
    between the same-spin Kerr (larger) and nothing."""
    from light_path_tracer_tpu.pipeline import render_shadow
    from light_path_tracer_tpu.utils.config import (SceneConfig,
                                                    RenderConfig)
    cfg = RenderConfig(dtype="float64", backend="xla")
    img_k, _ = render_shadow(SceneConfig(M=1.0, a=0.6), (40, 40), cfg)
    img_kn, _ = render_shadow(SceneConfig(M=1.0, a=0.6, Q=0.7),
                              (40, 40), cfg)
    dark_k = int((np.asarray(img_k) < 0.5).sum())
    dark_kn = int((np.asarray(img_kn) < 0.5).sum())
    assert 0 < dark_kn < dark_k
