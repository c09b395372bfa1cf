"""Pallas fused-kernel tests (interpret mode on CPU; real Mosaic on TPU).

The kernel and the XLA path share the same dp45_integrate body, so
interpret-mode equivalence checks the tiling/masking/padding plumbing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models import Kerr
from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr
from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
    trace_rays_kerr_pallas)

R_OBS = 100.0


def _compare(n, tile_rows, seed=0, spin=0.9):
    m = Kerr(M=1.0, a=spin)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(seed)
    alphas = jnp.asarray(rng.uniform(0.3 * ac, 4 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    refine = jnp.asarray(rng.random(n) < 0.2)

    rp = trace_rays_kerr_pallas(
        m, R_OBS, alphas, thetas, np.pi / 2, refine, 5000.0, 5000,
        tile_rows=tile_rows, interpret=True)
    rx = trace_rays_kerr(
        m, R_OBS, alphas, thetas, np.pi / 2, refine, 5000.0, 5000)

    sp, sx = np.asarray(rp.status), np.asarray(rx.status)
    fp, fx = np.asarray(rp.final_alpha), np.asarray(rx.final_alpha)
    # Outcomes must agree everywhere except (rarely) right at the critical
    # angle, where iteration-count differences can flip a grazer.
    assert (sp == sx).mean() > 0.99
    both = (sp == 1) & (sx == 1)
    alb = np.asarray(alphas)
    stable = both & (np.abs(alb - ac) > 0.05 * ac)
    d = np.abs(fp[stable] - fx[stable])
    # Identical numerics modulo different iteration geometry; grazers
    # amplify roundoff, so compare the stable population.
    assert np.percentile(d, 99) < 1e-3


@pytest.mark.slow
def test_pallas_matches_xla_single_tile():
    _compare(n=8 * 128, tile_rows=8)


@pytest.mark.slow
def test_pallas_matches_xla_multi_tile_with_padding():
    # 3000 rays over 2 tiles of 1024 -> padding lanes exercised.
    _compare(n=3000, tile_rows=8, seed=1)


def test_pallas_invalid_and_captured_lanes():
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    alphas = jnp.asarray([0.2 * ac, 2.0 * ac], jnp.float32)
    thetas = jnp.asarray([0.3, 1.0], jnp.float32)
    rp = trace_rays_kerr_pallas(
        m, R_OBS, alphas, thetas, np.pi / 2, jnp.zeros(2, bool),
        5000.0, 5000, tile_rows=8, interpret=True)
    assert int(rp.status[0]) == -1      # deep-shadow ray captured
    assert int(rp.status[1]) == 1       # escapes
    assert np.isnan(float(rp.final_alpha[0]))
    assert np.isfinite(float(rp.final_alpha[1]))


def test_pallas_rejects_f64():
    m = Kerr(M=1.0, a=0.9)
    with pytest.raises(ValueError):
        trace_rays_kerr_pallas(
            m, R_OBS, jnp.zeros(4, jnp.float64), jnp.zeros(4, jnp.float64),
            np.pi / 2, jnp.zeros(4, bool), 5000.0, 100, interpret=True)


def test_schwarzschild_pallas_matches_xla():
    from light_path_tracer_tpu.models import Schwarzschild
    from light_path_tracer_tpu.ops import trace_rays_schwarzschild
    from light_path_tracer_tpu.ops.pallas.schwarzschild_kernel import (
        trace_rays_schwarzschild_pallas)

    m = Schwarzschild(M=1.0)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(6)
    alphas = jnp.asarray(
        np.concatenate([rng.uniform(0.2 * ac, 4 * ac, 900), [0.0]]),
        jnp.float32)
    rp = trace_rays_schwarzschild_pallas(
        m, R_OBS, alphas, tile_rows=8, interpret=True)
    rx = trace_rays_schwarzschild(m, R_OBS, alphas)
    np.testing.assert_array_equal(np.asarray(rp.status),
                                  np.asarray(rx.status))
    both = np.asarray(rp.status) == 1
    np.testing.assert_allclose(np.asarray(rp.final_alpha)[both],
                               np.asarray(rx.final_alpha)[both],
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rp.n_half_orbits)[both],
                                  np.asarray(rx.n_half_orbits)[both])
    assert int(rp.status[-1]) == 0   # alpha = 0 invalid lane


@pytest.mark.slow
def test_two_pass_matches_single_pass():
    """Capped pass + straggler retrace == full single pass."""
    from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
        trace_rays_kerr_two_pass)

    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(31)
    n = 2048
    # Include deliberate grazers that exceed the pass-1 cap.
    alphas = np.concatenate([
        rng.uniform(0.3 * ac, 4 * ac, n - 8),
        ac * (1 + np.linspace(-2e-6, 2e-6, 8))])
    thetas = rng.uniform(-np.pi, np.pi, n)
    al = jnp.asarray(alphas, jnp.float32)
    th = jnp.asarray(thetas, jnp.float32)
    refine = jnp.zeros(n, bool)

    full = trace_rays_kerr(m, R_OBS, al, th, np.pi / 2, refine,
                           5000.0, 100000)
    two = trace_rays_kerr_two_pass(
        m, R_OBS, al, th, np.pi / 2, refine, 5000.0, 100000,
        pass1_steps=64, slots=256, tile_rows=8, interpret=True)

    s_f, s_t = np.asarray(full.status), np.asarray(two.status)
    assert (s_f == s_t).mean() > 0.995
    both = (s_f == 1) & (s_t == 1)
    stable = both & (np.abs(alphas - ac) > 0.05 * ac)
    d = np.abs(np.asarray(full.final_alpha)[stable]
               - np.asarray(two.final_alpha)[stable])
    assert np.percentile(d, 99) < 1e-3


@pytest.mark.slow
def test_pallas_dynamic_r_obs_matches_static():
    """dynamic_params=(M, a, r_obs): the traced observer radius (flyby
    SMEM path) reproduces the static-folded kernel — escape radius,
    h_init, plunge radii, and extraction all track the traced value."""
    m = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(3)
    n = 256
    alphas = jnp.asarray(rng.uniform(0.05, 0.3, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    refine = jnp.zeros(n, bool)

    r_static = trace_rays_kerr_pallas(
        m, 80.0, alphas, thetas, np.pi / 2, refine, 5000.0, 20000,
        interpret=True)
    # Placeholder metric/radius differ on purpose: only the traced
    # values may matter.
    r_dyn = trace_rays_kerr_pallas(
        Kerr(M=1.0, a=0.0), 999.0, alphas, thetas, np.pi / 2, refine,
        5000.0, 20000, interpret=True,
        dynamic_params=(jnp.float32(1.0), jnp.float32(0.9),
                        jnp.float32(80.0)))
    assert np.array_equal(np.asarray(r_static.status),
                          np.asarray(r_dyn.status))
    fs, fd = (np.asarray(r_static.final_alpha),
              np.asarray(r_dyn.final_alpha))
    esc = np.asarray(r_static.status) == 1
    # SMEM scalars vs constant-folded: identical math, but XLA cannot
    # fold r_obs-derived constants -> tiny f32 ordering differences
    # compound over the ~1e2-step integrations.
    d = np.abs(fs[esc] - fd[esc])
    assert np.percentile(d, 99) < 1e-4 and d.max() < 1e-3


@pytest.mark.slow
def test_pallas_dop853_matches_xla():
    """The opt-in dop853 integrator through the Pallas tile kernel
    (interpret mode) agrees with the XLA path — the shared
    dp45_integrate body's method='dop853' branch lowers in the kernel
    context too (stage loop, combined 5th/3rd error estimator)."""
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(5)
    n = 256
    alphas = jnp.asarray(rng.uniform(0.3 * ac, 4 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    refine = jnp.zeros(n, bool)

    rp = trace_rays_kerr_pallas(
        m, R_OBS, alphas, thetas, np.pi / 2, refine, 5000.0, 20000,
        interpret=True, method="dop853")
    rx = trace_rays_kerr(
        m, R_OBS, alphas, thetas, np.pi / 2, refine, 5000.0, 20000,
        method="dop853")
    sp, sx = np.asarray(rp.status), np.asarray(rx.status)
    assert (sp == sx).mean() > 0.99
    assert int(rp.n_steps) > 0
    both = (sp == 1) & (sx == 1)
    alb = np.asarray(alphas)
    stable = both & (np.abs(alb - ac) > 0.05 * ac)
    d = np.abs(np.asarray(rp.final_alpha)[stable]
               - np.asarray(rx.final_alpha)[stable])
    assert np.percentile(d, 99) < 1e-3


@pytest.mark.slow
def test_pallas_mu_formulation_matches_theta():
    """The opt-in transcendental-free mu formulation through the Pallas
    kernel (the hybrid tracer's pass-1 configuration): same geodesics
    as the theta form away from the polar axis."""
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(7)
    n = 256
    alphas = jnp.asarray(rng.uniform(0.3 * ac, 4 * ac, n), jnp.float32)
    # Azimuths away from the screen column over the pole (|cos| ~ 1
    # -> |L| large enough that no ray approaches the axis).
    thetas = jnp.asarray(
        rng.uniform(0.35 * np.pi, 0.65 * np.pi, n)
        * np.where(rng.random(n) < 0.5, 1.0, -1.0), jnp.float32)
    risk = np.asarray(m.pole_risk(R_OBS, alphas, thetas, np.pi / 2,
                                  1e-3))
    assert not risk.any()    # the sample avoids the mu-form's bad set
    refine = jnp.zeros(n, bool)

    r_mu = trace_rays_kerr_pallas(
        m, R_OBS, alphas, thetas, np.pi / 2, refine, 5000.0, 20000,
        interpret=True, formulation="mu")
    r_th = trace_rays_kerr_pallas(
        m, R_OBS, alphas, thetas, np.pi / 2, refine, 5000.0, 20000,
        interpret=True, formulation="theta")
    s_mu, s_th = np.asarray(r_mu.status), np.asarray(r_th.status)
    assert (s_mu == s_th).mean() > 0.99
    both = (s_mu == 1) & (s_th == 1)
    alb = np.asarray(alphas)
    stable = both & (np.abs(alb - ac) > 0.05 * ac)
    d = np.abs(np.asarray(r_mu.final_alpha)[stable]
               - np.asarray(r_th.final_alpha)[stable])
    assert np.percentile(d, 99) < 1e-3


@pytest.mark.slow
def test_volumetric_pallas_matches_xla():
    """The volumetric tile kernel (ops/pallas/volumetric_kernel.py)
    carries the error-controlled emission component through the same
    dp45_integrate body as the XLA path: interpret-mode results must
    agree to backend arithmetic, thin AND self-absorbed."""
    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_volumetric
    from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
        trace_rays_volumetric_pallas)
    from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                  make_transfer_fns)

    m = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(3)
    n = 300   # > one (2, 128) tile -> padding lanes exercised
    ac = m.alpha_crit(R_OBS)
    alphas = jnp.asarray(rng.uniform(0.3 * ac, 4 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)

    for riaf in (RIAFConfig(),                      # thin torus
                 RIAFConfig(alpha0=0.5)):           # self-absorbed
        em_fn, ab_fn = make_transfer_fns(m, riaf)
        rp = trace_rays_volumetric_pallas(
            m, R_OBS, alphas, thetas, np.pi / 2, em_fn, 5000.0, 4000,
            absorption_fn=ab_fn, tile_rows=2, interpret=True)
        rx = trace_rays_volumetric(
            m, R_OBS, alphas, thetas, np.pi / 2, em_fn, 5000.0, 4000,
            absorption_fn=ab_fn)
        sp, sx = np.asarray(rp.status), np.asarray(rx.status)
        assert (sp == sx).mean() > 0.99
        ep, ex = np.asarray(rp.emission), np.asarray(rx.emission)
        ok = sp == sx
        scale = max(float(np.abs(ex).max()), 1e-12)
        assert np.percentile(np.abs(ep[ok] - ex[ok]) / scale, 99) < 1e-4
        tp, tx = (np.asarray(rp.optical_depth),
                  np.asarray(rx.optical_depth))
        assert np.percentile(np.abs(tp[ok] - tx[ok]), 99) < 1e-3


@pytest.mark.slow
def test_volumetric_two_pass_matches_single_pass():
    """Straggler containment on the volumetric kernel: the capped pass
    + full-budget re-trace of unconverged lanes reproduces the
    single-pass result exactly (the re-trace restarts the path
    integral from lambda=0, so the merge is exact)."""
    from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
        trace_rays_volumetric_pallas, trace_rays_volumetric_two_pass)
    from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                  make_transfer_fns)

    m = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(9)
    n = 300
    ac = m.alpha_crit(R_OBS)
    # cluster near the critical angle so pass 1's cap actually bites
    alphas = jnp.asarray(rng.uniform(0.9 * ac, 1.1 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    em_fn, ab_fn = make_transfer_fns(m, RIAFConfig(alpha0=0.4))

    r1 = trace_rays_volumetric_pallas(
        m, R_OBS, alphas, thetas, np.radians(80.0), em_fn, 5000.0,
        8000, absorption_fn=ab_fn, tile_rows=2, interpret=True)
    r2 = trace_rays_volumetric_two_pass(
        m, R_OBS, alphas, thetas, np.radians(80.0), em_fn, 5000.0,
        8000, absorption_fn=ab_fn, pass1_steps=256, slots=128,
        tile_rows=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.status),
                                  np.asarray(r2.status))
    np.testing.assert_array_equal(np.asarray(r1.emission),
                                  np.asarray(r2.emission))
    np.testing.assert_array_equal(np.asarray(r1.optical_depth),
                                  np.asarray(r2.optical_depth))


@pytest.mark.slow
def test_spectral_pallas_matches_xla():
    """Generic coupled-extras tile kernel, spectral form: (tau_hat,
    I_1..I_n) bands from the VMEM kernel match the XLA path."""
    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_spectral
    from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
        trace_rays_spectral_pallas)
    from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                  make_spectral_transfer)

    m = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(11)
    n = 300
    ac = m.alpha_crit(R_OBS)
    alphas = jnp.asarray(rng.uniform(0.3 * ac, 4 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    riaf = RIAFConfig(g_power=4.0, alpha0=1.0, opacity_index=2.0)
    freqs = (0.5, 2.0)
    tf = make_spectral_transfer(m, riaf, freqs)

    rp = trace_rays_spectral_pallas(
        m, R_OBS, alphas, thetas, np.radians(80.0), tf, len(freqs),
        5000.0, 4000, tile_rows=2, interpret=True)
    rx = trace_rays_spectral(
        m, R_OBS, alphas, thetas, np.radians(80.0), tf, len(freqs),
        5000.0, 4000)
    sp, sx = np.asarray(rp.status), np.asarray(rx.status)
    assert (sp == sx).mean() > 0.99
    ok = sp == sx
    for bp, bx in zip(rp.emission, rx.emission):
        bp, bx = np.asarray(bp), np.asarray(bx)
        scale = max(float(np.abs(bx).max()), 1e-12)
        assert np.percentile(np.abs(bp[ok] - bx[ok]) / scale, 99) < 1e-4
    tp, tx = np.asarray(rp.tau_hat), np.asarray(rx.tau_hat)
    assert np.percentile(np.abs(tp[ok] - tx[ok]), 99) < 1e-3


@pytest.mark.slow
def test_aux_pallas_matches_xla_polarized():
    """Generic coupled-extras tile kernel with per-ray aux constants:
    the polarized-volumetric Stokes transport (4 Walker-Penrose aux
    tiles, 3 extras) matches the XLA trace_rays_aux."""
    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_aux
    from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
        trace_rays_aux_pallas)
    from light_path_tracer_tpu.polarization import (
        k_contravariant, make_polarized_volumetric_transfer,
        observer_basis, walker_penrose)
    from light_path_tracer_tpu.volumetric import RIAFConfig

    m = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(12)
    n = 300
    ac = m.alpha_crit(R_OBS)
    alphas = jnp.asarray(rng.uniform(0.3 * ac, 4 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    tf = make_polarized_volumetric_transfer(m, RIAFConfig(), "toroidal",
                                        0.7)

    y0, _p_t, p_phi, _inv = m.initial_conditions_5d(
        R_OBS, alphas, thetas, np.radians(80.0))
    Mj = jnp.asarray(1.0, jnp.float32)
    aj = jnp.asarray(0.9, jnp.float32)
    k_cam = k_contravariant(Mj, aj, y0[0], y0[1], y0[3], y0[4], p_phi)
    e1, e2 = observer_basis(Mj, aj, R_OBS, np.radians(80.0), k_cam)
    k11, k21 = walker_penrose(aj, y0[0], y0[1], k_cam, e1)
    k12, k22 = walker_penrose(aj, y0[0], y0[1], k_cam, e2)
    aux = (k11, k21, k12, k22)

    rp = trace_rays_aux_pallas(
        m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
        5000.0, 4000, tile_rows=2, interpret=True)
    rx = trace_rays_aux(
        m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
        5000.0, 4000)
    sp, sx = np.asarray(rp.status), np.asarray(rx.status)
    assert (sp == sx).mean() > 0.99
    ok = sp == sx
    for ep, ex in zip(rp.extras, rx.extras):
        ep, ex = np.asarray(ep), np.asarray(ex)
        scale = max(float(np.abs(ex).max()), 1e-12)
        assert np.percentile(np.abs(ep[ok] - ex[ok]) / scale, 99) < 1e-4


@pytest.mark.slow
def test_aux_two_pass_matches_single_pass():
    """Coupled-extras straggler containment: capped pass + full-budget
    re-trace (with the aux tiles gathered alongside) reproduces the
    single-pass result exactly."""
    from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
        trace_rays_aux_pallas, trace_rays_aux_two_pass)
    from light_path_tracer_tpu.polarization import (
        k_contravariant, make_polarized_volumetric_transfer,
        observer_basis, walker_penrose)
    from light_path_tracer_tpu.volumetric import RIAFConfig

    m = Kerr(M=1.0, a=0.9)
    rng = np.random.default_rng(14)
    n = 300
    ac = m.alpha_crit(R_OBS)
    alphas = jnp.asarray(rng.uniform(0.9 * ac, 1.1 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    tf = make_polarized_volumetric_transfer(m, RIAFConfig(), "toroidal",
                                            0.7)
    y0, _p_t, p_phi, _inv = m.initial_conditions_5d(
        R_OBS, alphas, thetas, np.radians(80.0))
    Mj = jnp.asarray(1.0, jnp.float32)
    aj = jnp.asarray(0.9, jnp.float32)
    k_cam = k_contravariant(Mj, aj, y0[0], y0[1], y0[3], y0[4], p_phi)
    e1, e2 = observer_basis(Mj, aj, R_OBS, np.radians(80.0), k_cam)
    k11, k21 = walker_penrose(aj, y0[0], y0[1], k_cam, e1)
    k12, k22 = walker_penrose(aj, y0[0], y0[1], k_cam, e2)
    aux = (k11, k21, k12, k22)

    r1 = trace_rays_aux_pallas(
        m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
        5000.0, 8000, tile_rows=2, interpret=True)
    r2 = trace_rays_aux_two_pass(
        m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
        5000.0, 8000, pass1_steps=256, slots=128, tile_rows=2,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.status),
                                  np.asarray(r2.status))
    for e1_, e2_ in zip(r1.extras, r2.extras):
        np.testing.assert_array_equal(np.asarray(e1_), np.asarray(e2_))
