"""Volumetric (optically-thin) rendering oracles.

Strategy mirrors the other physics modules: closed-form oracles where
they exist (flat-space chord lengths through a uniform shell), physical
orderings where they don't (Doppler beaming asymmetry and its flip
under retrograde flow, face-on symmetry), and exact-equality wiring
checks (charged hooks at Q = 0).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from light_path_tracer_tpu.models.kerr import Kerr
from light_path_tracer_tpu.models.kerr_newman import KerrNewman
from light_path_tracer_tpu.ops.kerr_trace import (CAPTURED, ESCAPED,
                                                  trace_rays_volumetric)
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.volumetric import (RIAFConfig, make_emission_fn,
                                              make_transfer_fns,
                                              render_volumetric)


CFG = RenderConfig(backend="xla")


def _shell_trace(metric, b, r_obs=2000.0, **riaf_kw):
    riaf_kw.setdefault("profile", "shell")
    riaf_kw.setdefault("shell_in", 200.0)
    riaf_kw.setdefault("shell_out", 240.0)
    riaf_kw.setdefault("g_power", 0.0)
    riaf = RIAFConfig(**riaf_kw)
    em_fn, ab_fn = make_transfer_fns(metric, riaf)
    alphas = jnp.asarray(np.arcsin(np.asarray(b) / r_obs), jnp.float64)
    thetas = jnp.zeros_like(alphas)
    return trace_rays_volumetric(metric, r_obs, alphas, thetas,
                                 np.pi / 2, em_fn, 12000.0, 200000,
                                 absorption_fn=ab_fn)


def test_shell_chord_lengths_flat_limit():
    """Weak-field shell far from the hole: the path integral of unit
    emissivity is the geometric chord length through the shell, to the
    O(M/r) gravitational corrections (~2% at r ~ 200M)."""
    b = np.array([30.0, 60.0, 100.0, 150.0, 210.0])
    res = _shell_trace(Kerr(1.0, 0.0), b)

    def chord(bi, R):
        return 2.0 * np.sqrt(max(R * R - bi * bi, 0.0))

    expect = np.array([chord(x, 240.0) - chord(x, 200.0) for x in b])
    em = np.asarray(res.emission)
    assert (np.asarray(res.status) == ESCAPED).all()
    np.testing.assert_allclose(em, expect, rtol=0.02)


def test_shell_miss_ray_zero_and_captured_half_chord():
    """b outside the shell: ~zero emission. b = 0 (radial plunge): the
    ray crosses the shell ONCE on the way in and is captured, so it
    collects exactly HALF the through-chord — the capture event
    shortens the integral to the event point."""
    b = np.array([0.0, 245.0])
    res = _shell_trace(Kerr(1.0, 0.0), b)
    em = np.asarray(res.emission)
    status = np.asarray(res.status)
    assert status[0] == CAPTURED and status[1] == ESCAPED
    np.testing.assert_allclose(em[0], 0.5 * (2 * 240.0 - 2 * 200.0),
                               rtol=0.01)
    assert em[1] < 1e-3


def test_absorbed_shell_formal_solution():
    """Self-absorbed uniform shell in the flat limit: with gray opacity
    alpha = alpha0 * j the formal solution per ray is

        I = S (1 - exp(-alpha0 L)),   S = 1/alpha0

    with L the total in-shell chord length (the vacuum gap between the
    near- and far-side shell segments neither emits nor absorbs, so
    the two-segment solution telescopes to the single-L form)."""
    b = np.array([30.0, 100.0, 210.0])
    alpha0 = 0.05
    res = _shell_trace(Kerr(1.0, 0.0), b, alpha0=alpha0)

    def chord(bi, R):
        return 2.0 * np.sqrt(max(R * R - bi * bi, 0.0))

    L = np.array([chord(x, 240.0) - chord(x, 200.0) for x in b])
    expect = (1.0 - np.exp(-alpha0 * L)) / alpha0
    em = np.asarray(res.emission)
    tau = np.asarray(res.optical_depth)
    assert (np.asarray(res.status) == ESCAPED).all()
    np.testing.assert_allclose(em, expect, rtol=0.02)
    # The recorded total optical depth is alpha0 * L to the same O(M/r)
    # gravitational corrections.
    np.testing.assert_allclose(tau, alpha0 * L, rtol=0.02)


def test_absorption_saturates_to_source_function():
    """tau >> 1: the observed intensity converges to the (uniform)
    source function S = 1/alpha0 regardless of path length — the
    optically-thick limit."""
    b = np.array([30.0, 100.0])
    alpha0 = 1.0                 # tau ~ 80 and ~60 on these chords
    res = _shell_trace(Kerr(1.0, 0.0), b, alpha0=alpha0)
    em = np.asarray(res.emission)
    np.testing.assert_allclose(em * alpha0, 1.0, rtol=0.02)
    assert (np.asarray(res.optical_depth) > 20.0).all()


@pytest.mark.slow
def test_absorption_dims_pointwise_and_thin_mode_tau_is_zero():
    """Same emissivity, absorption on: every pixel dims (exp(-tau) <= 1
    inside the integral), and the thin mode reports zero optical
    depth."""
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0))
    img_thin, st_thin = render_volumetric(
        scene, (24, 24), CFG, RIAFConfig())
    img_abs, st_abs = render_volumetric(
        scene, (24, 24), CFG, RIAFConfig(alpha0=0.2))
    em_thin = st_thin["emission"]
    em_abs = st_abs["emission"]
    # Pointwise dimming holds exactly in exact arithmetic; numerically
    # the two traces take different adaptive step sequences, so allow
    # integrator-tolerance slack relative to the image peak.
    assert np.all(em_abs <= em_thin + 1e-3 * em_thin.max())
    # The torus sightlines are genuinely absorbed, not negligibly so.
    assert em_abs.sum() < 0.9 * em_thin.sum()
    assert st_abs["tau_max"] > 1.0
    assert st_thin["tau_max"] == 0.0
    assert np.all(st_thin["optical_depth"] == 0.0)


def test_spectral_single_band_reduces_to_absorbed_trace():
    """trace_rays_spectral at one fiducial band (f = 1, gray q = 0) is
    the single-band absorption path: same emission, same optical
    depth, same step count."""
    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_spectral
    from light_path_tracer_tpu.volumetric import make_spectral_transfer

    m = Kerr(1.0, 0.0)
    riaf = RIAFConfig(profile="shell", shell_in=200.0, shell_out=240.0,
                      g_power=0.0, alpha0=0.05)
    em_fn, ab_fn = make_transfer_fns(m, riaf)
    tf = make_spectral_transfer(m, riaf, (1.0,))
    b = np.array([30.0, 100.0, 210.0])
    alphas = jnp.asarray(np.arcsin(b / 2000.0), jnp.float64)
    th = jnp.zeros_like(alphas)
    r1 = trace_rays_volumetric(m, 2000.0, alphas, th, np.pi / 2, em_fn,
                               12000.0, 200000, absorption_fn=ab_fn)
    r2 = trace_rays_spectral(m, 2000.0, alphas, th, np.pi / 2, tf, 1,
                             12000.0, 200000)
    np.testing.assert_allclose(np.asarray(r2.emission[0]),
                               np.asarray(r1.emission), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r2.tau_hat),
                               np.asarray(r1.optical_depth), rtol=1e-12)
    assert int(r2.n_steps) == int(r1.n_steps)


@pytest.mark.slow
def test_spectral_thin_bands_exactly_proportional():
    """alpha0 = 0: every band integrates the same weight up to the
    analytic f^-s factor (s = g_power - 3), so the band images are
    exactly proportional — the separable thin limit."""
    from light_path_tracer_tpu.volumetric import (
        render_volumetric_spectrum)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0))
    riaf = RIAFConfig(g_power=4.0, alpha0=0.0)      # s = 1
    freqs = (0.5, 1.0, 2.0)
    _imgs, st = render_volumetric_spectrum(scene, (16, 16), freqs,
                                           CFG, riaf)
    em = st["emission"]
    # Power-of-two band factors scale each f32 step exactly, so the
    # proportionality is bitwise except on DENORMAL pixels (~1e-35,
    # where rounding breaks exponent-shift exactness) — hence the
    # peak-relative atol.
    tiny = 1e-12 * em[1].max()
    np.testing.assert_allclose(em[0], 2.0 * em[1], rtol=1e-6, atol=tiny)
    np.testing.assert_allclose(em[2], 0.5 * em[1], rtol=1e-6, atol=tiny)


@pytest.mark.slow
def test_ssa_turnover_and_frequency_dependent_photosphere():
    """Synchrotron-self-absorption phenomenology: with opacity_index
    q > s the SED rises on the optically thick side and falls on the
    thin side, and the emission-weighted image radius GROWS toward
    lower frequency (the photosphere moves out where opacity is
    higher)."""
    from light_path_tracer_tpu.volumetric import (
        render_volumetric_spectrum)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0),
                        vertical_fov_deg=16.0)
    riaf = RIAFConfig(g_power=4.0, alpha0=1.0, opacity_index=3.0)
    freqs = (0.1, 1.0, 10.0)
    _imgs, st = render_volumetric_spectrum(scene, (32, 32), freqs,
                                           RenderConfig(backend="xla"),
                                           riaf)
    flux = st["flux"]
    assert flux[1] > 2.0 * flux[0]        # rising (thick) side
    assert flux[1] > 2.0 * flux[2]        # falling (thin) side
    r = st["mean_radius_rad"]
    assert r[0] > r[1] > r[2]             # photosphere grows at low f
    # Spectral-index maps: flux-weighted mean alpha = -dlnI/dlnnu is
    # NEGATIVE (rising) across the thick pair and POSITIVE (falling)
    # across the thin pair.
    a_thick, a_thin = st["spectral_index"]
    w = st["emission"]
    m_thick = np.nansum(a_thick * w[1]) / np.nansum(
        np.where(np.isfinite(a_thick), w[1], 0.0))
    m_thin = np.nansum(a_thin * w[1]) / np.nansum(
        np.where(np.isfinite(a_thin), w[1], 0.0))
    assert m_thick < -0.2
    assert m_thin > 0.2
    # The exponent floor keeps the controller out of the reject-cycle
    # grind (this exact configuration measured 200k steps without it).
    assert st["integrator_steps"] < 1000
    with pytest.raises(ValueError, match="freqs"):
        render_volumetric_spectrum(scene, (8, 8), (), CFG, riaf)


@pytest.mark.slow
def test_movie_stationary_frames_identical_and_periodic():
    """Flare-movie wiring: with no blob every frame is IDENTICAL (the
    retarded-time machinery must not perturb a stationary emissivity),
    and with a blob the frame at t = one full orbital period matches
    the t = 0 frame (the blob returns to its phase-0 azimuth)."""
    from light_path_tracer_tpu.volumetric import render_volumetric_movie
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0))
    _f, st = render_volumetric_movie(scene, (16, 16), (0.0, 300.0),
                                     CFG, RIAFConfig(spot_amp=0.0))
    np.testing.assert_array_equal(st["emission"][0], st["emission"][1])

    riaf = RIAFConfig(spot_amp=5.0, spot_r=6.0, spot_sigma=1.0)
    _f2, st2 = render_volumetric_movie(scene, (16, 16), (0.0, 1.0),
                                       CFG, riaf)
    period = st2["spot_period"]
    _f3, st3 = render_volumetric_movie(scene, (16, 16),
                                       (0.0, period), CFG, riaf)
    em = st3["emission"]
    np.testing.assert_allclose(em[1], em[0], rtol=1e-4,
                               atol=1e-5 * em[0].max())
    # And the 1-M-later frame genuinely differs (the blob moved).
    assert np.abs(st2["emission"][1]
                  - st2["emission"][0]).max() > 1e-3


@pytest.mark.slow
def test_movie_blob_orbits_and_beams():
    """Physical orderings over one orbit: the light curve is Doppler
    modulated (approaching > receding), and the emission-weighted
    centroid of the blob's excess rotates through the frames."""
    from light_path_tracer_tpu.volumetric import render_volumetric_movie
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0),
                        vertical_fov_deg=16.0)
    riaf = RIAFConfig(spot_amp=8.0, spot_r=6.0, spot_sigma=1.0)
    _f, st0 = render_volumetric_movie(scene, (32, 32), (0.0,), CFG,
                                      RIAFConfig())
    base = st0["emission"][0]
    period = None
    from light_path_tracer_tpu.disk import keplerian_omega
    period = 2 * np.pi / abs(float(keplerian_omega(1.0, 0.9, 6.0,
                                                   True)))
    times = tuple(period * k / 6 for k in range(6))
    _f, st = render_volumetric_movie(scene, (32, 32), times, CFG, riaf)
    lc = st["light_curve"]
    assert (lc.max() - lc.min()) / (lc.max() + lc.min()) > 0.02
    # Centroid column of the blob excess moves across the image.
    cols = []
    for em in st["emission"]:
        ex = np.maximum(em - base, 0.0)
        w = ex.sum()
        assert w > 0
        cols.append((ex.sum(axis=0) * np.arange(32)).sum() / w)
    assert np.ptp(cols) > 3.0      # sweeps a real fraction of the image


@pytest.mark.slow
def test_charged_hooks_reduce_to_kerr_at_zero_charge():
    """The emission function reads the metric through the _two_M_r /
    _Delta_b hooks; at Q = 0 the Kerr-Newman volumetric trace must
    match Kerr's to integrator roundoff."""
    b = np.array([60.0, 210.0])
    em_k = np.asarray(_shell_trace(Kerr(1.0, 0.7), b).emission)
    em_kn = np.asarray(_shell_trace(KerrNewman(1.0, 0.7, 0.0),
                                    b).emission)
    np.testing.assert_allclose(em_kn, em_k, rtol=1e-10)
    # And a genuinely charged trace runs and stays finite/positive.
    em_q = np.asarray(_shell_trace(KerrNewman(1.0, 0.7, 0.5),
                                   b).emission)
    assert np.isfinite(em_q).all() and (em_q > 0).all()


def _torus_image(a=0.9, inc_deg=80.0, prograde=True, res=(64, 64),
                 g_power=3.0):
    scene = SceneConfig(M=1.0, a=a, r_obs_mult=100.0,
                        theta_obs=np.radians(inc_deg))
    riaf = RIAFConfig(g_power=g_power, prograde=prograde)
    img, st = render_volumetric(scene, res, CFG, riaf)
    return np.asarray(st["emission"]), st


def _mirror_halves(em):
    """Left/right sums over mirror-symmetric column ranges.

    The camera grid has NO half-pixel offset (x_cam = (px - W/2)/fx,
    reference parity), so column W//2 is exactly on-axis: columns
    W//2 -+ k are the mirror pair, and a naive [:, :W//2] split is off
    by one column. Sum 1..W//2-1 against W//2+1..W-1."""
    h = em.shape[1] // 2
    return em[:, 1:h].sum(), em[:, h + 1:].sum()


@pytest.mark.slow
def test_torus_doppler_crescent_and_retrograde_flip():
    """Edge-on rotating torus: the approaching side is Doppler-beamed
    (g^3), producing a strongly one-sided crescent; reversing the flow
    direction mirrors the whole image (a = 0: phi -> -phi isometry)."""
    em_pro, st = _torus_image(a=0.0, prograde=True)
    em_ret, _ = _torus_image(a=0.0, prograde=False)
    assert st["invalid"] == 0 and st["captured"] > 0
    l_pro, r_pro = _mirror_halves(em_pro)
    l_ret, r_ret = _mirror_halves(em_ret)
    hi_pro, lo_pro = max(l_pro, r_pro), min(l_pro, r_pro)
    assert hi_pro > 2.0 * lo_pro          # a real crescent
    # The flip: whichever side was bright goes dim and vice versa.
    if l_pro > r_pro:
        assert r_ret > l_ret
    else:
        assert l_ret > r_ret
    # Exact mirror: em_ret(column W//2 + k) == em_pro(column W//2 - k).
    np.testing.assert_allclose(em_ret[:, 1:], em_pro[:, :0:-1],
                               rtol=0.02, atol=1e-4 * em_pro.max())


@pytest.mark.slow
def test_torus_face_on_is_nearly_symmetric():
    """Near-face-on: the line-of-sight component of the orbital
    velocity scales as sin(inclination), so the Doppler asymmetry
    collapses (measured ~3% residual at 2 deg from the g^3 weighting
    of the ~0.01c projected flow) — an order of magnitude below the
    edge-on crescent's."""
    em, _ = _torus_image(a=0.0, inc_deg=2.0)
    left, right = _mirror_halves(em)
    asym_face = abs(left - right) / (left + right)
    assert asym_face < 0.05
    em_edge, _ = _torus_image(a=0.0, inc_deg=80.0)
    l_e, r_e = _mirror_halves(em_edge)
    asym_edge = abs(l_e - r_e) / (l_e + r_e)
    assert asym_edge > 5.0 * asym_face
    assert em.sum() > 0


def test_g_power_zero_is_pure_path_length():
    """g_power = 0 removes the redshift weighting: edge-on asymmetry
    collapses to near-symmetric (pure geometry)."""
    em, _ = _torus_image(a=0.0, g_power=0.0)
    left, right = _mirror_halves(em)
    np.testing.assert_allclose(left, right, rtol=0.05)


def test_config_validation():
    with pytest.raises(ValueError, match="profile"):
        make_emission_fn(Kerr(1.0, 0.0), RIAFConfig(profile="blob"))
    with pytest.raises(ValueError, match="shell_out"):
        make_emission_fn(Kerr(1.0, 0.0), RIAFConfig(profile="shell"))
    from light_path_tracer_tpu.models.johannsen_psaltis import (
        JohannsenPsaltis)
    with pytest.raises(ValueError, match="Johannsen-Psaltis"):
        make_emission_fn(JohannsenPsaltis(1.0, 0.5, eps3=2.0),
                         RIAFConfig())


def test_render_volumetric_image_contract():
    """Image is [0, 1] float32, tone-mapped from the raw emission in
    stats; powerlaw profile also renders finite."""
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(60.0))
    img, st = render_volumetric(scene, (32, 32), CFG,
                                RIAFConfig(profile="powerlaw",
                                           tone_map="linear"))
    img = np.asarray(img)
    assert img.shape == (32, 32) and img.dtype == np.float32
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-6
    em = st["emission"]
    np.testing.assert_allclose(img, em / em.max(), rtol=1e-5,
                               atol=1e-7)
    assert st["integrator_steps"] > 0


@pytest.mark.slow
def test_decomposed_partition_and_winding_counter():
    """Photon-ring decomposition: the order layers partition the
    single-band image (same transfer, gated by the smooth winding
    coordinate), and the winding counter's unit-mass bump reads ~1.0
    on ordinary once-crossing rays."""
    from light_path_tracer_tpu.volumetric import (
        render_volumetric, render_volumetric_decomposed)

    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(20.0),
                        vertical_fov_deg=16.0)
    riaf = RIAFConfig()
    layers, st = render_volumetric_decomposed(scene, (64, 64),
                                              RenderConfig(), riaf,
                                              n_orders=3)
    assert layers.shape == (3, 64, 64)
    _img, st1 = render_volumetric(scene, (64, 64), RenderConfig(), riaf)
    total = np.asarray(layers, np.float64).sum(axis=0)
    ref = st1["emission"]
    # Pointwise to integration tolerance (the extra state components
    # change the controller's step sequence), integrated to ~0.1%.
    assert np.abs(total - ref).max() < 0.03 * ref.max()
    assert abs(total.sum() - ref.sum()) < 2e-3 * ref.sum()
    # The smooth winding coordinate counts crossings: emitting pixels
    # away from the ring cross the equator exactly once face-on.
    w = st["winding"]
    ordinary = (total > 0.01 * total.max()) & (w < 1.5)
    assert ordinary.sum() > 100
    assert abs(np.median(w[ordinary]) - 1.0) < 0.02


@pytest.mark.slow
def test_decomposed_demagnification_physics():
    """a=0 near-face-on: order fluxes decrease steeply and the n=1->2
    demagnification exponent is near the Schwarzschild Lyapunov
    asymptote pi (measured 3.44 at 128^2); the order-2 layer hugs the
    critical curve."""
    from light_path_tracer_tpu.volumetric import (
        render_volumetric_decomposed)

    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0,
                        theta_obs=np.radians(20.0),
                        vertical_fov_deg=16.0)
    layers, st = render_volumetric_decomposed(scene, (128, 128),
                                              RenderConfig(),
                                              RIAFConfig(), n_orders=3)
    flux = np.asarray(st["flux_per_order"])
    assert np.all(flux > 0.0) and np.all(flux[:-1] > flux[1:])
    assert 2.3 < st["gamma_estimates"][1] < 4.5
    assert np.isclose(st["mean_radius_rad"][2], st["alpha_crit"],
                      rtol=0.08)
    assert (layers >= 0.0).all()


@pytest.mark.slow
def test_decomposed_absorption_screens_every_order():
    """With alpha0 > 0 every order dims (shared optical depth) and the
    tau map rides stats; layers stay a partition of the absorbed
    single-band image."""
    from light_path_tracer_tpu.volumetric import (
        render_volumetric, render_volumetric_decomposed)

    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0,
                        theta_obs=np.radians(30.0),
                        vertical_fov_deg=16.0)
    thin = RIAFConfig()
    thick = RIAFConfig(alpha0=0.3)
    lt, st_t = render_volumetric_decomposed(scene, (48, 48),
                                            RenderConfig(), thin, 2)
    la, st_a = render_volumetric_decomposed(scene, (48, 48),
                                            RenderConfig(), thick, 2)
    assert st_a["optical_depth"].max() > 1.0
    flux_t = np.asarray(st_t["flux_per_order"])
    flux_a = np.asarray(st_a["flux_per_order"])
    assert np.all(flux_a < flux_t)
    _img, st1 = render_volumetric(scene, (48, 48), RenderConfig(),
                                  thick)
    total = np.asarray(la, np.float64).sum(axis=0)
    assert abs(total.sum() - st1["emission"].sum()) \
        < 5e-3 * st1["emission"].sum()


class TestJet:
    """Relativistic jet/outflow (profile='jet', RIAFConfig.jet_beta)."""

    def test_radially_boosted_zamo_exact(self):
        """The jet redshift on a constructed radial ray reproduces the
        exact factored form sqrt(f) / (Gamma (1 -+ beta)) — the
        gravitational shift times the special-relativistic radial
        Doppler — at weak field, both cone sides."""
        from light_path_tracer_tpu.volumetric import _profile_fns
        m = Kerr(M=1.0, a=0.0)
        beta = 0.5
        gamma = 1.0 / np.sqrt(1.0 - beta * beta)
        _j, g_jet = _profile_fns(
            m, RIAFConfig(profile="jet", jet_beta=beta))
        r = 500.0
        f = 1.0 - 2.0 / r
        def state(p_r):
            return tuple(jnp.asarray([v], jnp.float64)
                         for v in (r, np.pi / 2, 0.0, p_r, 0.0))
        p_t = jnp.asarray(-1.0)
        p_phi = jnp.asarray(0.0)
        # traced p_r < 0 = physical photon moving OUTWARD (toward the
        # camera): the emitter approaches -> blueshift.
        g_near = float(g_jet(state(-1.0 / f), p_t, p_phi)[0])
        g_far = float(g_jet(state(+1.0 / f), p_t, p_phi)[0])
        assert g_near == pytest.approx(
            np.sqrt(f) / (gamma * (1.0 - beta)), rel=1e-12)
        assert g_far == pytest.approx(
            np.sqrt(f) / (gamma * (1.0 + beta)), rel=1e-12)
        # beta = 0 reduces to the pure gravitational shift (ZAMO at
        # a = 0 with an L = 0 ray).
        _j0, g_jet0 = _profile_fns(
            m, RIAFConfig(profile="jet", jet_beta=0.0))
        g0 = float(g_jet0(state(-1.0 / f), p_t, p_phi)[0])
        assert g0 == pytest.approx(np.sqrt(f), rel=1e-12)

    @pytest.mark.slow
    def test_one_sided_beaming_and_mirror(self):
        """The approaching cone outshines the receding one, and
        flipping the observer to the other hemisphere flips the
        bright side (at theta_obs = 90 the two halves are equal)."""
        cfg = RenderConfig(dtype="float64", max_steps=30000)
        riaf = RIAFConfig(profile="jet", jet_beta=0.6, index=-1.0,
                          tone_map="linear")

        def halves(theta_obs_deg):
            scene = SceneConfig(M=1.0, a=0.9,
                                theta_obs=np.radians(theta_obs_deg),
                                vertical_fov_deg=40.0)
            img, st = render_volumetric(scene, (48, 48), cfg, riaf)
            raw = np.asarray(st["emission"])
            # The camera axis sits ON row H/2 (reference pixel
            # convention: centers at i - H/2), so the mirror pairs
            # row k with row 48 - k: rows 1..23 <-> 25..47; row 0 and
            # the axis row 24 are unpaired and excluded.
            return raw[1:24].sum(), raw[25:48].sum()

        # camera rows run SOUTHWARD-up (e_y = -theta_hat): the +z
        # (approaching, theta_obs < 90) cone fills the BOTTOM half.
        top, bot = halves(70.0)
        assert bot / top > 2.0
        top2, bot2 = halves(110.0)
        assert top2 / bot2 > 2.0
        top3, bot3 = halves(90.0)
        assert top3 / bot3 == pytest.approx(1.0, rel=0.05)

    @pytest.mark.slow
    def test_jet_beta_zero_is_symmetric(self):
        cfg = RenderConfig(dtype="float64", max_steps=30000)
        riaf = RIAFConfig(profile="jet", jet_beta=0.0, index=-1.0,
                          tone_map="linear")
        scene = SceneConfig(M=1.0, a=0.0, theta_obs=np.radians(70.0),
                            vertical_fov_deg=40.0)
        img, st = render_volumetric(scene, (48, 48), cfg, riaf)
        raw = np.asarray(st["emission"])
        # beta = 0: static bipolar cone — but theta_obs = 70 still
        # foreshortens the two cones differently; only the EQUATORIAL
        # observer is mirror-symmetric (paired-rows split, see
        # test_one_sided_beaming_and_mirror).
        scene90 = SceneConfig(M=1.0, a=0.0, theta_obs=np.pi / 2,
                              vertical_fov_deg=40.0)
        img, st = render_volumetric(scene90, (48, 48), cfg, riaf)
        raw = np.asarray(st["emission"])
        assert raw[1:24].sum() / raw[25:48].sum() == pytest.approx(
            1.0, rel=1e-6)

    def test_jet_beta_validation(self):
        from light_path_tracer_tpu.volumetric import make_transfer_fns
        with pytest.raises(ValueError):
            make_transfer_fns(Kerr(M=1.0, a=0.0),
                              RIAFConfig(profile="jet", jet_beta=1.0))
