"""Disk spectroscopy tests: relativistic line profiles + light curves.

Oracle strategy: the classic diskline features are parameter-ordering
properties (Doppler horns, gravitational red wing vs ISCO, inclination
narrowing) that don't require golden numbers — each test pins one
physical signature.
"""

import numpy as np
import pytest

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.disk import DiskConfig, HotSpot, keplerian_omega
from light_path_tracer_tpu.spectra import line_profile, hotspot_light_curve


CFG = RenderConfig(backend="xla")


def _profile(a, inc_deg, res=(64, 64), **kw):
    scene = SceneConfig(M=1.0, a=a, r_obs_mult=100.0,
                        theta_obs=np.radians(inc_deg))
    kw.setdefault("rest_energy", 1.0)
    return line_profile(scene, res, CFG, DiskConfig(), n_bins=40, **kw)


@pytest.mark.slow
def test_line_profile_edge_on_doppler_horns():
    """Edge-on disk: blue horn beyond g=1 (approaching limb beams), red
    wing well below (receding limb + gravitational redshift), and the
    blue horn carries the flux peak (Doppler boosting g^3)."""
    g, f, st = _profile(0.0, 80.0)
    assert (f >= 0).all() and f.sum() > 0
    seen = g[f > 0.01 * f.max()]
    assert seen.max() > 1.15          # Doppler blue horn
    assert seen.min() < 0.65          # red wing
    assert g[np.argmax(f)] > 1.0      # beamed blue horn dominates
    assert st["disk_pixels"] > 100


def test_line_profile_face_on_is_narrow_and_redshifted():
    """Face-on: projected orbital velocity ~0, so the line is narrow and
    sits wholly below g=1 (pure gravitational + transverse redshift)."""
    g_e, f_e, _ = _profile(0.0, 80.0)
    g_f, f_f, _ = _profile(0.0, 15.0)
    seen_e = g_e[f_e > 0.01 * f_e.max()]
    seen_f = g_f[f_f > 0.01 * f_f.max()]
    assert seen_f.max() < 1.0
    assert (seen_f.max() - seen_f.min()) < 0.6 * (seen_e.max()
                                                  - seen_e.min())


def test_line_profile_spin_extends_red_wing():
    """a=0.9 prograde ISCO (2.32M) sits far inside a=0's (6M): emission
    from the extra inner annuli drags the red wing to much lower g —
    the spin-measurement signature."""
    g0, f0, s0 = _profile(0.0, 80.0)
    g9, f9, s9 = _profile(0.9, 80.0)
    red0 = g0[f0 > 0.01 * f0.max()].min()
    red9 = g9[f9 > 0.01 * f9.max()].min()
    assert s9["r_isco"] < 0.5 * s0["r_isco"]
    assert red9 < red0 - 0.1


@pytest.mark.slow
def test_line_profile_supersampled_preserves_total_flux():
    """aa_samples multiplies the crossing samples but divides the
    weights, so total flux is preserved. Tested with a FLAT emission
    law (q=0, p=0: weight 1 per crossing) where the total is the
    disk's solid-angle coverage, which converges at small grids — the
    default r^-3 emissivity concentrates flux in a few inner-edge
    pixels whose subpixel in/out flips dominate 48^2 totals."""
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0))
    flat = DiskConfig(emissivity_index=0.0, g_power=0.0)
    g1, f1, s1 = line_profile(scene, (48, 48), CFG, flat, n_bins=40,
                              rest_energy=1.0)
    g4, f4, s4 = line_profile(scene, (48, 48), CFG, flat, n_bins=40,
                              rest_energy=1.0, aa_samples=4,
                              g_lim=tuple(s1["g_lim"]))
    np.testing.assert_allclose(g4, g1, rtol=1e-12)
    assert s4["traced_rays"] == 4 * s1["traced_rays"]
    # Total = covered solid angle in pixel units; agrees to the
    # boundary-pixel noise level.
    np.testing.assert_allclose(f4.sum(), f1.sum(), rtol=0.05)


def test_line_profile_energy_scaling():
    g, f, _ = _profile(0.0, 80.0)
    e, f2, _ = _profile(0.0, 80.0, rest_energy=6.4)
    np.testing.assert_allclose(e, 6.4 * g, rtol=1e-12)
    np.testing.assert_allclose(f2, f, rtol=1e-6)


@pytest.mark.slow
def test_line_profile_empty_fov_raises():
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0),
                        psi_y=np.radians(60.0))   # BH far off screen
    with pytest.raises(ValueError, match="no disk crossings"):
        line_profile(scene, (16, 16), CFG,
                     DiskConfig(r_out=8.0), n_bins=16)


def test_hotspot_light_curve_periodic_and_beamed():
    """One spot orbit: flux is periodic in the orbital period and
    Doppler beaming modulates it strongly at high inclination."""
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0))
    spot = HotSpot()
    period = abs(2 * np.pi / keplerian_omega(1.0, 0.9, spot.r0, True))
    ts = np.linspace(0.0, 2 * period, 17)
    t, f, st = hotspot_light_curve(scene, (48, 48), ts, CFG,
                                   DiskConfig(), spot)
    assert np.isfinite(f).all() and (f > 0).all()
    assert st["n_samples"] == 17
    np.testing.assert_allclose(st["orbit_period"], period, rtol=1e-12)
    # Periodicity: one full orbit returns the flux (same pattern phase).
    np.testing.assert_allclose(f[:8], f[8:16], rtol=1e-5)
    # Beaming modulation is strong at 80 deg.
    assert f.max() / f.min() > 1.2


def test_hotspot_light_curve_no_disk_pixels_with_delay():
    """Out-of-frame disk geometry + light_travel_delay: with zero disk
    pixels there is no earliest-arrival reference — delays must switch
    off (delay_spread 0) instead of propagating inf into the pattern
    times, and the flux stays finite (identically zero)."""
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0),
                        psi_y=np.radians(60.0))   # BH far off screen
    ts = np.linspace(0.0, 50.0, 5)
    t, f, st = hotspot_light_curve(scene, (16, 16), ts, CFG,
                                   DiskConfig(r_out=8.0), HotSpot(),
                                   light_travel_delay=True)
    assert st["disk_pixels"] == 0
    assert st["delay_spread"] == 0.0
    assert np.isfinite(f).all()
    np.testing.assert_allclose(f, 0.0)
