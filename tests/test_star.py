"""Stellar-surface imaging and pulse-profile oracles (star.py).

Closed-form anchors: the light-bending limb impact parameter
b_max = R / sqrt(1 - 2M/R), the uniform redshift of a static star
g = sqrt(1 - 2M/R), and the strong-lensing antipodal-spot visibility
for compact stars; physical orderings for the rotational Doppler and
retarded-phase effects.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from light_path_tracer_tpu.models.kerr import Kerr
from light_path_tracer_tpu.ops.kerr_trace import (CAPTURED, ESCAPED,
                                                  trace_rays_surface)
from light_path_tracer_tpu.utils.config import RenderConfig, SceneConfig
from light_path_tracer_tpu.star import (StarConfig, pulse_profile,
                                        render_star)

CFG = RenderConfig(backend="xla", dtype="float64")
R_OBS = 200.0


def _alpha_of_b(b, r_obs=R_OBS, M=1.0):
    """Screen viewing angle of impact parameter b at finite observer
    radius: sin(alpha) = b sqrt(1 - 2M/r_obs) / r_obs (Schwarzschild;
    matches initial_conditions_5d's rho = r sin(alpha)/sqrt(1-2M/r))."""
    return np.arcsin(b * np.sqrt(1.0 - 2.0 * M / r_obs) / r_obs)


def test_limb_impact_parameter_light_bending():
    """The captured/escaped boundary sits at b_max = R/sqrt(1 - 2M/R)
    — the star appears 29% larger than geometric at R = 5M."""
    R = 5.0
    b_max = R / np.sqrt(1.0 - 2.0 / R)
    bs = np.linspace(b_max - 0.05, b_max + 0.05, 41)
    alphas = jnp.asarray(_alpha_of_b(bs))
    res = trace_rays_surface(Kerr(1.0, 0.0), R_OBS, alphas,
                             jnp.zeros_like(alphas), np.pi / 2, R,
                             5000.0, 200000)
    cap = np.asarray(res.status) == CAPTURED
    assert cap[0] and not cap[-1]
    # Boundary localized to the grid spacing (2.5e-3 in b).
    edge = bs[np.where(cap)[0].max()]
    assert abs(edge - b_max) < 0.01
    # Escaped rays keep a finite lensed escape heading for compositing.
    assert np.isfinite(np.asarray(res.final_alpha)[~cap]).all()


def test_static_star_uniform_redshift_exact():
    """Omega = 0: every surface pixel's brightness is exactly
    g^4 T^4 = (1 - 2M/R)^2 T^4 — pins the redshift wiring AND the
    Hermite localization at r = R (any localization error would
    scatter g across the disk)."""
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2, vertical_fov_deg=6.0)
    star = StarConfig(radius=5.0, omega=0.0, spots=(), t_surface=0.5)
    _img, st = render_star(scene, (64, 64), CFG, star)
    b = st["brightness"]
    cap = b[b > 0]
    expect = (1.0 - 2.0 / 5.0) ** 2 * 0.5 ** 4
    assert st["captured"] > 1000 and st["invalid"] == 0
    np.testing.assert_allclose(cap, expect, rtol=1e-8)


def test_apparent_radius_area_estimate():
    """The captured-disk angular radius (pixel-area estimate) matches
    arcsin(b_max sqrt(1-2M/r_obs)/r_obs) and is well above the
    no-bending geometric size."""
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2, vertical_fov_deg=6.0)
    star = StarConfig(radius=5.0, spots=())
    _img, st = render_star(scene, (96, 96), CFG, star)
    bent = _alpha_of_b(5.0 / np.sqrt(1.0 - 2.0 / 5.0))
    geometric = _alpha_of_b(5.0)
    measured = st["apparent_radius_rad"]
    np.testing.assert_allclose(measured, bent, rtol=0.03)
    assert measured > 1.2 * geometric


def _spot_excess(R, fov_deg, spot_t):
    """Total brightness excess of an antipodal spot over the uniform
    star (sub-observer point at (90 deg, 0); spot at (90 deg, 180))."""
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2,
                        vertical_fov_deg=fov_deg)
    base = StarConfig(radius=R, spots=(), t_surface=0.5)
    spotted = StarConfig(radius=R,
                         spots=((90.0, 180.0, 25.0, spot_t),),
                         t_surface=0.5)
    _i0, st0 = render_star(scene, (64, 64), CFG, base)
    _i1, st1 = render_star(scene, (64, 64), CFG, spotted)
    b0 = st0["brightness"].sum()
    return (st1["brightness"].sum() - b0) / b0


@pytest.mark.slow
def test_antipodal_spot_visible_only_for_compact_star():
    """Strong lensing: for R = 3.3M (just outside the 3M photon
    sphere) the whole surface is visible, so a spot at the exact
    antipode of the sub-observer point still brightens the image; at
    R = 12M it is hidden behind the star."""
    excess_compact = _spot_excess(3.3, 4.0, 1.0)
    excess_wide = _spot_excess(12.0, 9.0, 1.0)
    assert excess_compact > 0.01          # clearly visible
    assert abs(excess_wide) < 1e-6        # geometrically hidden
    assert excess_compact > 100 * max(abs(excess_wide), 1e-12)


def test_rotational_doppler_asymmetry_and_flip():
    """Uniform-temperature rotating star seen edge-on: the approaching
    limb is Doppler-brightened (g^4), and reversing Omega mirrors the
    asymmetry."""
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2, vertical_fov_deg=6.0)

    def halves(omega):
        star = StarConfig(radius=5.0, omega=omega, spots=())
        _img, st = render_star(scene, (64, 64), CFG, star)
        b = st["brightness"]
        h = b.shape[1] // 2
        return b[:, 1:h].sum(), b[:, h + 1:].sum()

    l_pro, r_pro = halves(0.02)
    asym = abs(l_pro - r_pro) / (l_pro + r_pro)
    assert asym > 0.03                    # a real Doppler asymmetry
    l_ret, r_ret = halves(-0.02)
    if l_pro > r_pro:
        assert r_ret > l_ret
    else:
        assert l_ret > r_ret
    np.testing.assert_allclose(l_ret, r_pro, rtol=1e-6)
    np.testing.assert_allclose(r_ret, l_pro, rtol=1e-6)


@pytest.mark.slow
def test_pulse_profile_modulation_and_retarded_phase():
    """A rotating equatorial spot pulses; the light-travel-delay mode
    produces a finite, different profile (each element evaluated at
    its own retarded phase) with the same mean normalization."""
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2, vertical_fov_deg=6.0)
    star = StarConfig(radius=5.0, omega=0.02,
                      spots=((90.0, 0.0, 15.0, 1.0),), t_surface=0.5)
    ph, flux, st = pulse_profile(scene, CFG, star, n_phases=16,
                                 resolution=(48, 48))
    assert st["modulation"] > 0.05
    np.testing.assert_allclose(flux.mean(), 1.0, rtol=1e-12)
    ph_d, flux_d, st_d = pulse_profile(scene, CFG, star, n_phases=16,
                                       resolution=(48, 48),
                                       light_travel_delay=True)
    assert np.isfinite(flux_d).all() and st_d["modulation"] > 0.05
    # The retarded-phase profile is a genuinely different curve
    # (coordinate time to the far limb differs by ~tens of M).
    assert np.abs(flux_d - flux).max() > 1e-3


def test_kerr_exterior_runs():
    """Frame dragging: the a != 0 exterior traces and renders finite
    (exterior-Kerr approximation for rapid rotators)."""
    scene = SceneConfig(M=1.0, a=0.5, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2, vertical_fov_deg=6.0)
    star = StarConfig(radius=5.0, omega=0.02)
    img, st = render_star(scene, (32, 32), CFG, star)
    assert st["captured"] > 100
    assert np.isfinite(np.asarray(img)).all()


def test_config_validation():
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=R_OBS)
    with pytest.raises(ValueError, match="horizon"):
        render_star(scene, (8, 8), CFG, StarConfig(radius=1.5))
    with pytest.raises(ValueError, match="superluminal"):
        render_star(scene, (8, 8), CFG,
                    StarConfig(radius=5.0, omega=0.5))
    with pytest.raises(ValueError, match="spot"):
        render_star(scene, (8, 8), CFG,
                    StarConfig(radius=5.0, spots=((1.0, 2.0),)))
