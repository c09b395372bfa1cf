"""Observer-at-finite-velocity (relativistic aberration) tests.

New capability beyond the reference (static observer only,
image_lens.py:21-69): the camera may move with 3-velocity `boost`
(units of c); every pixel's view direction is aberrated into the
static frame before tracing, and observed frequencies pick up the
per-pixel Doppler factor.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu import camera
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def test_zero_boost_is_identity():
    dim, fov = (24, 32), camera.fov_from_vertical(np.radians(40.0), (24, 32))
    a0 = camera.build_alpha_lookup(dim, fov, dtype=jnp.float64)
    a1 = camera.build_alpha_lookup(dim, fov, dtype=jnp.float64,
                                   boost=(0.0, 0.0, 0.0))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    t0 = camera.build_theta_lookup(dim, fov, dtype=jnp.float64)
    t1 = camera.build_theta_lookup(dim, fov, dtype=jnp.float64, boost=None)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    d = camera.doppler_lookup(dim, fov, (0.0, 0.0, 0.0), dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(d), 1.0)


def test_aberration_roundtrip():
    """camera->static with boost b, then static->camera with -b, is the
    identity (frame S' moves at +b in S <=> S moves at -b in S')."""
    rng = np.random.default_rng(11)
    v = rng.normal(size=(3, 50))
    v /= np.linalg.norm(v, axis=0)
    vx, vy, vz = (jnp.asarray(c) for c in v)
    boost = (0.3, -0.2, 0.45)
    wx, wy, wz = camera.aberrate_view(vx, vy, vz, boost)
    ux, uy, uz = camera.aberrate_view(wx, wy, wz, tuple(-b for b in boost))
    np.testing.assert_allclose(np.asarray(ux), v[0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(uy), v[1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(uz), v[2], atol=1e-12)


def test_forward_boost_spreads_camera_angles():
    """Headlight effect, inverse view: the static-frame angle from the
    forward axis is LARGER than the camera-frame angle — a fixed camera
    FOV sees a wider static sky, so the shadow shrinks on screen.
    Scalar oracle: tan(psi/2) = sqrt((1+b)/(1-b)) tan(psi'/2)."""
    b = 0.6
    for psi_cam in (0.05, 0.3, 1.0, 2.0):
        v = (np.sin(psi_cam), 0.0, np.cos(psi_cam))
        wx, _wy, wz = camera.aberrate_view(
            jnp.asarray([v[0]]), jnp.asarray([v[1]]), jnp.asarray([v[2]]),
            (0.0, 0.0, b))
        psi_static = float(np.arctan2(np.asarray(wx)[0], np.asarray(wz)[0]))
        assert psi_static > psi_cam
        expect = 2.0 * np.arctan(
            np.sqrt((1.0 + b) / (1.0 - b)) * np.tan(psi_cam / 2.0))
        assert np.isclose(psi_static, expect, atol=1e-12)


def test_doppler_forward_value():
    """Looking along the motion: delta = sqrt((1+b)/(1-b))."""
    b = 0.5
    dim = (25, 25)  # odd -> a pixel sits near the exact center
    fov = camera.fov_from_vertical(np.radians(10.0), dim)
    d = np.asarray(camera.doppler_lookup(dim, fov, (0.0, 0.0, b),
                                         dtype=jnp.float64))
    # Center pixel is offset half a pixel from the axis; tolerance covers it.
    assert np.isclose(d[12, 12], np.sqrt(1.5 / 0.5), rtol=1e-3)
    assert d.max() <= np.sqrt(1.5 / 0.5) + 1e-9  # forward is the max
    # Transverse-ish edges are less blueshifted than the center.
    assert d[0, 0] < d[12, 12]


def test_analytic_shadow_shrinks_when_approaching():
    from light_path_tracer_tpu.pipeline import render_shadow
    cfg = RenderConfig(dtype="float64")
    static = SceneConfig(M=1.0, a=0.0)
    toward = SceneConfig(M=1.0, a=0.0, boost=(0.0, 0.0, 0.5))
    away = SceneConfig(M=1.0, a=0.0, boost=(0.0, 0.0, -0.5))
    n = {}
    for name, sc in [("static", static), ("toward", toward),
                     ("away", away)]:
        img, _ = render_shadow(sc, (96, 96), cfg, analytic=True)
        n[name] = int((np.asarray(img) == 0.0).sum())
    assert n["toward"] < n["static"] < n["away"]
    assert n["toward"] > 0


def test_integrated_shadow_shrinks_when_approaching():
    """Full pipeline: the traced Schwarzschild shadow aberrates too."""
    from light_path_tracer_tpu.pipeline import render_shadow
    cfg = RenderConfig(dtype="float64")
    img_s, _ = render_shadow(SceneConfig(M=1.0, a=0.0), (48, 48), cfg)
    img_t, _ = render_shadow(
        SceneConfig(M=1.0, a=0.0, boost=(0.0, 0.0, 0.4)), (48, 48), cfg)
    n_static = int((np.asarray(img_s) == 0.0).sum())
    n_toward = int((np.asarray(img_t) == 0.0).sum())
    assert 0 < n_toward < n_static


@pytest.mark.slow
def test_boosted_blackbody_disk_is_bluer():
    """Flying toward the disk blueshifts it: the blue channel fraction
    rises versus the static observer."""
    from light_path_tracer_tpu.disk import render_disk, DiskConfig
    cfg = RenderConfig(dtype="float64")
    disk = DiskConfig(spectrum="blackbody")
    kw = dict(M=1.0, a=0.9, r_obs_mult=100.0, theta_obs=np.radians(80.0))
    img0, st0 = render_disk(SceneConfig(**kw), (32, 48), cfg, disk)
    img1, st1 = render_disk(SceneConfig(**kw, boost=(0.0, 0.0, 0.4)),
                            (32, 48), cfg, disk)
    assert st1["disk_pixels"] > 0

    def blue_frac(im):
        im = np.asarray(im)
        return im[..., 2].sum() / max(im.sum(), 1e-9)

    assert blue_frac(img1) > blue_frac(img0)
