"""360-degree equirectangular panorama mode (pano.py).

Oracles:
  * the chart is exactly invertible at pixel centers (round trip), and
    (alpha, theta) reconstruct the view direction through the same
    formula the renderer uses;
  * weak field = identity: far from the hole, every sky texel maps back
    to itself under the nearest-gather rule (this also pins the NEW
    backward-ray radial branch — half the chart looks away from the BH,
    which the pinhole FOV never exercises);
  * the shadow's solid angle matches the analytic cone fraction
    (1 - cos(alpha_crit)) / 2 under cos(lat) quadrature weights;
  * the tb-symmetry fold equals the full trace (NaN pattern exactly;
    values to the chaotic-amplification tolerance documented in
    BASELINE.md); and mesh-sharded equals single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.camera import psi_frame
from light_path_tracer_tpu.models import Kerr, Schwarzschild
from light_path_tracer_tpu.ops.batch import trace_batch
from light_path_tracer_tpu.pano import (build_pano_lookups,
                                        pano_directions,
                                        pano_pixel_coords,
                                        render_pano_image,
                                        render_panorama)
from light_path_tracer_tpu.utils.config import RenderConfig, SceneConfig


def test_chart_round_trip_exact():
    H, W = 16, 32
    vx, vy, vz = pano_directions((H, W), jnp.float64)
    px, py = pano_pixel_coords(vx, vy, vz, (H, W))
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    assert float(jnp.max(jnp.abs(px - gx))) < 1e-9
    assert float(jnp.max(jnp.abs(py - gy))) < 1e-9


def test_lookups_reconstruct_directions():
    # (alpha, theta) -> direction through the renderer's reconstruction
    # must return the chart's own direction grid (any psi).
    H, W = 16, 32
    psi = (0.2, -0.4)
    vx, vy, vz = pano_directions((H, W), jnp.float64)
    a, t = build_pano_lookups((H, W), psi=psi, dtype=jnp.float64)
    fr = psi_frame(psi)
    sa, ca = jnp.sin(a), jnp.cos(a)
    st, ct = jnp.sin(t), jnp.cos(t)
    rx = ca * fr.d[0] + sa * (st * fr.e_x[0] + ct * fr.e_y[0])
    ry = ca * fr.d[1] + sa * (st * fr.e_x[1] + ct * fr.e_y[1])
    rz = ca * fr.d[2] + sa * (st * fr.e_x[2] + ct * fr.e_y[2])
    err = jnp.max(jnp.abs(rx - vx) + jnp.abs(ry - vy) + jnp.abs(rz - vz))
    assert float(err) < 1e-12


def test_backward_rays_weak_field():
    # The radial-branch fix: rays with alpha > pi/2 must come back at
    # final_alpha ~ alpha (tiny deflection at b = r sin(alpha) >> M),
    # not folded to pi - alpha.
    alphas = jnp.asarray([1.6, 2.0, 2.5, 3.0], jnp.float64)
    res = trace_batch(Schwarzschild(M=1.0), 1e4, alphas)
    err = np.abs(np.asarray(res.final_alpha) - np.asarray(alphas))
    assert err.max() < 5e-3

    thetas = jnp.full_like(alphas, 0.7)
    resk = trace_batch(Kerr(M=1.0, a=0.9), 1e4, alphas, thetas)
    errk = np.abs(np.asarray(resk.final_alpha) - np.asarray(alphas))
    assert errk.max() < 5e-3


def test_weak_field_identity_full_sphere():
    rng = np.random.default_rng(0)
    sky = rng.random((24, 48, 3)).astype(np.float32)
    out = render_panorama(SceneConfig(M=1.0, r_obs_mult=1e4), sky)
    img = np.asarray(out.image)
    alpha, _ = build_pano_lookups((24, 48))
    away = np.asarray(alpha) > 0.2   # exclude the strong-field forward cone
    same = np.abs(img - sky).max(axis=-1) < 1e-6
    assert same[away].all()
    # alpha_crit ~ 5e-4 rad: no whole pixel is inside the shadow.
    assert not np.isnan(np.asarray(out.final_alpha)).any()


def _captured_solid_angle_frac(out, resolution):
    H, W = resolution
    cap = np.isnan(np.asarray(out.final_alpha))
    lat = np.pi / 2 - (np.arange(H) + 0.5) / H * np.pi
    wgt = np.broadcast_to(np.cos(lat)[:, None], (H, W))
    return float((cap * wgt).sum() / wgt.sum())


def test_shadow_solid_angle_schwarzschild():
    # Spherically symmetric: the shadow is EXACTLY the alpha < alpha_crit
    # cone, solid-angle fraction (1 - cos(alpha_crit)) / 2.
    rng = np.random.default_rng(1)
    sky = rng.random((16, 32, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, r_obs_mult=10.0)
    out = render_panorama(scene, sky, resolution=(32, 64))
    frac = _captured_solid_angle_frac(out, (32, 64))
    expect = (1.0 - np.cos(out.alpha_crit)) / 2.0
    assert abs(frac - expect) < 0.15 * expect


@pytest.mark.slow
def test_shadow_solid_angle_kerr_bounded():
    # Kerr's alpha_crit is the shadow ENVELOPE (max over the asymmetric
    # silhouette), so the cone fraction is an UPPER bound; the shadow
    # still must be a substantial fraction of it, and there must be no
    # spurious backward-hemisphere captures (the pre-fix failure mode
    # doubled the fraction by capturing alpha ~ pi rays).
    rng = np.random.default_rng(1)
    sky = rng.random((16, 32, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=10.0)
    out = render_panorama(scene, sky, resolution=(32, 64))
    frac = _captured_solid_angle_frac(out, (32, 64))
    envelope = (1.0 - np.cos(out.alpha_crit)) / 2.0
    assert 0.3 * envelope < frac <= envelope
    alpha, _ = build_pano_lookups((32, 64))
    backward = np.asarray(alpha) > np.pi / 2
    assert not np.isnan(np.asarray(out.final_alpha))[backward].any()


@pytest.mark.slow
def test_tb_fold_equals_full():
    rng = np.random.default_rng(2)
    sky = rng.random((17, 32, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=10.0)
    on = render_panorama(scene, sky)
    off = render_panorama(scene, sky,
                          cfg=RenderConfig(use_tb_symmetry=False))
    assert on.traced_rays == 9 * 32 and off.traced_rays == 17 * 32
    fa_on = np.asarray(on.final_alpha)
    fa_off = np.asarray(off.final_alpha)
    assert (np.isnan(fa_on) == np.isnan(fa_off)).all()
    both = np.isfinite(fa_on) & np.isfinite(fa_off)
    d = np.abs(fa_on - fa_off)[both]
    # The chart mirrors bitwise; residuals are ulp-level input
    # differences (sin(pi - theta) vs sin(theta)) amplified near the
    # photon ring (the documented f32 chaotic tail, BASELINE.md).
    assert np.quantile(d, 0.98) < 1e-4
    assert d.max() < 1e-2


@pytest.mark.slow
def test_mesh_sharded_equals_single_device():
    devs = np.array(jax.devices()[:4])
    from jax.sharding import Mesh
    mesh = Mesh(devs, ("rows",))
    rng = np.random.default_rng(3)
    sky = rng.random((16, 32, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.7, r_obs_mult=20.0)
    cfg = RenderConfig(use_tb_symmetry=False)
    single = render_panorama(scene, sky, cfg=cfg)
    sharded = render_panorama(scene, sky, cfg=cfg, mesh=mesh)
    fa_s = np.asarray(single.final_alpha)
    fa_m = np.asarray(sharded.final_alpha)
    assert (np.isnan(fa_s) == np.isnan(fa_m)).all()
    # Exclude the few near-critical (photon-ring) pixels: the fused
    # single-device program and the shard_map program fuse/round
    # differently, and those rays amplify last-ulp differences (same
    # exclusion rationale as tests/test_sharding.py, which pins exact
    # agreement on f64 grids instead).
    alpha, _ = build_pano_lookups((16, 32))
    ok = (np.isfinite(fa_s)
          & (np.abs(np.asarray(alpha) - single.alpha_crit) > 0.1))
    np.testing.assert_allclose(fa_m[ok], fa_s[ok], atol=2e-5)
    img_s = np.asarray(single.image)
    img_m = np.asarray(sharded.image)
    assert (np.abs(img_m - img_s).max(axis=-1)[ok] < 1e-5).all()


def test_winding_overlay_and_bilinear():
    rng = np.random.default_rng(4)
    sky = rng.random((16, 32, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, r_obs_mult=10.0)
    out = render_panorama(scene, sky, resolution=(16, 32),
                          cfg=RenderConfig(sampling="bilinear"))
    img = np.asarray(out.image)
    assert img.shape == (16, 32, 3) and np.isfinite(img).all()
    # overlay recolors winding >= 1 pixels with the palette
    over = render_pano_image(sky, out.final_alpha, out.winding,
                             winding_overlay=True)
    assert np.asarray(over).shape == (16, 32, 3)
    wind = np.asarray(out.winding)
    valid = np.isfinite(np.asarray(out.final_alpha))
    ring = valid & (wind >= 1)
    if ring.any():
        from light_path_tracer_tpu.render import WINDING_COLORS
        got = np.asarray(over)[ring]
        pal = WINDING_COLORS[np.clip(wind[ring], 0,
                                     len(WINDING_COLORS) - 1)]
        np.testing.assert_allclose(got, pal, atol=1e-6)


def test_boosted_pano_runs():
    # Forward boost: aberration shrinks the shadow's solid angle.
    rng = np.random.default_rng(5)
    sky = rng.random((16, 32, 3)).astype(np.float32)
    static = render_panorama(SceneConfig(M=1.0, r_obs_mult=10.0), sky,
                             resolution=(16, 32))
    boosted = render_panorama(
        SceneConfig(M=1.0, r_obs_mult=10.0, boost=(0.0, 0.0, 0.5)), sky,
        resolution=(16, 32))
    n_static = int(np.isnan(np.asarray(static.final_alpha)).sum())
    n_boost = int(np.isnan(np.asarray(boosted.final_alpha)).sum())
    assert 0 < n_boost < n_static
