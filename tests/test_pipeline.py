"""End-to-end pipeline tests: shadow geometry, symmetry, full renders."""

import pytest
import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.pipeline import (
    render_scene, render_shadow, precompute_final_alpha)
from light_path_tracer_tpu import camera


def _src(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((h, w, 3)).astype(np.float32)


def test_schwarzschild_shadow_radius():
    """Integrated shadow radius must match the analytic critical angle."""
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    res = (64, 64)
    img, stats = render_shadow(scene, res)
    img = np.asarray(img)
    shadow_px = (img == 0).sum()
    # Expected: circle of angular radius alpha_crit in a 40-deg-FOV camera.
    fov = camera.fov_from_vertical(scene.vertical_fov, res)
    fx, fy = camera.focal_lengths(res, fov)
    r_px = np.tan(stats["alpha_crit"]) * fy   # small-angle pinhole radius
    expected = np.pi * r_px**2
    assert abs(shadow_px - expected) / expected < 0.15
    # Analytic threshold shadow must closely agree with the integrated one.
    img_a, _ = render_shadow(scene, res, analytic=True)
    assert np.mean(np.asarray(img_a) != img) < 0.01


def test_kerr_shadow_displaced():
    """Frame dragging displaces the a=0.9 shadow horizontally."""
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    img, _ = render_shadow(scene, (48, 48),
                           RenderConfig(dtype="float64", chunk_size=None))
    img = np.asarray(img)
    ys, xs = np.where(img == 0)
    assert len(xs) > 10
    cx = xs.mean()
    assert abs(cx - 23.5) > 0.5    # centroid shifted off-axis
    # Shadow is still up/down symmetric for an equatorial observer.
    cy = ys.mean()
    assert abs(cy - 23.5) < 1.0


@pytest.mark.slow
def test_tb_symmetry_mirror_semantics():
    """The symmetry path traces half the rows and mirrors them — the
    reference's exact semantics (image_lens.py:218-229, 272-276), which
    carry an inherent half-pixel row offset vs a full trace."""
    scene = SceneConfig(M=1.0, a=0.8, r_obs_mult=100.0)
    dim = (30, 40)
    fov = camera.fov_from_vertical(scene.vertical_fov, dim)
    pre_sym = precompute_final_alpha(
        scene, RenderConfig(use_tb_symmetry=True, chunk_size=None),
        dim, fov)
    pre_full = precompute_final_alpha(
        scene, RenderConfig(use_tb_symmetry=False, chunk_size=None),
        dim, fov)
    assert pre_sym.traced_rays == 15 * 40
    assert pre_full.traced_rays == 30 * 40
    fa_s = np.asarray(pre_sym.final_alpha)
    fa_f = np.asarray(pre_full.final_alpha)
    # Mirror construction: bottom row r is a copy of top row H-1-r.
    for r in range(15, 30):
        np.testing.assert_array_equal(fa_s[r], fa_s[30 - 1 - r])
    # Top halves (actually traced) agree with the full trace. (Not bitwise:
    # different batch shapes vectorize differently in f32.)
    top_s, top_f = fa_s[:15], fa_f[:15]
    both = np.isfinite(top_s) & np.isfinite(top_f)
    assert (np.isfinite(top_s) == np.isfinite(top_f)).all()
    np.testing.assert_allclose(top_s[both], top_f[both], atol=1e-5)
    # The mirrored bottom stays within one pixel row of the full trace:
    # shadow masks may only disagree along the one-row shift.
    finite_agree = (np.isfinite(fa_s) == np.isfinite(fa_f)).mean()
    assert finite_agree > 0.9


def test_tb_physical_symmetry_of_tracer():
    """Equatorial-observer mirror symmetry of the physics itself:
    (alpha, theta) and (alpha, pi - theta) give identical final_alpha."""
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu.ops import trace_rays_kerr
    m = Kerr(M=1.0, a=0.8)
    ac = m.alpha_crit(100.0)
    alphas = jnp.asarray([1.4 * ac, 2.5 * ac, 0.6 * ac], jnp.float64)
    thetas = jnp.asarray([0.7, -1.9, 2.2], jnp.float64)
    up = trace_rays_kerr(m, 100.0, alphas, thetas, np.pi / 2,
                         jnp.zeros(3, bool), 5000.0, 200000)
    dn = trace_rays_kerr(m, 100.0, alphas, np.pi - thetas, np.pi / 2,
                         jnp.zeros(3, bool), 5000.0, 200000)
    np.testing.assert_array_equal(np.asarray(up.status),
                                  np.asarray(dn.status))
    esc = np.asarray(up.status) == 1
    # pi - theta is inexact in fp, and the adaptive controller's
    # accept/reject decisions amplify that to the integration-tolerance
    # level; agreement at ~1e-5 is the expected bound.
    np.testing.assert_allclose(np.asarray(up.final_alpha)[esc],
                               np.asarray(dn.final_alpha)[esc], atol=5e-5)


def test_render_scene_schwarzschild():
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    src = _src()
    out = render_scene(scene, src)
    assert out.image.shape == src.shape
    img = np.asarray(out.image)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # The shadow exists and is surrounded by lensed texture.
    shadow = np.isnan(np.asarray(out.precompute.final_alpha))
    assert 0 < shadow.sum() < shadow.size * 0.5
    assert set(out.timings) >= {"load_image", "build_lookup",
                                "precompute", "render", "total"}


def test_render_scene_kerr_off_axis():
    scene = SceneConfig(M=1.0, a=0.6, r_obs_mult=100.0,
                        psi_y=np.radians(2.0), psi_x=np.radians(-3.0))
    src = _src(40, 56, seed=2)
    out = render_scene(scene, src, RenderConfig(chunk_size=None))
    assert out.image.shape == src.shape
    # Off-axis psi_y breaks the symmetry precondition: all rows traced.
    assert out.precompute.traced_rays == 40 * 56


def test_uint8_source_normalized():
    scene = SceneConfig(M=1.0, a=0.0)
    src = (np.random.default_rng(1).random((32, 32, 3)) * 255).astype(
        np.uint8)
    out = render_scene(scene, src)
    assert np.asarray(out.image).max() <= 1.0


@pytest.mark.slow
def test_invalid_rays_surface_as_shadow():
    """Failure handling (SURVEY §5): numerically invalid rays surface as
    status 0 / NaN final_alpha and render black, never crash."""
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu.ops import trace_rays_kerr

    # Observer inside the ergosphere/horizon region -> Delta <= 0 -> the
    # initial-condition guard flags every ray invalid.
    m = Kerr(M=1.0, a=0.5)
    alphas = jnp.asarray([0.01, 0.05], jnp.float64)
    thetas = jnp.asarray([0.0, 1.0], jnp.float64)
    res = trace_rays_kerr(m, 1.5, alphas, thetas, np.pi / 2,
                          jnp.zeros(2, bool), 5000.0, 1000)
    assert (np.asarray(res.status) == 0).all()
    assert np.isnan(np.asarray(res.final_alpha)).all()

    # Invalid lanes must not poison neighbors in the same batch.
    m2 = Kerr(M=1.0, a=0.9)
    al = jnp.asarray([0.0, 0.1], jnp.float64)   # alpha=0: degenerate
    th = jnp.asarray([0.0, 1.0], jnp.float64)
    r2 = trace_rays_kerr(m2, 100.0, al, th, np.pi / 2,
                         jnp.zeros(2, bool), 5000.0, 200000)
    assert int(r2.status[1]) == 1
    assert np.isfinite(float(r2.final_alpha[1]))


@pytest.mark.slow
def test_fused_lens_path_matches_staged():
    """render_scene's default single-program fused path (camera grids +
    trace + fold + render in ONE dispatch) is exact against the staged
    chunked path, including boosted and off-axis scenes."""
    rng = np.random.default_rng(1)
    src = rng.random((24, 32, 3)).astype(np.float32)
    for scene in (SceneConfig(a=0.9),
                  SceneConfig(a=0.9, boost=(0.0, 0.0, 0.2)),
                  SceneConfig(a=0.9, psi_y=np.radians(3.0))):
        fused = render_scene(scene, src, RenderConfig(dtype="float64"))
        staged = render_scene(scene, src,
                              RenderConfig(dtype="float64",
                                           chunk_size=256))
        np.testing.assert_allclose(np.asarray(fused.image),
                                   np.asarray(staged.image), atol=1e-12)
        np.testing.assert_allclose(np.asarray(fused.alpha_lookup),
                                   np.asarray(staged.alpha_lookup),
                                   atol=1e-12)
        assert (fused.precompute.traced_rays
                == staged.precompute.traced_rays)
