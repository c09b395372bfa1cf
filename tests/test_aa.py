"""Supersampled-AA tests: offsets, boundary smoothing, mesh tiling."""

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.aa import (
    aa_offsets, render_shadow_aa, render_scene_aa)
from light_path_tracer_tpu.parallel.mesh import make_mesh


def test_aa_offsets():
    assert aa_offsets(1).shape == (1, 2)
    assert np.all(aa_offsets(1) == 0)
    o4 = aa_offsets(4)
    assert o4.shape == (4, 2)
    assert np.all(np.abs(o4) <= 0.5)
    o8 = aa_offsets(8)
    assert o8.shape == (8, 2)
    assert len({tuple(r) for r in np.round(o8, 6)}) == 8  # distinct


def test_shadow_aa_smooths_boundary():
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    img1, _ = render_shadow_aa(scene, (48, 48),
                               RenderConfig(dtype="float64"), aa_samples=1)
    img4, s4 = render_shadow_aa(scene, (48, 48),
                                RenderConfig(dtype="float64"), aa_samples=4)
    img1, img4 = np.asarray(img1), np.asarray(img4)
    # 1-sample image is binary; 4-sample must have fractional coverage
    # pixels on the shadow boundary.
    assert set(np.unique(img1)).issubset({0.0, 1.0})
    frac = (img4 > 0.01) & (img4 < 0.99)
    assert frac.sum() > 0
    # Interiors agree.
    assert abs(float(img1.mean()) - float(img4.mean())) < 0.02
    assert s4["aa_samples"] == 4
    assert s4["total_rays"] == 48 * 48 * 4


def test_shadow_aa_on_mesh_matches_single_device():
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    cfg = RenderConfig(dtype="float64")
    mesh = make_mesh()
    img_m, s_m = render_shadow_aa(scene, (24, 32), cfg, aa_samples=2,
                                  mesh=mesh)
    img_1, _ = render_shadow_aa(scene, (24, 32), cfg, aa_samples=2,
                                mesh=None)
    assert s_m["n_devices"] == 8
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_1))


def test_scene_aa_render():
    rng = np.random.default_rng(0)
    src = rng.random((32, 48, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    img, stats = render_scene_aa(scene, src, RenderConfig(dtype="float64"),
                                 aa_samples=2)
    img = np.asarray(img)
    assert img.shape == src.shape
    assert np.isfinite(img).all()
    assert stats["aa_samples"] == 2
