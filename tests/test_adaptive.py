"""Adaptive-AA tests: edge scoring, budget compaction, equivalence to
uniform supersampling (aa.py) on the refined set."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu import camera
from light_path_tracer_tpu.aa import (
    aa_offsets, render_shadow_aa, render_scene_aa)
from light_path_tracer_tpu.adaptive import (
    edge_score, render_shadow_adaptive, render_scene_adaptive)


CFG = RenderConfig(dtype="float64", use_tb_symmetry=False)


def test_pixel_angles_at_matches_grid_builders():
    """The scattered-pixel angle helper must agree with the full-grid
    lookup builders at every pixel (same math, same op order)."""
    res = (13, 17)
    fov = camera.fov_from_vertical(np.radians(40.0), res)
    for psi, offset, boost in [
            ((0.0, 0.0), (0.0, 0.0), None),
            ((0.1, -0.2), (0.375, -0.125), None),
            ((0.05, 0.0), (-0.125, 0.25), (0.1, -0.05, 0.2))]:
        al_grid = camera.build_alpha_lookup(
            res, fov, psi=psi, dtype=jnp.float64,
            pixel_offset=offset, boost=boost)
        th_grid = camera.build_theta_lookup(
            res, fov, psi=psi, dtype=jnp.float64,
            pixel_offset=offset, boost=boost)
        py, px = jnp.meshgrid(jnp.arange(res[0]), jnp.arange(res[1]),
                              indexing="ij")
        al, th = camera.pixel_angles_at(
            py.ravel(), px.ravel(), res, fov, psi=psi,
            dtype=jnp.float64, pixel_offset=offset, boost=boost)
        np.testing.assert_allclose(np.asarray(al).reshape(res),
                                   np.asarray(al_grid), rtol=0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(th).reshape(res),
                                   np.asarray(th_grid), rtol=0, atol=1e-13)


def test_edge_score_finds_capture_boundary():
    fa = jnp.full((8, 8), 1.0).at[2:6, 2:6].set(jnp.nan)
    w = jnp.zeros((8, 8), jnp.int32)
    score = np.asarray(edge_score(fa, w))
    # Pixels adjacent to the NaN block (inside or outside) score at the
    # capture weight; far-away pixels score zero.
    assert score[2, 2] >= 1e6 and score[1, 3] >= 1e6
    assert score[0, 0] == 0.0 and score[7, 7] == 0.0


def test_edge_score_ranks_winding_over_gradient():
    fa = jnp.linspace(0.0, 1.0, 64).reshape(8, 8)
    w = jnp.zeros((8, 8), jnp.int32).at[:, 4:].set(1)
    score = np.asarray(edge_score(fa, w))
    winding_cols = score[:, 3:5].min()
    smooth = score[:, 0:2].max()
    assert winding_cols > 1e2 * smooth


@pytest.mark.slow
def test_shadow_adaptive_equals_uniform_aa():
    """With the default 5% budget the whole edge set is covered, so the
    adaptive shadow must equal the uniform-AA shadow EXACTLY (refined
    pixels trace the identical sample set; unrefined pixels are
    uniform-coverage regions where every sample agrees)."""
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    img_u, _ = render_shadow_aa(scene, (48, 48), CFG, aa_samples=4)
    img_a, st = render_shadow_adaptive(scene, (48, 48), CFG,
                                       aa_samples=4, refine_frac=0.10)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_u))
    assert st["total_rays"] < st["uniform_aa_rays"] / 2
    assert st["refined_pixels"] == int(0.10 * 48 * 48)


@pytest.mark.slow
def test_shadow_adaptive_tb_symmetry_matches_uniform():
    """With equatorial mirror symmetry ON (the default for theta_obs =
    pi/2, psi_y = 0), the adaptive shadow must still equal the uniform
    tb-AA shadow exactly: the base pass mirrors, the edge score folds
    onto the traced rows, and refined coverage scatters to both twins
    (the twin's sample set is the flipped-offset one, equal by the
    scene symmetry)."""
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    cfg = RenderConfig(dtype="float64")      # tb symmetry applies
    for height in (48, 49):                  # even + odd row counts
        img_u, _ = render_shadow_aa(scene, (height, 48), cfg,
                                    aa_samples=4)
        img_a, st = render_shadow_adaptive(scene, (height, 48), cfg,
                                           aa_samples=4,
                                           refine_frac=0.10)
        assert st["tb_symmetry"]
        assert st["total_rays"] < (height // 2 + 2) * 48 + 3 * (
            st["refined_pixels"] + 1)
        np.testing.assert_array_equal(np.asarray(img_a),
                                      np.asarray(img_u))


def test_shadow_adaptive_schwarzschild():
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    img_u, _ = render_shadow_aa(scene, (32, 32), CFG, aa_samples=2)
    img_a, _ = render_shadow_adaptive(scene, (32, 32), CFG,
                                      aa_samples=2, refine_frac=0.2)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_u))


@pytest.mark.slow
def test_scene_adaptive_full_budget_equals_uniform():
    """refine_frac=1.0 refines every pixel: the adaptive lensed render
    is the uniform-AA render (up to float accumulation order)."""
    rng = np.random.default_rng(3)
    src = rng.random((32, 32, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    img_u, _ = render_scene_aa(scene, src, CFG, aa_samples=4)
    img_a, st = render_scene_adaptive(scene, src, CFG,
                                      aa_samples=4, refine_frac=1.0)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_u),
                               rtol=0, atol=1e-6)
    assert st["refined_pixels"] == 32 * 32


@pytest.mark.slow
def test_scene_adaptive_partial_budget_converges_toward_uniform():
    """A partial budget must (a) reproduce uniform AA exactly on the
    refined pixels and (b) reduce the whole-image distance to uniform
    AA vs the single-sample base render."""
    # Smooth multi-scale texture (a white-noise source would make every
    # pixel a color edge — no structure for adaptivity to exploit).
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32),
                         indexing="ij")
    src = np.stack([0.5 + 0.5 * np.sin(2 * np.pi * (2 * xx + yy)),
                    0.5 + 0.5 * np.cos(2 * np.pi * (xx - 2 * yy)),
                    xx * yy], axis=-1).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    img_u, _ = render_scene_aa(scene, src, CFG, aa_samples=4)
    img_b, _ = render_scene_aa(scene, src, CFG, aa_samples=1)
    img_a, st = render_scene_adaptive(scene, src, CFG,
                                      aa_samples=4, refine_frac=0.25)
    img_u, img_b, img_a = (np.asarray(x) for x in (img_u, img_b, img_a))
    rmse_adaptive = float(np.sqrt(np.mean((img_a - img_u) ** 2)))
    rmse_base = float(np.sqrt(np.mean((img_b - img_u) ** 2)))
    # At 32^2 the strong-lensing band is a large image fraction, so the
    # top-quartile budget removes ~40% of the RMSE (more than its pixel
    # share); production grids concentrate the edges much further.
    assert rmse_adaptive < 0.75 * rmse_base
    # The refined pixels carry the exact uniform-AA sample set.
    idx = st["refined_idx"]
    np.testing.assert_allclose(img_a.reshape(-1, 3)[idx],
                               img_u.reshape(-1, 3)[idx],
                               rtol=0, atol=1e-6)
    assert st["total_rays"] == 32 * 32 + 3 * st["refined_pixels"]


def test_adaptive_rejects_single_sample():
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    with pytest.raises(ValueError, match="aa_samples"):
        render_shadow_adaptive(scene, (8, 8), CFG, aa_samples=1)
