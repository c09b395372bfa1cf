"""Renderer semantics tests: shadow, winding palette, sentinel, wrap."""

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu.render import render_lensed_image, WINDING_COLORS
from light_path_tracer_tpu import camera

DIM = (32, 48)
FOV = camera.fov_from_vertical(np.radians(40.0), DIM)


def _mk_source(rgb=True, seed=0):
    rng = np.random.default_rng(seed)
    shape = DIM + (3,) if rgb else DIM
    return rng.random(shape).astype(np.float32)


def _render(fa, wind=None, src=None, **kw):
    if src is None:
        src = _mk_source()
    if wind is None:
        wind = np.zeros(DIM, np.uint16)
    return np.asarray(render_lensed_image(
        src, None, jnp.asarray(fa), jnp.asarray(wind), 0.05, FOV, **kw))


def test_nan_stays_black():
    fa = np.full(DIM, np.nan, np.float32)
    out = _render(fa)
    assert np.all(out == 0.0)


def test_winding_colors():
    fa = np.full(DIM, np.nan, np.float32)
    fa[4, 5] = np.pi / 2 + 0.2     # escaped but deflected past pi/2
    wind = np.zeros(DIM, np.uint16)
    wind[4, 5] = 3
    out = _render(fa, wind)
    np.testing.assert_allclose(out[4, 5], WINDING_COLORS[3], atol=1e-6)
    # Winding index clipped to the palette.
    wind[4, 5] = 999
    out = _render(fa, wind)
    np.testing.assert_allclose(out[4, 5], WINDING_COLORS[-1], atol=1e-6)


def test_winding_grayscale_luma():
    src = _mk_source(rgb=False)
    fa = np.full(DIM, np.nan, np.float32)
    fa[2, 2] = 2.0
    wind = np.zeros(DIM, np.uint16)
    wind[2, 2] = 1
    out = _render(fa, wind, src=src)
    luma = WINDING_COLORS[1] @ np.array([0.299, 0.587, 0.114])
    assert np.isclose(out[2, 2], luma, atol=1e-6)
    assert out.ndim == 2


def test_undeflected_identity_center():
    """A ray with final_alpha equal to its own pixel alpha maps back to
    (approximately) its own pixel."""
    src = _mk_source()
    alpha = np.asarray(camera.build_alpha_lookup(DIM, FOV,
                                                 dtype=jnp.float64))
    out = _render(alpha.astype(np.float32), src=src)
    # Away from edges the gather should reproduce the source.
    inner = (slice(8, 24), slice(12, 36))
    match = np.isclose(out[inner], src[inner], atol=1e-6).all(axis=-1)
    assert match.mean() > 0.95


def test_magenta_sentinel_oob():
    src = _mk_source()
    fa = np.full(DIM, np.nan, np.float32)
    fa[10, 10] = np.pi / 2 - 1e-3   # escaped, nearly sideways -> off image
    out = _render(fa, src=src)
    np.testing.assert_allclose(out[10, 10], [1.0, 0.0, 1.0], atol=1e-6)


def test_loop_around_wraps():
    src = _mk_source()
    fa = np.full(DIM, np.nan, np.float32)
    fa[10, 10] = np.pi / 2 - 1e-3
    out = _render(fa, src=src, render_loop_around=True)
    # Wrapped: must equal *some* source pixel, not magenta.
    px = out[10, 10]
    assert not np.allclose(px, [1.0, 0.0, 1.0])
    flat = src.reshape(-1, 3)
    assert np.isclose(flat, px[None, :], atol=1e-6).all(axis=1).any()


def test_two_channel_sentinel():
    src = np.stack([_mk_source(rgb=False), _mk_source(rgb=False, seed=1)],
                   axis=-1)
    fa = np.full(DIM, np.nan, np.float32)
    fa[5, 5] = np.pi / 2 - 1e-3
    out = _render(fa, src=src)
    np.testing.assert_allclose(out[5, 5], [1.0, 0.0], atol=1e-6)


def test_ring_decomposition_partitions_image():
    """Ring masks partition every pixel exactly once; composite colors
    shadow black and direct image gray (shadow --rings capability)."""
    import numpy as np
    import jax.numpy as jnp
    from light_path_tracer_tpu.render import ring_decomposition

    rng = np.random.default_rng(3)
    H, W = 24, 20
    fa = rng.uniform(0.0, 1.0, (H, W)).astype(np.float32)
    fa[0:4, 0:4] = np.nan                       # shadow
    wind = rng.integers(0, 6, (H, W)).astype(np.uint16)

    masks, comp = ring_decomposition(jnp.asarray(fa), jnp.asarray(wind),
                                     max_order=3)
    m = np.asarray(masks)
    assert m.shape == (5, H, W)
    # exact partition
    np.testing.assert_array_equal(m.sum(axis=0), np.ones((H, W)))
    # shadow mask is the NaN set
    np.testing.assert_array_equal(m[-1], np.isnan(fa))
    # orders agree with winding
    esc = ~np.isnan(fa)
    np.testing.assert_array_equal(m[0], esc & (wind == 0))
    np.testing.assert_array_equal(m[3], esc & (wind >= 3))
    c = np.asarray(comp)
    assert (c[np.isnan(fa)] == 0.0).all()                      # black
    assert (c[esc & (wind == 0)] == 0.85).all()                # gray


def test_render_scene_rings_layers_partition_image():
    """Lensed ring decomposition: the order layers are disjoint and sum
    back to the full lensed image."""
    import numpy as np
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.pipeline import render_scene_rings

    rng = np.random.default_rng(4)
    src = rng.uniform(0.1, 0.9, (32, 40, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    layers, full, stats = render_scene_rings(
        scene, src, RenderConfig(dtype="float64"), max_order=2)
    layers, full = np.asarray(layers), np.asarray(full)
    assert layers.shape == (4, 32, 40, 3)
    np.testing.assert_allclose(layers.sum(axis=0), full, atol=1e-6)
    # Disjoint: at most one layer nonzero per pixel (shadow layer is 0).
    nonzero = (layers.sum(axis=-1) > 0).sum(axis=0)
    assert nonzero.max() <= 1
    assert stats["order_pixels"]["order_0"] > 100
    assert stats["order_pixels"]["order_1"] > 0


def test_bilinear_sampling_matches_nearest_at_texel_centers():
    """sampling='bilinear': exact agreement with nearest when source
    positions land on texel centers, intermediate values otherwise,
    identical sentinel classification, and continuity (no texel-flip
    jumps): perturbing final_alpha by eps moves the bilinear result by
    O(eps) while nearest can jump a full texel."""
    import jax.numpy as jnp
    from light_path_tracer_tpu.render import render_lensed_image

    H, W = 24, 32
    rng = np.random.default_rng(2)
    src = rng.random((H, W, 3)).astype(np.float32)
    fov = (0.9, 0.7)
    al = jnp.zeros((H, W), jnp.float32)
    wd = jnp.zeros((H, W), jnp.uint16)
    fa = jnp.asarray(rng.uniform(0.01, 0.3, (H, W)), jnp.float32)
    th = jnp.asarray(rng.uniform(0, 2 * np.pi, (H, W)), jnp.float32)

    near = np.asarray(render_lensed_image(
        src, al, fa, wd, 0.05, fov, theta_lookup=th))
    bil = np.asarray(render_lensed_image(
        src, al, fa, wd, 0.05, fov, theta_lookup=th,
        sampling="bilinear"))
    sent_n = (near == [1.0, 0.0, 1.0]).all(-1)
    sent_b = (bil == [1.0, 0.0, 1.0]).all(-1)
    assert np.array_equal(sent_n, sent_b)   # same sentinel classification
    # Bilinear output is bounded by the texture range (a convex blend).
    assert bil[~sent_b].min() >= src.min() - 1e-6
    assert bil[~sent_b].max() <= src.max() + 1e-6

    # Continuity: a 1e-5-rad perturbation changes bilinear pixels by
    # O(1e-3) at most, while nearest is allowed to flip whole texels.
    fa_p = fa + 1e-5
    bil_p = np.asarray(render_lensed_image(
        src, al, fa_p, wd, 0.05, fov, theta_lookup=th,
        sampling="bilinear"))
    near_p = np.asarray(render_lensed_image(
        src, al, fa_p, wd, 0.05, fov, theta_lookup=th))
    stable = sent_b & ((bil_p == [1.0, 0.0, 1.0]).all(-1) == sent_b)
    keep = ~sent_b & ~(near_p == [1.0, 0.0, 1.0]).all(-1)
    d_bil = np.abs(bil_p - bil)[keep].max()
    d_near = np.abs(near_p - near)[keep].max()
    assert d_bil < 0.05, d_bil            # continuous response
    assert d_near > d_bil or d_near == 0  # nearest jumps or is static

    # Invalid sampling mode raises.
    import pytest
    with pytest.raises(ValueError):
        render_lensed_image(src, al, fa, wd, 0.05, fov,
                            theta_lookup=th, sampling="cubic")
