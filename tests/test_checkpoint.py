"""Lookup-table checkpoint cache tests."""

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.checkpoint import (
    cache_key, cached_precompute, save_lookup, load_lookup, cache_path)
from light_path_tracer_tpu import camera


def test_cache_key_sensitivity():
    scene = SceneConfig(M=1.0, a=0.5)
    cfg = RenderConfig()
    dim, fov = (32, 32), (0.7, 0.7)
    k0 = cache_key(scene, cfg, dim, fov)
    assert k0 == cache_key(scene, cfg, dim, fov)
    # Any physics/numerics change must change the key...
    assert k0 != cache_key(SceneConfig(M=1.0, a=0.6), cfg, dim, fov)
    assert k0 != cache_key(scene, RenderConfig(dtype="float64"), dim, fov)
    assert k0 != cache_key(scene, cfg, (64, 64), fov)
    assert k0 != cache_key(scene, cfg, dim, (0.8, 0.7))
    # ...but a render-only knob must NOT (tables are reusable).
    assert k0 == cache_key(scene, RenderConfig(render_loop_around=True),
                           dim, fov)


def test_save_load_roundtrip(tmp_path):
    fa = np.random.default_rng(0).random((8, 8)).astype(np.float32)
    fa[0, 0] = np.nan
    w = np.arange(64, dtype=np.uint16).reshape(8, 8)
    path = str(tmp_path / "x.npz")
    save_lookup(path, fa, w, {"traced_rays": 64})
    fa2, w2, meta = load_lookup(path)
    np.testing.assert_array_equal(np.asarray(fa2), fa)
    np.testing.assert_array_equal(np.asarray(w2), w)
    assert meta["traced_rays"] == 64
    assert load_lookup(str(tmp_path / "missing.npz")) is None
    # Corrupt file -> None, not a crash.
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not a zip")
    assert load_lookup(str(bad)) is None


def test_cached_precompute_hit_matches_miss(tmp_path):
    scene = SceneConfig(M=1.0, a=0.7, r_obs_mult=100.0)
    cfg = RenderConfig(dtype="float64", chunk_size=None)
    dim = (16, 20)
    fov = camera.fov_from_vertical(scene.vertical_fov, dim)
    pre1, hit1 = cached_precompute(scene, cfg, dim, fov,
                                   cache_dir=str(tmp_path))
    pre2, hit2 = cached_precompute(scene, cfg, dim, fov,
                                   cache_dir=str(tmp_path))
    assert not hit1 and hit2
    np.testing.assert_array_equal(np.asarray(pre1.final_alpha),
                                  np.asarray(pre2.final_alpha))
    np.testing.assert_array_equal(np.asarray(pre1.winding),
                                  np.asarray(pre2.winding))
    assert pre2.traced_rays == pre1.traced_rays
    # A different spin misses.
    scene3 = SceneConfig(M=1.0, a=0.71, r_obs_mult=100.0)
    _pre3, hit3 = cached_precompute(scene3, cfg, dim, fov,
                                    cache_dir=str(tmp_path))
    assert not hit3
