"""Golden parity tests against the ACTUAL reference implementation.

The reference at /root/reference is imported read-only and driven as a
test oracle (its documented pure-Python fallback path executes, since
numba is absent). These tests are the direct check of the acceptance gate
"rendered images match the NumPy/SciPy reference" (BASELINE.md).

Skipped automatically when the reference checkout is unavailable.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

REF_PATH = "/root/reference"

ref = pytest.importorskip(
    "metrics",
    reason="reference checkout not available") if (
        sys.path.insert(0, REF_PATH) or True) else None

from light_path_tracer_tpu.models import Schwarzschild, Kerr  # noqa: E402
from light_path_tracer_tpu.ops import (  # noqa: E402
    trace_rays_schwarzschild, trace_rays_kerr)
from light_path_tracer_tpu.render import render_lensed_image  # noqa: E402
from light_path_tracer_tpu import camera  # noqa: E402

R_OBS = 100.0


def test_schwarzschild_final_alpha_matches_reference():
    """Same algorithm, same constants: per-ray agreement ~1e-9."""
    m = Schwarzschild(M=1.0)
    ref_m = ref.Schwarzschild(M=1.0)
    ac = m.alpha_crit(R_OBS)
    angles = np.linspace(0.1 * ac, 5.0 * ac, 60)

    ours = trace_rays_schwarzschild(
        m, R_OBS, jnp.asarray(angles, jnp.float64))
    fa_ref = np.full(angles.shape, np.nan)
    w_ref = np.zeros(angles.shape, np.int64)
    ref_m.trace_rays_batch(R_OBS, angles, fa_ref, w_ref)

    fa_us = np.asarray(ours.final_alpha)
    assert (np.isnan(fa_us) == np.isnan(fa_ref)).all()
    ok = ~np.isnan(fa_ref)
    np.testing.assert_allclose(fa_us[ok], fa_ref[ok], atol=1e-9)
    np.testing.assert_array_equal(
        np.asarray(ours.n_half_orbits)[ok], w_ref[ok])


def test_kerr_final_alpha_matches_reference_linear_mode():
    """Bug-for-bug mode (linear event lerp, f64 reference tolerances) vs
    the reference's own adaptive tracer on a pixel-grid sample."""
    m = Kerr(M=1.0, a=0.9)
    ref_m = ref.Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(2)
    n = 80
    angles = rng.uniform(0.2 * ac, 4.0 * ac, n)
    screens = rng.uniform(-np.pi, np.pi, n)

    # Bug-for-bug mode: linear event lerp AND the reference's theta
    # polar coordinate (the mu production form integrates the same
    # geodesics but with a different step sequence, so per-ray values
    # agree only to integration tolerance, not fp-order).
    ours = trace_rays_kerr(
        m, R_OBS, jnp.asarray(angles, jnp.float64),
        jnp.asarray(screens, jnp.float64), np.pi / 2,
        jnp.zeros(n, bool), 5000.0, 200000, event_interp="linear",
        formulation="theta")

    fa_ref = np.full(n, np.nan)
    w_ref = np.zeros(n, np.int64)
    ref_m.trace_rays_batch(R_OBS, angles, screens, np.pi / 2,
                           np.zeros(n, bool), fa_ref, w_ref)

    fa_us = np.asarray(ours.final_alpha)
    nan_agree = (np.isnan(fa_us) == np.isnan(fa_ref))
    # Capture/escape classification agrees except possibly a grazer.
    assert nan_agree.mean() > 0.97
    both = ~np.isnan(fa_us) & ~np.isnan(fa_ref)
    d = np.abs(fa_us[both] - fa_ref[both])
    # Identical algorithm; fp-order differences only amplify for the few
    # near-critical rays.
    assert np.median(d) < 1e-7
    assert np.mean(d < 1e-3) > 0.9
    rmse = np.sqrt(np.mean(np.minimum(d, 0.1) ** 2))
    assert rmse < 1e-2


def test_renderer_matches_reference_renderer():
    """Our jitted renderer vs the reference's numpy renderer on the SAME
    lookup tables: image RMSE << 1e-3 (acceptance gate)."""
    import image_lens as ref_il

    rng = np.random.default_rng(4)
    H, W = 40, 56
    src = rng.random((H, W, 3)).astype(np.float32)
    fov = camera.fov_from_vertical(np.radians(40.0), (H, W))
    psi = (0.0, 0.0)

    alpha = np.asarray(camera.build_alpha_lookup(
        (H, W), fov, psi=psi, dtype=jnp.float64)).astype(np.float32)
    # Synthesize a lookup with every semantic case: NaN shadow, winding
    # > pi/2, normal escape, out-of-FOV magenta.
    fa = alpha * 1.03
    fa[5:10, 5:10] = np.nan
    fa[20:24, 30:34] = np.pi / 2 + 0.3
    fa[0:3, 50:55] = np.pi / 2 - 1e-3
    winding = np.zeros((H, W), np.uint16)
    winding[20:24, 30:34] = np.arange(16).reshape(4, 4) % 6

    img_ref = ref_il.render_lensed_image(
        src, alpha, fa.astype(np.float32), winding, 0.05, fov,
        render_loop_around=False, psi=psi)
    img_us = np.asarray(render_lensed_image(
        src, alpha, jnp.asarray(fa, jnp.float32), jnp.asarray(winding),
        0.05, fov, render_loop_around=False, psi=psi))

    rmse = np.sqrt(np.mean((img_ref - img_us) ** 2))
    assert rmse < 1e-5, rmse

    # Loop-around mode too.
    img_ref2 = ref_il.render_lensed_image(
        src, alpha, fa.astype(np.float32), winding, 0.05, fov,
        render_loop_around=True, psi=psi)
    img_us2 = np.asarray(render_lensed_image(
        src, alpha, jnp.asarray(fa, jnp.float32), jnp.asarray(winding),
        0.05, fov, render_loop_around=True, psi=psi))
    rmse2 = np.sqrt(np.mean((img_ref2 - img_us2) ** 2))
    assert rmse2 < 1e-5, rmse2


def test_camera_matches_reference_camera():
    """pixel<->angle conversions agree with the reference's for random
    pixels and off-axis psi."""
    import image_lens as ref_il

    dim = (48, 72)
    fov = camera.fov_from_vertical(np.radians(35.0), dim)
    psi = (0.04, -0.09)
    rng = np.random.default_rng(8)
    for _ in range(25):
        py = int(rng.integers(0, dim[0]))
        px = int(rng.integers(0, dim[1]))
        a_us, t_us = camera.pixel_to_angles((py, px), dim, fov, psi=psi)
        a_rf, t_rf = ref_il.pixel_to_angles((py, px), dim, fov, psi=psi)
        assert np.isclose(a_us, a_rf, atol=1e-12)
        assert np.isclose(t_us, t_rf, atol=1e-12)
        assert (camera.angles_to_pixel((a_us, t_us), dim, fov, psi=psi)
                == ref_il.angles_to_pixel((a_rf, t_rf), dim, fov, psi=psi))

    # Grid builders agree with the reference's vectorized builder.
    g_us = np.asarray(camera.build_alpha_lookup(dim, fov, psi=psi,
                                                dtype=jnp.float64))
    g_rf = ref_il.build_alpha_lookup(dim, fov, psi=psi)
    np.testing.assert_allclose(g_us, g_rf, atol=1e-6)


@pytest.mark.slow
def test_e2e_kerr_image_matches_reference_pipeline():
    """Capstone: full small Kerr lensed render vs the reference pipeline
    run end-to-end (its pure-Python fallback), RMSE gate on the image."""
    import image_lens as ref_il

    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.pipeline import render_scene

    H, W = 24, 24
    rng = np.random.default_rng(5)
    src = rng.random((H, W, 3)).astype(np.float32)
    a = 0.9
    fov = camera.fov_from_vertical(np.radians(40.0), (H, W))

    # --- reference pipeline (driven directly, no file IO) ---
    ref_m = ref.Kerr(M=1.0, a=a)
    alpha_lookup = ref_il.build_alpha_lookup((H, W), fov)
    fa_ref, w_ref, _tot, _traced = ref_il.precompute_final_alpha_lookup_2d(
        alpha_lookup, fov, ref_m.alpha_crit(R_OBS), R_OBS, ref_m)
    img_ref = ref_il.render_lensed_image(
        src, alpha_lookup, fa_ref, w_ref, ref_m.alpha_crit(R_OBS), fov)

    # --- our pipeline (f64, bug-for-bug event + coordinate mode) ---
    scene = SceneConfig(M=1.0, a=a, r_obs_mult=100.0)
    out = render_scene(scene, src, RenderConfig(
        dtype="float64", event_interp="linear", formulation="theta",
        chunk_size=None))
    img_us = np.asarray(out.image)

    fa_us = np.asarray(out.precompute.final_alpha)
    shadow_agree = (np.isnan(fa_us) == np.isnan(fa_ref)).mean()
    assert shadow_agree > 0.98

    rmse = np.sqrt(np.mean((img_us - img_ref) ** 2))
    # The acceptance gate (BASELINE.md): image RMSE < 1e-3. Identical
    # algorithms; only fp-order differences on grazing pixels remain.
    assert rmse < 1e-3, f"image RMSE {rmse}"
