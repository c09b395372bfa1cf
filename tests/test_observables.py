"""Visibility-domain observables: analytic Fourier oracles.

Each synthetic source has a closed-form visibility function; the
module must reproduce the amplitude law and locate the first null at
the textbook Bessel zero. The end-to-end test inverts a rendered
black-hole silhouette back to its known angular diameter 2*alpha_crit.
"""

import numpy as np
import pytest

from light_path_tracer_tpu import observables as obs


FOV = (np.radians(20.0), np.radians(20.0))
N = 128


def _grid(n=N, fov=FOV):
    """Tangent-plane (l, m) coordinate grids matching pixel_scales."""
    dm, dl = obs.pixel_scales((n, n), fov)
    x = (np.arange(n) - n / 2.0 + 0.5) * dl
    y = (np.arange(n) - n / 2.0 + 0.5) * dm
    return np.meshgrid(x, y)


def test_point_source_flat_amplitude():
    img = np.zeros((N, N))
    img[N // 2, N // 2] = 1.0
    vis, u, v = obs.visibilities(img, FOV)
    amp = np.abs(np.asarray(vis))
    assert np.allclose(amp, 1.0, atol=1e-6)


def test_total_flux_normalization_and_zero_image():
    img = np.random.default_rng(0).uniform(size=(N, N))
    vis, u, v = obs.visibilities(img, FOV)
    center = np.asarray(vis)[vis.shape[0] // 2, vis.shape[1] // 2]
    assert abs(center - 1.0) < 1e-6
    vis0, _, _ = obs.visibilities(np.zeros((N, N)), FOV)
    assert np.allclose(np.asarray(vis0), 0.0)


def test_rgb_luma_matches_gray():
    rng = np.random.default_rng(1)
    gray = rng.uniform(size=(32, 32))
    rgb = np.stack([gray, gray, gray], axis=-1)
    a, _, _ = obs.visibilities(gray, FOV)
    b, _, _ = obs.visibilities(rgb, FOV)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gaussian_amplitude_law():
    l, m = _grid()
    sigma = np.radians(0.8)
    img = np.exp(-(l**2 + m**2) / (2 * sigma**2))
    vis, u, v = obs.visibilities(img, FOV, pad=2)
    baselines, amp = obs.radial_profile(vis, u, v, n_bins=64)
    b = np.asarray(baselines)
    a = np.asarray(amp)
    expect = np.exp(-2 * np.pi**2 * sigma**2 * b**2)
    sel = expect > 1e-3  # above the discretization floor
    assert np.max(np.abs(a[sel] - expect[sel])) < 2e-2


def test_thin_ring_null_recovers_diameter():
    l, m = _grid()
    d = np.radians(6.0)  # ring angular diameter
    r = np.sqrt(l**2 + m**2)
    dm, dl = obs.pixel_scales((N, N), FOV)
    img = (np.abs(r - d / 2) < dl).astype(float)  # ~1-pixel-wide ring
    est, b_null, (bl, amp) = obs.shadow_diameter(img, FOV, model="ring",
                                                 pad=8, n_bins=512)
    assert np.isfinite(b_null)
    assert abs(est - d) / d < 0.03


def test_uniform_disk_null_recovers_diameter():
    l, m = _grid()
    d = np.radians(8.0)
    img = ((l**2 + m**2) < (d / 2) ** 2).astype(float)
    est, b_null, _ = obs.shadow_diameter(img, FOV, model="disk",
                                         pad=8, n_bins=512)
    assert np.isfinite(b_null)
    assert abs(est - d) / d < 0.03


def test_ring_vs_disk_kernels_ordering():
    # Same null baseline: the disk inversion reads a larger diameter
    # (j1_1 > j0_1) — users picking the wrong model bias high/low.
    assert (obs.disk_diameter_from_null(1.0)
            > obs.ring_diameter_from_null(1.0))


def test_first_null_no_minimum_is_nan():
    b = np.linspace(0, 10, 50)
    assert np.isnan(obs.first_null(b, np.exp(-b)))  # monotone decrease


def test_shadow_silhouette_end_to_end():
    """Render the analytic Kerr shadow, invert its silhouette's
    visibility null, and recover the known diameter 2*alpha_crit."""
    from light_path_tracer_tpu.pipeline import render_shadow
    from light_path_tracer_tpu.utils.config import SceneConfig
    from light_path_tracer_tpu import camera

    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0,
                        vertical_fov_deg=16.0)
    image, stats = render_shadow(scene, (128, 128), analytic=True)
    fov = camera.fov_from_vertical(scene.vertical_fov, (128, 128))
    silhouette = 1.0 - np.asarray(image)  # bright disk on dark sky
    est, b_null, _ = obs.shadow_diameter(silhouette, fov, model="disk",
                                         pad=8, n_bins=512)
    from light_path_tracer_tpu.models import make_metric
    d_true = 2.0 * make_metric(1.0, 0.0, 0.0).alpha_crit(100.0)
    assert np.isfinite(b_null)
    assert abs(est - d_true) / d_true < 0.05


def test_visibility_at_matches_fft_grid():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(64, 64))
    vis, u, v = obs.visibilities(img, FOV, pad=1)
    # Sample the exact DFT at a few FFT-grid points: must agree.
    iu, iv = 5, 9
    pts = np.array([[float(u[iu]), float(v[iv])]])
    direct = np.asarray(obs.visibility_at(img, FOV, pts))[0]
    grid = np.asarray(vis)[iv, iu]
    assert abs(direct - grid) < 1e-8


def test_closure_phase_point_source_zero():
    img = np.zeros((N, N))
    img[N // 2 + 7, N // 2 - 11] = 1.0  # OFF-center: raw phases huge
    b1 = (40.0, 10.0)
    b2 = (-15.0, 25.0)
    cp = obs.closure_phase(img, FOV, b1, b2)
    assert abs(cp) < 1e-6


def test_closure_phase_symmetric_zero_or_pi():
    l, m = _grid()
    d = np.radians(6.0)
    img = ((l**2 + m**2) < (d / 2) ** 2).astype(float)  # centro-symm
    cp = obs.closure_phase(img, FOV, (30.0, 5.0), (-10.0, 12.0))
    assert min(abs(cp), abs(abs(cp) - np.pi)) < 1e-6


def test_closure_phase_two_point_analytic():
    # Two unequal points: B(b1, b2) has a closed form; closure phase
    # must match it exactly.
    img = np.zeros((N, N))
    dm, dl = obs.pixel_scales((N, N), FOV)
    p1 = (N // 2 + 4, N // 2 + 10)   # (row, col), flux 2
    p2 = (N // 2 - 9, N // 2 - 3)    # flux 1
    img[p1], img[p2] = 2.0, 1.0

    def v_of(b):
        u_, v_ = b
        tot = 0
        for (py, px), f in ((p1, 2.0), (p2, 1.0)):
            ll = (px - N / 2.0) * dl
            mm = (py - N / 2.0) * dm
            tot += f * np.exp(-2j * np.pi * (u_ * ll + v_ * mm))
        return tot / 3.0

    b1, b2 = (35.0, -8.0), (12.0, 20.0)
    b3 = (-(b1[0] + b2[0]), -(b1[1] + b2[1]))
    expect = np.angle(v_of(b1) * v_of(b2) * v_of(b3))
    cp = obs.closure_phase(img, FOV, b1, b2)
    # Compare on the circle.
    diff = np.angle(np.exp(1j * (cp - expect)))
    assert abs(diff) < 1e-6


def test_pixel_scales_match_camera_focal_lengths():
    """pixel_scales must be the exact reciprocal of the pinhole focal
    lengths the render geometry uses (camera.focal_lengths) — the
    visibility pixel scale and the camera model share one definition.
    Non-square image + unequal FOV so an axis swap would be caught."""
    from light_path_tracer_tpu.camera import focal_lengths
    shape = (96, 160)
    fov = (np.radians(24.0), np.radians(14.0))  # (horizontal, vertical)
    dm, dl = obs.pixel_scales(shape, fov)
    fx, fy = focal_lengths(shape, fov)
    np.testing.assert_allclose(dl, 1.0 / fx, rtol=0, atol=0)
    np.testing.assert_allclose(dm, 1.0 / fy, rtol=0, atol=0)
    # And both equal the closed form 2*tan(fov/2)/npix per axis.
    np.testing.assert_allclose(
        dl, 2.0 * np.tan(fov[0] / 2.0) / shape[1], rtol=1e-12)
    np.testing.assert_allclose(
        dm, 2.0 * np.tan(fov[1] / 2.0) / shape[0], rtol=1e-12)


def test_centroid_point_source_matches_camera_convention():
    """A point source at pixel (r, c) must report exactly that pixel's
    camera-ray tangent coordinates x=(c - W/2)/fx, y=(r - H/2)/fy."""
    from light_path_tracer_tpu.camera import focal_lengths
    img = np.zeros((N, N), np.float64)
    r, c = 37, 90
    img[r, c] = 2.5
    track = np.asarray(obs.centroid_track(img, FOV))
    fx, fy = focal_lengths((N, N), FOV)
    assert track.shape == (2,)
    assert np.isclose(track[0], (c - N / 2.0) / fx, atol=1e-12)
    assert np.isclose(track[1], (r - N / 2.0) / fy, atol=1e-12)


def test_centroid_track_shapes_and_rgb():
    """(T, H, W) input -> (T, 2); RGB collapses through the same luma
    weights as intensity(); a symmetric frame centers at ~0."""
    rng = np.random.default_rng(1)
    frames = rng.uniform(size=(4, 32, 32))
    track = np.asarray(obs.centroid_track(frames, FOV))
    assert track.shape == (4, 2)
    # A uniform frame centers at the pixel-grid mean, which sits half a
    # pixel off W/2 in the camera convention (indices 0..N-1, center
    # N/2): mean = (N-1)/2 - N/2 = -0.5 px exactly.
    from light_path_tracer_tpu.camera import focal_lengths
    fx, fy = focal_lengths((32, 32), FOV)
    sym = np.ones((32, 32))
    t0 = np.asarray(obs.centroid_track(sym, FOV))
    assert np.allclose(t0, [-0.5 / fx, -0.5 / fy], atol=1e-9)
    # RGB with flux only in one channel == grayscale of that channel.
    rgbf = np.zeros((2, 32, 32, 3))
    rgbf[..., 1] = frames[:2]
    tr_rgb = np.asarray(obs.centroid_track(rgbf, FOV))
    tr_gray = np.asarray(obs.centroid_track(frames[:2], FOV))
    np.testing.assert_allclose(tr_rgb, tr_gray, atol=1e-12)


@pytest.mark.slow
def test_centroid_flare_wobble_physics():
    """Volumetric flare movie: the photocenter wanders (the GRAVITY
    wobble), by LESS than the blob's orbital angular diameter (the
    steady crescent + the opposite-side secondary image pull it back),
    and the track is periodic over one orbit."""
    from light_path_tracer_tpu import camera
    from light_path_tracer_tpu.disk import keplerian_omega
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                  render_volumetric_movie)

    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(60.0),
                        vertical_fov_deg=16.0)
    riaf = RIAFConfig(spot_amp=8.0, spot_r=6.0)
    period = abs(2.0 * np.pi / keplerian_omega(1.0, 0.9, 6.0))
    times = [period * k / 4 for k in range(4)] + [period]
    frames, st = render_volumetric_movie(scene, (48, 48), times,
                                         RenderConfig(backend="xla"),
                                         riaf)
    fov = camera.fov_from_vertical(scene.vertical_fov, (48, 48))
    track = np.asarray(obs.centroid_track(st["emission"], fov))
    assert track.shape == (5, 2)
    ext = np.ptp(track[:4], axis=0)
    orbit_diameter = 2.0 * 6.0 / scene.r_obs
    assert ext.max() > 1e-5          # it moves
    assert ext.max() < orbit_diameter  # less than the blob's own orbit
    # One full orbit closes the track (same pattern phase).
    np.testing.assert_allclose(track[4], track[0], atol=1e-6)
