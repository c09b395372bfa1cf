"""Camera model tests: conventions, inverses, grid/scalar agreement."""

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu import camera


DIM = (120, 160)   # (height, width)
FOV = camera.fov_from_vertical(np.radians(40.0), DIM)


def test_psi_zero_frame():
    frame = camera.psi_frame((0.0, 0.0))
    np.testing.assert_allclose(frame.d, [0, 0, 1], atol=1e-15)
    np.testing.assert_allclose(frame.e_x, [1, 0, 0], atol=1e-15)
    np.testing.assert_allclose(frame.e_y, [0, 1, 0], atol=1e-15)
    assert frame.in_front


def test_psi_direction_signs():
    # psi_y > 0: BH up => -y; psi_x > 0: BH right => +x.
    d_up = camera.psi_to_bh_direction((0.2, 0.0))
    assert d_up[1] < 0 and abs(d_up[0]) < 1e-15
    d_right = camera.psi_to_bh_direction((0.0, 0.2))
    assert d_right[0] > 0 and abs(d_right[1]) < 1e-15


def test_psi_behind_camera():
    y, x, front = camera.psi_to_cam_projection((0.0, np.pi))
    assert not front and np.isnan(y)


def test_pixel_angle_roundtrip():
    rng = np.random.default_rng(11)
    for psi in [(0.0, 0.0), (0.05, -0.1)]:
        for _ in range(20):
            py = int(rng.integers(0, DIM[0]))
            px = int(rng.integers(0, DIM[1]))
            angles = camera.pixel_to_angles((py, px), DIM, FOV, psi=psi)
            back = camera.angles_to_pixel(angles, DIM, FOV, psi=psi)
            assert back == (py, px), (psi, (py, px), back)


def test_angles_to_pixel_clip_and_behind():
    # A ray at alpha=pi (behind) must return the sentinel.
    assert camera.angles_to_pixel((np.pi, 0.0), DIM, FOV) == (-1, -1)
    assert camera.angles_to_pixel((np.pi, 0.0), DIM, FOV, clip=True) == (0, 0)


def test_alpha_lookup_matches_scalar():
    psi = (0.03, -0.07)
    grid = np.asarray(camera.build_alpha_lookup(
        DIM, FOV, psi=psi, dtype=jnp.float64))
    for py, px in [(0, 0), (60, 80), (119, 159), (17, 102)]:
        alpha, _ = camera.pixel_to_angles((py, px), DIM, FOV, psi=psi)
        assert np.isclose(grid[py, px], alpha, atol=1e-6)


def test_theta_lookup_matches_scalar():
    psi = (0.03, -0.07)
    grid = np.asarray(camera.build_theta_lookup(
        DIM, FOV, psi=psi, dtype=jnp.float64))
    for py, px in [(3, 5), (60, 80), (100, 10)]:
        _, theta = camera.pixel_to_angles((py, px), DIM, FOV, psi=psi)
        assert np.isclose(grid[py, px], theta, atol=1e-6)


def test_alpha_lookup_center_on_axis():
    grid = np.asarray(camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64))
    # Pixel exactly at the optical center has alpha ~ 0.
    assert grid[DIM[0] // 2, DIM[1] // 2] < np.radians(0.5)
    # Rounding option bins the values.
    g2 = np.asarray(camera.build_alpha_lookup(
        DIM, FOV, decimals=2, dtype=jnp.float64))
    # Rounded to 2 decimals (idempotent up to fp representation).
    assert np.allclose(g2, np.round(g2, 2), atol=1e-9)
    assert len(np.unique(g2)) < g2.size / 10   # values are binned


def test_axis_refine_band():
    cols = camera.axis_refine_columns(DIM, FOV, psi=(0.0, 0.0),
                                      refine_frac=0.07)
    assert cols.shape == (DIM[1],)
    frac = cols.mean()
    assert 0.03 < frac < 0.15           # a narrow band
    w = DIM[1]
    assert cols[w // 2] or cols[w // 2 - 1]   # centered at BH column
    # BH behind camera -> no refinement.
    cols_b = camera.axis_refine_columns(DIM, FOV, psi=(0.0, np.pi))
    assert not cols_b.any()
