"""Lensing magnification maps (render.magnification_map).

Oracle: point-lens physics. For an observer at r_obs = 100M the
Einstein radius of a perfectly aligned far source is near
sqrt(4M/r_obs) ~ 11.5 deg, so a 40-deg FOV contains the full critical
structure: mu -> +1 in the far field, mu -> infinity on the tangential
critical curve, odd (negative-parity) demagnified images inside it,
NaN in the shadow."""

import numpy as np
import pytest

from light_path_tracer_tpu.pipeline import render_magnification
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig


@pytest.fixture(scope="module")
def mu_map():
    scene = SceneConfig(M=1.0, a=0.0, vertical_fov_deg=40.0)
    mu, stats = render_magnification(
        scene, (192, 192), RenderConfig(dtype="float32", backend="xla"))
    return np.asarray(mu), stats


def test_far_field_calibrates_at_unity(mu_map):
    mu, _ = mu_map
    edge = np.concatenate([mu[0, :], mu[-1, :], mu[:, 0], mu[:, -1]])
    assert np.isfinite(edge).all()
    np.testing.assert_allclose(edge, 1.0, atol=0.15)


def test_critical_curve_and_parity(mu_map):
    mu, stats = mu_map
    fin = np.isfinite(mu)
    # Divergence on the tangential critical curve.
    assert np.abs(mu[fin]).max() > 100.0
    assert stats["mu_abs_max"] > 100.0
    # Odd images inside the Einstein ring: negative parity, demagnified.
    row = mu[96]
    ang_deg = (np.arange(192) - 96) / 96.0 * 20.0
    inside = np.isfinite(row) & (np.abs(ang_deg) < 9.0)
    assert (row[inside] < 0).all()
    assert (np.abs(row[inside]) < 1.0).all()
    outside = np.abs(ang_deg) > 15.0
    assert (row[outside] > 0).all()
    # Sign change happens near the Einstein radius sqrt(4/100) rad.
    theta_e = np.degrees(np.sqrt(4.0 / 100.0))
    right = row[96:]
    ang_r = ang_deg[96:]
    flip = np.where(np.isfinite(right[:-1]) & np.isfinite(right[1:])
                    & (np.sign(right[:-1]) != np.sign(right[1:]))
                    & (ang_r[:-1] > 5.0))[0]
    assert flip.size >= 1
    assert abs(ang_r[flip[0]] - theta_e) < 2.0
    # Shadow pixels are NaN.
    assert stats["shadow_pixels"] > 0
    assert not np.isfinite(mu[96, 96])


def test_rotational_symmetry(mu_map):
    mu, _ = mu_map
    # a = 0: the map is symmetric under the grid's 90-degree rotations.
    fin = np.isfinite(mu) & np.isfinite(np.rot90(mu))
    d = np.abs(mu - np.rot90(mu))[fin]
    scale = np.abs(mu[fin]) + 1.0
    assert np.median(d / scale) < 0.05


@pytest.mark.slow
def test_kerr_map_runs_and_breaks_symmetry():
    scene = SceneConfig(M=1.0, a=0.9, vertical_fov_deg=40.0)
    mu, stats = render_magnification(
        scene, (96, 96), RenderConfig(dtype="float32", backend="xla"))
    mu = np.asarray(mu)
    fin = np.isfinite(mu)
    assert fin.sum() > 1000 and np.abs(mu[fin]).max() > 20.0
    # Frame dragging: left/right asymmetry of |mu| along the equator.
    row = mu[48]
    left, right = row[:48], row[:47:-1]
    ok = np.isfinite(left) & np.isfinite(right)
    assert not np.allclose(left[ok], right[ok], rtol=1e-3)
