"""Strong-lensing image-position solver (images.find_point_images).

Headline oracles — weak-field point lens (Schwarzschild, r_obs = 1000M,
source at impact u in Einstein-angle units):

    theta+- = (sqrt(u^2+4) +- u)/2 * theta_E        (image positions)
    mu+-    = (u^2+2)/(2u sqrt(u^2+4)) +- 1/2       (magnifications,
                                                     mu- odd parity)
    dt      = 4M [u sqrt(u^2+4)/2
                  + ln((sqrt(u^2+4)+u)/(sqrt(u^2+4)-u))]   (Refsdal)

The traced values carry real strong-field corrections at b ~ 40-80 M,
so tolerances are a few percent (same regime as tests/test_timedelay_map).
"""

import numpy as np
import pytest

import jax

from light_path_tracer_tpu.images import (find_point_images,
                                          format_image_table)
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig

WEAK = SceneConfig(M=1.0, a=0.0, r_obs_mult=1000.0,
                   vertical_fov_deg=40.0)
CFG64 = RenderConfig(dtype="float64", precision="precise")
THETA_E = np.sqrt(4.0 / 1000.0)


def _oracle(u):
    s = np.sqrt(u * u + 4.0)
    theta_p = (s + u) / 2.0 * THETA_E
    theta_m = (s - u) / 2.0 * THETA_E
    mu_p = (u * u + 2.0) / (2.0 * u * s) + 0.5
    mu_m = (u * u + 2.0) / (2.0 * u * s) - 0.5
    dt = 4.0 * (u * s / 2.0 + np.log((s + u) / (s - u)))
    return theta_p, theta_m, mu_p, mu_m, dt


@pytest.fixture(scope="module")
def weak_u1():
    imgs, stats = find_point_images(WEAK, (THETA_E, 0.0),
                                    resolution=(256, 256), cfg=CFG64)
    return imgs, stats


def test_point_lens_two_images(weak_u1):
    imgs, stats = weak_u1
    assert stats["n_images"] == 2
    assert all(im.converged for im in imgs)
    # Tau ordering: the primary (same-side, even parity) arrives first.
    assert imgs[0].tau == 0.0
    assert imgs[1].tau > 0.0


def test_point_lens_positions(weak_u1):
    imgs, _ = weak_u1
    theta_p, theta_m, *_ = _oracle(1.0)
    primary, secondary = imgs
    assert primary.alpha_rad == pytest.approx(theta_p, rel=0.03)
    assert secondary.alpha_rad == pytest.approx(theta_m, rel=0.08)
    # Opposite screen sides of the BH.
    d_theta = abs(primary.screen_theta_rad - secondary.screen_theta_rad)
    assert d_theta == pytest.approx(np.pi, abs=0.02)


def test_point_lens_magnifications(weak_u1):
    imgs, stats = weak_u1
    _, _, mu_p, mu_m, _ = _oracle(1.0)
    primary, secondary = imgs
    assert primary.mu == pytest.approx(mu_p, rel=0.05)
    assert primary.parity == +1
    assert secondary.mu == pytest.approx(-mu_m, rel=0.05)
    assert secondary.parity == -1
    # Total magnification ~ the Paczynski curve A(u=1) = 3/sqrt(5).
    assert stats["total_abs_mu"] == pytest.approx(3.0 / np.sqrt(5.0),
                                                  rel=0.05)


def test_point_lens_delay_and_winding(weak_u1):
    imgs, _ = weak_u1
    *_, dt = _oracle(1.0)
    primary, secondary = imgs
    assert secondary.tau - primary.tau == pytest.approx(dt, rel=0.05)
    # The secondary crossed the axis behind the lens.
    assert primary.winding == 0
    assert secondary.winding == 1


@pytest.mark.slow
def test_far_source_demagnified_counter_image():
    """u = 3: the primary tends to the unlensed star (mu -> 1), the
    counter-image is strongly demagnified, and the delay exceeds u=1's."""
    imgs, stats = find_point_images(WEAK, (3.0 * THETA_E, 0.0),
                                    resolution=(256, 256), cfg=CFG64)
    theta_p, theta_m, mu_p, mu_m, dt = _oracle(3.0)
    assert stats["n_images"] == 2
    primary, secondary = imgs
    assert primary.mu == pytest.approx(mu_p, rel=0.05)
    assert abs(secondary.mu) < 0.05
    assert secondary.tau == pytest.approx(dt, rel=0.05)
    *_, dt1 = _oracle(1.0)
    assert dt > dt1


@pytest.mark.slow
def test_no_images_outside_fov():
    """A source far outside the traced field has no candidate cells."""
    imgs, stats = find_point_images(WEAK, (0.6, 0.0),
                                    resolution=(128, 128))
    assert imgs == []
    assert stats["n_images"] == 0
    assert stats["n_candidates"] == 0


@pytest.mark.slow
def test_kerr_frame_dragging_asymmetry():
    """a = 0.9 equatorial observer: frame dragging makes the lens map
    azimuthally asymmetric — a source at +beta_x and its mirror at
    -beta_x produce primaries at measurably different |alpha|; at a = 0
    the pair is exactly mirror-symmetric."""
    theta_e = np.sqrt(4.0 / 100.0)
    beta = 1.0 * theta_e

    def primary_alpha(a, bx):
        scene = SceneConfig(M=1.0, a=a, r_obs_mult=100.0,
                            vertical_fov_deg=50.0)
        imgs, stats = find_point_images(scene, (bx, 0.0),
                                        resolution=(192, 192),
                                        cfg=CFG64)
        assert stats["n_images"] >= 2, format_image_table(imgs, stats)
        # Brightest image = the primary.
        return max(imgs, key=lambda im: abs(im.mu)).alpha_rad

    kerr_plus = primary_alpha(0.9, +beta)
    kerr_minus = primary_alpha(0.9, -beta)
    schw_plus = primary_alpha(0.0, +beta)
    schw_minus = primary_alpha(0.0, -beta)
    assert schw_plus == pytest.approx(schw_minus, abs=2e-6)
    assert abs(kerr_plus - kerr_minus) > 1e-4


@pytest.mark.slow
def test_mesh_sharded_equality():
    """Coarse pass sharded over the virtual 8-device mesh: identical
    images (positions to float64 roundoff of the same refinement)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("rows",))
    beta = (THETA_E, 0.0)
    imgs0, _ = find_point_images(WEAK, beta, resolution=(128, 128),
                                 cfg=CFG64)
    imgs1, _ = find_point_images(WEAK, beta, resolution=(128, 128),
                                 cfg=CFG64, mesh=mesh)
    assert len(imgs0) == len(imgs1) == 2
    for a, b in zip(imgs0, imgs1):
        assert a.py == pytest.approx(b.py, abs=1e-6)
        assert a.px == pytest.approx(b.px, abs=1e-6)
        assert a.mu == pytest.approx(b.mu, rel=1e-6)


def test_format_table(weak_u1):
    imgs, stats = weak_u1
    text = format_image_table(imgs, stats)
    assert "mu" in text and "delay[M]" in text
    assert text.count("\n") == len(imgs) + 1
