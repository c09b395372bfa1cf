"""Image time delays (pipeline.render_time_delay) — the time-delay-
cosmography observable, and the side-exact escape chart
(render.world_escape_beta) it depends on.

Headline oracle: for a weak-field point lens the delay between the two
images of a source at impact parameter u (Einstein-angle units) is

    dt = 4M [ u sqrt(u^2+4) / 2 + ln((sqrt(u^2+4)+u)/(sqrt(u^2+4)-u)) ]

(Refsdal 1964 / standard Fermat-potential result with D_ls/D_s -> 1).
The traced dt must match, converging toward the formula as u grows
(the residual at small u is the real strong-field correction at
b ~ 50-80 M plus finite pixel pairing).

The side-exactness pin: the reference's (final_alpha, theta) chart
(metrics.py:363-416) collapses which azimuthal side a crossing ray
escaped on; world_escape_beta must agree with that chart on
NON-crossing rays (convention pin) and place axis-crossing rays on
the OPPOSITE side (physics pin).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from light_path_tracer_tpu.pipeline import render_time_delay
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu import camera
from light_path_tracer_tpu.render import (_source_plane_coords,
                                          world_escape_beta)
from light_path_tracer_tpu.models import Kerr
from light_path_tracer_tpu.ops.kerr_trace import (trace_rays_surface,
                                                  ESCAPED)

WEAK = SceneConfig(M=1.0, a=0.0, r_obs_mult=1000.0,
                   vertical_fov_deg=40.0)
CFG = RenderConfig(dtype="float64", precision="precise")


def point_lens_delay(u):
    s = np.sqrt(u * u + 4.0)
    return 4.0 * (u * s / 2.0 + np.log((s + u) / (s - u)))


@pytest.fixture(scope="module")
def delay_map():
    tau, stats = render_time_delay(WEAK, (256, 256), CFG)
    return np.asarray(tau), stats


def test_point_lens_delays(delay_map):
    tau, stats = delay_map
    bx, by = stats["beta_x"], stats["beta_y"]
    theta_e = np.sqrt(4.0 / 1000.0)
    half = tau.shape[1] // 2
    prev = 0.0
    for u, tol in ((1.0, 0.10), (1.5, 0.08), (2.0, 0.06)):
        b0 = u * theta_e
        d2 = (bx - b0) ** 2 + by ** 2
        d2 = np.where(np.isfinite(d2), d2, np.inf)
        right = d2.copy()
        right[:, :half] = np.inf       # primary image (same side)
        left = d2.copy()
        left[:, half:] = np.inf        # secondary (crossed the axis)
        i1 = np.unravel_index(np.argmin(right), d2.shape)
        i2 = np.unravel_index(np.argmin(left), d2.shape)
        # both images found at the requested source position
        assert right[i1] < (0.1 * theta_e) ** 2
        assert left[i2] < (0.1 * theta_e) ** 2
        dt = tau[i2] - tau[i1]
        ref = point_lens_delay(u)
        assert dt == pytest.approx(ref, rel=tol)
        assert dt > prev               # delay grows with u
        prev = dt


def test_tau_map_basic(delay_map):
    tau, stats = delay_map
    finite = np.isfinite(tau)
    assert stats["shadow_pixels"] == (~finite).sum()
    assert 0 < stats["shadow_pixels"] < tau.size // 100
    assert np.nanmin(tau) == 0.0
    assert stats["tau_max"] > 10.0     # Shapiro range over the FOV


def _surface_fan(alphas_deg, thetas, theta_obs=np.pi / 2):
    metric = Kerr(M=1.0, a=0.0)
    alphas = jnp.asarray(np.radians(alphas_deg), jnp.float64)
    thetas = jnp.asarray(thetas, jnp.float64)
    res = trace_rays_surface(
        metric, 1000.0, alphas, thetas, theta_obs,
        r_surface=float(metric.capture_radius()), lambda_max=6000.0,
        record_time=False)
    bx, by = world_escape_beta(
        metric, 2000.0, res.theta, res.phi, res.p_r, res.p_theta,
        res.xi, res.status == ESCAPED, theta_obs)
    return res, np.asarray(bx), np.asarray(by)


def test_world_beta_matches_collapsed_chart_non_crossing():
    """Convention pin: on rays that do NOT cross the axis the exact
    world chart equals the reference-parity (final_alpha, theta)
    reconstruction (psi = 0 frame)."""
    thetas = np.array([np.pi / 2, 0.0, -np.pi / 3, 2.1])
    res, bx, by = _surface_fan([8.0, 8.0, 8.0, 8.0], thetas)
    frame = camera.psi_frame((0.0, 0.0))
    cx, cy = _source_plane_coords(
        jnp.asarray(res.final_alpha), jnp.asarray(thetas), frame)
    np.testing.assert_allclose(bx, np.asarray(cx), atol=1e-6)
    np.testing.assert_allclose(by, np.asarray(cy), atol=1e-6)


def test_world_beta_crossing_side():
    """Physics pin: a ray aimed INSIDE the Einstein angle crosses the
    axis — its true source lies on the opposite side, which the
    collapsed chart cannot represent (it reflects the sign)."""
    theta_e_deg = np.degrees(np.sqrt(4.0 / 1000.0))   # 3.62 deg
    res, bx, by = _surface_fan(
        [0.55 * theta_e_deg, 2.0 * theta_e_deg],
        [np.pi / 2, np.pi / 2])
    frame = camera.psi_frame((0.0, 0.0))
    cx, _cy = _source_plane_coords(
        jnp.asarray(res.final_alpha),
        jnp.asarray([np.pi / 2, np.pi / 2], jnp.float64), frame)
    cx = np.asarray(cx)
    # crossing ray: exact side negative, collapsed chart positive
    assert bx[0] < 0 < cx[0]
    assert abs(bx[0] + cx[0]) < 1e-6   # same magnitude
    # non-crossing ray: both positive and equal
    assert bx[1] > 0 and bx[1] == pytest.approx(cx[1], abs=1e-6)


@pytest.mark.slow
def test_inclined_observer_runs():
    scene = SceneConfig(M=1.0, a=0.5, r_obs_mult=1000.0,
                        vertical_fov_deg=40.0,
                        theta_obs=np.radians(60.0))
    tau, stats = render_time_delay(scene, (64, 64), CFG)
    tau = np.asarray(tau)
    assert np.isfinite(stats["tau_max"])
    assert np.nanmin(tau) == 0.0


def test_cli_time_delay(tmp_path, monkeypatch):
    import os
    from light_path_tracer_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    rc = main(["lens", "--time-delay", "t.png", "--size", "64",
               "--r-obs", "1000", "--dtype", "float64"])
    assert rc == 0 and os.path.exists("t.png")
