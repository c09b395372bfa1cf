"""Source-plane lensing products (render.source_plane_map /
microlens_light_curve): inverse ray shooting on the traced rays.

The headline oracle: for Schwarzschild in the weak field the traced
microlensing light curve must reproduce the classic point-lens
Paczynski (1986) curve A(u) = (u^2 + 2) / (u sqrt(u^2 + 4)) — an
end-to-end pin through screen mapping, geodesic integration, escape
extraction, source-plane projection, and the solid-angle bookkeeping
(including the gnomonic Jacobian; without it the far track reads
(1 + beta^2)^{-3/2} low).
"""

import os

import numpy as np
import pytest

from light_path_tracer_tpu.pipeline import (render_caustics,
                                            render_microlens_curve)
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig

WEAK = SceneConfig(M=1.0, a=0.0, r_obs_mult=1000.0,
                   vertical_fov_deg=40.0)
CFG = RenderConfig(dtype="float64")


def paczynski(u):
    return (u ** 2 + 2.0) / (u * np.sqrt(u ** 2 + 4.0))


@pytest.mark.slow
def test_paczynski_curve():
    u, A, stats = render_microlens_curve(
        WEAK, (256, 256), CFG, impact_u=1.0, span_u=4.0,
        n_points=21, source_radius_u=0.35)
    A = np.asarray(A)
    ref = paczynski(u)
    rel = np.abs(A - ref) / ref
    assert rel.max() < 0.025
    # peak at closest approach (track center), symmetric track
    assert np.argmax(A) == len(A) // 2
    np.testing.assert_allclose(A, A[::-1], rtol=1e-6)
    assert stats["A_peak"] == pytest.approx(paczynski(1.0), rel=0.02)


@pytest.mark.slow
def test_caustic_map_point_caustic():
    amap, extent, stats = render_caustics(WEAK, (256, 256), CFG,
                                          bins=64)
    amap = np.asarray(amap)
    assert np.isfinite(amap).all()
    assert (amap >= 0).all()
    # Point caustic of the point lens: global max at the center bins.
    iy, ix = np.unravel_index(np.argmax(amap), amap.shape)
    assert abs(iy - 31.5) < 2 and abs(ix - 31.5) < 2
    # Far field (outside the Einstein angle, inside full-FOV coverage)
    # magnifies to ~1. theta_E = 3.62 deg, beta_max = 14 deg.
    bins = amap.shape[0]
    centers = (np.arange(bins) + 0.5) / bins * 2 - 1   # in beta_max
    bx, by = np.meshgrid(centers, centers)
    rr = np.hypot(bx, by) * stats["beta_max"]
    theta_e = np.sqrt(4.0 / 1000.0)
    annulus = (rr > 2 * theta_e) & (rr < 4 * theta_e)
    med = np.median(amap[annulus])
    assert med == pytest.approx(1.0, abs=0.15)
    # Schwarzschild is axisymmetric: left-right mirror agrees in the
    # annulus median sense.
    flipped = amap[:, ::-1]
    assert np.median(np.abs(amap[annulus] - flipped[annulus])) < 0.2


@pytest.mark.slow
def test_kerr_caustics_run():
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=1000.0,
                        vertical_fov_deg=40.0)
    amap, extent, stats = render_caustics(scene, (128, 128), CFG,
                                          bins=32)
    amap = np.asarray(amap)
    assert np.isfinite(amap).all() and stats["A_max"] > 1.0


@pytest.mark.slow
def test_cli_caustics_and_microlens(tmp_path, monkeypatch):
    from light_path_tracer_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    rc = main(["lens", "--caustics", "c.png", "--size", "96",
               "--caustic-bins", "24", "--r-obs", "1000",
               "--dtype", "float64"])
    assert rc == 0 and os.path.exists("c.png")
    rc = main(["lens", "--microlens", "m.csv", "--size", "96",
               "--track-points", "5", "--r-obs", "1000",
               "--dtype", "float64"])
    assert rc == 0
    rows = open("m.csv").read().strip().splitlines()
    assert rows[0] == "track_pos_thetaE,u,A"
    assert len(rows) == 6
    rc = main(["lens", "--microlens", "m.png", "--size", "96",
               "--track-points", "5", "--r-obs", "1000",
               "--dtype", "float64"])
    assert rc == 0 and os.path.exists("m.png")
