"""Coordinate-time recording (record_time) + light-travel delay.

Oracles:
  * analytic Schwarzschild radial coordinate time
    Delta t = Delta r + 2M ln((r1-2M)/(r2-2M)) for a (near-)radial ray;
  * the independent 8-D Hamiltonian integrator (trajectory.py), whose
    state CARRIES t — the recorder must agree at the first equatorial
    crossing;
  * geometry: far-side disk crossings arrive later than near-side ones
    by ~2 r sin(inclination);
  * purity: switching the recorder on must not change the trace.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.models.kerr import Kerr
from light_path_tracer_tpu.disk import trace_disk_rays, DiskConfig
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig


R_OBS = 100.0
THETA_OBS = np.radians(80.0)
DISK = DiskConfig(r_in=6.0, r_out=30.0, opaque=False)


def _trace(alphas, thetas, metric=None, disk=DISK, record_time=True,
           precision="fast", theta_obs=THETA_OBS):
    return trace_disk_rays(
        metric or Kerr(1.0, 0.0), R_OBS,
        jnp.asarray(alphas, jnp.float64), jnp.asarray(thetas, jnp.float64),
        theta_obs, 5000.0, 200000, disk, backend="xla",
        precision=precision, record_time=record_time)


@pytest.mark.slow
def test_radial_capture_time_analytic():
    # A near-radial ray (b = r sin(1e-3) ~ 0.1M: bending negligible)
    # is captured; its t_end must match the analytic Schwarzschild
    # radial integral from r_obs to the capture radius.
    res = _trace([1e-3], [0.3])
    assert int(res.status[0]) == -1  # captured
    r_cap = 1.01 * 2.0
    dt = (R_OBS - r_cap) + 2.0 * np.log((R_OBS - 2.0) / (r_cap - 2.0))
    rel = abs(float(res.t_end[0]) - dt) / dt
    assert rel < 5e-3
    # Tighter tolerances localize the capture better -> closer still.
    res_p = _trace([1e-3], [0.3], precision="precise")
    rel_p = abs(float(res_p.t_end[0]) - dt) / dt
    assert rel_p <= rel * 1.5  # no degradation; usually improves


def test_crossing_time_matches_8d_hamiltonian():
    # The 8-D integrator carries t in its state — an independent check
    # of the recorder's trapezoid accumulation, frame dragging included
    # (a = 0.9).
    from light_path_tracer_tpu.trajectory import integrate_geodesic_8d

    metric = Kerr(1.0, 0.9)
    alpha, theta = 0.08, 0.5
    res = _trace([alpha], [theta], metric=metric)
    assert int(res.n_hits[0]) >= 1
    t_rec = float(res.t_hits[0][0])

    state8, invalid = metric.initial_conditions_8d(
        R_OBS, jnp.asarray([alpha], jnp.float64), theta, THETA_OBS)
    assert not bool(invalid[0])
    traj = integrate_geodesic_8d(metric, state8[0], r_obs=R_OBS,
                                 n_steps=20000, h_base=0.25)
    states = np.asarray(traj.states)  # (S+1, 8): [t, r, th, phi, ...]
    n = int(traj.n_valid)
    t_path, th_path = states[:n, 0], states[:n, 2]
    c = np.cos(th_path)
    sign_change = np.nonzero(c[:-1] * c[1:] < 0)[0]
    assert sign_change.size >= 1
    i = int(sign_change[0])
    frac = -c[i] / (c[i + 1] - c[i])
    t_oracle = t_path[i] + frac * (t_path[i + 1] - t_path[i])
    assert abs(t_rec - t_oracle) / t_oracle < 1e-2


def test_far_side_arrives_later():
    # Grid of equatorial crossings: near-side (cos phi > 0, toward the
    # camera at phi=0) photons arrive EARLIER than far-side ones at the
    # same radius; for an inclined disk the gap is ~2 r sin(i).
    n = 64
    rings = [0.07, 0.09, 0.105, 0.125, 0.15]
    alphas = np.concatenate([np.full(n, al) for al in rings])
    thetas = np.tile(np.linspace(0.05, 2 * np.pi - 0.05, n), len(rings))
    res = _trace(alphas, thetas)
    hit = np.asarray(res.n_hits) >= 1
    r0 = np.asarray(res.r_hits[0])
    phi0 = np.asarray(res.phi_hits[0])
    t0 = np.asarray(res.t_hits[0])
    band = hit & (r0 > 5.0) & (r0 < 16.0)
    near = band & (np.cos(phi0) > 0.5)
    far = band & (np.cos(phi0) < -0.5)
    assert near.sum() >= 3 and far.sum() >= 3
    gap = t0[far].mean() - t0[near].mean()
    # Expected ~ 2 <r sin(i)> (flat-space chord) + Shapiro delay; allow
    # a wide band around it.
    expect = 2.0 * np.mean(np.concatenate([r0[near], r0[far]])) \
        * np.sin(THETA_OBS)
    assert gap > 0.4 * expect
    assert gap < 3.0 * expect


@pytest.mark.slow
def test_recording_is_pure_observation():
    # The trace itself must be bitwise-unchanged by record_time.
    alphas = np.linspace(0.02, 0.3, 12)
    thetas = np.linspace(0.1, 5.9, 12)
    on = _trace(alphas, thetas, record_time=True)
    off = _trace(alphas, thetas, record_time=False)
    assert off.t_hits == () and isinstance(off.t_end, tuple)
    np.testing.assert_array_equal(np.asarray(on.status),
                                  np.asarray(off.status))
    for a, b in zip(on.r_hits, off.r_hits):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(on.phi_hits, off.phi_hits):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(on.final_alpha),
                                  np.asarray(off.final_alpha))


@pytest.mark.slow
def test_light_curve_delay_skews_but_preserves_flux_scale():
    from light_path_tracer_tpu.spectra import hotspot_light_curve
    from light_path_tracer_tpu.disk import HotSpot, keplerian_omega

    scene = SceneConfig(M=1.0, a=0.5, r_obs_mult=100.0,
                        theta_obs=np.radians(75.0))
    cfg = RenderConfig(backend="xla", dtype="float64")
    spot = HotSpot(r0=8.0, amplitude=6.0)
    period = abs(2 * np.pi / keplerian_omega(1.0, 0.5, 8.0, True))
    ts = np.linspace(0.0, period, 24)
    disk = DiskConfig(r_in=6.0, r_out=20.0, opaque=True)

    t_a, flux_plain, s_plain = hotspot_light_curve(
        scene, (48, 48), ts, cfg, disk, spot)
    t_b, flux_delay, s_delay = hotspot_light_curve(
        scene, (48, 48), ts, cfg, disk, spot, light_travel_delay=True)

    # The delay spread across a 20M disk at 75 deg inclination is tens
    # of M — a real fraction of the ~178M orbit -> the curves differ.
    assert s_delay["delay_spread"] > 10.0
    assert not np.allclose(flux_plain, flux_delay, rtol=1e-3)
    # Same physics otherwise: total emitted energy over the full orbit
    # is conserved to a few percent (the delay only re-phases samples).
    assert abs(flux_plain.mean() - flux_delay.mean()) \
        / flux_plain.mean() < 0.05
