"""Compact-star surface imaging and pulse profiles (NICER-style).

No reference counterpart (the reference images black holes only); this
module adds the other relativistic imaging workhorse: an opaque
stellar surface at r = R with hot spots, imaged through the exterior
metric, and the rotational pulse profiles behind NICER's neutron-star
mass-radius measurements.

Physics
-------
Backward-traced rays either miss the star (ESCAPED — usable as a
lensed background layer) or intersect the surface (the capture event
at r_capture = R, Hermite-localized by the shared adaptive loop —
ops/kerr_trace.trace_rays_surface). For a surface element rotating
rigidly at angular velocity Omega the observed bolometric intensity is

    I_obs = g^4 * I_rest(theta_s, phi_s),      g = nu_obs / nu_em

with the circular-emitter redshift

    g = sqrt(-(g_tt + 2 Omega g_tph + Omega^2 g_pp)) / (1 - Omega xi)

evaluated at the hit point with the OFF-plane covariant t-phi block
(disk.covariant_tphi_components) and the photon's conserved
xi = L/E — gravitational redshift and rotational Doppler in one exact
expression (for a static star it reduces to g = sqrt(1 - 2M/R),
uniform over the surface: a wiring oracle). g_power is configurable
(4 = bolometric from I/nu^4... invariance; 3 + spectral index for a
fixed observed frequency).

The rest-frame intensity is sigma T^4-like: I_rest = T^4(theta_s,
phi_s) with T the background surface temperature plus Gaussian-edged
circular hot spots, each given as (colatitude, azimuth, angular
radius, temperature). Optional Lambert-type limb darkening weights by
cos^k of the emission angle in the emitter frame,
cos sigma = g * |p_r| * sqrt(g^rr) (the radial direction is orthogonal
to the emitter's worldlines, so this is frame-exact for any Omega).

Light bending makes the star APPEAR larger than geometric: the limb
impact parameter is b_max = R / sqrt(1 - 2M/R) (Schwarzschild), 29%
super-geometric at R = 5M — and for compact enough stars (R below
~3.5M, outside the 3M photon sphere) the ENTIRE surface is visible at
once, the classic strong-lensing result the test suite pins by the
antipodal-spot ordering.

Pulse profiles: the surface map rotates rigidly, so a full rotation is
ONE geodesic trace + a vmapped re-weighting per phase (the disk
hot-spot pattern) — flux(phase) = sum_pixels g^4 T^4(theta_s,
phi_s - phase [+ Omega t_hit]); the optional retarded-phase term
(light_travel_delay=True) evaluates each surface element at its own
emission time via the error-controlled coordinate-time component.

Conventions: the camera sits at (r_obs, theta_obs, phi=0), so the
sub-observer point is (theta_obs, 0) and spot azimuths are measured
from it. Rapid rotation uses the exterior Kerr approximation when
scene.a != 0 (the true rotating-NS exterior is not Kerr — the standard
caveat of every S+D-style pulse-profile model); oblateness is not
modeled (spherical surface).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from light_path_tracer_tpu import camera
from light_path_tracer_tpu.disk import (_scene_metric, _tone_map,
                                        covariant_tphi_components)
from light_path_tracer_tpu.ops.kerr_trace import (CAPTURED, INVALID,
                                                  trace_rays_surface)
from light_path_tracer_tpu.utils.config import RenderConfig, SceneConfig
from light_path_tracer_tpu.utils.timing import StageTimer


@dataclasses.dataclass(frozen=True)
class StarConfig:
    """Stellar surface model: geometry, rotation, temperature map."""

    radius: float = 5.0            # surface radius R [M]
    omega: float = 0.0             # rigid rotation Omega [c/M] (>0 is
    #                                prograde: surface moves toward +phi)
    t_surface: float = 0.5         # background temperature (display units)
    # Hot spots: (colatitude_deg, azimuth_deg, angular_radius_deg, T).
    # Azimuth 0 = the sub-observer meridian at phase 0. Overlapping
    # spots add in T^4 (additive flux, not max-T).
    spots: tuple = ((30.0, 0.0, 20.0, 1.0),)
    edge_deg: float = 2.0          # spot edge smoothing [deg]
    g_power: float = 4.0           # bolometric redshift weight g^p
    limb_k: float = 0.0            # cos^k limb darkening (0 = isotropic)
    tone_map: str = "linear"       # display transfer


def _validate(metric, star: StarConfig):
    if getattr(metric, "eps3", 0.0):
        raise ValueError("star mode is not wired for Johannsen-Psaltis "
                         "(eps3 != 0): the emitter redshift is a "
                         "Kerr/charged closed form")
    M = float(metric.M)
    a = float(metric.a)
    Q = float(getattr(metric, "Q", 0.0))
    r_h = M + np.sqrt(max(M * M - a * a - Q * Q, 0.0))
    if star.radius <= r_h:
        raise ValueError(f"radius {star.radius} must exceed the "
                         f"horizon r_+ = {r_h:.4f}")
    # The equatorial surface element must move on a timelike worldline
    # (host-side float check: W at the equator through the charge hook).
    R = float(star.radius)
    W = 2.0 * M * R - Q * Q
    g_tt = -(1.0 - W / (R * R))
    g_tph = -a * W / (R * R)
    g_pp = R * R + a * a + a * a * W / (R * R)
    den = -(g_tt + 2.0 * star.omega * g_tph
            + star.omega ** 2 * g_pp)
    if not den > 0.0:
        raise ValueError(f"omega {star.omega} is superluminal at the "
                         f"equator of radius {star.radius}")
    for spot in star.spots:
        if len(spot) != 4:
            raise ValueError("each spot is (colat_deg, az_deg, "
                             f"radius_deg, T), got {spot!r}")


def _physical_angles(theta, phi):
    """Fold the integrator's double-cover chart onto the physical
    sphere: theta is reduced mod 2pi and reflected off the poles
    (which advances the azimuth by pi — passing OVER a pole lands on
    the opposite meridian), phi reduced mod 2pi. Pinned by the
    mirror-symmetry image oracle (tests/test_star.py)."""
    two_pi = 2.0 * np.pi
    th = jnp.mod(theta, two_pi)
    flip = th > np.pi
    th = jnp.where(flip, two_pi - th, th)
    ph = jnp.where(flip, phi + np.pi, phi)
    return th, jnp.mod(ph, two_pi)


def temperature4_map(star: StarConfig, theta_s, phi_s, phase):
    """T^4(theta_s, phi_s) of the rigidly rotated surface map at the
    given rotation phase [rad]: background + sigmoid-edged circular
    spots centered at (colat_i, az_i + phase). Smooth edges keep the
    map friendly to the display transfer and to phase-derivative use;
    width edge_deg is measured along the great circle."""
    t4 = jnp.full_like(theta_s, float(star.t_surface) ** 4)
    cth, sth = jnp.cos(theta_s), jnp.sin(theta_s)
    w = np.radians(max(float(star.edge_deg), 1e-3))
    for colat_deg, az_deg, rad_deg, t_spot in star.spots:
        colat = np.radians(float(colat_deg))
        rad = np.radians(float(rad_deg))
        az = np.radians(float(az_deg))
        # Angular distance d to the spot center via the spherical law
        # of cosines; the mask transitions over ~edge_deg of d around
        # the spot radius (sigmoid in cos d with the matched slope
        # sin(rad) * w).
        cosd = (np.cos(colat) * cth
                + np.sin(colat) * sth * jnp.cos(phi_s - az - phase))
        width = max(np.sin(rad), 1e-3) * w
        mask = jax.nn.sigmoid((cosd - np.cos(rad)) / width)
        t4 = t4 + (float(t_spot) ** 4 - float(star.t_surface) ** 4) * mask
    return t4


def surface_redshift(metric, star: StarConfig, theta_s, xi):
    """g = nu_obs/nu_em for a surface element at colatitude theta_s
    rotating at Omega, seen by the photon with conserved xi = L/E.
    Exact in the given metric (gravitational + rotational Doppler);
    clipped to [0, 10] like the volumetric emitter (the beaming
    caustic 1 - Omega xi -> 0 is measure-zero)."""
    r = jnp.asarray(star.radius, theta_s.dtype)
    g_tt, g_tph, g_pp = covariant_tphi_components(metric, r,
                                                  jnp.cos(theta_s))
    om = star.omega
    den = jnp.maximum(-(g_tt + 2.0 * om * g_tph + om * om * g_pp),
                      1e-12)
    g = jnp.sqrt(den) / jnp.maximum(1.0 - om * xi, 1e-3)
    return jnp.clip(g, 0.0, 10.0)


def _emission_cos(metric, star: StarConfig, theta_s, p_r, g):
    """cos of the emission angle in the emitter frame: the radial
    direction e_r = sqrt(g^rr) d_r is orthogonal to the (t, phi)-plane
    worldlines, so cos sigma = (p . e_r) / (-p . u) = g * |p_r| *
    sqrt(g^rr) for ANY rigid Omega."""
    r = jnp.asarray(star.radius, theta_s.dtype)
    (_g_tt, _g_tph, g_rr_inv, _g_thth, _g_pp,
     *_rest) = metric._inv_terms(r, theta_s)
    return jnp.clip(g * jnp.abs(p_r) * jnp.sqrt(g_rr_inv), 0.0, 1.0)


@functools.partial(jax.jit,
                   static_argnames=("metric", "star", "delay"))
def _brightness(metric, star: StarConfig, theta_raw, phi_raw, p_r, xi,
                t_hit, status, phase, delay: bool = False):
    """Per-ray observed brightness at a rotation phase; 0 off the
    surface. With delay=True each element is evaluated at its own
    retarded phase (phase - Omega * t_hit: the spot is seen where it
    WAS when this pixel's light left the surface)."""
    th, ph = _physical_angles(theta_raw, phi_raw)
    g = surface_redshift(metric, star, th, xi)
    eval_phase = phase - (star.omega * t_hit if delay else 0.0)
    t4 = temperature4_map(star, th, ph, eval_phase)
    b = g ** star.g_power * t4
    if star.limb_k:
        b = b * _emission_cos(metric, star, th, p_r, g) ** star.limb_k
    return jnp.where(status == CAPTURED, b, 0.0)


def render_star(scene: SceneConfig, resolution,
                cfg: RenderConfig = RenderConfig(),
                star: StarConfig = StarConfig(), phase: float = 0.0,
                mesh=None):
    """Stellar-surface image; returns (image (H, W) float32 in [0, 1],
    stats). stats['brightness'] holds the raw per-pixel g^p T^4 values
    and stats['apparent_radius_rad'] the measured angular radius of
    the captured disk (pixel-area estimate) — the light-bending
    enlarged size, b_max = R/sqrt(1-2M/R) in Schwarzschild.

    XLA shared adaptive loop (the surface event needs the Hermite
    localization; Pallas tiles do not record it). mesh: a
    jax.sharding.Mesh routes the trace through row-striped tile DP
    (parallel.tiles.trace_surface_grid_sharded)."""
    metric = _scene_metric(scene)
    _validate(metric, star)
    timer = StageTimer()
    height, width = resolution
    fov = camera.fov_from_vertical(scene.vertical_fov, resolution)
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32

    with timer.stage("build_lookup") as out:
        alpha = camera.build_alpha_lookup(
            resolution, fov, psi=scene.psi, dtype=dtype,
            boost=scene.boost)
        theta = camera.build_theta_lookup(
            resolution, fov, psi=scene.psi, dtype=dtype,
            boost=scene.boost)
        out.append((alpha, theta))

    with timer.stage("precompute") as out:
        if mesh is not None:
            from light_path_tracer_tpu.parallel.tiles import (
                trace_surface_grid_sharded)
            res = trace_surface_grid_sharded(
                metric, scene.r_obs, alpha, theta, scene.theta_obs,
                float(star.radius), mesh=mesh,
                max_steps=cfg.max_steps, precision=cfg.precision,
                method=cfg.integrator)
        else:
            res = trace_rays_surface(
                metric, scene.r_obs, alpha.ravel(), theta.ravel(),
                scene.theta_obs, float(star.radius),
                max(5000.0, 6.0 * scene.r_obs), cfg.max_steps,
                precision=cfg.precision, method=cfg.integrator)
        out.append(res.status)

    with timer.stage("render") as out:
        bright = _brightness(metric, star, res.theta.ravel(),
                             res.phi.ravel(), res.p_r.ravel(),
                             res.xi.ravel(), res.t_hit.ravel(),
                             res.status.ravel(),
                             jnp.asarray(phase, dtype))
        image = _tone_map(bright, star.tone_map).reshape(
            resolution).astype(jnp.float32)
        out.append(image)

    status = np.asarray(res.status)
    n_cap = int((status == CAPTURED).sum())
    # Pixel-area estimate of the captured disk's angular radius: the
    # camera grid is uniform in tan-angle ~ angle at these FOVs.
    px_solid = (fov[0] / height) * (fov[1] / width)
    app_radius = float(np.sqrt(max(n_cap, 0) * px_solid / np.pi))
    stats = dict(
        captured=n_cap,
        invalid=int((status == INVALID).sum()),
        brightness=np.asarray(bright).reshape(resolution),
        apparent_radius_rad=app_radius,
        integrator_steps=int(res.n_steps),
        total_rays=height * width,
        traced_rays=height * width,
        timings=timer.finish())
    return image, stats


def pulse_profile(scene: SceneConfig, cfg: RenderConfig = RenderConfig(),
                  star: StarConfig = StarConfig(), n_phases: int = 64,
                  resolution=(128, 128), light_travel_delay=False):
    """Rotational light curve: ONE geodesic trace, then a vmapped
    phase sweep of the surface-map re-weighting on device. Returns
    (phases (n,), flux (n,) normalized to mean 1, stats).

    light_travel_delay=True records coordinate time to the surface
    (error-controlled extra state component) and evaluates each
    element at its retarded phase — the sub-second-pulsar-scale skew
    on top of the Doppler asymmetry."""
    metric = _scene_metric(scene)
    _validate(metric, star)
    timer = StageTimer()
    fov = camera.fov_from_vertical(scene.vertical_fov, resolution)
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    alpha = camera.build_alpha_lookup(resolution, fov, psi=scene.psi,
                                      dtype=dtype, boost=scene.boost)
    theta = camera.build_theta_lookup(resolution, fov, psi=scene.psi,
                                      dtype=dtype, boost=scene.boost)
    with timer.stage("precompute") as out:
        res = trace_rays_surface(
            metric, scene.r_obs, alpha.ravel(), theta.ravel(),
            scene.theta_obs, float(star.radius),
            max(5000.0, 6.0 * scene.r_obs), cfg.max_steps,
            precision=cfg.precision, method=cfg.integrator,
            record_time=bool(light_travel_delay))
        out.append(res.status)

    phases = jnp.linspace(0.0, 2.0 * np.pi, n_phases,
                          endpoint=False).astype(dtype)

    with timer.stage("render") as out:
        flux = jax.jit(jax.vmap(lambda p: jnp.sum(_brightness(
            metric, star, res.theta, res.phi, res.p_r, res.xi,
            res.t_hit, res.status, p,
            delay=bool(light_travel_delay)))))(phases)
        out.append(flux)

    flux = np.asarray(flux, np.float64)
    mean = flux.mean() if flux.mean() > 0 else 1.0
    stats = dict(
        captured=int((np.asarray(res.status) == CAPTURED).sum()),
        integrator_steps=int(res.n_steps),
        modulation=float((flux.max() - flux.min())
                         / max(flux.max() + flux.min(), 1e-30)),
        timings=timer.finish())
    return np.asarray(phases), flux / mean, stats
