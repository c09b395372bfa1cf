"""Shared result types for batched ray tracing."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TraceResult(NamedTuple):
    """Per-ray tracing outcome (structure-of-arrays over N rays).

    status matches the reference's integer codes (metrics.py:69, 451):
    1 escaped, -1 captured, 0 invalid. (Max-range rays are folded into
    'escaped' at extraction time, as the reference does.)
    final_alpha is NaN for captured/invalid rays.
    """

    final_alpha: jnp.ndarray   # (N,) float
    n_half_orbits: jnp.ndarray  # (N,) int32
    status: jnp.ndarray        # (N,) int32
    # () int32 — lock-step integrator loop iterations, summed over
    # independently scheduled units: the XLA path counts its single
    # whole-batch while_loop; Pallas paths sum the per-tile counts (each
    # tile exits when its own rays finish); chunked/two-pass drivers sum
    # across dispatches. Same contract on every backend: total sequential
    # step work actually executed.
    n_steps: jnp.ndarray


class VolumetricResult(NamedTuple):
    """Per-ray volumetric radiative-transfer trace outcome.

    emission is the path integral of the caller's emissivity weight
    along the geodesic, integrated as an error-controlled 6th state
    component (ops/kerr_trace.py extra_rhs); 0 for invalid lanes. In
    absorption mode (trace_rays_volumetric absorption_fn) it is the
    self-absorbed intensity integral j g^p exp(-tau) dlambda and
    optical_depth carries the ray's TOTAL optical depth (zeros in the
    optically-thin mode).
    final_alpha / n_half_orbits describe the ray's FINAL state exactly
    as in TraceResult (NaN final_alpha when captured), so a volumetric
    layer can be composited over a lensed background from ONE trace
    (exp(-optical_depth) screens the background).
    """

    emission: jnp.ndarray       # (N,) float — integral j g^p e^-tau dlam
    final_alpha: jnp.ndarray    # (N,) float
    n_half_orbits: jnp.ndarray  # (N,) int32
    status: jnp.ndarray         # (N,) int32
    n_steps: jnp.ndarray        # () int32
    optical_depth: jnp.ndarray  # (N,) float — total tau (0 when thin)


class SpectralResult(NamedTuple):
    """Per-ray multi-frequency radiative-transfer trace outcome
    (volumetric.render_volumetric_spectrum).

    emission[i] is band i's self-absorbed intensity integral; all
    bands share ONE geodesic trace and ONE reduced optical-depth
    integral tau_hat (per-band tau_i = c_i * tau_hat with the
    frequency scaling c_i = f_i^(1-q) applied inside the coupled
    e^{-c_i tau_hat} emission terms).
    """

    emission: tuple             # n_bands x (N,) float
    tau_hat: jnp.ndarray        # (N,) float — reduced optical depth
    final_alpha: jnp.ndarray    # (N,) float
    n_half_orbits: jnp.ndarray  # (N,) int32
    status: jnp.ndarray         # (N,) int32
    n_steps: jnp.ndarray        # () int32


class ExtrasResult(NamedTuple):
    """Per-ray outcome of the generic coupled-extras trace
    (ops/kerr_trace.trace_rays_aux): n error-controlled path-integral
    components (e.g. Stokes I/Q/U for polarized volumetric transfer)
    accumulated along each geodesic, with optional per-ray auxiliary
    constants available to the integrand."""

    extras: tuple               # n x (N,) float — final integral values
    final_alpha: jnp.ndarray    # (N,) float
    n_half_orbits: jnp.ndarray  # (N,) int32
    status: jnp.ndarray         # (N,) int32
    n_steps: jnp.ndarray        # () int32


class SurfaceResult(NamedTuple):
    """Per-ray opaque-spherical-surface trace outcome (stellar-surface
    imaging, star.py).

    status CAPTURED means the ray hit the surface at r = r_surface:
    (theta, phi) are its Hermite-localized RAW chart coordinates
    (double-cover theta, cumulative winding phi — star._physical_angles
    folds them to the physical sphere) and p_r/p_theta the momentum
    there (emission-angle / limb-darkening input). ESCAPED rays missed
    the star: final_alpha / n_half_orbits describe their escape heading
    exactly as in TraceResult, so the star can be composited over a
    lensed background from ONE trace.
    """

    theta: jnp.ndarray          # (N,) float — raw chart colatitude
    phi: jnp.ndarray            # (N,) float — raw cumulative azimuth
    p_r: jnp.ndarray            # (N,) float
    p_theta: jnp.ndarray        # (N,) float
    xi: jnp.ndarray             # (N,) float — conserved L/E per ray
    t_hit: jnp.ndarray          # (N,) float — coord time camera->hit
    #                             (0 unless record_time)
    final_alpha: jnp.ndarray    # (N,) float (escaped rays)
    n_half_orbits: jnp.ndarray  # (N,) int32
    status: jnp.ndarray         # (N,) int32
    n_steps: jnp.ndarray        # () int32
