"""Pallas TPU tile kernel for the volumetric radiative-transfer trace.

Round-3 verdict item 3: the entire volumetric family (thin emission,
self-absorbed transfer) previously ran on the XLA shared adaptive loop
regardless of cfg.backend, because the Pallas tile kernel did not carry
the extra error-controlled state component. This kernel closes that gap:
it is the same VMEM-resident fused-trace design as
ops/pallas/kerr_trace_kernel.py (one Pallas program per (rows, 128) ray
tile, per-tile `lax.while_loop` early exit), but the integrated state is
the 6- or 7-component volumetric state — [r, theta, phi, p_r, p_theta]
plus the error-controlled path-integral extras of
ops/kerr_trace.trace_rays_volumetric (kerr_trace.py:307-397):

    thin:      y[5] = I,  dI/dlambda   = emission(y5)
    absorbed:  y[5] = I,  dI/dlambda   = exp(-tau) * emission(y5)
               y[6] = tau, dtau/dlambda = chi(y5)

The numerics are shared, not duplicated: the kernel body calls the same
shape-polymorphic ops.kerr_trace.dp45_integrate with the same extra_rhs
closure the XLA path builds, so XLA-vs-Pallas agreement is a
backend-arithmetic diff, pinned in tests/test_pallas.py (interpret mode)
and by the on-chip smoke artifact (scripts/chip_smoke.py).

Certain-capture early exit stays OFF (r_plunge=None), exactly as on the
XLA path: plunging photons collect emission down to the capture surface.

Emissivity restrictions: emission_fn/absorption_fn must lower under
Mosaic — the shipped RIAF profiles (volumetric._profile_fns: exp, sqrt,
pow, sigmoid, cos) all do; anything needing atan2/acos must stay on the
XLA path (same rule as the mu-chart conversion, kerr_trace_kernel.py).

No reference counterpart (the reference renders background lensing
only; /root/reference/image_lens.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_path_tracer_tpu.ops.kerr_trace import (
    dp45_integrate, finalize_angles, get_tols, _h_init_for,
    saturation_r_max, RUNNING, INVALID)
from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
    LANE, DEFAULT_ROWS)
from light_path_tracer_tpu.ops.types import VolumetricResult


def _volumetric_tile_kernel(alpha_ref, theta_ref, valid_ref, *out_refs,
                            metric, r_obs, theta_obs, lambda_max,
                            max_steps, tols, emission_fn, absorption_fn,
                            method, sat_window):
    (r_out, th_out, phi_out, pr_out, pth_out, em_out, tau_out, lam_out,
     status_out, steps_out) = out_refs
    alphas = alpha_ref[:]
    thetas = theta_ref[:]
    valid = valid_ref[:] > 0.5
    dtype = alphas.dtype

    y0, p_t, p_phi, invalid0 = metric.initial_conditions_5d(
        r_obs, alphas, thetas, theta_obs)
    status0 = jnp.where(invalid0 | ~valid, INVALID, RUNNING).astype(
        jnp.int32)

    # Same extra-state construction as the XLA path
    # (kerr_trace.trace_rays_volumetric) — incl. the -30 tau floor that
    # bounds exp(+|tau|) on unphysical RK stage probes.
    if absorption_fn is None:
        y0 = (*y0, jnp.zeros_like(y0[0]))
        extra = lambda y, pt, pp: (emission_fn(y[:5], pt, pp),)
    else:
        y0 = (*y0, jnp.zeros_like(y0[0]), jnp.zeros_like(y0[0]))
        extra = lambda y, pt, pp: (
            jnp.exp(-jnp.maximum(y[6], -30.0))
            * emission_fn(y[:5], pt, pp),
            absorption_fn(y[:5], pt, pp))

    y_f, status_f, lam_f, steps = dp45_integrate(
        metric, y0, p_t, p_phi, status0,
        atol=jnp.full_like(alphas, tols["atol"]),
        rtol=jnp.full_like(alphas, tols["rtol"]),
        h_min=jnp.asarray(tols["h_min"], dtype),
        tiny_err=tols["tiny_err"],
        r_capture=jnp.asarray(metric.capture_radius(), dtype),
        r_escape=jnp.asarray(r_obs * 2.0, dtype),
        lambda_max=lambda_max, h_init=_h_init_for(r_obs, dtype),
        max_steps=max_steps, method=method, extra_rhs=extra,
        sat_window=sat_window, sat_monitor=(0,),
        sat_r_max=saturation_r_max(metric) if sat_window else None)

    r_out[:] = y_f[0]
    th_out[:] = y_f[1]
    phi_out[:] = y_f[2]
    pr_out[:] = y_f[3]
    pth_out[:] = y_f[4]
    em_out[:] = y_f[5]
    tau_out[:] = y_f[6] if absorption_fn is not None else jnp.zeros_like(
        y_f[0])
    lam_out[:] = lam_f
    status_out[:] = status_f
    steps_out[:] = jnp.full(steps_out.shape, steps, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "r_obs", "theta_obs", "emission_fn",
                     "lambda_max", "max_steps", "precision", "method",
                     "absorption_fn", "tile_rows", "interpret",
                     "return_unconverged", "sat_window"))
def trace_rays_volumetric_pallas(metric, r_obs, alphas, thetas,
                                 theta_obs, emission_fn,
                                 lambda_max: float,
                                 max_steps: int = 200000,
                                 precision: str = "fast",
                                 method: str = "dp45",
                                 absorption_fn=None,
                                 tile_rows: int = DEFAULT_ROWS,
                                 interpret: bool = False,
                                 return_unconverged: bool = False,
                                 sat_window: int = 0):
    """Pallas-fused volumetric batch tracer; drop-in for
    ops.kerr_trace.trace_rays_volumetric (same signature head, same
    VolumetricResult return). float32 only — the XLA path remains the
    float64 oracle tier. emission_fn/absorption_fn must be
    cached/stable function objects (jit static args —
    volumetric.make_transfer_fns lru_caches per (metric, config))."""
    dtype = alphas.dtype
    if dtype != jnp.float32:
        raise ValueError("pallas path is float32-only; got " + str(dtype))
    tols = get_tols(dtype, precision)

    n = alphas.shape[0]
    tile = tile_rows * LANE
    n_pad = max(1, -(-n // tile)) * tile
    n_tiles = n_pad // tile

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,), fill, x.dtype)]) if n_pad > n else x

    alphas_p = pad(alphas, 0.1).reshape(n_tiles * tile_rows, LANE)
    thetas_p = pad(thetas, 0.0).reshape(n_tiles * tile_rows, LANE)
    valid_p = pad(jnp.ones((n,), dtype), 0.0).reshape(
        n_tiles * tile_rows, LANE)

    kernel = functools.partial(
        _volumetric_tile_kernel, metric=metric, r_obs=float(r_obs),
        theta_obs=float(theta_obs), lambda_max=float(lambda_max),
        max_steps=max_steps, tols=tols, emission_fn=emission_fn,
        absorption_fn=absorption_fn, method=method,
        sat_window=sat_window)

    block = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles * tile_rows, LANE), dtype)
    i32 = jax.ShapeDtypeStruct((n_tiles * tile_rows, LANE), jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[block, block, block],
        out_specs=(block,) * 10,
        out_shape=(f32,) * 8 + (i32, i32),
        interpret=interpret,
    )(alphas_p, thetas_p, valid_p)

    # Same cross-backend n_steps contract as the shadow kernel: total
    # lock-step iterations summed over independently scheduled tiles.
    n_steps = jnp.sum(outs[9].reshape(n_tiles, -1)[:, 0])
    (r_f, th_f, phi_f, pr_f, pth_f, em_f, tau_f, lam_f) = (
        o.reshape(n_pad)[:n] for o in outs[:8])
    status_f = outs[8].reshape(n_pad)[:n]

    zero = jnp.asarray(0.0, dtype)
    em = jnp.where(status_f == INVALID, zero, em_f)
    tau = (jnp.zeros_like(em) if absorption_fn is None
           else jnp.where(status_f == INVALID, zero, tau_f))

    # Extraction outside the kernel (finalize_angles needs acos, which
    # Mosaic does not lower — same split as the shadow kernel).
    _y0, p_t, p_phi, _inv = metric.initial_conditions_5d(
        float(r_obs), alphas, thetas, float(theta_obs))
    final_alpha, n_half, status_out = finalize_angles(
        metric, (r_f, th_f, phi_f, pr_f, pth_f), p_t, p_phi, status_f)
    # em keys off the INTEGRATION status, not status_out (same rationale
    # as the XLA path: a degenerate angle extraction does not erase the
    # physically accumulated emission).
    result = VolumetricResult(em, final_alpha, n_half, status_out,
                              n_steps, tau)
    if return_unconverged:
        # Raw RUNNING after the step budget AND lambda budget left:
        # neither event fired, lambda not exhausted, not saturation-
        # exited (both of which park lam at lambda_max) — only these
        # need the two-pass full-depth re-trace.
        return result, (status_f == RUNNING) & (lam_f < lambda_max)
    return result


@functools.partial(
    jax.jit,
    static_argnames=("metric", "r_obs", "theta_obs", "emission_fn",
                     "lambda_max", "max_steps", "precision", "method",
                     "absorption_fn", "pass1_steps", "slots",
                     "tile_rows", "interpret", "sat_window"))
def trace_rays_volumetric_two_pass(metric, r_obs, alphas, thetas,
                                   theta_obs, emission_fn,
                                   lambda_max: float,
                                   max_steps: int = 200000,
                                   precision: str = "fast",
                                   method: str = "dp45",
                                   absorption_fn=None,
                                   pass1_steps: int = 4096,
                                   slots: int = 1024,
                                   tile_rows: int = DEFAULT_ROWS,
                                   interpret: bool = False,
                                   sat_window: int = 0):
    """Straggler-contained volumetric tracing (round-4 measurement: a
    pointing-dependent near-critical photon-ring orbiter legitimately
    integrates to lambda_max in tiny steps, grinding the full 200k-step
    budget and pinning its tile — 1.15 s vs 0.036 s for the identical
    256² torus one jitter step away; the capped run's emission was
    bit-identical, but correctness cannot rely on that).

    Same design as trace_rays_kerr_two_pass: a `pass1_steps`-capped
    pass over all tiles, then a full-budget re-trace FROM SCRATCH of
    only the unconverged lanes on minimal (8, 128) tiles — the
    path integral re-accumulates from lambda=0, so the merge is exact,
    not an approximation. All one jitted program (no host sync)."""
    res1, unconv = trace_rays_volumetric_pallas(
        metric, r_obs, alphas, thetas, theta_obs, emission_fn,
        lambda_max, pass1_steps, precision=precision, method=method,
        absorption_fn=absorption_fn, tile_rows=tile_rows,
        interpret=interpret, return_unconverged=True,
        sat_window=sat_window)

    n = alphas.shape[0]
    slots = min(slots, n)
    idx = jnp.nonzero(unconv, size=slots, fill_value=0)[0]
    res2 = trace_rays_volumetric_pallas(
        metric, r_obs, alphas[idx], thetas[idx], theta_obs,
        emission_fn, lambda_max, max_steps, precision=precision,
        method=method, absorption_fn=absorption_fn, tile_rows=8,
        interpret=interpret, sat_window=sat_window)

    take = unconv[idx]
    em = res1.emission.at[idx].set(
        jnp.where(take, res2.emission, res1.emission[idx]))
    fa = res1.final_alpha.at[idx].set(
        jnp.where(take, res2.final_alpha, res1.final_alpha[idx]))
    nh = res1.n_half_orbits.at[idx].set(
        jnp.where(take, res2.n_half_orbits, res1.n_half_orbits[idx]))
    st = res1.status.at[idx].set(
        jnp.where(take, res2.status, res1.status[idx]))
    tau = res1.optical_depth.at[idx].set(
        jnp.where(take, res2.optical_depth, res1.optical_depth[idx]))
    return VolumetricResult(em, fa, nh, st,
                            res1.n_steps + res2.n_steps, tau)


# ---------------------------------------------------------------------------
# Generic coupled-extras tile kernel: the Pallas tier for EVERY
# error-controlled-extras trace (multi-frequency spectra, flare movies,
# polarized volumetric Stokes transport, photon-ring order buckets) —
# the same VMEM design as the volumetric kernel above, with N extra
# state components and optional per-ray auxiliary constants riding
# extra input tiles. Shares dp45_integrate; XLA-vs-Pallas agreement is
# interpret-pinned (tests/test_pallas.py) and chip-pinned
# (scripts/chip_smoke.py).
# ---------------------------------------------------------------------------


def _extras_tile_kernel(alpha_ref, theta_ref, valid_ref, *refs,
                        metric, r_obs, theta_obs, lambda_max,
                        max_steps, tols, transfer_fn, n_extras, n_aux,
                        method, sat_window, sat_monitor):
    aux = tuple(r[:] for r in refs[:n_aux])
    out_refs = refs[n_aux:]
    state_outs = out_refs[:5]
    extra_outs = out_refs[5:5 + n_extras]
    lam_out, status_out, steps_out = out_refs[5 + n_extras:]

    alphas = alpha_ref[:]
    thetas = theta_ref[:]
    valid = valid_ref[:] > 0.5
    dtype = alphas.dtype

    y0, p_t, p_phi, invalid0 = metric.initial_conditions_5d(
        r_obs, alphas, thetas, theta_obs)
    status0 = jnp.where(invalid0 | ~valid, INVALID, RUNNING).astype(
        jnp.int32)
    zeros = jnp.zeros_like(y0[0])
    y0 = (*y0, *([zeros] * n_extras))
    if n_aux:
        extra = lambda y, pt, pp: transfer_fn(y, pt, pp, aux)
    else:
        extra = transfer_fn

    y_f, status_f, lam_f, steps = dp45_integrate(
        metric, y0, p_t, p_phi, status0,
        atol=jnp.full_like(alphas, tols["atol"]),
        rtol=jnp.full_like(alphas, tols["rtol"]),
        h_min=jnp.asarray(tols["h_min"], dtype),
        tiny_err=tols["tiny_err"],
        r_capture=jnp.asarray(metric.capture_radius(), dtype),
        r_escape=jnp.asarray(r_obs * 2.0, dtype),
        lambda_max=lambda_max, h_init=_h_init_for(r_obs, dtype),
        max_steps=max_steps, method=method, extra_rhs=extra,
        sat_window=sat_window, sat_monitor=sat_monitor,
        sat_r_max=saturation_r_max(metric) if sat_window else None)

    for k in range(5):
        state_outs[k][:] = y_f[k]
    for k in range(n_extras):
        extra_outs[k][:] = y_f[5 + k]
    lam_out[:] = lam_f
    status_out[:] = status_f
    steps_out[:] = jnp.full(steps_out.shape, steps, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "r_obs", "theta_obs", "transfer_fn",
                     "n_extras", "lambda_max", "max_steps", "precision",
                     "method", "tile_rows", "interpret",
                     "return_unconverged", "sat_window", "sat_monitor"))
def trace_rays_aux_pallas(metric, r_obs, alphas, thetas, theta_obs,
                          transfer_fn, n_extras: int, aux,
                          lambda_max: float, max_steps: int = 200000,
                          precision: str = "fast",
                          method: str = "dp45",
                          tile_rows: int = DEFAULT_ROWS,
                          interpret: bool = False,
                          return_unconverged: bool = False,
                          sat_window: int = 0,
                          sat_monitor: tuple = ()):
    """Pallas-fused generic coupled-extras tracer; drop-in for
    ops.kerr_trace.trace_rays_aux (same ExtrasResult contract).
    float32 only. `aux` must be a flat tuple of per-ray (N,) arrays
    (the polarized path's four Walker-Penrose constants are the
    shipped example); pass () for aux-free transfer functions."""
    from light_path_tracer_tpu.ops.types import ExtrasResult
    dtype = alphas.dtype
    if dtype != jnp.float32:
        raise ValueError("pallas path is float32-only; got " + str(dtype))
    tols = get_tols(dtype, precision)
    aux = tuple(aux) if aux is not None else ()

    n = alphas.shape[0]
    tile = tile_rows * LANE
    n_pad = max(1, -(-n // tile)) * tile
    n_tiles = n_pad // tile

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,), fill, x.dtype)]) if n_pad > n else x

    def tile_of(x, fill=0.0):
        return pad(jnp.asarray(x, dtype), fill).reshape(
            n_tiles * tile_rows, LANE)

    alphas_p = tile_of(alphas, 0.1)
    thetas_p = tile_of(thetas)
    valid_p = tile_of(jnp.ones((n,), dtype))
    aux_p = tuple(tile_of(a) for a in aux)

    kernel = functools.partial(
        _extras_tile_kernel, metric=metric, r_obs=float(r_obs),
        theta_obs=float(theta_obs), lambda_max=float(lambda_max),
        max_steps=max_steps, tols=tols, transfer_fn=transfer_fn,
        n_extras=n_extras, n_aux=len(aux), method=method,
        sat_window=sat_window, sat_monitor=sat_monitor)

    block = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((n_tiles * tile_rows, LANE), dtype)
    i32 = jax.ShapeDtypeStruct((n_tiles * tile_rows, LANE), jnp.int32)
    n_out = 5 + n_extras

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[block] * (3 + len(aux)),
        out_specs=(block,) * (n_out + 3),
        out_shape=(f32,) * (n_out + 1) + (i32, i32),
        interpret=interpret,
    )(alphas_p, thetas_p, valid_p, *aux_p)

    n_steps = jnp.sum(outs[n_out + 2].reshape(n_tiles, -1)[:, 0])
    flat = [o.reshape(n_pad)[:n] for o in outs[:n_out]]
    lam_f = outs[n_out].reshape(n_pad)[:n]
    status_f = outs[n_out + 1].reshape(n_pad)[:n]

    zero = jnp.asarray(0.0, dtype)
    ok = status_f != INVALID
    extras = tuple(jnp.where(ok, flat[5 + i], zero)
                   for i in range(n_extras))
    _y0, p_t, p_phi, _inv = metric.initial_conditions_5d(
        float(r_obs), alphas, thetas, float(theta_obs))
    final_alpha, n_half, status_out = finalize_angles(
        metric, tuple(flat[:5]), p_t, p_phi, status_f)
    result = ExtrasResult(extras, final_alpha, n_half, status_out,
                          n_steps)
    if return_unconverged:
        # Same contract as the volumetric kernel: only step-budget-
        # capped lanes (lambda budget left, not saturation-exited)
        # need the full-depth re-trace.
        return result, (status_f == RUNNING) & (lam_f < lambda_max)
    return result


@functools.partial(
    jax.jit,
    static_argnames=("metric", "r_obs", "theta_obs", "transfer_fn",
                     "n_extras", "lambda_max", "max_steps", "precision",
                     "method", "pass1_steps", "slots", "tile_rows",
                     "interpret", "sat_window", "sat_monitor"))
def trace_rays_aux_two_pass(metric, r_obs, alphas, thetas, theta_obs,
                            transfer_fn, n_extras: int, aux,
                            lambda_max: float, max_steps: int = 200000,
                            precision: str = "fast",
                            method: str = "dp45",
                            pass1_steps: int = 4096,
                            slots: int = 1024,
                            tile_rows: int = DEFAULT_ROWS,
                            interpret: bool = False,
                            sat_window: int = 0,
                            sat_monitor: tuple = ()):
    """Straggler-contained coupled-extras tracing: same exact-merge
    design as trace_rays_volumetric_two_pass (the re-trace restarts
    every path integral from lambda=0). Measured trigger: the
    order-decomposition's winding-bucket state at some pointings
    carries a photon-ring orbiter grinding the full budget (200k
    steps, 1.3 s at 256² vs ~0.03 s clean — BASELINE.md round 4)."""
    from light_path_tracer_tpu.ops.types import ExtrasResult
    aux = tuple(aux) if aux is not None else ()
    res1, unconv = trace_rays_aux_pallas(
        metric, r_obs, alphas, thetas, theta_obs, transfer_fn,
        n_extras, aux, lambda_max, pass1_steps, precision=precision,
        method=method, tile_rows=tile_rows, interpret=interpret,
        return_unconverged=True, sat_window=sat_window,
        sat_monitor=sat_monitor)

    n = alphas.shape[0]
    slots = min(slots, n)
    idx = jnp.nonzero(unconv, size=slots, fill_value=0)[0]
    res2 = trace_rays_aux_pallas(
        metric, r_obs, alphas[idx], thetas[idx], theta_obs,
        transfer_fn, n_extras, tuple(a[idx] for a in aux),
        lambda_max, max_steps, precision=precision, method=method,
        tile_rows=8, interpret=interpret, sat_window=sat_window,
        sat_monitor=sat_monitor)

    take = unconv[idx]
    extras = tuple(
        e1.at[idx].set(jnp.where(take, e2, e1[idx]))
        for e1, e2 in zip(res1.extras, res2.extras))
    fa = res1.final_alpha.at[idx].set(
        jnp.where(take, res2.final_alpha, res1.final_alpha[idx]))
    nh = res1.n_half_orbits.at[idx].set(
        jnp.where(take, res2.n_half_orbits, res1.n_half_orbits[idx]))
    st = res1.status.at[idx].set(
        jnp.where(take, res2.status, res1.status[idx]))
    return ExtrasResult(extras, fa, nh, st, res1.n_steps + res2.n_steps)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "r_obs", "theta_obs", "transfer_fn",
                     "n_bands", "lambda_max", "max_steps", "precision",
                     "method", "pass1_steps", "slots", "tile_rows",
                     "interpret", "sat_window", "sat_monitor"))
def trace_rays_spectral_two_pass(metric, r_obs, alphas, thetas,
                                 theta_obs, transfer_fn, n_bands: int,
                                 lambda_max: float,
                                 max_steps: int = 200000,
                                 precision: str = "fast",
                                 method: str = "dp45",
                                 pass1_steps: int = 4096,
                                 slots: int = 1024,
                                 tile_rows: int = DEFAULT_ROWS,
                                 interpret: bool = False,
                                 sat_window: int = 0,
                                 sat_monitor: tuple = None):
    """Straggler-contained spectral tracing (SpectralResult contract)."""
    from light_path_tracer_tpu.ops.types import SpectralResult
    if sat_monitor is None:
        sat_monitor = tuple(range(1, 1 + n_bands))
    res = trace_rays_aux_two_pass(
        metric, r_obs, alphas, thetas, theta_obs, transfer_fn,
        1 + n_bands, (), lambda_max, max_steps, precision=precision,
        method=method, pass1_steps=pass1_steps, slots=slots,
        tile_rows=tile_rows, interpret=interpret,
        sat_window=sat_window, sat_monitor=sat_monitor)
    return SpectralResult(res.extras[1:], res.extras[0],
                          res.final_alpha, res.n_half_orbits,
                          res.status, res.n_steps)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "r_obs", "theta_obs", "transfer_fn",
                     "n_bands", "lambda_max", "max_steps", "precision",
                     "method", "tile_rows", "interpret", "sat_window",
                     "sat_monitor"))
def trace_rays_spectral_pallas(metric, r_obs, alphas, thetas,
                               theta_obs, transfer_fn, n_bands: int,
                               lambda_max: float,
                               max_steps: int = 200000,
                               precision: str = "fast",
                               method: str = "dp45",
                               tile_rows: int = DEFAULT_ROWS,
                               interpret: bool = False,
                               sat_window: int = 0,
                               sat_monitor: tuple = None):
    """Pallas tier for ops.kerr_trace.trace_rays_spectral: the
    (tau_hat, I_1..I_n) coupled-extras state on VMEM tiles (extras[0]
    is the shared reduced optical depth). Same SpectralResult
    contract."""
    from light_path_tracer_tpu.ops.types import SpectralResult
    if sat_monitor is None:
        sat_monitor = tuple(range(1, 1 + n_bands))
    # transfer_fn takes (y, p_t, p_phi) — no aux — and
    # trace_rays_aux_pallas passes it through unchanged when aux=().
    res = trace_rays_aux_pallas(
        metric, r_obs, alphas, thetas, theta_obs, transfer_fn,
        1 + n_bands, (), lambda_max, max_steps, precision=precision,
        method=method, tile_rows=tile_rows, interpret=interpret,
        sat_window=sat_window, sat_monitor=sat_monitor)
    return SpectralResult(res.extras[1:], res.extras[0],
                          res.final_alpha, res.n_half_orbits,
                          res.status, res.n_steps)
