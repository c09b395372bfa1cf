#!/usr/bin/env python
"""Empirical roofline for the Kerr DP45 kernel on this chip.

Both sides are MEASURED on the same device, with the same timing
protocol, rather than quoted from datasheets:

  * VPU f32 peak: a Pallas FMA-chain kernel on VMEM tiles, rate taken as
    the MARGINAL cost between two chain lengths — this cancels the
    ~27 ms fixed host-readback latency of this TPU tunnel (every timing
    here forces a scalar readback, because bare block_until_ready can be
    served from tunnel-side memoization for repeated programs).
  * sin() throughput: same protocol with a sin chain (the theta-form RHS
    costs 2 transcendentals per evaluation).
  * Achieved: the Kerr tracer's FLOP/s from its own step counters times
    a hand-counted ~1.18 kflop/lane/step DP45 body (6 RHS evaluations at
    ~110 flops + 2 sin/cos each, tableau combinations, embedded error
    norm, Hermite event location, controller, masking), minus the same
    fixed readback latency.

Round 5 adds `--extras`: the same protocol for the volumetric/extras
VMEM tile kernels (6/7/9/10-component error-controlled states —
thin/absorbed transfer, 3-band spectra, photon-ring order buckets,
polarized Stokes). Their per-lane-step flop counts are MECHANICAL, not
hand-counted: XLA's own cost analysis of the mode's full RHS closure
(geodesic rhs5 + the emission/transfer derivatives, exactly the
function the kernel integrates) supplies the 6-stage term, and the
DP45 scaffolding (tableau combinations, embedded error norm, Hermite
event location, controller, masking) is the documented structural
formula 86*C + 55 flops per lane-step for a C-component state —
calibrated against the lens kernel's hand count (C=5: 6*rhs + 485 vs
the recorded 1,180 at rhs ~ 116; ROOFLINE_r02.jsonl). Achieved rate
uses the kernels' own tile-step counters x lanes-per-tile, minus the
measured fixed readback overhead — the identical protocol as the lens
row, so utilizations are directly comparable.

Prints one JSON line per quantity. Recorded in BASELINE.md "roofline"
and the per-round ROOFLINE_r{N}.jsonl artifact.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_path_tracer_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

ROWS, LANE, N_TILES = 512, 128, 16
N_ELEM = N_TILES * ROWS * LANE


def _chain_kernel(x_ref, o_ref, *, k, op):
    x = x_ref[:]
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    if op == "fma":
        body = lambda _, v: v * a + b
    else:
        body = lambda _, v: jnp.sin(v)
    o_ref[:] = jax.lax.fori_loop(0, k, body, x)


@functools.partial(jax.jit, static_argnames=("k", "op"))
def _chain(x, k, op):
    blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_chain_kernel, k=k, op=op)
    return pl.pallas_call(
        kern, grid=(N_TILES,), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((N_TILES * ROWS, LANE),
                                       jnp.float32))(x)


def _timed(fn):
    """Best-of-4 wall time with forced scalar readback, fresh inputs."""
    fn(0)  # warm/compile
    best = np.inf
    for i in range(4):
        t0 = time.perf_counter()
        fn(i + 1)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_chain(op, k):
    x = jnp.ones((N_TILES * ROWS, LANE), jnp.float32) * 0.5

    def run(i):
        x_i = x + np.float32(1e-3 * i)
        return np.asarray(_chain(x_i, k, op)[0, 0])

    return _timed(run)


def _rhs_flops_per_lane(metric, extra, n_extras, n_lanes=256):
    """XLA cost analysis of the mode's full RHS closure (the exact
    function dp45_integrate evaluates 6x per step), per lane."""
    cpu = jax.devices("cpu")[0]
    ones = jnp.ones((n_lanes,), jnp.float32)
    p_t, p_phi = -ones, 0.31 * ones

    def f(y):
        base = metric.rhs5(y[:5], p_t, p_phi)
        if extra is None:
            return base
        return (*base, *extra(y, p_t, p_phi))

    vals = [10.0, 1.2, 0.3, -0.1, 0.2] + [0.05] * n_extras
    ys = tuple(jnp.full((n_lanes,), v, jnp.float32) for v in vals)
    with jax.default_device(cpu):
        cost = jax.jit(f).lower(ys).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"]) / n_lanes


def _extras_rows(rate_fma, overhead):
    """Roofline rows for the volumetric/extras tile kernels."""
    from light_path_tracer_tpu import camera
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
        trace_rays_aux_pallas, trace_rays_spectral_pallas,
        trace_rays_volumetric_pallas)
    from light_path_tracer_tpu.volumetric import (
        RIAFConfig, make_order_transfer, make_spectral_transfer,
        make_transfer_fns)

    m = Kerr(M=1.0, a=0.9)
    dim = (512, 512)
    theta_obs = float(np.radians(80.0))
    fov = camera.fov_from_vertical(np.radians(16.0), dim)
    al = camera.build_alpha_lookup(dim, fov, dtype=jnp.float32).ravel()
    th = camera.build_theta_lookup(dim, fov, dtype=jnp.float32).ravel()
    rows = 32
    lanes = rows * 128
    lam = 5000.0
    SAT = 2048                       # production saturation window

    riaf = RIAFConfig()
    riaf_abs = RIAFConfig(alpha0=0.3)
    em_fn, _ = make_transfer_fns(m, riaf)
    em_a, ab_a = make_transfer_fns(m, riaf_abs)
    spec_fn = make_spectral_transfer(m, RIAFConfig(
        g_power=4.0, alpha0=1.0, opacity_index=3.0), (0.1, 1.0, 10.0))
    order_fn = make_order_transfer(m, riaf, 3)

    # Polarized Stokes: camera-side Walker-Penrose constants as aux.
    from light_path_tracer_tpu.polarization import (
        k_contravariant, make_polarized_volumetric_transfer,
        observer_basis, walker_penrose)
    pol_fn = make_polarized_volumetric_transfer(m, riaf, "toroidal",
                                                0.7)
    y0, _pt, pph = m.initial_conditions_5d(100.0, al, th, theta_obs)[:3]
    k_cam = k_contravariant(jnp.float32(1.0), jnp.float32(0.9), y0[0],
                            y0[1], y0[3], y0[4], pph)
    e1, e2 = observer_basis(jnp.float32(1.0), jnp.float32(0.9), 100.0,
                            theta_obs, k_cam)
    k11, k21 = walker_penrose(jnp.float32(0.9), y0[0], y0[1], k_cam, e1)
    k12, k22 = walker_penrose(jnp.float32(0.9), y0[0], y0[1], k_cam, e2)
    aux = (k11, k21, k12, k22)
    aux_host = tuple(np.asarray(a)[:256] for a in aux)

    def extra_thin(y, pt, pp):
        return (em_fn(y[:5], pt, pp),)

    def extra_abs(y, pt, pp):
        return (jnp.exp(-jnp.maximum(y[6], -30.0))
                * em_a(y[:5], pt, pp), ab_a(y[:5], pt, pp))

    def extra_pol(y, pt, pp):
        a = tuple(jnp.asarray(v) for v in aux_host)
        return pol_fn(y, pt, pp, a)

    modes = {
        "volumetric_thin": dict(
            n_extras=1, extra=extra_thin,
            run=lambda a: trace_rays_volumetric_pallas(
                m, 100.0, a, th, theta_obs, em_fn, lam, 200000,
                tile_rows=rows, sat_window=SAT)),
        "volumetric_absorbed": dict(
            n_extras=2, extra=extra_abs,
            run=lambda a: trace_rays_volumetric_pallas(
                m, 100.0, a, th, theta_obs, em_a, lam, 200000,
                absorption_fn=ab_a, tile_rows=rows, sat_window=SAT)),
        "spectral_3band": dict(
            n_extras=4, extra=spec_fn,
            run=lambda a: trace_rays_spectral_pallas(
                m, 100.0, a, th, theta_obs, spec_fn, 3, lam, 200000,
                tile_rows=rows, sat_window=SAT)),
        "order_decomposed_x3": dict(
            n_extras=4, extra=order_fn,
            run=lambda a: trace_rays_spectral_pallas(
                m, 100.0, a, th, theta_obs, order_fn, 3, lam, 200000,
                tile_rows=rows, sat_window=SAT,
                sat_monitor=(1, 2, 3))),
        "polarized_stokes": dict(
            n_extras=3, extra=extra_pol,
            run=lambda a: trace_rays_aux_pallas(
                m, 100.0, a, th, theta_obs, pol_fn, 3, aux, lam,
                200000, tile_rows=rows, sat_window=SAT,
                sat_monitor=(0, 1, 2))),
    }

    for name, mode in modes.items():
        n_comp = 5 + mode["n_extras"]
        rhs = _rhs_flops_per_lane(m, mode["extra"], mode["n_extras"])
        flops_step = 6.0 * rhs + 86.0 * n_comp + 55.0

        def run(i, _run=mode["run"]):
            a_i = al * np.float32(1.0 + 1e-5 * i)
            out = _run(a_i)
            steps = int(out.n_steps)                 # forces readback
            np.asarray(out.final_alpha[0])
            return steps

        # Pair each rep's time with ITS OWN step count: pointing
        # jitter moves which lanes grind between reps, so best-time
        # with another rep's steps fabricates impossible rates (first
        # recording of this section measured 7x "utilization").
        run(0)   # warm/compile
        best = None
        for i in range(4):
            t0 = time.perf_counter()
            steps = run(i + 1)
            dt = time.perf_counter() - t0
            if best is None or dt / max(steps, 1) < best[0]:
                best = (dt / max(steps, 1), dt, steps)
        _per, dt, steps = best
        t = dt - overhead
        achieved = steps * lanes * flops_step / t
        print(json.dumps({
            "metric": f"{name}_achieved_f32",
            "value": round(achieved / 1e12, 3), "unit": "TFLOP/s",
            "components": n_comp,
            "rhs_flops_per_lane_xla_cost_analysis": round(rhs, 1),
            "flops_per_lane_step": round(flops_step, 1),
            "tile_steps": steps,
            "compute_seconds": round(t, 4),
            "utilization_vs_measured_fma_peak":
                round(achieved / rate_fma, 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extras", action="store_true",
                    help="also roofline the volumetric/extras kernels")
    ap.add_argument("--skip-lens", action="store_true",
                    help="skip the 1024^2 lens-kernel achieved row")
    args = ap.parse_args()
    k1, k2 = 16384, 65536
    t1f, t2f = measure_chain("fma", k1), measure_chain("fma", k2)
    rate_fma = N_ELEM * (k2 - k1) * 2 / (t2f - t1f)     # 2 flops per FMA
    overhead = t1f - N_ELEM * k1 * 2 / rate_fma
    print(json.dumps({"metric": "vpu_f32_fma_peak_marginal",
                      "value": round(rate_fma / 1e12, 3),
                      "unit": "TFLOP/s",
                      "fixed_readback_overhead_ms":
                          round(overhead * 1e3, 1)}))

    t1s, t2s = measure_chain("sin", k1 // 4), measure_chain("sin", k2 // 4)
    rate_sin = N_ELEM * (k2 - k1) / 4 / (t2s - t1s)
    print(json.dumps({"metric": "vpu_f32_sin_throughput_marginal",
                      "value": round(rate_sin / 1e9, 1), "unit": "Gsin/s",
                      "sin_cost_fma_equiv":
                          round(rate_fma / 2 / rate_sin, 1)}))

    if args.extras:
        _extras_rows(rate_fma, overhead)
    if args.skip_lens:
        return

    # Achieved by the Kerr tracer (theta form, fast tier, rows=32).
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
        trace_rays_kerr_pallas)
    from light_path_tracer_tpu import camera

    m = Kerr(M=1.0, a=0.9)
    dim = (1024, 1024)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    al = camera.build_alpha_lookup(dim, fov, dtype=jnp.float32).ravel()
    th = camera.build_theta_lookup(dim, fov, dtype=jnp.float32).ravel()
    rf = jnp.zeros(al.shape, bool)
    rows = 32
    steps_box = {}

    def run(i):
        a_i = al * np.float32(1.0 + 1e-5 * i)
        out = trace_rays_kerr_pallas(m, 100.0, a_i, th, np.pi / 2, rf,
                                     5000.0, 200000, tile_rows=rows,
                                     formulation="theta")
        steps_box["steps"] = int(out.n_steps)       # forces readback
        return np.asarray(out.final_alpha[0])

    t_kerr = _timed(run) - overhead
    flops_per_lane_step = 1180          # hand count, module docstring
    lanes = rows * 128
    achieved = steps_box["steps"] * lanes * flops_per_lane_step / t_kerr
    print(json.dumps({
        "metric": "kerr_dp45_achieved_f32",
        "value": round(achieved / 1e12, 3), "unit": "TFLOP/s",
        "tile_steps": steps_box["steps"],
        "compute_seconds": round(t_kerr, 4),
        "flops_per_lane_step_assumed": flops_per_lane_step,
        "utilization_vs_measured_fma_peak":
            round(achieved / rate_fma, 3)}))


if __name__ == "__main__":
    main()
