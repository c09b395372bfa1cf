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

Prints one JSON line per quantity. Recorded in BASELINE.md "roofline".
"""

import functools
import json
import time

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


def main():
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
