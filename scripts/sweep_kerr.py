#!/usr/bin/env python
"""Sweep the Kerr tracer's performance knobs on the real chip.

Trace-only timing (no renderer, no camera build) of the 1024^2 Kerr a=0.9
shadow workload: single-pass tile sizes vs two-pass (pass1_steps, rows).
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from light_path_tracer_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from light_path_tracer_tpu.models import Kerr
from light_path_tracer_tpu import camera
from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
    trace_rays_kerr_pallas, trace_rays_kerr_two_pass)


def workload(size):
    dim = (size, size)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    alpha = camera.build_alpha_lookup(dim, fov, dtype=jnp.float32)
    theta = camera.build_theta_lookup(dim, fov, dtype=jnp.float32)
    return alpha.ravel(), theta.ravel()


def bench(fn, *args, repeats=3, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--spin", type=float, default=0.9)
    args = p.parse_args()

    metric = Kerr(M=1.0, a=args.spin)
    r_obs = 100.0
    alphas, thetas = workload(args.size)
    n = alphas.shape[0]
    refine = jnp.zeros((n,), bool)
    lam_max = max(5000.0, 6.0 * r_obs)

    print(f"# {args.size}^2 Kerr a={args.spin}: {n} rays")

    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr_hybrid

    for form in ("theta", "mu"):
        for rows in (16, 32, 64):
            dt, res = bench(trace_rays_kerr_pallas, metric, r_obs, alphas,
                            thetas, np.pi / 2, refine, lam_max, 200000,
                            tile_rows=rows, formulation=form)
            steps = int(res.n_steps)
            print(f"single {form:<6} rows={rows:<4} {dt*1e3:8.1f} ms  "
                  f"{n/dt/1e6:6.2f} Mrays/s  tile-steps={steps}")

    for rows in (16, 32, 64):
        for p1 in (None, 256, 512):
            dt, res = bench(trace_rays_kerr_hybrid, metric, r_obs,
                            alphas, thetas, np.pi / 2, refine, lam_max,
                            200000, backend="pallas", pass1_steps=p1,
                            tile_rows=rows)
            steps = int(res.n_steps)
            print(f"hybrid rows={rows:<3} p1={str(p1):<5} {dt*1e3:8.1f} ms  "
                  f"{n/dt/1e6:6.2f} Mrays/s  tile-steps={steps}")


if __name__ == "__main__":
    main()
