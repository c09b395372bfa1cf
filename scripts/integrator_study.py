#!/usr/bin/env python
"""Integrator cost/accuracy frontier: DP45 vs DOP853 on the headline
1024^2 Kerr a=0.9 workload (f32 Pallas tiles on the TPU).

Motivation (BASELINE.md roofline): the DP45 kernel runs at ~73% of the
measured VPU f32 peak, so per-instruction tuning has <= 1.4x headroom —
further speedups must come from FEWER steps. DOP853 takes ~2x fewer
steps at 2x the stage cost at *equal tolerance* (a wash), but its 8th-
order solution is far more accurate than the controlled 5th-order
estimate, so at *equal delivered accuracy* it can run at a much looser
tolerance. This script measures that frontier empirically:

  * f64 oracle: reference-tolerance DP45 on N_SAMPLE rays (CPU backend,
    cached in /tmp between runs — it is minutes of single-core work).
  * for each (method, precision-tier): full-grid f32 TPU trace; report
    trace seconds (perturbed-input repeats — this tunnel memoizes
    repeat-identical dispatches), total lock-step tile steps, final-
    alpha RMSE/p99 vs the oracle, and shadow classification agreement.

One JSON line per configuration. Run: JAX_PLATFORMS=axon,cpu (default
env works).
"""

import json
import os
import time

import numpy as np

N_SAMPLE = 8192
DIM = (1024, 1024)
SPIN, R_OBS = 0.9, 100.0
ORACLE_CACHE = "/tmp/integrator_study_oracle.npz"

CONFIGS = [
    ("dp45", "fast"),
    ("dp45", "precise"),
    ("dop853", "fast"),
    ("dop853", "tol:1e-4"),
    ("dop853", "tol:3e-4"),
    ("dop853", "tol:1e-3"),
]


def main():
    import jax
    import jax.numpy as jnp

    from light_path_tracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu import camera
    from light_path_tracer_tpu.ops.batch import trace_batch

    metric = Kerr(M=1.0, a=SPIN)
    fov = camera.fov_from_vertical(np.radians(40.0), DIM)

    cpu = jax.devices("cpu")[0]
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    accel = accel[0] if accel else cpu

    rng = np.random.default_rng(7)
    flat = rng.choice(DIM[0] * DIM[1], size=N_SAMPLE, replace=False)
    iy, ix = np.unravel_index(flat, DIM)

    # ---- f64 oracle on the sampled rays (cached across runs) ----
    if os.path.exists(ORACLE_CACHE):
        data = np.load(ORACLE_CACHE)
        fa64, st64 = data["fa"], data["st"]
    else:
        jax.config.update("jax_enable_x64", True)
        with jax.default_device(cpu):
            a64 = camera.build_alpha_lookup(DIM, fov, dtype=jnp.float64)
            t64 = camera.build_theta_lookup(DIM, fov, dtype=jnp.float64)
            a_s = jnp.asarray(np.asarray(a64)[iy, ix], jnp.float64)
            t_s = jnp.asarray(np.asarray(t64)[iy, ix], jnp.float64)
            t0 = time.perf_counter()
            res = trace_batch(metric, R_OBS, a_s, t_s, backend="xla",
                              chunk_size=2048)
            fa64 = np.asarray(res.final_alpha)
            st64 = np.asarray(res.status)
            print(f"# oracle: {time.perf_counter() - t0:.0f}s", flush=True)
        np.savez(ORACLE_CACHE, fa=fa64, st=st64)
        jax.config.update("jax_enable_x64", False)

    # ---- f32 grid on the accelerator ----
    with jax.default_device(accel):
        a32 = camera.build_alpha_lookup(DIM, fov, dtype=jnp.float32)
        t32 = camera.build_theta_lookup(DIM, fov, dtype=jnp.float32)
        a_flat, t_flat = a32.ravel(), t32.ravel()

        for method, precision in CONFIGS:
            def run(al):
                res = trace_batch(metric, R_OBS, al, t_flat,
                                  backend="auto", integrator=method,
                                  precision=precision)
                fa = np.asarray(res.final_alpha, np.float64).reshape(DIM)
                return fa, int(res.n_steps)

            fa32, steps = run(a_flat)          # warm/compile
            best = None
            for i in range(2):
                al = a_flat * np.float32(1.0 + 1e-6 * (i + 1))
                t0 = time.perf_counter()
                run(al)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)

            fa_s = fa32[iy, ix]
            shadow_agree = float(np.mean(np.isnan(fa_s)
                                         == np.isnan(fa64)))
            both = ~np.isnan(fa_s) & ~np.isnan(fa64)
            d = np.abs(fa_s[both] - fa64[both])
            print(json.dumps({
                "method": method, "precision": precision,
                "trace_seconds": round(best, 3),
                "rays_per_sec": round(DIM[0] * DIM[1] / best, 0),
                "tile_steps": steps,
                "final_alpha_rmse_rad": float(np.sqrt(np.mean(d ** 2))),
                "final_alpha_p99_rad": float(np.percentile(d, 99)),
                "shadow_agreement": round(shadow_agree, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
