#!/usr/bin/env python
"""Headline benchmark: 1024^2 Kerr a=0.9 shadow render, rays/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

vs_baseline compares against the CPU reference measured on this host
(BASELINE.md): the reference's own Kerr tracer (metrics.py:419-567) run
per-ray over a uniform sample of the same 1024^2 pixel grid. numba is not
installed in this image, so the reference executes its documented
pure-Python fallback path (metrics.py:16-29) single-core:
162.7 rays/s. See BASELINE.md for the numba-extrapolated comparison.
"""

import argparse
import json
import time

import numpy as np

CPU_BASELINE_RAYS_PER_SEC = 162.7   # measured 2026-08-16, see BASELINE.md


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--spin", type=float, default=0.9)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--dtype", default="float32")
    args = parser.parse_args()

    if args.dtype == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)

    from light_path_tracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.pipeline import render_shadow

    scene = SceneConfig(M=1.0, a=args.spin, r_obs_mult=100.0)
    cfg = RenderConfig(dtype=args.dtype, chunk_size=None)
    dim = (args.size, args.size)

    def measure():
        render_shadow(scene, dim, cfg)   # warmup: compile
        best = None
        for _ in range(args.repeats):
            _img, stats = render_shadow(scene, dim, cfg)
            dt = stats["timings"]["precompute"]
            rays_per_sec = stats["traced_rays"] / dt
            best = rays_per_sec if best is None else max(best,
                                                         rays_per_sec)
        return best

    try:
        best = measure()
    except Exception as exc:   # transient TPU-tunnel faults: retry once
        print(f"# bench attempt failed ({type(exc).__name__}: {exc}); "
              f"retrying in 60s", flush=True)
        time.sleep(60)
        best = measure()

    print(json.dumps({
        "metric": f"kerr_a{args.spin}_shadow_{args.size}sq_rays_per_sec_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / CPU_BASELINE_RAYS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
