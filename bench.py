#!/usr/bin/env python
"""Benchmarks for every BASELINE.json config.

Default: the headline config 3 (1024^2 Kerr a=0.9 shadow), ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N,
   "vs_native_cpu": N}

--all additionally reproduces configs 1/2/4/5 (one JSON line each), so
every number in BASELINE.md regenerates from this script.

vs_baseline compares against the CPU reference measured on this host
(BASELINE.md): the reference's own Kerr tracer (metrics.py:419-567) run
per-ray over a uniform sample of the same 1024^2 pixel grid. numba is not
installed in this image, so the reference executes its documented
pure-Python fallback path (metrics.py:16-29) single-core: 162.7 rays/s.
vs_native_cpu compares against this repo's own C++/OpenMP engine
(native/) — the honest "reference rebuilt with a proper native tier"
comparator — measured live on a ray sample when the engine is available,
else the recorded 57.5k rays/s (BASELINE.md, 1 core).
"""

import argparse
import json
import time

import numpy as np

CPU_BASELINE_RAYS_PER_SEC = 162.7    # measured 2026-08-16, see BASELINE.md
NATIVE_CPU_RAYS_PER_SEC = 57_500.0   # recorded fallback, see BASELINE.md


_JSON_SINK = None   # set by --json: every emitted line is also appended
#   to that file, so `bench.py --all --json BENCH_ALL_r{N}.json` leaves
#   ONE committed artifact carrying every headline number (round-5
#   verdict item 6: no more prose-only performance claims — README and
#   docs/modes.md are mechanically checked against the artifacts by
#   scripts/check_numbers.py, which runs in the fast test lane).


def _emit(metric, value, unit, **extra):
    line = {"metric": metric, "value": round(value, 1), "unit": unit}
    line.update(extra)
    print(json.dumps(line), flush=True)
    if _JSON_SINK is not None:
        with open(_JSON_SINK, "a") as fh:
            fh.write(json.dumps(line) + "\n")


def measure_native_cpu(size, spin, n_sample=1500):
    """Live rays/s of the native C++ engine on a grid ray sample."""
    from light_path_tracer_tpu import native, camera
    if not native.available():
        return NATIVE_CPU_RAYS_PER_SEC
    import jax.numpy as jnp
    dim = (size, size)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    al = np.asarray(camera.build_alpha_lookup(dim, fov, dtype=jnp.float32),
                    np.float64).ravel()
    th = np.asarray(camera.build_theta_lookup(dim, fov, dtype=jnp.float32),
                    np.float64).ravel()
    rng = np.random.default_rng(0)
    pick = rng.choice(al.size, size=n_sample, replace=False)
    t0 = time.perf_counter()
    native.kerr_trace_batch(1.0, spin, float(100.0), al[pick], th[pick])
    return n_sample / (time.perf_counter() - t0)


def _best_rays_per_sec(render, repeats):
    render()  # warmup: compile
    best = None
    for _ in range(repeats):
        _img, stats = render()
        dt = stats["timings"]["precompute"]
        rays_per_sec = stats["traced_rays"] / dt
        best = rays_per_sec if best is None else max(best, rays_per_sec)
    return best


def bench_kerr_headline(args):
    """Config 3: Kerr a=0.9 shadow, adaptive stepping (the north star)."""
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.pipeline import render_shadow

    scene = SceneConfig(M=1.0, a=args.spin, r_obs_mult=100.0)
    cfg = RenderConfig(dtype=args.dtype, chunk_size=None,
                       integrator=args.integrator)
    dim = (args.size, args.size)

    def measure():
        return _best_rays_per_sec(
            lambda: render_shadow(scene, dim, cfg), args.repeats)

    try:
        best = measure()
    except Exception as exc:   # transient TPU-tunnel faults: retry once
        print(f"# bench attempt failed ({type(exc).__name__}: {exc}); "
              f"retrying in 60s", flush=True)
        time.sleep(60)
        best = measure()

    try:
        native_rps = measure_native_cpu(args.size, args.spin)
    except Exception:
        native_rps = NATIVE_CPU_RAYS_PER_SEC

    _emit(f"kerr_a{args.spin}_shadow_{args.size}sq_rays_per_sec_chip",
          best, "rays/s",
          vs_baseline=round(best / CPU_BASELINE_RAYS_PER_SEC, 1),
          vs_native_cpu=round(best / native_rps, 1))


def bench_schwarzschild_shadow(args):
    """Config 1: Schwarzschild shadow, integrated per-pixel rays."""
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.pipeline import render_shadow

    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    cfg = RenderConfig(dtype=args.dtype, chunk_size=None)
    dim = (args.size, args.size)
    best = _best_rays_per_sec(
        lambda: render_shadow(scene, dim, cfg), args.repeats)
    _emit(f"schwarzschild_shadow_{args.size}sq_rays_per_sec_chip",
          best, "rays/s")


def bench_lensed(args):
    """Config 2: 512^2 Schwarzschild lensed background render."""
    import jax
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.pipeline import render_scene

    rng = np.random.default_rng(3)
    src = rng.random((512, 512, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    cfg = RenderConfig(dtype=args.dtype, chunk_size=None)

    render_scene(scene, src, cfg)  # warmup
    best = None
    for _ in range(args.repeats):
        out = render_scene(scene, src, cfg)
        jax.block_until_ready(out.image)
        total = out.timings["total"]
        best = total if best is None else min(best, total)
    _emit("schwarzschild_lensed_512sq_seconds_per_frame", best, "s",
          trace_rays_per_sec=round(
              out.precompute.traced_rays / out.timings["precompute"], 1))


def bench_disk(args):
    """Config 4: accretion disk with redshift + Doppler beaming."""
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.disk import render_disk, DiskConfig

    scene = SceneConfig(M=1.0, a=args.spin, r_obs_mult=100.0,
                        theta_obs=np.radians(80.0))
    cfg = RenderConfig(dtype=args.dtype)
    dim = (args.size, args.size)

    def render():
        img, stats = render_disk(scene, dim, cfg, DiskConfig())
        return img, stats

    best = _best_rays_per_sec(render, args.repeats)
    _emit(f"disk_a{args.spin}_{args.size}sq_rays_per_sec_chip",
          best, "rays/s")


def bench_aa_4k(args):
    """Config 5: 4k shadow, 4x jittered AA, tiled across all devices.

    Drives the stacked-grid trace directly with per-repeat perturbed
    inputs: this TPU tunnel memoizes repeat-identical executions
    (BASELINE.md measurement-hygiene note), so timing a second identical
    render_shadow_aa call would report a fantasy number.
    """
    import jax
    import jax.numpy as jnp
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.models import make_metric
    from light_path_tracer_tpu import camera
    from light_path_tracer_tpu.aa import aa_offsets, _stacked_grids
    from light_path_tracer_tpu.ops.batch import trace_batch

    scene = SceneConfig(M=1.0, a=args.spin, r_obs_mult=100.0)
    cfg = RenderConfig(dtype=args.dtype)
    dim = (2160, 3840)
    n_dev = len(jax.devices())
    metric = make_metric(scene.M, scene.a)
    fov = camera.fov_from_vertical(scene.vertical_fov, dim)
    # Equatorial mirror symmetry (aa.py module docstring): only rows
    # 0..H//2 of each AA pass are traced; the delivered image still
    # carries 4 samples/pixel (bottom rows sample the mirrored offsets).
    trace_rows = dim[0] // 2 + 1
    alpha, theta = _stacked_grids(metric, scene, cfg, dim, fov,
                                  aa_offsets(4), trace_rows=trace_rows)
    alpha, theta = alpha.ravel(), theta.ravel()

    def run(alpha_i):
        res = trace_batch(metric, scene.r_obs, alpha_i, theta,
                          scene.theta_obs, backend=cfg.backend,
                          precision=cfg.precision,
                          chunk_size=trace_rows * dim[1],
                          sort_by_difficulty=False)
        top = jnp.where(jnp.isnan(res.final_alpha.reshape(
            (4, trace_rows, dim[1]))), 0.0, 1.0).mean(axis=0)
        n_bottom = dim[0] - trace_rows
        img = jnp.concatenate([top, top[1:n_bottom + 1][::-1]], axis=0)
        # Actually fetch a value: on this tunnel block_until_ready alone
        # can return before execution (BASELINE.md hygiene note).
        float(img.sum())

    run(alpha)  # warm/compile
    best = None
    for i in range(max(2, args.repeats - 1)):
        alpha_i = alpha * np.float32(1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        run(alpha_i)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rays = dim[0] * dim[1] * 4
    traced = int(alpha.size)
    _emit(f"kerr_a{args.spin}_4k_aa4_rays_per_sec", rays / best, "rays/s",
          seconds_per_frame=round(best, 2), devices=n_dev,
          traced_rays=traced,
          traced_rays_per_sec=round(traced / best, 1))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--spin", type=float, default=0.9)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--integrator", default="dp45",
                        choices=["dp45", "dop853"],
                        help="headline-config Kerr integrator")
    parser.add_argument("--all", action="store_true",
                        help="run every BASELINE.json config")
    parser.add_argument("--json", default=None, metavar="PATH",
                        help="also append every emitted JSON line to "
                             "PATH (the committed BENCH_ALL artifact)")
    args = parser.parse_args()
    if args.json:
        global _JSON_SINK
        _JSON_SINK = args.json

    if args.dtype == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)

    # Backend-init watchdog: a wedged axon TPU grant hangs even
    # jax.devices() indefinitely (observed for whole sessions,
    # BASELINE.md "wedged-tunnel caveat"), blocking INSIDE native RPC
    # code — so a Python signal handler would never run. A watchdog
    # THREAD prints the driver's one JSON line and hard-exits if the
    # backend never comes up.
    import threading
    import os as _os
    _backend_up = threading.Event()

    def _watchdog():
        if not _backend_up.wait(timeout=420.0):
            # Same key the real headline measurement would use, so
            # recorders see an explicit zero-valued row, not a gap.
            _emit(f"kerr_a{args.spin}_shadow_{args.size}sq_"
                  f"rays_per_sec_chip", 0.0, "rays/s",
                  error="TPU backend init timed out (wedged axon "
                        "grant); no measurement taken")
            _os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    jax.devices()
    _backend_up.set()

    from light_path_tracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    bench_kerr_headline(args)
    if args.all:
        bench_schwarzschild_shadow(args)
        bench_lensed(args)
        bench_disk(args)
        bench_aa_4k(args)


if __name__ == "__main__":
    main()
