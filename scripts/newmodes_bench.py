#!/usr/bin/env python
"""Timing sweep of the late round-3 observational modes.

  python scripts/newmodes_bench.py [--size 256] [--device tpu|cpu]
                                   [--reps 2]

Times (warm, StageTimer on-device stages — the axon-hygiene protocol:
inputs perturbed per repeat so memoized repeats cannot fake speed):
  volumetric thin / absorbed / 3-band spectral / 8-frame movie /
  polarized, and the stellar-surface image + 32-phase pulse profile.
Prints one table row per mode: steps, precompute seconds, rays/s.
Paste into BASELINE.md once measured on the real chip.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--device", default="default",
                    choices=["default", "cpu", "tpu"])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", default=None,
                    help="substring filter on mode names")
    ap.add_argument("--backend", default="xla",
                    choices=["xla", "pallas", "auto"],
                    help="integrator backend for modes that take "
                         "cfg.backend (volumetric family rides the "
                         "Pallas tile kernel on TPU f32 when "
                         "'pallas'/'auto')")
    ap.add_argument("--json", default=None,
                    help="append one JSON line per mode to this file "
                         "(the committed NEWMODES artifact)")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from light_path_tracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                    SceneConfig)
    from light_path_tracer_tpu.volumetric import (
        RIAFConfig, render_volumetric, render_volumetric_movie,
        render_volumetric_spectrum)
    from light_path_tracer_tpu.polarization import (
        render_polarized_volumetric)
    from light_path_tracer_tpu.star import (StarConfig, pulse_profile,
                                            render_star)
    from light_path_tracer_tpu.disk import keplerian_omega

    size = (args.size, args.size)
    cfg = RenderConfig(backend=args.backend)
    period = 2 * np.pi / abs(float(keplerian_omega(1.0, 0.9, 6.0, True)))
    movie_times = tuple(period * k / 8 for k in range(8))

    def scene(jitter):
        # Perturbed camera POINTING per repeat: identical dispatches
        # can be served memoized through the axon tunnel (BASELINE.md
        # hygiene addendum), so no two timed runs are bit-identical.
        # psi_y rides the traced lookup VALUES; theta_obs (and every
        # other scene scalar) is a STATIC jit argument of the trace
        # entry points, so perturbing it measures recompiles — which
        # is exactly what this script did before this fix.
        return SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                           theta_obs=np.radians(80.0),
                           psi_y=np.radians(0.01 * (jitter + 1)),
                           vertical_fov_deg=16.0)

    star_scene_kw = dict(M=1.0, a=0.0, r_obs_mult=200.0,
                         vertical_fov_deg=6.0)

    from light_path_tracer_tpu.volumetric import (
        render_volumetric_decomposed)
    from light_path_tracer_tpu.disk import (DiskConfig,
                                            render_disk_decomposed)

    def _fov_scene(s):
        # polarized volumetric requires psi = (0, 0) (BH-centered
        # camera basis), and an off-axis psi tilts one screen column
        # into the polar-axis grind for the decomposition's winding
        # state — those rows jitter the FOV instead (still traced
        # lookup values, same compiled program).
        return SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                           theta_obs=np.radians(80.0),
                           vertical_fov_deg=16.0
                           + np.degrees(s.psi_y) * 0.1)

    def _decomposed(s, size, cfg):
        return render_volumetric_decomposed(_fov_scene(s), size, cfg,
                                            RIAFConfig(), n_orders=3)

    def _disk_decomposed(s, size, cfg):
        return render_disk_decomposed(s, size, cfg,
                                      DiskConfig(r_out=20.0),
                                      n_orders=3)

    modes = {
        "volumetric thin": lambda s: render_volumetric(
            s, size, cfg, RIAFConfig()),
        "volumetric absorbed": lambda s: render_volumetric(
            s, size, cfg, RIAFConfig(alpha0=0.3)),
        "volumetric jet b=0.6": lambda s: render_volumetric(
            s, size, cfg, RIAFConfig(profile="jet", jet_beta=0.6,
                                     index=-1.0)),
        "spectral 3-band": lambda s: render_volumetric_spectrum(
            s, size, (0.1, 1.0, 10.0), cfg,
            RIAFConfig(g_power=4.0, alpha0=1.0, opacity_index=3.0)),
        "movie 8-frame": lambda s: render_volumetric_movie(
            s, size, movie_times, cfg, RIAFConfig(spot_amp=8.0)),
        "polarized": lambda s: render_polarized_volumetric(
            _fov_scene(s), size, cfg, RIAFConfig()),
        "star image": lambda s: render_star(
            SceneConfig(psi_y=s.psi_y, **star_scene_kw),
            size, cfg, StarConfig(radius=5.0, omega=0.02)),
        "star pulse x32": lambda s: pulse_profile(
            SceneConfig(psi_y=s.psi_y, **star_scene_kw),
            cfg, StarConfig(radius=5.0, omega=0.02), n_phases=32,
            resolution=size),
        "decomposed x3": lambda s: _decomposed(s, size, cfg),
        "disk decomposed x3": lambda s: _disk_decomposed(s, size, cfg),
    }

    # Source-plane products (weak-field scene: r_obs = 1000M) and the
    # user-metric plug-in (autodiff RHS, XLA backend) — jitter rides
    # theta_obs into the scene like the star rows.
    from light_path_tracer_tpu.pipeline import (render_caustics,
                                                render_microlens_curve,
                                                render_shadow,
                                                render_shear,
                                                render_time_delay)
    from light_path_tracer_tpu.models import CustomMetric
    from light_path_tracer_tpu.models.custom import kerr_covariant

    # NOTE the perturbation: theta_obs is a STATIC argument of
    # trace_rays_surface (recompiles per value) — these rows jitter
    # psi_y instead (traced lookup VALUES change, same program).
    weak_kw = dict(M=1.0, a=0.9, r_obs_mult=1000.0,
                   vertical_fov_deg=40.0, theta_obs=np.pi / 2)
    _custom = CustomMetric(M=1.0, a=0.9,
                           covariant_fn=kerr_covariant(1.0, 0.9),
                           label="kerr-as-custom")
    from light_path_tracer_tpu.models import Kerr as _Kerr
    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr
    from light_path_tracer_tpu.utils.timing import StageTimer
    import jax.numpy as jnp
    _kerr_ref = _Kerr(M=1.0, a=0.9)

    def _trace_only(metric, jitter):
        from light_path_tracer_tpu.ops.batch import trace_batch
        rng = np.random.default_rng(int(jitter * 1e6) % 2**31)
        n = args.size * args.size
        alphas = jnp.asarray(rng.uniform(0.005, 0.3, n), jnp.float32)
        thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n),
                             jnp.float32)
        timer = StageTimer()
        with timer.stage("precompute") as out:
            # 'pallas' -> 'auto' so metrics with supports_pallas=False
            # (the autodiff custom metric) fall back instead of raising.
            res = trace_batch(metric, 100.0, alphas, thetas,
                              np.pi / 2, jnp.zeros(n, bool),
                              lambda_max=5000.0, max_steps=200000,
                              backend=("auto" if args.backend == "pallas"
                                       else args.backend))
            out.append(res.final_alpha)
        return None, {"timings": timer.finish(),
                      "integrator_steps": int(res.n_steps)}
    modes.update({
        "caustics 128-bin": lambda s: render_caustics(
            SceneConfig(psi_y=s.psi_y, **weak_kw),
            size, cfg, bins=128)[2:],
        "microlens x41": lambda s: render_microlens_curve(
            SceneConfig(psi_y=s.psi_y, **weak_kw),
            size, cfg, n_points=41)[2:],
        # Direct trace comparison (the scene is a static arg of the
        # fused shadow pipeline, so scene-jitter would measure
        # recompiles): the autodiff-Hamiltonian RHS of the plug-in
        # metric vs Kerr's hand-derived RHS on identical rays.
        "custom-metric trace": lambda s: _trace_only(
            _custom, s.psi_y),
        "kerr hand-RHS trace": lambda s: _trace_only(
            _kerr_ref, s.psi_y),
        "time-delay map": lambda s: render_time_delay(
            SceneConfig(psi_y=s.psi_y, **weak_kw), size, cfg),
        "shear decomposition": lambda s: render_shear(
            SceneConfig(psi_y=s.psi_y, M=1.0, a=0.9,
                        r_obs_mult=100.0, vertical_fov_deg=40.0,
                        theta_obs=np.pi / 2), size, cfg),
    })

    # Kerr-Newman (charged) trace + image-plane magnification map —
    # the two round-3 modes the table previously missed (VERDICT r3
    # item 2). KN follows the direct-trace pattern (the fused shadow
    # pipeline's scene is a static arg; jitter would recompile);
    # magnification rides psi_y like the other source-plane rows.
    from light_path_tracer_tpu.models import KerrNewman
    from light_path_tracer_tpu.pipeline import render_magnification
    _kn = KerrNewman(M=1.0, a=0.6, Q=0.6)
    modes.update({
        "kerr-newman trace": lambda s: _trace_only(_kn, s.psi_y),
        "magnification map": lambda s: render_magnification(
            SceneConfig(psi_y=s.psi_y, **weak_kw), size, cfg)[1:],
    })

    # Round-4 additions: the polarized DISK (render_polarization needs
    # psi = 0, so jitter rides the FOV like the other BH-centered
    # rows) and the Johannsen-Psaltis hand-RHS trace (Pallas tier
    # since round 4).
    from light_path_tracer_tpu.models import JohannsenPsaltis
    from light_path_tracer_tpu.polarization import render_polarization
    _jp = JohannsenPsaltis(M=1.0, a=0.9, eps3=2.0)
    modes.update({
        "polarized disk": lambda s: render_polarization(
            _fov_scene(s), size, cfg)[3:],
        "johannsen-psaltis trace": lambda s: _trace_only(_jp, s.psi_y),
    })

    n_rays = args.size * args.size
    print(f"# newmodes bench: {args.size}^2, device={args.device}, "
          f"platform={jax.devices()[0].platform}")
    print(f"{'mode':<22} {'steps':>8} {'precomp_s':>10} "
          f"{'Mrays/s':>8}")
    import json
    jf = open(args.json, "a") if args.json else None
    for name, fn in modes.items():
        if args.only and args.only not in name:
            continue
        fn(scene(0))                      # warm the compile
        best = None
        steps = 0
        for rep in range(args.reps):
            out = fn(scene(rep + 1))
            st = out[-1]
            dt = st["timings"].get("precompute", 0.0)
            if best is None or dt < best:
                # Keep steps FROM THE BEST REP: pointing jitter can
                # move a near-critical grazer into the 200k-step
                # budget on one rep (legit physics, ~30x that rep) —
                # pairing best-time with last-rep steps misreads as
                # "200k steps in 30 ms".
                best = dt
                steps = st.get("integrator_steps", 0)
        print(f"{name:<22} {steps:>8,} {best:>10.3f} "
              f"{n_rays / max(best, 1e-9) / 1e6:>8.2f}")
        if jf is not None:
            jf.write(json.dumps({
                "mode": name, "size": args.size,
                "backend": args.backend,
                "platform": jax.devices()[0].platform,
                "steps": int(steps), "precompute_s": round(best, 4),
                "mrays_per_s": round(n_rays / max(best, 1e-9) / 1e6,
                                     3)}) + "\n")
            jf.flush()
    if jf is not None:
        jf.close()


if __name__ == "__main__":
    main()
