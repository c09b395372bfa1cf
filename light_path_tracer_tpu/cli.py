"""Command-line interface.

Flag parity with the reference (`image_lens.py:519-532`): --M --a --r-obs
--psi-y --psi-x --fov-v, same semantics and defaults (psi in degrees,
r-obs in units of M, vertical FOV in degrees). Extends it with subcommands
for the other entry points (shadow render, single-ray demo, trajectory
plot) and TPU-relevant knobs (dtype, chunking, lookup cache, device mesh).

Usage:
  python -m light_path_tracer_tpu lens   --a 0.9 --image image.jpg
  python -m light_path_tracer_tpu shadow --a 0.9 --size 1024
  python -m light_path_tracer_tpu shadow --analytic          # zero-integration
  python -m light_path_tracer_tpu ray    --alpha-deg 8       # single-ray demo
  python -m light_path_tracer_tpu plot   --angles 0,2,4,5.5,5.97,8
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _add_scene_args(p):
    p.add_argument("--M", type=float, default=1.0, help="BH mass")
    p.add_argument("--a", type=float, default=0.0,
                   help="BH spin (|a| <= M, 0 = Schwarzschild)")
    p.add_argument("--Q", type=float, default=0.0,
                   help="BH charge (Reissner-Nordstrom; with --a != 0: "
                        "Kerr-Newman, needs a^2 + Q^2 <= M^2)")
    p.add_argument("--eps3", type=float, default=0.0,
                   help="Johannsen-Psaltis deformation parameter "
                        "(test-GR deformed Kerr; 0 = GR. Shadow/lens/"
                        "magnification modes; mutually exclusive with "
                        "--Q, not wired for disk orbital dynamics)")
    p.add_argument("--metric-py", default=None, metavar="FILE.py:ATTR",
                   help="user-defined spacetime: load a covariant-"
                        "components function (r, th) -> (g_tt, g_tphi, "
                        "g_rr, g_thth, g_phiphi) written in jax.numpy "
                        "from a local Python file (models.custom."
                        "CustomMetric; --M/--a declare the asymptotic "
                        "Kerr the far field approaches). Shadow/lens/"
                        "magnification/AA/ray/plot modes; mutually "
                        "exclusive with --Q/--eps3")
    p.add_argument("--r-obs", type=float, default=100.0,
                   help="Observer distance in units of M (default: 100)")
    p.add_argument("--psi-y", type=float, default=0.0,
                   help="BH vertical offset in deg (+ = top, - = bottom)")
    p.add_argument("--psi-x", type=float, default=0.0,
                   help="BH horizontal offset in deg (+ = right, - = left)")
    p.add_argument("--fov-v", type=float, default=40.0,
                   help="Vertical field of view in deg")
    p.add_argument("--theta-obs", type=float, default=90.0,
                   help="Observer inclination from the spin axis in deg "
                        "(default: 90 = equatorial)")
    p.add_argument("--boost", type=float, nargs=3, default=(0.0, 0.0, 0.0),
                   metavar=("BX", "BY", "BZ"),
                   help="camera 3-velocity in units of c (camera coords: "
                        "+x right, +y down, +z toward the BH); aberrates "
                        "the view and Doppler-shifts the disk")


def _add_render_args(p):
    p.add_argument("--device", default="default",
                   choices=["default", "cpu", "tpu"],
                   help="force the JAX platform (default: whatever the "
                        "environment provides). 'cpu' never touches an "
                        "accelerator — useful for portability and when "
                        "a TPU grant is wedged")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64"])
    p.add_argument("--chunk-size", type=int, default=0,
                   help="rays per chunk (0 = whole grid in one dispatch)")
    p.add_argument("--progress", default="off",
                   choices=["off", "bar", "live"],
                   help="chunked-trace progress: tqdm bar or the live "
                        "ANSI bar with CPU/RSS telemetry (needs "
                        "--chunk-size)")
    p.add_argument("--no-symmetry", action="store_true",
                   help="disable top/bottom mirror symmetry")
    p.add_argument("--loop-around", action="store_true",
                   help="wrap out-of-FOV source samples (legacy mode)")
    p.add_argument("--cache", action="store_true",
                   help="cache traced lookup tables in lookup_cache/")
    p.add_argument("--precision", default="fast",
                   choices=["fast", "precise", "gate"],
                   help="tolerance tier: fast (throughput), precise, or "
                        "gate (accuracy tier; with --bilinear it passes "
                        "the image-RMSE<1e-3 acceptance gate in f32)")
    p.add_argument("--integrator", default="dp45",
                   choices=["dp45", "dop853", "rk4"],
                   help="Kerr integrator (dp45 = reference-parity "
                        "adaptive default)")
    p.add_argument("--max-steps", type=int, default=200000,
                   help="adaptive-step budget per ray (reference "
                        "parity 200000; lower it for metrics whose "
                        "trapped rays never cross a capture sphere, "
                        "e.g. the Majumdar-Papapetrou binary example)")
    p.add_argument("--bilinear", action="store_true",
                   help="bilinear background-texture sampling (smoother "
                        "than the reference's nearest-texel gather)")


def _add_multihost_args(p):
    p.add_argument("--multihost", action="store_true",
                   help="run this render over a jax.distributed global "
                        "mesh (every chip of every process); start one "
                        "CLI process per host")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (omit on real "
                        "TPU pods — auto-detected)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total process count (omit to auto-detect)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's id, 0..N-1 (omit to "
                        "auto-detect)")
    p.add_argument("--init-timeout", type=float, default=60.0,
                   help="seconds to wait for the full cluster to join "
                        "before failing with a clear error")


def _multihost_mesh(args):
    """Global mesh for a --multihost run (initialize happened in main)."""
    from light_path_tracer_tpu.parallel.multihost import make_global_mesh
    import jax
    mesh = make_global_mesh()
    print(f"multihost: process {jax.process_index()}/"
          f"{jax.process_count()}, {mesh.devices.size} global devices")
    return mesh


def _is_proc0() -> bool:
    import jax
    return jax.process_index() == 0


def _visibility_report(image, fov, path, model, true_diameter=None):
    """Visibility-domain analysis of a rendered image (observables.py):
    save the |V| radial profile, print the first-null diameter."""
    from light_path_tracer_tpu import observables as obs
    # Null-location accuracy needs a finely sampled transform, but the
    # padded complex FFT grid is (pad*H x pad*W): keep it bounded
    # (~8k^2) so a 4k render doesn't OOM the analysis step.
    side = max(np.asarray(image).shape[:2])
    pad = max(2, min(8, 8192 // side))
    est, b_null, (baselines, amp) = obs.shadow_diameter(
        np.asarray(image), fov, model=model, pad=pad, n_bins=512)
    np.savez(path, baselines=np.asarray(baselines), amp=np.asarray(amp),
             b_null=b_null, diameter_rad=est, model=model)
    if np.isfinite(b_null):
        line = (f"  visibility: first null at {b_null:,.1f} wavelengths"
                f" -> {model}-model diameter {np.degrees(est):.4f} deg")
        if true_diameter is not None:
            line += f" (2*alpha_crit = {np.degrees(true_diameter):.4f})"
        print(line)
    else:
        print("  visibility: no null within the sampled baselines "
              "(featureless image or field of view too tight)")
    print(f"Saved: {path}")


def _scene_from(args):
    from light_path_tracer_tpu.utils.config import SceneConfig
    custom = None
    spec = getattr(args, "metric_py", None)
    if spec:
        if getattr(args, "Q", 0.0) or getattr(args, "eps3", 0.0):
            raise SystemExit(
                "error: --metric-py is mutually exclusive with "
                "--Q/--eps3 (the user metric defines the spacetime)")
        from light_path_tracer_tpu.models import load_user_metric
        custom = load_user_metric(spec, M=args.M, a=args.a)
        if (custom.M != args.M or custom.a != args.a) and (
                args.M != 1.0 or args.a != 0.0):
            print(f"note: {spec} is a CustomMetric instance with "
                  f"M={custom.M}, a={custom.a}; ignoring --M/--a")
    return SceneConfig(
        M=args.M, a=args.a, Q=getattr(args, "Q", 0.0),
        eps3=getattr(args, "eps3", 0.0),
        r_obs_mult=args.r_obs,
        psi_y=np.radians(args.psi_y), psi_x=np.radians(args.psi_x),
        vertical_fov_deg=args.fov_v,
        theta_obs=np.radians(getattr(args, "theta_obs", 90.0)),
        boost=tuple(getattr(args, "boost", (0.0, 0.0, 0.0))),
        custom_metric=custom)


def _reject_metric_py(args, mode: str) -> bool:
    """Modes whose physics needs the closed-form families (disk
    orbital dynamics, volumetric flow fields, stellar surfaces,
    recompilation-free sweeps) reject --metric-py with a clear error
    instead of silently tracing the wrong spacetime."""
    if getattr(args, "metric_py", None):
        print(f"error: --metric-py is not supported in {mode} mode "
              "(supported: shadow, lens, magnification, AA, ray, "
              "plot)", file=sys.stderr)
        return True
    return False


def _render_cfg_from(args):
    from light_path_tracer_tpu.utils.config import RenderConfig
    progress = getattr(args, "progress", "off")
    return RenderConfig(
        dtype=args.dtype,
        max_steps=getattr(args, "max_steps", 200000),
        chunk_size=args.chunk_size or None,
        use_tb_symmetry=not args.no_symmetry,
        render_loop_around=getattr(args, "loop_around", False),
        precision=getattr(args, "precision", "fast"),
        integrator=getattr(args, "integrator", "dp45"),
        sampling="bilinear" if getattr(args, "bilinear", False)
                 else "nearest",
        progress={"off": False, "bar": True, "live": "live"}[progress])


def cmd_lens(args) -> int:
    """Lensed background-image render (image_lens.main parity)."""
    import matplotlib.image as mpimg
    from light_path_tracer_tpu.pipeline import (
        render_scene, print_benchmark_summary)
    from light_path_tracer_tpu import camera

    scene = _scene_from(args)
    cfg = _render_cfg_from(args)

    q_arg = getattr(args, "Q", 0.0)
    kind = ("Kerr-Newman" if args.a != 0 and q_arg != 0
            else "Kerr" if args.a != 0
            else "Reissner-Nordstrom" if q_arg != 0
            else "Schwarzschild")
    print(f"Metric: {kind} (M={args.M}, a={args.a}"
          + (f", Q={args.Q}" if getattr(args, "Q", 0.0) else "") + ")")

    if getattr(args, "magnification", None):
        # Magnification-map product: no source image involved.
        from light_path_tracer_tpu.pipeline import render_magnification
        mu, mstats = render_magnification(
            scene, (args.size, args.size), cfg)
        from light_path_tracer_tpu.render import magnification_display
        mpimg.imsave(args.magnification, magnification_display(mu))
        tt = mstats["timings"]
        print(f"Magnification map {args.size}x{args.size}: "
              f"|mu|_max={mstats['mu_abs_max']:.1f}, "
              f"{mstats['negative_parity_pixels']} odd-parity px, "
              f"{mstats['shadow_pixels']} shadow px "
              f"(precompute {tt.get('precompute', 0.0):.3f}s, "
              f"render {tt.get('render', 0.0):.3f}s)")
        print(f"Saved: {args.magnification}")
        return 0

    if getattr(args, "shear", None):
        # Weak-lensing decomposition maps (kappa/gamma/omega).
        from light_path_tracer_tpu.pipeline import render_shear
        maps, sstats = render_shear(scene, (args.size, args.size), cfg)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 2, figsize=(9, 8))
        panels = (("kappa", "convergence kappa", "RdBu_r", True),
                  ("gamma", "shear |gamma|", "inferno", False),
                  ("gamma1", "gamma_1", "RdBu_r", True),
                  ("omega", "rotation omega (frame dragging)",
                   "RdBu_r", True))
        for ax, (key, title, cmap, sym) in zip(axes.ravel(), panels):
            v = np.asarray(maps[key])
            fin = np.isfinite(v)
            lim = (np.percentile(np.abs(v[fin]), 99.0)
                   if fin.any() else 1.0) or 1.0
            kw = ({"vmin": -lim, "vmax": lim} if sym
                  else {"vmin": 0.0, "vmax": lim})
            im = ax.imshow(v, cmap=cmap, origin="lower", **kw)
            ax.set_title(title, fontsize=10)
            ax.set_xticks([]), ax.set_yticks([])
            fig.colorbar(im, ax=ax, fraction=0.046)
        fig.tight_layout()
        fig.savefig(args.shear, dpi=110)
        plt.close(fig)
        tt = sstats["timings"]
        print(f"Shear decomposition {args.size}x{args.size}: "
              f"gamma_max={sstats['gamma_max']:.2f}, "
              f"|omega|_max={sstats['omega_abs_max']:.2e}, "
              f"{sstats['shadow_pixels']} shadow px "
              f"(precompute {tt.get('precompute', 0.0):.3f}s, "
              f"render {tt.get('render', 0.0):.3f}s)")
        print(f"Saved: {args.shear}")
        return 0

    if getattr(args, "caustics", None):
        # Source-plane (caustic) map: inverse ray shooting.
        from light_path_tracer_tpu.pipeline import render_caustics
        amap, extent, cstats = render_caustics(
            scene, (args.size, args.size), cfg,
            bins=args.caustic_bins)
        amap_np = np.asarray(amap)
        disp = np.log10(1.0 + np.maximum(amap_np, 0.0))
        lim = np.percentile(disp, 99.5) or 1.0
        import matplotlib.cm as cm
        mpimg.imsave(args.caustics,
                     cm.inferno(np.clip(disp / lim, 0.0, 1.0)))
        tt = cstats["timings"]
        print(f"Caustic map {args.caustic_bins}x{args.caustic_bins} "
              f"(traced {args.size}x{args.size}, beta_max "
              f"{np.degrees(cstats['beta_max']):.2f} deg): "
              f"A_max={cstats['A_max']:.1f}, far-field median "
              f"A={cstats['A_far_field']:.3f} "
              f"(precompute {tt.get('precompute', 0.0):.3f}s, "
              f"render {tt.get('render', 0.0):.3f}s)")
        print(f"Saved: {args.caustics}")
        return 0

    if getattr(args, "time_delay", None):
        # Fermat arrival-time map (time-delay cosmography).
        from light_path_tracer_tpu.pipeline import render_time_delay
        tau, tstats = render_time_delay(
            scene, (args.size, args.size), cfg)
        tau_np = np.asarray(tau)
        disp = np.log10(1.0 + np.nan_to_num(tau_np, nan=0.0))
        lim = np.nanpercentile(disp, 99.5) or 1.0
        import matplotlib.cm as cm
        rgba = cm.viridis(np.clip(disp / lim, 0.0, 1.0))
        rgba[~np.isfinite(tau_np)] = (0.0, 0.0, 0.0, 1.0)
        mpimg.imsave(args.time_delay, rgba)
        tt = tstats["timings"]
        print(f"Arrival-time map {args.size}x{args.size}: "
              f"tau_max={tstats['tau_max']:.2f} M, "
              f"{tstats['shadow_pixels']} shadow px "
              f"(precompute {tt.get('precompute', 0.0):.3f}s, "
              f"render {tt.get('render', 0.0):.3f}s)")
        print(f"Saved: {args.time_delay}")
        return 0

    if getattr(args, "find_images", None):
        # Strong-lensing image-position solver (images.py).
        from light_path_tracer_tpu.images import (find_point_images,
                                                  format_image_table)
        try:
            bx_deg, by_deg = (float(v) for v in
                              args.find_images.split(","))
        except ValueError:
            print("--find-images expects BX,BY in degrees "
                  f"(got {args.find_images!r})")
            return 2
        beta = (np.radians(bx_deg), np.radians(by_deg))
        imgs, istats = find_point_images(
            scene, beta, resolution=(args.size, args.size), cfg=cfg)
        tt = istats["timings"]
        print(f"Images of point source at beta = ({bx_deg:.4f}, "
              f"{by_deg:.4f}) deg ({args.size}x{args.size} grid):")
        print(format_image_table(imgs, istats))
        print(f"  (precompute {tt.get('precompute', 0.0):.3f}s, "
              f"refine {tt.get('refine', 0.0):.3f}s, "
              f"products {tt.get('products', 0.0):.3f}s)")
        return 0

    if getattr(args, "microlens", None):
        # Microlensing light curve of a source crossing the lens.
        from light_path_tracer_tpu.pipeline import (
            render_microlens_curve)
        u_axis, curve, mlstats = render_microlens_curve(
            scene, (args.size, args.size), cfg,
            impact_u=args.track_impact, span_u=args.track_span,
            n_points=args.track_points,
            source_radius_u=args.source_radius)
        curve_np = np.asarray(curve)
        xs = np.linspace(-args.track_span, args.track_span,
                         args.track_points)
        if args.microlens.endswith(".png"):
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(7, 4))
            ax.plot(xs, curve_np, lw=2)
            ref = (u_axis ** 2 + 2) / (
                u_axis * np.sqrt(u_axis ** 2 + 4))
            ax.plot(xs, ref, "--", lw=1,
                    label="point-lens Paczynski")
            ax.set_xlabel(r"track position [$\theta_E$]")
            ax.set_ylabel("total magnification A")
            ax.legend()
            fig.savefig(args.microlens, dpi=120,
                        bbox_inches="tight")
            plt.close(fig)
        else:
            with open(args.microlens, "w") as fh:
                fh.write("track_pos_thetaE,u,A\n")
                for x, uu, aa in zip(xs, u_axis, curve_np):
                    fh.write(f"{x:.6f},{uu:.6f},{aa:.8f}\n")
        print(f"Microlensing curve ({args.track_points} points, "
              f"impact u0={args.track_impact}, source radius "
              f"{args.source_radius} theta_E, theta_E = "
              f"{np.degrees(mlstats['theta_E']):.3f} deg): "
              f"A_peak={mlstats['A_peak']:.4f}, baseline "
              f"{mlstats['A_baseline']:.4f}")
        print(f"Saved: {args.microlens}")
        return 0

    t0 = time.perf_counter()
    img = mpimg.imread(args.image)
    load_time = time.perf_counter() - t0
    height, width = img.shape[:2]
    print(f"Image: {width}x{height}")

    r_obs = scene.r_obs
    metric = scene.metric()
    alpha_crit = metric.alpha_crit(r_obs)
    print(f"r_obs = {r_obs:.1f} M, "
          f"alpha_crit = {np.degrees(alpha_crit):.4f} deg")

    bh_y, bh_x, in_front = camera.psi_to_cam_projection(scene.psi)
    fov = camera.fov_from_vertical(scene.vertical_fov, (height, width))
    in_fov = (in_front and abs(bh_y) <= np.tan(fov[1] / 2)
              and abs(bh_x) <= np.tan(fov[0] / 2))
    status = ("behind observer" if not in_front
              else ("inside FOV" if in_fov else "outside FOV"))
    print(f"BH screen offset: psi_y={args.psi_y:.4f} deg, "
          f"psi_x={args.psi_x:.4f} deg ({status})")

    ring_tables = None
    if getattr(args, "multihost", False):
        from light_path_tracer_tpu.aa import render_scene_aa
        for flag, note in (("disk", "--disk"), ("cache", "--cache"),
                           ("rings", "--rings"),
                           ("adaptive", "--adaptive")):
            if getattr(args, flag, False):
                print(f"  note: {note} is not supported with "
                      f"--multihost; ignoring")
        result, astats = render_scene_aa(
            scene, img, cfg, aa_samples=max(getattr(args, "aa", 1), 1),
            mesh=_multihost_mesh(args))
        astats["timings"]["load_image"] = (
            astats["timings"].get("load_image", 0.0) + load_time)
        timings = astats["timings"]
        total, traced = astats["total_rays"], astats["traced_rays"]
    elif getattr(args, "disk", False):
        if args.cache:
            print("  note: --cache is not supported with --disk "
                  "(composite re-traces); ignoring")
        if getattr(args, "rings", False):
            print("  note: --rings is not supported with --disk; "
                  "ignoring")
        from light_path_tracer_tpu.disk import (
            render_scene_with_disk, DiskConfig)
        disk = DiskConfig(r_out=args.r_out,
                          emissivity_index=args.emissivity_q,
                          g_power=args.g_power,
                          opaque=not args.translucent,
                          spectrum=args.spectrum, t_peak=args.t_peak)
        if getattr(args, "adaptive", False):
            print("  note: --adaptive is not supported with --disk "
                  "(the composite needs every pixel's crossing record); "
                  "using stacked uniform AA")
        if getattr(args, "aa", 1) > 1:
            from light_path_tracer_tpu.disk import render_scene_with_disk_aa
            # Per-pass display encoding BEFORE the average — exact AA
            # in display space (see render_scene_with_disk_aa docs).
            result, stats = render_scene_with_disk_aa(
                scene, img, cfg, disk, disk_gain=args.disk_gain,
                aa_samples=args.aa, display_encode=True)
        else:
            result, stats = render_scene_with_disk(
                scene, img, cfg, disk, disk_gain=args.disk_gain)
        if args.spectrum == "blackbody" and not stats.get(
                "display_encoded"):
            # Display-encode the linear-light disk pixels so the
            # composite matches cmd_disk / showcase output (the
            # background texture is already display-encoded; only the
            # disk layer is physical linear radiance).
            from light_path_tracer_tpu.disk import composite_gamma_encode
            result = composite_gamma_encode(result, stats["disk_mask"])
        stats["timings"]["load_image"] = (
            stats["timings"].get("load_image", 0.0) + load_time)
        timings = stats["timings"]
        total, traced = stats["total_rays"], stats["traced_rays"]
        print(f"  disk pixels: {stats['disk_pixels']:,}, "
              f"captured: {stats['captured']:,}, "
              f"r_isco={stats['r_isco']:.3f} M")
    elif args.cache:
        if getattr(args, "aa", 1) > 1:
            print("  note: --aa is not supported with --cache "
                  "(the cache stores one non-jittered lookup); ignoring")
        from light_path_tracer_tpu.checkpoint import cached_precompute
        from light_path_tracer_tpu.utils.timing import StageTimer
        from light_path_tracer_tpu.render import render_lensed_image
        import jax.numpy as jnp

        timer = StageTimer()
        timer.timings["load_image"] = load_time
        src = jnp.asarray(img)
        if src.dtype == jnp.uint8:
            src = src.astype(jnp.float32) / 255.0
        with timer.stage("build_lookup") as out:
            alpha_lookup = camera.build_alpha_lookup(
                (height, width), fov, psi=scene.psi)
            out.append(alpha_lookup)
        with timer.stage("precompute") as out:
            pre, hit = cached_precompute(scene, cfg, (height, width), fov)
            out.append(pre.final_alpha)
        print(f"  lookup cache {'HIT' if hit else 'MISS'}")
        with timer.stage("render") as out:
            theta_lookup = (camera.build_theta_lookup(
                (height, width), fov, psi=scene.psi,
                boost=scene.boost) if scene.boosted else None)
            lensed = render_lensed_image(
                src, alpha_lookup, pre.final_alpha, pre.winding,
                alpha_crit, fov, cfg.render_loop_around, psi=scene.psi,
                theta_lookup=theta_lookup, sampling=cfg.sampling)
            out.append(lensed)
        timings = timer.finish()
        result, total, traced = lensed, pre.total_rays, pre.traced_rays
        ring_tables = (pre.final_alpha, pre.winding)
    elif getattr(args, "aa", 1) > 1:
        if getattr(args, "adaptive", False):
            from light_path_tracer_tpu.adaptive import (
                render_scene_adaptive)
            result, astats = render_scene_adaptive(
                scene, img, cfg, aa_samples=args.aa,
                refine_frac=args.refine_frac)
            print(f"  adaptive AA: {astats['refined_pixels']:,} pixels "
                  f"refined ({astats['edge_pixels']:,} discrete-edge), "
                  f"{astats['total_rays']:,} rays vs "
                  f"{astats['uniform_aa_rays']:,} uniform")
        else:
            from light_path_tracer_tpu.aa import render_scene_aa
            result, astats = render_scene_aa(scene, img, cfg,
                                             aa_samples=args.aa)
        astats["timings"]["load_image"] = (
            astats["timings"].get("load_image", 0.0) + load_time)
        timings = astats["timings"]
        total, traced = astats["total_rays"], astats["traced_rays"]
        if getattr(args, "rings", False):
            print("  note: --rings is not supported with --aa; ignoring")
    else:
        out = render_scene(scene, img, cfg)
        out.timings["load_image"] += load_time
        timings = out.timings
        result = out.image
        total, traced = out.precompute.total_rays, out.precompute.traced_rays
        ring_tables = (out.precompute.final_alpha, out.precompute.winding)

    if getattr(args, "rings", False) and ring_tables is not None:
        # Decomposition reuses THIS render's lookup tables — no second
        # trace (review finding: the old path re-rendered everything).
        import os
        from light_path_tracer_tpu.pipeline import lensed_ring_layers
        layers, order_pixels = lensed_ring_layers(
            ring_tables[0], ring_tables[1], result,
            max_order=args.max_order)
        stem, ext = os.path.splitext(args.output)
        for layer, label in zip(np.asarray(layers), order_pixels):
            mpimg.imsave(f"{stem}_{label.replace('_', '')}{ext}",
                         np.clip(layer, 0.0, 1.0))
        for label, count in order_pixels.items():
            print(f"  {label:<12} {count:>10,} px")

    t0 = time.perf_counter()
    if _is_proc0():
        # On-device uint8 quantization: 4x less readback through the
        # tunnel, byte-identical PNG (utils/save.py; round-4 item 5).
        from light_path_tracer_tpu.utils.save import save_png
        save_png(args.output, result)
    timings["save_image"] = time.perf_counter() - t0
    timings["total"] = timings.get("total", 0.0) + timings["save_image"]

    print_benchmark_summary((height, width), alpha_crit, total, traced,
                            timings)
    print(f"Saved: {args.output}")
    return 0


def _scene_metric_alpha_crit(scene):
    return scene.metric().alpha_crit(scene.r_obs, scene.theta_obs)


def cmd_shadow(args) -> int:
    """Shadow render (black_hole_shadow.py parity + integrated mode)."""
    import os
    import matplotlib.image as mpimg
    from light_path_tracer_tpu.pipeline import render_shadow, render_rings

    scene = _scene_from(args)
    cfg = _render_cfg_from(args)

    if args.rings:
        if getattr(args, "visibility", None):
            print("  note: --visibility is not supported with --rings; "
                  "ignoring")
        masks, composite, stats = render_rings(
            scene, (args.size, args.size), cfg, max_order=args.max_order)
        mpimg.imsave(args.output, np.asarray(composite))
        stem, ext = os.path.splitext(args.output)
        labels = ([f"order{k}" for k in range(args.max_order)]
                  + [f"order{args.max_order}plus", "shadow"])
        for mask, label in zip(np.asarray(masks), labels):
            mpimg.imsave(f"{stem}_{label}{ext}",
                         mask.astype(np.float32), cmap="gray",
                         vmin=0, vmax=1)
        t = stats["timings"]
        print(f"Photon-ring decomposition: {args.size}x{args.size}, "
              f"a={scene.a}, precompute {t.get('precompute', 0.0):.3f}s")
        for label, count in stats["order_pixels"].items():
            print(f"  {label:<12} {count:>10,} px")
        print(f"Saved: {args.output} (+ {len(labels)} per-order masks)")
        return 0

    if getattr(args, "multihost", False):
        from light_path_tracer_tpu.aa import render_shadow_aa
        if args.analytic:
            print("  note: --multihost shadow is the integrated mode; "
                  "ignoring --analytic")
        if getattr(args, "adaptive", False):
            print("  note: --adaptive is not supported with --multihost "
                  "(scattered refine sets defeat row sharding); using "
                  "uniform AA")
        img, stats = render_shadow_aa(scene, (args.size, args.size), cfg,
                                      aa_samples=max(args.aa, 1),
                                      mesh=_multihost_mesh(args))
        stats.setdefault("alpha_crit", _scene_metric_alpha_crit(scene))
    elif getattr(args, "aa", 1) > 1:
        if args.analytic:
            print("  note: --aa applies to the integrated shadow; "
                  "ignoring --analytic")
        if getattr(args, "adaptive", False):
            from light_path_tracer_tpu.adaptive import (
                render_shadow_adaptive)
            img, stats = render_shadow_adaptive(
                scene, (args.size, args.size), cfg, aa_samples=args.aa,
                refine_frac=args.refine_frac)
            print(f"  adaptive AA: {stats['refined_pixels']:,} pixels "
                  f"refined, {stats['total_rays']:,} rays vs "
                  f"{stats['uniform_aa_rays']:,} uniform")
        else:
            from light_path_tracer_tpu.aa import render_shadow_aa
            img, stats = render_shadow_aa(scene, (args.size, args.size),
                                          cfg, aa_samples=args.aa)
        stats.setdefault("alpha_crit", _scene_metric_alpha_crit(scene))
    else:
        img, stats = render_shadow(scene, (args.size, args.size), cfg,
                                   analytic=args.analytic)
    if _is_proc0():
        # uint8 colormap-index readback (1 B/px vs 4) + host-side LUT
        # with bytes=True: byte-identical to the float cmap="gray"
        # save (pinned in tests/test_save.py; round-4 item 5 — this is
        # the 4k AA path whose f32 readback was the ~1 s floor).
        from matplotlib import cm as _cm
        from light_path_tracer_tpu.utils.save import quantize_cmap_index
        mpimg.imsave(args.output,
                     _cm.gray(np.asarray(quantize_cmap_index(img)),
                              bytes=True))
    t = stats["timings"]
    mode = ("analytic threshold" if args.analytic
            else (f"integrated, {stats['aa_samples']}x AA"
                  if stats.get("aa_samples", 1) > 1 else "integrated"))
    # AA timings report one fused precompute+render stage.
    trace_t = t.get("precompute", t.get("precompute+render", 0.0))
    print(f"Shadow ({mode}): {args.size}x{args.size}, "
          f"alpha_crit={np.degrees(stats['alpha_crit']):.4f} deg, "
          f"precompute {trace_t:.3f}s, "
          f"render {t.get('render', 0.0):.3f}s")
    if stats.get("traced_rays"):
        print(f"  {stats['traced_rays'] / max(trace_t, 1e-12):,.0f} rays/s")
    print(f"Saved: {args.output}")
    if getattr(args, "visibility", None) and _is_proc0():
        from light_path_tracer_tpu import camera as _cam
        fov = _cam.fov_from_vertical(scene.vertical_fov,
                                     (args.size, args.size))
        # The silhouette (bright disk on dark sky) is the compact
        # source whose null encodes the shadow diameter.
        _visibility_report(1.0 - np.asarray(img), fov, args.visibility,
                           model="disk",
                           true_diameter=2.0 * stats["alpha_crit"])
    return 0


def _centroid_report(path, scene, size, emission, light_curve, spot_r):
    """GRAVITY-style astrometric wobble figure + console summary:
    photocenter track of the RAW per-frame emission
    (observables.centroid_track) next to the light curve. Shared by
    the volumetric --movie and disk --frames movie modes."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from light_path_tracer_tpu import camera as _cam
    from light_path_tracer_tpu.observables import centroid_track
    fov = _cam.fov_from_vertical(scene.vertical_fov, (size, size))
    track = np.degrees(np.asarray(centroid_track(emission, fov)))
    lc = np.asarray(light_curve, np.float64)
    fig, axes = plt.subplots(1, 2, figsize=(9.6, 4.2))
    ph = np.arange(len(track)) / max(len(track), 1)
    sc = axes[0].scatter(track[:, 0] * 3600, -track[:, 1] * 3600,
                         c=ph, cmap="twilight", s=28)
    axes[0].plot(track[:, 0] * 3600, -track[:, 1] * 3600,
                 color="0.75", lw=0.8, zorder=0)
    axes[0].set_xlabel("x [arcsec]"), axes[0].set_ylabel("y [arcsec, up]")
    axes[0].set_title("photocenter track")
    axes[0].set_aspect("equal", adjustable="datalim")
    fig.colorbar(sc, ax=axes[0], label="orbital phase")
    axes[1].plot(ph, lc / max(lc.mean(), 1e-300), lw=1.6)
    axes[1].set_xlabel("orbital phase")
    axes[1].set_ylabel("flux / mean")
    axes[1].set_title("light curve")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    ext = np.ptp(track, axis=0) * 3600
    print(f"  centroid wobble: {ext[0]:.3f} x {ext[1]:.3f} "
          f"arcsec (spot orbit diameter "
          f"{np.degrees(2 * spot_r / scene.r_obs) * 3600:.3f} arcsec)")
    print(f"Saved: {path}")


def cmd_volumetric(args) -> int:
    """Optically-thin hot-flow render (volumetric.py): RIAF torus /
    power-law flow / uniform shell integrated along every geodesic."""
    if _reject_metric_py(args, "volumetric"):
        return 2
    import matplotlib.image as mpimg
    from matplotlib import cm
    from light_path_tracer_tpu import camera
    from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                  render_volumetric)

    scene = _scene_from(args)
    cfg = _render_cfg_from(args)
    riaf = RIAFConfig(
        profile=args.profile, r_peak=args.r_peak, sigma_r=args.sigma_r,
        h_cos=args.h_cos, index=args.index, shell_in=args.shell_in,
        shell_out=args.shell_out, g_power=args.g_power,
        prograde=not args.retrograde, tone_map=args.tone_map,
        alpha0=args.alpha0, opacity_index=args.opacity_index,
        # The blob only participates in movie mode (still/spectral
        # emissivities are stationary).
        spot_amp=args.spot_amp if args.movie else 0.0,
        spot_r=args.spot_r, spot_sigma=args.spot_sigma,
        jet_beta=args.jet_beta, jet_cos=args.jet_cos,
        jet_sigma=args.jet_sigma, jet_r_base=args.jet_r_base)

    if args.polarization:
        # Polarized hot-flow image: Stokes (I, Q, U) path integrals
        # via per-element Walker-Penrose endpoint algebra.
        from light_path_tracer_tpu.polarization import (
            render_polarized_volumetric, save_polarization_figure)
        evpa, pol_frac, intensity, pstats = render_polarized_volumetric(
            scene, (args.size, args.size), cfg, riaf,
            field=args.b_field)
        save_polarization_figure(
            args.polarization, evpa, pol_frac, intensity,
            title=f"volumetric {args.b_field} field, a={scene.a}, "
                  f"inc={np.degrees(scene.theta_obs):.0f}\N{DEGREE SIGN}")
        sel = np.isfinite(evpa)
        print(f"Polarized volumetric ({args.b_field}): "
              f"{args.size}x{args.size}, "
              f"{pstats['integrator_steps']:,} steps, mean pol "
              f"fraction {np.nanmean(pol_frac[sel]):.3f} over "
              f"{int(sel.sum()):,} px")
        print(f"Saved: {args.polarization}")
        return 0

    if args.movie:
        from PIL import Image
        from light_path_tracer_tpu.volumetric import (
            render_volumetric_movie)
        from light_path_tracer_tpu.disk import keplerian_omega
        period = abs(2.0 * np.pi / keplerian_omega(
            scene.M, scene.a, args.spot_r, not args.retrograde,
            Q=scene.Q))
        times = tuple(period * args.orbits * k / args.movie
                      for k in range(args.movie))
        frames, stats = render_volumetric_movie(
            scene, (args.size, args.size), times, cfg, riaf)
        colored = cm.afmhot(np.asarray(frames))[..., :3]
        pils = [Image.fromarray((np.clip(f, 0, 1) * 255)
                                .astype(np.uint8)) for f in colored]
        out = args.output
        if out.endswith(".png"):
            out = out[:-4] + ".gif"
        pils[0].save(out, save_all=True, append_images=pils[1:],
                     duration=int(1000 / args.fps), loop=0)
        t = stats["timings"]
        print(f"Flare movie: {args.movie} frames ({args.orbits} "
              f"orbit(s), period {period:.1f} M) from ONE trace "
              f"({stats['integrator_steps']:,} steps, "
              f"{t.get('precompute', 0.0):.3f}s)")
        lc = stats["light_curve"]
        print(f"  light curve modulation "
              f"{(lc.max() - lc.min()) / (lc.max() + lc.min()):.1%}, "
              f"retarded-time span {stats['t_max']:.0f} M")
        print(f"Saved: {out}")
        if getattr(args, "centroid", None):
            _centroid_report(args.centroid, scene, args.size,
                             stats["emission"], lc, args.spot_r)
        return 0

    if getattr(args, "decompose", None):
        # Photon-ring decomposition of the hot-flow image: per-image-
        # order path-emission layers from ONE trace
        # (volumetric.render_volumetric_decomposed).
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import jax.numpy as jnp
        from light_path_tracer_tpu.disk import decomposed_display
        from light_path_tracer_tpu.volumetric import (
            render_volumetric_decomposed)
        n_ord = max(args.orders, 2)
        layers, stats = render_volumetric_decomposed(
            scene, (args.size, args.size), cfg, riaf, n_orders=n_ord)
        stack = jnp.concatenate([jnp.sum(layers, axis=0)[None], layers])
        disp = np.asarray(decomposed_display(stack, riaf.tone_map))
        flux = np.asarray(stats["flux_per_order"])
        frac = flux / max(flux.sum(), 1e-300)
        fig, axes = plt.subplots(1, n_ord + 1,
                                 figsize=(3.3 * (n_ord + 1), 3.7))
        titles = ["composite"] + [
            f"n={k} ({frac[k]:.2%} of flux)" for k in range(n_ord)]
        for ax, im, title in zip(axes, disp, titles):
            ax.imshow(im, cmap="afmhot", origin="upper",
                      vmin=0.0, vmax=1.0)
            ax.set_title(title, fontsize=10)
            ax.axis("off")
        gammas = ", ".join(f"{g:.2f}" for g in stats["gamma_estimates"])
        fig.suptitle(f"hot-flow image-order decomposition: a={args.a} "
                     f"— measured demagnification exponent(s) {gammas}",
                     fontsize=11)
        fig.tight_layout()
        fig.savefig(args.decompose, dpi=120)
        t = stats["timings"]
        print(f"Decomposition: {args.size}x{args.size}, a={args.a}, "
              f"{n_ord} orders from ONE trace "
              f"({stats['integrator_steps']:,} steps, "
              f"{t.get('precompute', 0.0):.3f}s)")
        for k in range(n_ord):
            mr = np.degrees(stats["mean_radius_rad"][k])
            print(f"  n={k}: flux {frac[k]:.2%}, "
                  f"mean radius {mr:.3f} deg")
        print(f"  alpha_crit {np.degrees(stats['alpha_crit']):.3f} deg; "
              f"flux ratios {[f'{r:.3g}' for r in stats['flux_ratios']]}")
        print(f"Saved: {args.decompose}")
        return 0

    if args.freqs:
        from light_path_tracer_tpu.volumetric import (
            render_volumetric_spectrum)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        freqs = tuple(float(f) for f in args.freqs.split(","))
        imgs, stats = render_volumetric_spectrum(
            scene, (args.size, args.size), freqs, cfg, riaf)
        n = len(freqs)
        fig, axes = plt.subplots(1, n, figsize=(3.2 * n, 3.6))
        for ax, f, im, mr in zip(np.atleast_1d(axes), freqs,
                                 np.asarray(imgs),
                                 stats["mean_radius_rad"]):
            ax.imshow(im, cmap="afmhot", origin="upper")
            ax.set_title(f"f={f:g}  <r>={np.degrees(mr):.2f}\N{DEGREE SIGN}",
                         fontsize=10)
            ax.axis("off")
        fig.suptitle("Self-absorbed spectral images (one trace, "
                     f"q={riaf.opacity_index:g})", fontsize=11)
        fig.tight_layout()
        fig.savefig(args.output, dpi=110)
        base = args.output.rsplit(".", 1)[0]
        np.savez(base + "_spectrum.npz", freqs=stats["freqs"],
                 flux=stats["flux"],
                 mean_radius_rad=stats["mean_radius_rad"],
                 spectral_index=np.stack(stats["spectral_index"])
                 if stats["spectral_index"] else np.zeros(0))
        print(f"Spectral volumetric: {n} bands in one trace "
              f"({stats['integrator_steps']:,} steps)")
        for f, fl, mr in zip(freqs, stats["flux"],
                             stats["mean_radius_rad"]):
            print(f"  f={f:<6g} flux={fl:<12.4f} "
                  f"<r>={np.degrees(mr):.3f} deg")
        for i, amap in enumerate(stats["spectral_index"]):
            # Flux-weighted (the unweighted mean is dominated by dim
            # outskirt pixels, which are optically thin at every band).
            w = np.where(np.isfinite(amap), stats["emission"][i], 0.0)
            mean_a = np.nansum(amap * w) / max(w.sum(), 1e-30)
            print(f"  alpha({freqs[i]:g}->{freqs[i + 1]:g}) "
                  f"flux-weighted mean={mean_a:+.2f} "
                  f"(negative = rising/thick)")
        print(f"Saved: {args.output} + {base}_spectrum.npz")
        return 0

    img, stats = render_volumetric(scene, (args.size, args.size), cfg,
                                   riaf)
    # Read back a 1-byte/px colormap index instead of the f32 image;
    # LUT applied host-side, byte-identical PNG (utils/save.py).
    from light_path_tracer_tpu.utils.save import quantize_cmap_index
    mpimg.imsave(args.output, cm.afmhot(np.asarray(
        quantize_cmap_index(img)))[..., :3])
    t = stats["timings"]
    print(f"Volumetric ({args.profile}): {args.size}x{args.size}, "
          f"a={scene.a}, "
          f"alpha_crit={np.degrees(stats['alpha_crit']):.4f} deg, "
          f"precompute {t.get('precompute', 0.0):.3f}s, "
          f"render {t.get('render', 0.0):.3f}s")
    rate = stats["traced_rays"] / max(t.get("precompute", 0.0), 1e-9)
    print(f"  captured {stats['captured']:,} px, emission total "
          f"{stats['emission_total']:.3f}, {rate:,.0f} rays/s")
    if args.alpha0 > 0.0:
        print(f"  self-absorbed: alpha0={args.alpha0}, "
              f"max optical depth {stats['tau_max']:.2f}")
    if getattr(args, "visibility", None):
        fov = camera.fov_from_vertical(scene.vertical_fov,
                                       (args.size, args.size))
        # The raw physical intensity (not the display-tone-mapped
        # image) is the right input for the baseline domain.
        _visibility_report(stats["emission"], fov, args.visibility,
                           model="ring")
    print(f"Saved: {args.output}")
    return 0


def cmd_star(args) -> int:
    """Compact-star surface image / pulse profile (star.py):
    NICER-style hot polar caps on a neutron-star surface."""
    if _reject_metric_py(args, "star"):
        return 2
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    from matplotlib import cm
    from light_path_tracer_tpu.star import (StarConfig, pulse_profile,
                                            render_star)

    scene = _scene_from(args)
    cfg = _render_cfg_from(args)
    spots = tuple(tuple(float(v) for v in s.split(",")) for s in
                  (args.spot or ["30,0,20,1.0"]))
    omega = args.omega
    if args.period:
        omega = 2.0 * np.pi / args.period
    star = StarConfig(radius=args.radius, omega=omega,
                      t_surface=args.t_surface, spots=spots,
                      g_power=args.g_power, limb_k=args.limb_k,
                      tone_map=args.tone_map)

    if args.pulse_profile:
        phases, flux, stats = pulse_profile(
            scene, cfg, star, n_phases=args.pulse_profile,
            resolution=(args.size, args.size),
            light_travel_delay=args.light_travel_delay)
        np.savez(args.output if args.output.endswith(".npz")
                 else args.output + ".npz", phases=phases, flux=flux)
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.plot(phases / (2.0 * np.pi), flux)
        ax.set_xlabel("rotation phase")
        ax.set_ylabel("flux / mean")
        ax.set_title(f"R={star.radius}M, Omega={omega:.3g}/M, "
                     f"modulation {stats['modulation']:.1%}")
        png = (args.output[:-4] if args.output.endswith(".npz")
               else args.output) + ".png"
        fig.savefig(png, dpi=120, bbox_inches="tight")
        print(f"Pulse profile: {args.pulse_profile} phases, "
              f"modulation {stats['modulation']:.2%}, "
              f"{stats['captured']:,} surface px")
        print(f"Saved: {png}")
        return 0

    img, stats = render_star(scene, (args.size, args.size), cfg, star,
                             phase=np.radians(args.phase_deg))
    from light_path_tracer_tpu.utils.save import quantize_cmap_index
    mpimg.imsave(args.output, cm.afmhot(np.asarray(
        quantize_cmap_index(img)))[..., :3])
    t = stats["timings"]
    print(f"Star ({args.radius}M): {args.size}x{args.size}, "
          f"apparent radius "
          f"{np.degrees(stats['apparent_radius_rad']):.4f} deg, "
          f"precompute {t.get('precompute', 0.0):.3f}s, "
          f"render {t.get('render', 0.0):.3f}s")
    rate = stats["traced_rays"] / max(t.get("precompute", 0.0), 1e-9)
    print(f"  surface {stats['captured']:,} px, {rate:,.0f} rays/s")
    if getattr(args, "visibility", None):
        from light_path_tracer_tpu import camera
        fov = camera.fov_from_vertical(scene.vertical_fov,
                                       (args.size, args.size))
        # The filled stellar disk matches the uniform-disk Bessel
        # kernel (first null at 1.22 lambda/D).
        _visibility_report(stats["brightness"], fov, args.visibility,
                           model="disk")
    print(f"Saved: {args.output}")
    return 0


def cmd_pano(args) -> int:
    """360-degree equirectangular panorama render (pano.py)."""
    import os
    import matplotlib.image as mpimg
    from light_path_tracer_tpu.pano import render_panorama, grid_sky
    from light_path_tracer_tpu.pipeline import print_benchmark_summary

    scene = _scene_from(args)
    cfg = _render_cfg_from(args)
    if args.fov_v != 40.0:
        print("  note: the panorama chart covers the full sphere; "
              "--fov-v is ignored")

    if args.grid_sky or not os.path.exists(args.image):
        if not args.grid_sky:
            print(f"note: {args.image} not found; using the procedural "
                  f"graticule sky (--grid-sky)")
        h = args.height or 512
        sky = grid_sky((h, 2 * h))
    else:
        sky = mpimg.imread(args.image)
    resolution = ((args.height, 2 * args.height)
                  if args.height else None)

    mesh = (_multihost_mesh(args)
            if getattr(args, "multihost", False) else None)
    out = render_panorama(scene, sky, resolution=resolution, cfg=cfg,
                          winding_overlay=args.winding_overlay,
                          mesh=mesh)
    height, width = np.asarray(out.final_alpha).shape
    if _is_proc0():
        mpimg.imsave(args.output, np.clip(np.asarray(out.image), 0, 1))
    cap = np.isnan(np.asarray(out.final_alpha))
    lat = np.pi / 2 - (np.arange(height) + 0.5) / height * np.pi
    wgt = np.broadcast_to(np.cos(lat)[:, None], (height, width))
    frac = float((cap * wgt).sum() / max(float(wgt.sum()), 1e-12))
    print(f"Panorama {height}x{width}: shadow covers {100 * frac:.2f}% "
          f"of the sky (alpha_crit envelope "
          f"{np.degrees(out.alpha_crit):.2f} deg)")
    print_benchmark_summary((height, width), out.alpha_crit,
                            out.total_rays, out.traced_rays, out.timings)
    if _is_proc0():
        print(f"Saved: {args.output}")
    return 0


def cmd_disk(args) -> int:
    """Accretion-disk render (BASELINE.json config 4)."""
    if _reject_metric_py(args, "disk"):
        return 2
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    import matplotlib.cm as cm
    from light_path_tracer_tpu.utils.config import SceneConfig
    from light_path_tracer_tpu.disk import render_disk, DiskConfig

    polarized = (getattr(args, "polarization", None)
                 or getattr(args, "qu_loop", None))
    if getattr(args, "Q", 0.0) and polarized:
        print("  note: polarized rendering is Kerr-only; ignoring --Q")
    if getattr(args, "visibility", None) and (
            polarized or getattr(args, "line_profile", None)
            or getattr(args, "light_curve", None) or args.frames > 1):
        # Those branches return before the still-image visibility block.
        print("  note: --visibility applies to the still disk image "
              "only; ignoring")
    if getattr(args, "eps3", 0.0):
        print("  note: disk mode is not wired for --eps3 (orbital "
              "dynamics are Kerr/charged closed forms); ignoring")
    scene = SceneConfig(
        M=args.M, a=args.a, r_obs_mult=args.r_obs,
        Q=(0.0 if polarized else getattr(args, "Q", 0.0)),
        psi_y=np.radians(args.psi_y), psi_x=np.radians(args.psi_x),
        vertical_fov_deg=args.fov_v,
        theta_obs=np.radians(args.inclination),
        boost=tuple(getattr(args, "boost", (0.0, 0.0, 0.0))))
    cfg = _render_cfg_from(args)
    disk = DiskConfig(r_out=args.r_out,
                      emissivity_index=args.emissivity_q,
                      g_power=args.g_power,
                      opaque=not args.translucent,
                      prograde=not args.retrograde,
                      tilt=np.radians(args.tilt),
                      tilt_azimuth=np.radians(args.tilt_azimuth),
                      warp_radius=args.warp_radius or None,
                      spectrum=args.spectrum, t_peak=args.t_peak)

    if getattr(args, "polarization", None):
        # Polarized disk image via the Walker-Penrose constant
        # (polarization.py): EVPA ticks over the tone-mapped image.
        from light_path_tracer_tpu.polarization import (
            render_polarization, save_polarization_figure)
        evpa, pol_frac, intensity, stats = render_polarization(
            scene, (args.size, args.size), cfg, disk,
            field=args.b_field)
        save_polarization_figure(
            args.polarization, evpa, pol_frac, intensity,
            tick_step=max(args.size // 32, 4),
            title=f"a={args.a}, i={args.inclination} deg, "
                  f"{args.b_field} B-field")
        t = stats["timings"]
        print(f"Polarization: {args.size}x{args.size}, a={args.a}, "
              f"{args.b_field} field, "
              f"{stats['polarized_pixels']:,} polarized px, "
              f"trace {t.get('precompute', 0.0):.3f}s")
        print(f"Saved: {args.polarization}")
        return 0

    if getattr(args, "qu_loop", None):
        # Polarized hot-spot flare: integrated Stokes (Q, U) loop over
        # --orbits spot orbits (polarization.hotspot_qu_loop).
        import matplotlib.pyplot as plt
        from light_path_tracer_tpu.disk import HotSpot, keplerian_omega
        from light_path_tracer_tpu.polarization import hotspot_qu_loop
        spot = HotSpot(r0=args.spot_r0, amplitude=args.spot_amplitude)
        period = abs(2.0 * np.pi / keplerian_omega(
            args.M, args.a, args.spot_r0, not args.retrograde,
            Q=scene.Q))
        n = max(args.frames, 48)
        ts = np.linspace(0.0, period * args.orbits, n)
        t_arr, I, Q, U, stats = hotspot_qu_loop(
            scene, (args.size, args.size), ts, cfg, disk, spot,
            field=args.b_field)
        fig, axes = plt.subplots(1, 2, figsize=(11, 4.8))
        s = I.mean()
        axes[0].plot(Q / s, U / s, lw=1.6)
        axes[0].scatter(Q[0] / s, U[0] / s, color="k", zorder=3,
                        label="t=0")
        axes[0].set_xlabel("Q / <I>"), axes[0].set_ylabel("U / <I>")
        axes[0].set_title("Stokes loop"), axes[0].legend()
        axes[0].set_aspect("equal", adjustable="datalim")
        axes[1].plot(t_arr / period, I / s, label="I")
        axes[1].plot(t_arr / period, Q / s, label="Q")
        axes[1].plot(t_arr / period, U / s, label="U")
        axes[1].set_xlabel("time [orbits]"), axes[1].legend()
        axes[1].set_title(f"a={args.a}, i={args.inclination} deg, "
                          f"{args.b_field} field")
        fig.tight_layout()
        fig.savefig(args.qu_loop, dpi=130)
        np.savetxt(args.qu_loop.rsplit(".", 1)[0] + ".csv",
                   np.column_stack([t_arr, I, Q, U]), delimiter=",",
                   header="time_M,I,Q,U")
        tt = stats["timings"]
        print(f"Q-U loop: {n} samples over {args.orbits} orbit(s), "
              f"{args.b_field} field, ONE trace "
              f"{tt.get('precompute', 0.0):.3f}s")
        print(f"Saved: {args.qu_loop} (+ .csv)")
        return 0

    if getattr(args, "decompose", None):
        # Photon-ring decomposition: one trace, per-image-order layers
        # (disk.render_disk_decomposed) on a shared display scale.
        import matplotlib.pyplot as plt
        import jax.numpy as jnp
        from light_path_tracer_tpu.disk import (render_disk_decomposed,
                                                decomposed_display)
        if args.aa > 1:
            print("  note: --aa is not supported with --decompose; "
                  "ignoring")
        n_ord = max(args.orders, 2)
        layers, stats = render_disk_decomposed(
            scene, (args.size, args.size), cfg, disk, n_orders=n_ord)
        stack = jnp.concatenate([jnp.sum(layers, axis=0)[None], layers])
        disp = np.asarray(decomposed_display(stack, disk.tone_map))
        flux = np.asarray(stats["flux_per_order"])
        frac = flux / max(flux.sum(), 1e-300)
        fig, axes = plt.subplots(1, n_ord + 1,
                                 figsize=(3.3 * (n_ord + 1), 3.7))
        titles = ["composite"] + [
            f"n={k} ({frac[k]:.2%} of flux)" for k in range(n_ord)]
        for ax, im, title in zip(axes, disp, titles):
            if im.ndim == 3:
                ax.imshow(np.clip(im, 0.0, 1.0) ** (1.0 / 2.2),
                          origin="upper")
            else:
                ax.imshow(im, cmap="afmhot", origin="upper",
                          vmin=0.0, vmax=1.0)
            ax.set_title(title, fontsize=10)
            ax.axis("off")
        gammas = ", ".join(f"{g:.2f}" for g in stats["gamma_estimates"])
        fig.suptitle(f"image-order decomposition: a={args.a}, "
                     f"i={args.inclination} deg — measured "
                     f"demagnification exponent(s) {gammas} "
                     f"(Schwarzschild asymptote pi)", fontsize=11)
        fig.tight_layout()
        fig.savefig(args.decompose, dpi=120)
        t = stats["timings"]
        print(f"Decomposition: {args.size}x{args.size}, a={args.a}, "
              f"{n_ord} orders from ONE trace "
              f"{t.get('precompute', 0.0):.3f}s")
        for k in range(n_ord):
            mr = np.degrees(stats["mean_radius_rad"][k])
            print(f"  n={k}: flux {frac[k]:.2%}, "
                  f"{stats['pixels_per_order'][k]:,} px, "
                  f"mean radius {mr:.3f} deg")
        print(f"  alpha_crit {np.degrees(stats['alpha_crit']):.3f} deg; "
              f"flux ratios {[f'{r:.3g}' for r in stats['flux_ratios']]}")
        print(f"Saved: {args.decompose}")
        return 0

    if getattr(args, "line_profile", None):
        # Relativistic emission-line profile (spectra.line_profile):
        # double-horned diskline with the spin-dependent red wing.
        import matplotlib.pyplot as plt
        from light_path_tracer_tpu.spectra import line_profile
        energy, flux, stats = line_profile(
            scene, (args.size, args.size), cfg, disk,
            n_bins=args.line_bins, rest_energy=args.rest_energy,
            aa_samples=max(args.aa, 1))
        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.plot(energy, flux / max(flux.max(), 1e-300), lw=1.8)
        ax.axvline(args.rest_energy, color="0.6", ls="--", lw=0.8)
        ax.set_xlabel(f"observed energy (rest = {args.rest_energy})")
        ax.set_ylabel("relative line flux")
        ax.set_title(f"disk line profile: a={args.a}, "
                     f"i={args.inclination} deg, "
                     f"r_isco={stats['r_isco']:.2f} M")
        fig.tight_layout()
        fig.savefig(args.line_profile, dpi=130)
        np.savetxt(args.line_profile.rsplit(".", 1)[0] + ".csv",
                   np.column_stack([energy, flux]), delimiter=",",
                   header="energy,flux")
        t = stats["timings"]
        seen = energy[flux > 0.01 * flux.max()]
        print(f"Line profile: a={args.a}, i={args.inclination} deg, "
              f"{stats['disk_pixels']:,} disk px, "
              f"E/E0 range {seen.min() / args.rest_energy:.3f}"
              f"-{seen.max() / args.rest_energy:.3f}, "
              f"trace {t.get('precompute', 0.0):.3f}s")
        print(f"Saved: {args.line_profile} (+ .csv)")
        return 0

    if getattr(args, "light_curve", None):
        # Hot-spot orbit light curve (spectra.hotspot_light_curve):
        # one trace, flux(t) over --orbits orbits.
        import matplotlib.pyplot as plt
        from light_path_tracer_tpu.disk import HotSpot, keplerian_omega
        from light_path_tracer_tpu.spectra import hotspot_light_curve
        spot = HotSpot(r0=args.spot_r0, amplitude=args.spot_amplitude)
        period = abs(2.0 * np.pi / keplerian_omega(
            args.M, args.a, args.spot_r0, not args.retrograde,
            Q=scene.Q))
        n = max(args.frames, 32)
        ts = np.linspace(0.0, period * args.orbits, n)
        t_arr, flux, stats = hotspot_light_curve(
            scene, (args.size, args.size), ts, cfg, disk, spot,
            light_travel_delay=getattr(args, "light_travel_delay",
                                       False))
        if getattr(args, "light_travel_delay", False):
            print(f"  light-travel delay: {stats['delay_spread']:.1f} M "
                  f"spread across the disk image")
        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.plot(t_arr / period, flux / flux.mean(), lw=1.8)
        ax.set_xlabel("time [spot orbits]")
        ax.set_ylabel("flux / mean")
        ax.set_title(f"hot-spot light curve: a={args.a}, "
                     f"i={args.inclination} deg, r0={args.spot_r0} M "
                     f"(P={period:.1f} M)")
        fig.tight_layout()
        fig.savefig(args.light_curve, dpi=130)
        np.savetxt(args.light_curve.rsplit(".", 1)[0] + ".csv",
                   np.column_stack([t_arr, flux]), delimiter=",",
                   header="time_M,flux")
        t = stats["timings"]
        print(f"Light curve: {n} samples over {args.orbits} orbit(s), "
              f"modulation x{flux.max() / flux.min():.2f}, ONE trace "
              f"{t.get('precompute', 0.0):.3f}s + "
              f"render {t.get('render', 0.0):.3f}s")
        print(f"Saved: {args.light_curve} (+ .csv)")
        return 0

    if args.frames > 1:
        # Hot-spot orbit animation: ONE trace, args.frames re-renders.
        from PIL import Image
        from light_path_tracer_tpu.disk import (render_disk_frames,
                                                HotSpot, keplerian_omega)
        spot = HotSpot(r0=args.spot_r0, amplitude=args.spot_amplitude)
        period = abs(2.0 * np.pi / keplerian_omega(
            args.M, args.a, args.spot_r0, not args.retrograde,
            Q=scene.Q))
        times = [period * args.orbits * i / args.frames
                 for i in range(args.frames)]
        frames, stats = render_disk_frames(
            scene, (args.size, args.size), times, cfg, disk, spot)
        frames = np.asarray(frames)
        if args.spectrum == "blackbody":
            colored = np.clip(frames, 0.0, 1.0) ** (1.0 / 2.2)
        else:
            colored = cm.afmhot(frames)[..., :3]
        pils = [Image.fromarray((np.clip(f, 0, 1)[..., :3] * 255)
                                .astype(np.uint8)) for f in colored]
        out = args.output
        if out.endswith(".png"):
            out = out[:-4] + ".gif"
        pils[0].save(out, save_all=True, append_images=pils[1:],
                     duration=int(1000 / args.fps), loop=0)
        t = stats["timings"]
        print(f"Hot-spot orbit: {args.frames} frames "
              f"({args.orbits} orbit(s), period {period:.1f} M), "
              f"ONE trace {t.get('precompute', 0.0):.3f}s + "
              f"render {t.get('render', 0.0):.3f}s")
        print(f"Saved: {out}")
        if getattr(args, "centroid", None):
            emission = np.asarray(stats["emission"], np.float64)
            _centroid_report(args.centroid, scene, args.size, emission,
                             emission.sum(axis=(1, 2)), args.spot_r0)
        return 0

    if getattr(args, "multihost", False):
        from light_path_tracer_tpu.disk import render_disk_multihost
        for flag, note in (("disk2", "--disk2"),):
            if getattr(args, flag, False):
                print(f"  note: {note} is not supported with "
                      f"--multihost; ignoring")
        if args.aa > 1:
            print("  note: --aa is not supported with --multihost disk; "
                  "ignoring")
        img, stats = render_disk_multihost(
            scene, (args.size, args.size), cfg, disk,
            mesh=_multihost_mesh(args))
    elif getattr(args, "disk2", False):
        # Second independent disk plane, traced in the SAME integration
        # (multi-plane recorder, ops/kerr_trace.py extra_disks).
        from light_path_tracer_tpu.disk import render_multi_disk
        if args.aa > 1:
            print("  note: --aa is not supported with --disk2; ignoring")
        disk2 = DiskConfig(
            r_in=args.disk2_r_in or None, r_out=args.disk2_r_out,
            emissivity_index=args.emissivity_q, g_power=args.g_power,
            opaque=not args.disk2_translucent,
            prograde=not args.retrograde,
            tilt=np.radians(args.disk2_tilt),
            tilt_azimuth=np.radians(args.disk2_tilt_azimuth),
            spectrum=args.spectrum, t_peak=args.t_peak)
        img, stats = render_multi_disk(scene, (args.size, args.size),
                                       cfg, [disk, disk2])
        print(f"  two disks: per-plane pixels "
              f"{stats['disk_pixels_per_plane']}")
    elif args.aa > 1:
        from light_path_tracer_tpu.disk import render_disk_aa
        img, stats = render_disk_aa(scene, (args.size, args.size), cfg,
                                    disk, aa_samples=args.aa)
    else:
        img, stats = render_disk(scene, (args.size, args.size), cfg, disk)
    if args.spectrum == "blackbody":
        # Physically colored (linear sRGB): gamma-encode for the PNG.
        # (Host-side: device-f32 pow differs from this float64 pow in
        # the last ulp, which could flip a truncated texel — the
        # byte-identical guarantee of utils/save.py would not hold.)
        colored = np.clip(np.asarray(img), 0.0, 1.0) ** (1.0 / 2.2)
    else:
        from light_path_tracer_tpu.utils.save import quantize_cmap_index
        colored = cm.afmhot(np.asarray(quantize_cmap_index(img)))[..., :3]
    if _is_proc0():
        mpimg.imsave(args.output, colored)
    t = stats["timings"]
    print(f"Accretion disk: {args.size}x{args.size}, a={args.a}, "
          f"inclination {args.inclination} deg, "
          f"r_isco={stats['r_isco']:.3f} M")
    print(f"  disk pixels: {stats['disk_pixels']:,}, "
          f"captured: {stats['captured']:,}")
    print(f"  precompute {t.get('precompute', 0.0):.3f}s "
          f"({stats['traced_rays'] / max(t.get('precompute', 1e-12), 1e-12):,.0f} rays/s)")
    print(f"Saved: {args.output}")
    if getattr(args, "visibility", None) and _is_proc0():
        from light_path_tracer_tpu import camera as _cam
        fov = _cam.fov_from_vertical(scene.vertical_fov,
                                     (args.size, args.size))
        _visibility_report(np.asarray(img), fov, args.visibility,
                           model="ring")
    return 0


def cmd_animate(args) -> int:
    """Camera-pan or flyby sequence -> animated GIF (traced fast path)."""
    if _reject_metric_py(args, "animate"):
        return 2
    import time
    import numpy as np
    from PIL import Image
    from light_path_tracer_tpu.sequence import render_flyby, render_sequence

    scene = _scene_from(args)
    n_frames = max(args.frames, 1)

    src = None
    if args.image:
        import matplotlib.image as mpimg
        src = mpimg.imread(args.image)

    if args.flyby:
        # Approach animation: observer radius ramps r0 -> r1 (units of
        # M) while a forward boost ramps 0 -> --boost-to; radius AND
        # boost ride the traced carry, so the whole approach is one
        # compiled program (sequence.render_flyby).
        if scene.Q:
            print("error: --flyby traces the metric through the "
                  "uncharged TracedKerr fast path; --Q is not "
                  "supported with --flyby (pan animations are)")
            return 2
        try:
            r0, r1 = (float(x) for x in args.flyby.split(":"))
        except ValueError:
            print(f"error: --flyby expects R0:R1 (units of M), got "
                  f"{args.flyby!r}")
            return 2
        ts = [i / max(n_frames - 1, 1) for i in range(n_frames)]
        fly_frames = [(scene.psi_y, scene.psi_x,
                       (r0 + (r1 - r0) * t) * scene.M,
                       (0.0, 0.0, args.boost_to * t)) for t in ts]

        def render(fr):
            return render_flyby(scene, fr, source_image=src,
                                resolution=(args.size, args.size))
    else:
        pan = np.radians(args.pan_deg)
        fly_frames = [(scene.psi_y, scene.psi_x - pan / 2 + pan * i /
                       max(n_frames - 1, 1)) for i in range(n_frames)]

        def render(fr):
            return render_sequence(scene, fr, source_image=src,
                                   resolution=(args.size, args.size))

    t0 = time.perf_counter()
    first = np.asarray(render(fly_frames[:1])[0])
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    rest = render(fly_frames[1:])
    imgs = [first] + [np.asarray(f) for f in rest]
    dt = (time.perf_counter() - t0) / max(n_frames - 1, 1)

    def to_pil(a):
        a = np.clip(a, 0.0, 1.0)
        if a.ndim == 2:
            a = np.repeat(a[..., None], 3, axis=-1)
        return Image.fromarray((a[..., :3] * 255).astype(np.uint8))

    pils = [to_pil(a) for a in imgs]
    pils[0].save(args.output, save_all=True, append_images=pils[1:],
                 duration=int(1000 / args.fps), loop=0)
    print(f"Animation: {args.frames} frames at {args.size}x{args.size}, "
          f"compile+first {t_compile:.1f}s, then {dt * 1000:.0f} ms/frame "
          f"({1 / max(dt, 1e-9):.1f} fps)")
    print(f"Saved: {args.output}")
    return 0


def cmd_request(args) -> int:
    """Offline replay of a serve-style JSON request (serve.py
    POST /render body) — same decode, dispatch, and display encodings
    as the HTTP layer, without the server. Reproducible scene files
    and local debugging of recorded production requests."""
    import json as _json
    with open(args.request) as f:
        req = _json.load(f)
    src = None
    if args.image:
        src = mpimg.imread(args.image)
        if src.dtype == np.uint8:
            src = src.astype(np.float32) / 255.0
    fmt = "npy" if args.output.endswith(".npy") else "png"
    from light_path_tracer_tpu.serve import render_request
    try:
        body, _ctype, dt, _cache = render_request(
            req, source_image=src, fmt=fmt)
    except (ValueError, TypeError, KeyError) as exc:
        raise SystemExit(
            f"error: bad request: {type(exc).__name__}: {exc}")
    with open(args.output, "wb") as f:
        f.write(body)
    print(f"Rendered mode={req.get('mode', 'shadow')} "
          f"in {dt:.3f}s")
    print(f"Saved: {args.output}")
    return 0


def cmd_ray(args) -> int:
    """Single-ray demo (main.py parity): trace, report, plot."""
    from light_path_tracer_tpu.trajectory import trace_ray_trajectory

    metric = _scene_from(args).metric()
    r_obs = args.r_obs * args.M
    alpha = np.radians(args.alpha_deg)
    traj, outcome = trace_ray_trajectory(metric, r_obs, alpha)
    b = metric.viewing_angle_to_impact_parameter(alpha, r_obs)
    print(f"Metric:             {type(metric).__name__}")
    print(f"Observer radius:    r_obs = {r_obs} M")
    print(f"Viewing angle:      alpha = {args.alpha_deg} deg")
    print(f"Impact parameter:   b = {b:.4f} M")
    print(f"Outcome:            {outcome.upper()}")

    if not args.no_plot and traj is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        n = int(traj.n_valid)
        r = np.asarray(traj.states[:n, 1])
        phi = np.asarray(traj.states[:n, 3])
        fig, ax = plt.subplots(figsize=(10, 10))
        circle = np.linspace(0, 2 * np.pi, 200)
        rh = metric.capture_radius()
        ax.fill(rh * np.cos(circle), rh * np.sin(circle), "k",
                label="Event horizon")
        if hasattr(metric, "R_PHOTON"):
            ax.plot(metric.R_PHOTON * np.cos(circle),
                    metric.R_PHOTON * np.sin(circle), "r--",
                    label="Photon sphere")
        color = "steelblue" if outcome == "escaped" else "crimson"
        ax.plot(r * np.cos(phi), r * np.sin(phi), color=color,
                linewidth=2, label=f"Photon path ({outcome})")
        ax.plot(r_obs, 0, "go", markersize=12, label="Observer")
        ax.set_aspect("equal")
        ax.legend(loc="upper left")
        ax.grid(True, alpha=0.3)
        plt.savefig(args.output, dpi=150)
        print(f"Saved: {args.output}")
    return 0


def cmd_plot(args) -> int:
    """Multi-angle trajectory overlay (geodesic_tracer.__main__ parity)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from light_path_tracer_tpu.trajectory import plot_trajectories

    metric = _scene_from(args).metric()
    r_obs = args.r_obs * args.M
    angles = [float(x) for x in args.angles.split(",")]
    ac = np.degrees(metric.alpha_crit(r_obs))
    print(f"Metric: {type(metric).__name__}; critical angle "
          f"{ac:.4f} deg")
    for alpha_deg in angles:
        alpha = np.radians(alpha_deg)
        b = metric.viewing_angle_to_impact_parameter(alpha, r_obs)
        fa, nh, outcome = metric.trace_ray(r_obs, alpha)
        print(f"  alpha = {alpha_deg:6.2f} deg -> b = {b:6.3f} M -> "
              f"{outcome.upper()}")
    fig, ax = plt.subplots(figsize=(12, 10))
    plot_trajectories(metric, r_obs, angles, ax=ax)
    plt.tight_layout()
    plt.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"Saved: {args.output}")
    return 0


def cmd_orbit(args) -> int:
    """Timelike bound orbit: integrate, report precession, plot rosette.

    Beyond-reference mode (the reference traces photons only) on the same
    8-D Hamiltonian recorder the `ray`/`plot` commands use.
    """
    import jax.numpy as jnp
    from light_path_tracer_tpu.models import make_metric
    from light_path_tracer_tpu import particles as pt

    if args.eps3:
        print("error: orbit integrals (BPT circular-orbit forms) are not "
              "derived for the Johannsen-Psaltis family; use --a/--Q "
              "metrics", file=sys.stderr)
        return 2
    metric = make_metric(args.M, args.a, args.Q, 0.0)
    prograde = not args.retrograde
    if args.r is not None:
        r0 = args.r * args.M
        E, L, omega = pt.circular_orbit(metric, r0, prograde)
        print(f"Circular orbit at r = {r0} M: E = {E:.9f}, L = {L:.6f}, "
              f"Omega = {omega:.8f} (period {2 * np.pi / abs(omega):.2f} M)")
    else:
        r_p, r_a = args.peri * args.M, args.apo * args.M
        E, L = pt.orbit_from_apsides(metric, r_p, r_a, prograde=prograde)
        r0 = r_p
        print(f"Bound orbit r_peri = {r_p} M, r_apo = {r_a} M: "
              f"E = {E:.9f}, L = {L:.6f}")

    inc = np.radians(args.inclination)
    state8, invalid = pt.timelike_initial_conditions(
        metric, jnp.asarray(r0, jnp.float64), E, L * np.cos(inc),
        p_theta=L * np.sin(inc))
    if bool(np.asarray(invalid)):
        print("error: requested start point is classically forbidden",
              file=sys.stderr)
        return 2
    traj = pt.integrate_orbit(metric, state8, n_steps=args.steps)
    n = int(np.asarray(traj.n_valid))
    states = np.asarray(traj.states[:n], np.float64)
    if int(np.asarray(traj.outcome)) == -1:
        print(f"Orbit PLUNGED through the horizon after "
              f"{states[-1, 0]:.1f} M of coordinate time "
              f"({n} accepted steps)")
    else:
        r_all = states[:, 1]
        # A (near-)circular orbit has no periapsis: numerical micro-
        # extrema would otherwise masquerade as precession.
        if np.ptp(r_all) > 1e-3 * np.mean(r_all):
            try:
                adv = pt.periapsis_precession(traj)
                pred = pt.weak_field_periapsis_advance(
                    args.M, args.a, float(np.min(r_all)),
                    float(np.max(r_all)), prograde=prograde)
                print(f"Periapsis advance per orbit: "
                      f"{np.degrees(np.mean(adv)):.4f} deg measured over "
                      f"{len(adv)} passages (leading-order GR: "
                      f"{np.degrees(pred):.4f} deg)")
            except ValueError:
                pass
        if inc != 0.0:
            try:
                drift, _ = pt.nodal_precession(traj)
                print(f"Ascending-node drift per orbit (Lense-Thirring): "
                      f"{np.degrees(np.mean(drift)):.4f} deg over "
                      f"{len(drift)} nodes")
            except ValueError:
                pass
        res = np.asarray(pt.hamiltonian(metric, jnp.asarray(states)))
        print(f"Hamiltonian residual |H + 1/2| <= "
              f"{np.max(np.abs(res + 0.5)):.2e} over {n} steps")

    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        r, th, phi = states[:, 1], states[:, 2], states[:, 3]
        x = r * np.sin(th) * np.cos(phi)
        y = r * np.sin(th) * np.sin(phi)
        panels = 2 if inc != 0.0 else 1
        fig, axes = plt.subplots(1, panels,
                                 figsize=(7 * panels, 7), squeeze=False)
        ax = axes[0, 0]
        circle = np.linspace(0, 2 * np.pi, 200)
        rh = metric.capture_radius()
        ax.fill(rh * np.cos(circle), rh * np.sin(circle), "k",
                label="Event horizon")
        ax.plot(x, y, lw=0.8, color="steelblue", label="orbit")
        ax.plot(x[0], y[0], "go", label="start")
        ax.set_aspect("equal")
        ax.legend(loc="upper left")
        ax.grid(True, alpha=0.3)
        ax.set_title(f"{type(metric).__name__} timelike orbit "
                     f"(E={E:.4f}, L={L:.3f})")
        if inc != 0.0:
            ax2 = axes[0, 1]
            ax2.plot(states[:, 0], r * np.cos(th), lw=0.8)
            ax2.set_xlabel("coordinate time t [M]")
            ax2.set_ylabel("z = r cos(theta) [M]")
            ax2.set_title("vertical oscillation (nodal drift)")
            ax2.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(args.output, dpi=150)
        print(f"Saved: {args.output}")
    return 0


def build_parser():
    parser = argparse.ArgumentParser(
        prog="light_path_tracer_tpu",
        description="TPU-native general-relativistic ray tracer")
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("lens", help="lensed background-image render")
    _add_scene_args(p)
    _add_render_args(p)
    p.add_argument("--image", default="image.jpg")
    p.add_argument("--output", default="lensed_image.png")
    p.add_argument("--disk", action="store_true",
                   help="composite an accretion disk into the lensed "
                        "render (one trace per pixel; --theta-obs sets "
                        "the inclination)")
    p.add_argument("--r-out", type=float, default=20.0)
    p.add_argument("--emissivity-q", type=float, default=3.0)
    p.add_argument("--g-power", type=float, default=3.0)
    p.add_argument("--translucent", action="store_true")
    p.add_argument("--spectrum", default="blackbody",
                   choices=["powerlaw", "blackbody"])
    p.add_argument("--t-peak", type=float, default=9000.0)
    p.add_argument("--disk-gain", type=float, default=1.0,
                   help="disk brightness relative to the background")
    p.add_argument("--aa", type=int, default=1,
                   help="composite AA samples per pixel (with --disk)")
    p.add_argument("--adaptive", action="store_true",
                   help="adaptive AA: refine only edge pixels (shadow "
                        "boundary, photon rings, high-contrast bands) "
                        "at --aa samples; ~aa x fewer rays than uniform "
                        "AA (adaptive.py)")
    p.add_argument("--refine-frac", type=float, default=0.05,
                   help="adaptive-AA refinement budget (fraction of "
                        "pixels, top_k by edge score)")
    p.add_argument("--rings", action="store_true",
                   help="also write the lensed image split by photon-"
                        "ring order (direct / 1st lensed / n-th ring)")
    p.add_argument("--max-order", type=int, default=3)
    p.add_argument("--magnification", metavar="PATH",
                   help="instead of lensing an image, write the signed "
                        "magnification map of the celestial lens map "
                        "(critical curves at |mu| -> inf, mu < 0 = "
                        "parity-flipped images, NaN shadow black); "
                        "--size sets the grid, no --image needed")
    p.add_argument("--size", type=int, default=512,
                   help="grid size for --magnification/--caustics/"
                        "--microlens")
    p.add_argument("--shear", metavar="PATH",
                   help="write the weak-lensing decomposition of the "
                        "traced lens map (2x2 panel: convergence "
                        "kappa, shear |gamma|, gamma_1, rotation "
                        "omega; omega != 0 is frame dragging — a "
                        "direct map-level spin observable); --size "
                        "sets the grid, no --image needed")
    p.add_argument("--caustics", metavar="PATH",
                   help="instead of lensing an image, write the "
                        "SOURCE-plane magnification (caustic) map by "
                        "inverse ray shooting (total A over all "
                        "images; ridges = caustics); --size sets the "
                        "traced grid, no --image needed")
    p.add_argument("--caustic-bins", type=int, default=256,
                   help="source-plane bins per axis for --caustics")
    p.add_argument("--microlens", metavar="PATH",
                   help="write a microlensing light curve (CSV, or a "
                        "plot if PATH ends .png) of a finite source "
                        "crossing the lens at --track-impact; "
                        "weak-field Schwarzschild reproduces the "
                        "Paczynski curve")
    p.add_argument("--track-impact", type=float, default=1.0,
                   help="microlens track impact parameter u0 in "
                        "Einstein angles theta_E = sqrt(4M/r_obs)")
    p.add_argument("--track-span", type=float, default=4.0,
                   help="microlens track half-length in theta_E")
    p.add_argument("--track-points", type=int, default=81,
                   help="points along the microlens track")
    p.add_argument("--source-radius", type=float, default=0.3,
                   help="source angular radius in theta_E")
    p.add_argument("--time-delay", metavar="PATH",
                   help="write the Fermat arrival-time map (coordinate "
                        "time traced through the metric, plane-wave "
                        "referenced; tau differences between pixels "
                        "imaging the same source = the time-delay-"
                        "cosmography observable). float64 recommended")
    p.add_argument("--find-images", metavar="BX,BY",
                   help="solve for ALL images of a point source at "
                        "gnomonic sky position (BX, BY) degrees about "
                        "the BH: prints positions, signed "
                        "magnifications/parities, winding orders, and "
                        "relative time delays (Newton-refined on the "
                        "traced lens map; --size sets the coarse "
                        "grid, no --image needed). "
                        "--dtype float64 recommended for delays")
    _add_multihost_args(p)
    p.set_defaults(fn=cmd_lens)

    p = sub.add_parser("shadow", help="black-hole shadow render")
    p.add_argument("--aa", type=int, default=1,
                   help="jittered AA samples per pixel (smooth shadow "
                        "boundary)")
    p.add_argument("--adaptive", action="store_true",
                   help="adaptive AA: refine only shadow-boundary / "
                        "photon-ring pixels at --aa samples "
                        "(adaptive.py)")
    p.add_argument("--refine-frac", type=float, default=0.05,
                   help="adaptive-AA refinement budget (fraction of "
                        "pixels, top_k by edge score)")
    _add_scene_args(p)
    _add_render_args(p)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--analytic", action="store_true",
                   help="zero-integration threshold test vs alpha_crit")
    p.add_argument("--rings", action="store_true",
                   help="photon-ring decomposition: composite colored by "
                        "winding order + one mask image per order")
    p.add_argument("--max-order", type=int, default=3,
                   help="highest photon-ring order to separate")
    p.add_argument("--output", default="black_hole_shadow.png")
    p.add_argument("--visibility", metavar="PATH",
                   help="also analyze the shadow silhouette in the "
                        "visibility domain (observables.py): save the "
                        "azimuthally averaged |V| profile as PATH "
                        "(.npz) and print the diameter recovered from "
                        "the first null vs the true 2*alpha_crit")
    _add_multihost_args(p)
    p.set_defaults(fn=cmd_shadow)

    p = sub.add_parser("disk", help="accretion-disk render (redshift + "
                                    "Doppler beaming)")
    _add_scene_args(p)
    _add_render_args(p)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--inclination", type=float, default=80.0,
                   help="observer inclination from the spin axis in deg")
    p.add_argument("--r-out", type=float, default=20.0)
    p.add_argument("--emissivity-q", type=float, default=3.0)
    p.add_argument("--g-power", type=float, default=3.0)
    p.add_argument("--translucent", action="store_true")
    p.add_argument("--retrograde", action="store_true",
                   help="retrograde disk orbits (ISCO moves out, "
                        "Doppler limb swaps)")
    p.add_argument("--tilt", type=float, default=0.0,
                   help="disk tilt from the equator [deg] (XLA path; "
                        "emitter model approximate for tilted Kerr)")
    p.add_argument("--tilt-azimuth", type=float, default=0.0,
                   help="azimuth of the tilted disk's line of nodes [deg]")
    p.add_argument("--warp-radius", type=float, default=0.0,
                   help="Bardeen-Petterson warp radius [M]: inner disk "
                        "aligns with the equator, outer keeps --tilt "
                        "(0 = flat tilted plane)")
    p.add_argument("--spectrum", default="powerlaw",
                   choices=["powerlaw", "blackbody"],
                   help="powerlaw: grayscale g^p r^-q (afmhot colormap); "
                        "blackbody: physical Planck colors at "
                        "T_obs = g T(r)")
    p.add_argument("--t-peak", type=float, default=9000.0,
                   help="blackbody peak disk temperature [K]")
    p.add_argument("--frames", type=int, default=1,
                   help=">1: hot-spot orbit animation (GIF) — one trace, "
                        "N re-rendered frames")
    p.add_argument("--orbits", type=float, default=1.0,
                   help="number of spot orbits across the animation")
    p.add_argument("--spot-r0", type=float, default=6.0,
                   help="hot-spot orbit radius [M]")
    p.add_argument("--spot-amplitude", type=float, default=6.0)
    p.add_argument("--centroid", default=None, metavar="PLOT.png",
                   help="with --frames: also save the GRAVITY-style "
                        "astrometric photocenter track + light curve "
                        "(observables.centroid_track on the raw "
                        "per-frame emission)")
    p.add_argument("--fps", type=float, default=12.0)
    p.add_argument("--aa", type=int, default=1,
                   help="jittered AA samples per pixel (disk edges / "
                        "photon ring)")
    p.add_argument("--decompose", default=None, metavar="PANEL.png",
                   help="photon-ring decomposition: split the disk "
                        "image by image order (direct / first lensed / "
                        "photon subrings) from ONE trace; saves a "
                        "shared-scale panel and prints per-order "
                        "fluxes + the measured Lyapunov "
                        "demagnification (disk.render_disk_decomposed)")
    p.add_argument("--orders", type=int, default=3,
                   help="image orders for --decompose (>= 2)")
    p.add_argument("--polarization", default=None, metavar="PLOT.png",
                   help="polarized disk image (Walker-Penrose "
                        "transport): EVPA ticks over the disk render "
                        "(polarization.py; requires a BH-centered "
                        "camera)")
    p.add_argument("--b-field", default="toroidal",
                   choices=["vertical", "toroidal", "radial"],
                   help="magnetic-field geometry for --polarization")
    p.add_argument("--qu-loop", default=None, metavar="PLOT.png",
                   help="polarized hot-spot flare: integrated Stokes "
                        "(Q, U) loop over --orbits orbits "
                        "(polarization.hotspot_qu_loop)")
    p.add_argument("--line-profile", default=None, metavar="PLOT.png",
                   help="compute the relativistic emission-line profile "
                        "(flux vs observed energy; the Fe K-alpha "
                        "diskline shape) instead of an image; saves a "
                        "plot + CSV (spectra.line_profile)")
    p.add_argument("--rest-energy", type=float, default=6.4,
                   help="line rest energy for --line-profile (6.4 = "
                        "Fe K-alpha in keV; 1.0 = profile in g)")
    p.add_argument("--line-bins", type=int, default=200,
                   help="energy bins for --line-profile")
    p.add_argument("--light-travel-delay", action="store_true",
                   help="with --light-curve: evaluate the spot at each "
                        "pixel's RETARDED time (per-crossing coordinate"
                        "-time recording) instead of the equal-time "
                        "approximation — light-echo skew included")
    p.add_argument("--light-curve", default=None, metavar="PLOT.png",
                   help="compute the orbiting hot-spot light curve "
                        "(flux vs time over --orbits orbits, >=32 "
                        "samples or --frames) instead of an image; "
                        "saves a plot + CSV (spectra.hotspot_light_curve)")
    p.add_argument("--disk2", action="store_true",
                   help="add a second independent disk plane, traced in "
                        "the same integration (multi-plane recorder)")
    p.add_argument("--disk2-r-in", type=float, default=0.0,
                   help="second disk inner radius [M] (0 = ISCO)")
    p.add_argument("--disk2-r-out", type=float, default=30.0)
    p.add_argument("--disk2-tilt", type=float, default=25.0,
                   help="second disk tilt from the equator [deg]")
    p.add_argument("--disk2-tilt-azimuth", type=float, default=0.0)
    p.add_argument("--disk2-translucent", action="store_true")
    p.add_argument("--output", default="accretion_disk.png")
    p.add_argument("--visibility", metavar="PATH",
                   help="also analyze the disk image in the visibility "
                        "domain (observables.py): save the azimuthally "
                        "averaged |V| profile as PATH (.npz) and print "
                        "the ring diameter recovered from the first "
                        "null")
    _add_multihost_args(p)
    p.set_defaults(fn=cmd_disk)

    p = sub.add_parser("volumetric",
                       help="optically-thin hot-flow render (RIAF "
                            "torus: the M87*-style crescent image)")
    _add_scene_args(p)
    _add_render_args(p)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--profile", default="torus",
                   choices=["torus", "powerlaw", "shell", "jet"],
                   help="rest-frame emissivity: Gaussian torus, "
                        "RIAF power-law with Gaussian scale height, "
                        "uniform spherical shell, or bipolar jet "
                        "funnel with relativistic radial outflow "
                        "(--jet-beta)")
    p.add_argument("--jet-beta", type=float, default=0.0,
                   help="jet ZAMO-frame outflow speed in c "
                        "(profile=jet; one-sided Doppler beaming)")
    p.add_argument("--jet-cos", type=float, default=0.9,
                   help="jet cone center in |cos theta|")
    p.add_argument("--jet-sigma", type=float, default=0.06,
                   help="jet cone thickness in |cos theta|")
    p.add_argument("--jet-r-base", type=float, default=2.0,
                   help="jet emission base radius [M]")
    p.add_argument("--r-peak", type=float, default=4.5,
                   help="torus center / power-law pivot radius [M]")
    p.add_argument("--sigma-r", type=float, default=1.5,
                   help="torus radial Gaussian width [M]")
    p.add_argument("--h-cos", type=float, default=0.3,
                   help="vertical Gaussian width in cos(theta)")
    p.add_argument("--index", type=float, default=-1.5,
                   help="power-law emissivity exponent")
    p.add_argument("--shell-in", type=float, default=6.0,
                   help="shell inner radius [M] (--profile shell)")
    p.add_argument("--shell-out", type=float, default=10.0,
                   help="shell outer radius [M] (--profile shell)")
    p.add_argument("--g-power", type=float, default=3.0,
                   help="redshift weight exponent p in g^p j "
                        "(3 = I_nu invariance; 0 = pure path length)")
    p.add_argument("--retrograde", action="store_true",
                   help="reverse the flow rotation (flips the "
                        "Doppler crescent)")
    p.add_argument("--tone-map", default="sqrt",
                   choices=["linear", "sqrt", "asinh"])
    p.add_argument("--alpha0", type=float, default=0.0,
                   help="opacity scale [1/M] at the fiducial "
                        "frequency: rest-frame absorption "
                        "alpha0 * j(r, theta) (uniform source "
                        "function 1/alpha0); 0 = optically thin")
    p.add_argument("--freqs", metavar="F1,F2,...",
                   help="multi-frequency mode: observed frequencies "
                        "(units of the fiducial) — ALL bands in ONE "
                        "trace via the shared reduced optical depth; "
                        "saves a band panel + the SED (.npz)")
    p.add_argument("--opacity-index", type=float, default=0.0,
                   help="q in alpha_nu ~ nu^-q (0 = gray; "
                        "synchrotron-like q = g_power - 3 + 5/2). "
                        "With --freqs this makes the photosphere "
                        "frequency-dependent (SSA turnover)")
    p.add_argument("--movie", type=int, metavar="N",
                   help="flare-movie mode: N observer-time frames of "
                        "an orbiting hot-spot blob, ALL from one "
                        "trace (retarded-time evaluation); writes a "
                        "GIF")
    p.add_argument("--orbits", type=float, default=1.0,
                   help="blob orbits covered by the movie")
    p.add_argument("--spot-amp", type=float, default=5.0,
                   help="blob peak emissivity (movie mode; adds to "
                        "the base profile)")
    p.add_argument("--spot-r", type=float, default=6.0,
                   help="blob orbit radius [M]")
    p.add_argument("--centroid", default=None, metavar="PLOT.png",
                   help="with --movie: also save the GRAVITY-style "
                        "astrometric photocenter track + light curve "
                        "(observables.centroid_track on the raw "
                        "per-frame emission)")
    p.add_argument("--decompose", default=None, metavar="PANEL.png",
                   help="photon-ring decomposition of the hot-flow "
                        "image: per-image-order emission layers from "
                        "ONE trace (smooth winding coordinate), panel "
                        "+ per-order fluxes and the measured Lyapunov "
                        "demagnification "
                        "(volumetric.render_volumetric_decomposed)")
    p.add_argument("--orders", type=int, default=3,
                   help="image orders for --decompose (>= 2)")
    p.add_argument("--spot-sigma", type=float, default=1.0,
                   help="blob Gaussian size [M]")
    p.add_argument("--fps", type=float, default=12.0,
                   help="movie GIF frame rate")
    p.add_argument("--polarization", default=None, metavar="PLOT.png",
                   help="polarized mode: Stokes I/Q/U volumetric path "
                        "integrals (Walker-Penrose per-element "
                        "algebra); saves an EHT-style EVPA tick "
                        "figure (Kerr-only, optically thin)")
    p.add_argument("--b-field", default="toroidal",
                   choices=["vertical", "toroidal", "radial"],
                   help="magnetic-field geometry of the polarized "
                        "emission")
    p.add_argument("--output", default="volumetric.png")
    p.add_argument("--visibility", metavar="PATH",
                   help="save the baseline-domain |V| profile of the "
                        "raw emission image as PATH (.npz) and print "
                        "the first-null ring diameter")
    p.set_defaults(fn=cmd_volumetric)

    p = sub.add_parser("star",
                       help="compact-star surface image / NICER-style "
                            "pulse profile (hot spots on a "
                            "neutron-star surface)")
    _add_scene_args(p)
    _add_render_args(p)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--radius", type=float, default=5.0,
                   help="stellar surface radius [M] (must exceed the "
                        "horizon; < ~3.5M makes the WHOLE surface "
                        "visible at once)")
    p.add_argument("--omega", type=float, default=0.0,
                   help="rigid rotation angular velocity [c/M]")
    p.add_argument("--period", type=float, default=0.0,
                   help="rotation period [M] (alternative to --omega)")
    p.add_argument("--spot", action="append", metavar="COLAT,AZ,RAD,T",
                   help="hot spot: colatitude, azimuth, angular radius "
                        "[deg], temperature; repeatable "
                        "(default 30,0,20,1.0)")
    p.add_argument("--t-surface", type=float, default=0.5,
                   help="background surface temperature")
    p.add_argument("--g-power", type=float, default=4.0,
                   help="redshift weight exponent (4 = bolometric)")
    p.add_argument("--limb-k", type=float, default=0.0,
                   help="cos^k limb darkening (0 = isotropic)")
    p.add_argument("--phase-deg", type=float, default=0.0,
                   help="rotation phase of the still image [deg]")
    p.add_argument("--pulse-profile", type=int, metavar="N",
                   help="compute an N-phase rotational light curve "
                        "instead of an image (one trace, vmapped "
                        "phases); saves .npz + plot")
    p.add_argument("--light-travel-delay", action="store_true",
                   help="evaluate each surface element at its "
                        "retarded phase (records coordinate time "
                        "along every ray)")
    p.add_argument("--tone-map", default="linear",
                   choices=["linear", "sqrt", "asinh"])
    p.add_argument("--visibility", metavar="PATH",
                   help="save the baseline-domain |V| profile of the "
                        "raw brightness image as PATH (.npz) and "
                        "print the uniform-disk diameter recovered "
                        "from the first null")
    p.add_argument("--output", default="star.png")
    p.set_defaults(fn=cmd_star)

    p = sub.add_parser(
        "pano",
        help="360-degree equirectangular panorama render (VR skybox: "
             "the full lensed celestial sphere around the observer)")
    _add_scene_args(p)
    _add_render_args(p)
    p.add_argument("--image", default="image.jpg",
                   help="equirectangular source sky (2:1 lat/lon chart)")
    p.add_argument("--grid-sky", action="store_true",
                   help="use a procedural lat/lon graticule source sky "
                        "instead of --image")
    p.add_argument("--height", type=int, default=None,
                   help="output rows (width = 2*height); default: the "
                        "source sky's resolution")
    p.add_argument("--winding-overlay", action="store_true",
                   help="recolor photon-ring pixels (winding >= 1) with "
                        "the winding palette")
    p.add_argument("--output", default="pano.png")
    _add_multihost_args(p)
    p.set_defaults(fn=cmd_pano)

    p = sub.add_parser("animate", help="camera-pan animation (GIF), "
                                       "one compile for all frames")
    _add_scene_args(p)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--pan-deg", type=float, default=2.0,
                   help="total horizontal pan across the sequence")
    p.add_argument("--flyby", default=None, metavar="R0:R1",
                   help="approach animation instead of a pan: observer "
                        "radius ramps R0 -> R1 (units of M) with radius "
                        "and boost in the traced carry (one compile)")
    p.add_argument("--boost-to", type=float, default=0.0,
                   help="with --flyby: forward boost ramps 0 -> this "
                        "(units of c; shadow shrinks by aberration)")
    p.add_argument("--image", default=None,
                   help="background image (default: shadow-only frames)")
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--output", default="pan.gif")
    p.set_defaults(fn=cmd_animate)

    p = sub.add_parser("ray", help="single-ray trace + trajectory plot")
    _add_scene_args(p)
    p.add_argument("--alpha-deg", type=float, default=8.0)
    p.add_argument("--no-plot", action="store_true")
    p.add_argument("--output", default="example_geodesic.png")
    p.set_defaults(fn=cmd_ray)

    p = sub.add_parser(
        "request", help="offline replay of a serve-style JSON request "
                        "(the POST /render body, rendered locally "
                        "through the exact serving contract)")
    p.add_argument("request", help="path to the request JSON file")
    p.add_argument("--image", default=None,
                   help="background image path for lens/composite "
                        "(replaces the request's image_b64)")
    p.add_argument("--output", default="request_out.png",
                   help=".png (display-encoded) or .npy (raw arrays)")
    p.set_defaults(fn=cmd_request)

    p = sub.add_parser("plot", help="multi-angle trajectory overlay")
    _add_scene_args(p)
    p.add_argument("--angles", default="0,2,4,5,5.5,5.97,6.5,8,10,15")
    p.add_argument("--output", default="geodesic_trajectories.png")
    p.set_defaults(fn=cmd_plot)

    p = sub.add_parser(
        "orbit", help="timelike (massive-particle) bound orbit: rosette "
                      "plot + measured periapsis/nodal precession")
    p.add_argument("--M", type=float, default=1.0, help="BH mass")
    p.add_argument("--a", type=float, default=0.0, help="BH spin")
    p.add_argument("--Q", type=float, default=0.0, help="BH charge")
    p.add_argument("--eps3", type=float, default=0.0,
                   help=argparse.SUPPRESS)  # rejected with a clear error
    p.add_argument("--r", type=float, default=None,
                   help="circular-orbit radius in units of M (overrides "
                        "--peri/--apo)")
    p.add_argument("--peri", type=float, default=8.0,
                   help="periapsis radius in units of M")
    p.add_argument("--apo", type=float, default=16.0,
                   help="apoapsis radius in units of M")
    p.add_argument("--retrograde", action="store_true",
                   help="orbit against the BH spin")
    p.add_argument("--inclination", type=float, default=0.0,
                   help="orbital inclination in deg (tilts L out of the "
                        "equator; nonzero shows Lense-Thirring node drag)")
    p.add_argument("--steps", type=int, default=6000,
                   help="adaptive-step budget (more steps = more orbits)")
    p.add_argument("--device", default="default",
                   choices=["default", "cpu", "tpu"])
    p.add_argument("--no-plot", action="store_true")
    p.add_argument("--output", default="orbit.png")
    # Precession accumulates phase over many orbits: always integrate in
    # f64 (main() enables x64 from this default).
    p.set_defaults(fn=cmd_orbit, dtype="float64")

    return parser


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    import jax
    restore = {}
    device = getattr(args, "device", "default")
    if device != "default":
        # Must run before any backend initialization: some TPU plugins
        # force-register themselves and override JAX_PLATFORMS at
        # interpreter start, so the env var alone is not enough.
        restore["jax_platforms"] = jax.config.jax_platforms
        jax.config.update("jax_platforms", device)
    if getattr(args, "dtype", "float32") == "float64":
        # Without this, jnp silently truncates every float64 request
        # to float32 and --dtype float64 would be a no-op.
        restore["jax_enable_x64"] = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
    if getattr(args, "multihost", False):
        # Must run before ANY other JAX call in this process.
        from light_path_tracer_tpu.parallel.multihost import (
            initialize_multihost)
        initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            timeout_s=args.init_timeout)
    from light_path_tracer_tpu.utils.cache import enable_compilation_cache
    # The persistent-cache settings are process-global too; snapshot
    # them BEFORE enabling so the finally below restores them (a leaked
    # jax_compilation_cache_dir made pytest write — and once segfault
    # in — the on-disk cache long after main() returned).
    for key in ("jax_compilation_cache_dir",
                "jax_persistent_cache_min_compile_time_secs"):
        try:
            restore[key] = getattr(jax.config, key)
        except AttributeError:
            pass
    enable_compilation_cache()
    try:
        if not getattr(args, "fn", None):
            parser.print_help()
            return 2
        return args.fn(args)
    finally:
        # All captured settings are process-global; restore them so
        # in-process callers (tests, notebooks) can invoke main()
        # repeatedly with different flags. (The already-initialized
        # backend persists — only the CONFIG is restored.)
        for key, val in restore.items():
            jax.config.update(key, val)


if __name__ == "__main__":
    sys.exit(main())
