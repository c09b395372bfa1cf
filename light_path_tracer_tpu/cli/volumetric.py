"""`volumetric` subcommand: RIAF torus / jets, self-absorption,
spectra, flare movies, decomposition."""

from __future__ import annotations

import numpy as np

from light_path_tracer_tpu.cli._shared import (
    _add_render_args, _add_scene_args, _centroid_report, _reject_metric_py, _render_cfg_from, _scene_from, _visibility_report)


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


def register(sub):
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
