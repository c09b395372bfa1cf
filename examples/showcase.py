#!/usr/bin/env python
"""One-stop showcase: renders every product of the framework.

  python examples/showcase.py [--size 512] [--outdir out]

Produces:
  shadow_schwarzschild.png   integrated Schwarzschild shadow
  shadow_kerr.png            integrated Kerr a=0.9 shadow (frame dragging)
  lensed_checker.png         gravitationally lensed checkerboard
  accretion_disk.png         thin disk w/ redshift + Doppler beaming
  trajectories.png           geodesic overlay around the photon sphere
  shadow_kerr_newman_q.png   charged-shadow triptych (Q = 0/0.6/0.79)
  disk_charged_rn.png        charged disk: the RN ISCO sits closer in
  magnification_kerr_a09.png signed magnification map (critical curves)
  volumetric_absorption.png  RIAF torus, optically thin vs self-absorbed
  volumetric_spectrum.png    three frequencies from one trace (SSA)
  volumetric_polarized.png   EVPA ticks from Stokes path integrals
  neutron_star_caps.png      neutron-star surface with two hot caps
  pulse_profile.png          NICER-style rotational light curve
  binary_and_wormhole.png    MP binary shadows + massless Ellis wormhole
"""

import argparse
import os

import numpy as np


def checkerboard(h, w, tiles=12):
    yy, xx = np.mgrid[0:h, 0:w]
    cell = ((yy * tiles // h) + (xx * tiles // w)) % 2
    img = np.empty((h, w, 3), np.float32)
    img[..., 0] = np.where(cell, 0.92, 0.12)
    img[..., 1] = np.where(cell, 0.55, 0.35)
    img[..., 2] = np.where(cell, 0.15, 0.75)
    return img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--outdir", default="examples/out")
    args = parser.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt

    from light_path_tracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
    from light_path_tracer_tpu.pipeline import render_shadow, render_scene
    from light_path_tracer_tpu.disk import render_disk
    from light_path_tracer_tpu.models import make_metric
    from light_path_tracer_tpu.trajectory import plot_trajectories

    size = (args.size, args.size)

    def save(name, img, **kw):
        path = os.path.join(args.outdir, name)
        mpimg.imsave(path, np.clip(np.asarray(img), 0, 1), **kw)
        print("wrote", path)

    sch = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    img, st = render_shadow(sch, size)
    save("shadow_schwarzschild.png", img, cmap="gray")
    print(f"  schwarzschild: {st['traced_rays']/max(st['timings']['precompute'],1e-9):,.0f} rays/s")

    kerr = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    img, st = render_shadow(kerr, size)
    save("shadow_kerr.png", img, cmap="gray")
    print(f"  kerr a=0.9: {st['traced_rays']/max(st['timings']['precompute'],1e-9):,.0f} rays/s")

    src = checkerboard(args.size, args.size)
    out = render_scene(kerr, src)
    save("lensed_checker.png", out.image)

    disk_scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                             vertical_fov_deg=24.0,
                             theta_obs=np.radians(80.0))
    img, st = render_disk(disk_scene, size)
    save("accretion_disk.png", cm.afmhot(np.asarray(img))[..., :3])

    from light_path_tracer_tpu.disk import (
        render_scene_with_disk, DiskConfig)
    img, st = render_disk(disk_scene, size,
                          disk=DiskConfig(spectrum="blackbody",
                                          t_peak=15000.0))
    save("accretion_disk_blackbody.png",
         np.clip(np.asarray(img), 0, 1) ** (1 / 2.2))

    rng = np.random.default_rng(7)
    stars = np.full((args.size, args.size, 3), 0.05, np.float32)
    ys = rng.integers(0, args.size, args.size * args.size // 300)
    xs = rng.integers(0, args.size, len(ys))
    stars[ys, xs] = rng.uniform(0.4, 1.0, (len(ys), 3)).astype(np.float32)
    comp_scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                             vertical_fov_deg=24.0,
                             theta_obs=np.radians(80.0))
    cfg_la = RenderConfig(render_loop_around=True)
    from light_path_tracer_tpu.disk import composite_gamma_encode
    img, st = render_scene_with_disk(
        comp_scene, stars, cfg_la,
        DiskConfig(spectrum="blackbody", t_peak=15000.0))
    save("composite_disk_stars.png",
         composite_gamma_encode(img, st["disk_mask"]))

    # Charged families: shadow-vs-charge triptych + RN-disk comparison.
    fig, axes = plt.subplots(1, 3, figsize=(9.6, 3.5))
    for ax, q in zip(axes, (0.0, 0.6, 0.79)):
        img, _st = render_shadow(
            SceneConfig(M=1.0, a=0.6, Q=q, vertical_fov_deg=9.0), size)
        ax.imshow(np.asarray(img), cmap="gray", origin="upper")
        ax.set_title(f"a=0.6, Q={q}", fontsize=11)
        ax.axis("off")
    fig.suptitle("Kerr-Newman shadow: charge shrinks the capture "
                 "cross-section (9\N{DEGREE SIGN} FOV, r_obs=100M)",
                 fontsize=11)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "shadow_kerr_newman_q.png"),
                dpi=110)
    print("wrote", os.path.join(args.outdir, "shadow_kerr_newman_q.png"))

    fig, axes = plt.subplots(1, 2, figsize=(8.2, 3.8))
    for ax, q in zip(axes, (0.0, 0.9)):
        img, st = render_disk(
            SceneConfig(M=1.0, a=0.0, Q=q, theta_obs=np.radians(80.0)),
            size, disk=DiskConfig(r_out=18.0))
        ax.imshow(np.asarray(img), cmap="inferno", origin="upper")
        ax.set_title(f"a=0, Q={q}  (r_isco={st['r_isco']:.2f} M)",
                     fontsize=10)
        ax.axis("off")
    fig.suptitle("Charged disk: the Reissner-Nordstrom ISCO sits "
                 "closer in", fontsize=11)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "disk_charged_rn.png"),
                dpi=110)
    print("wrote", os.path.join(args.outdir, "disk_charged_rn.png"))

    # Signed magnification map (critical curves / image parity).
    from light_path_tracer_tpu.pipeline import render_magnification
    mag_scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                            vertical_fov_deg=40.0)
    from light_path_tracer_tpu.render import magnification_display
    mu, _ms = render_magnification(mag_scene, size)
    mpimg.imsave(os.path.join(args.outdir, "magnification_kerr_a09.png"),
                 magnification_display(mu))
    print("wrote", os.path.join(args.outdir, "magnification_kerr_a09.png"))

    # Volumetric hot flow: optically thin vs self-absorbed crescent.
    from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                  render_volumetric)
    vol_scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                            theta_obs=np.radians(80.0),
                            vertical_fov_deg=16.0)
    vsize = (min(args.size, 256),) * 2
    fig, axes = plt.subplots(1, 2, figsize=(8.2, 3.8))
    for ax, a0 in zip(axes, (0.0, 0.3)):
        vimg, vst = render_volumetric(vol_scene, vsize,
                                      riaf=RIAFConfig(alpha0=a0))
        ax.imshow(np.asarray(vimg), cmap="afmhot", origin="upper")
        label = ("optically thin" if a0 == 0.0
                 else f"alpha0={a0}, tau_max={vst['tau_max']:.1f}")
        ax.set_title(label, fontsize=10)
        ax.axis("off")
    fig.suptitle("RIAF torus at a=0.9: self-absorption dims the "
                 "screened far side", fontsize=11)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "volumetric_absorption.png"),
                dpi=110)
    print("wrote", os.path.join(args.outdir,
                                "volumetric_absorption.png"))

    # Spectral volumetric: the SSA turnover / nu-dependent photosphere
    # (all bands in one trace).
    from light_path_tracer_tpu.volumetric import (
        render_volumetric_spectrum)
    sp_riaf = RIAFConfig(g_power=4.0, alpha0=1.0, opacity_index=3.0)
    sp_freqs = (0.1, 1.0, 10.0)
    sp_imgs, sp_st = render_volumetric_spectrum(vol_scene, vsize,
                                                sp_freqs, riaf=sp_riaf)
    fig, axes = plt.subplots(1, 3, figsize=(9.6, 3.6))
    for ax, f, im, mr in zip(axes, sp_freqs, np.asarray(sp_imgs),
                             sp_st["mean_radius_rad"]):
        ax.imshow(im, cmap="afmhot", origin="upper")
        ax.set_title(f"f={f:g}  <r>={np.degrees(mr):.2f}"
                     "\N{DEGREE SIGN}", fontsize=10)
        ax.axis("off")
    fig.suptitle("One trace, three frequencies: the photosphere grows "
                 "and the shadow vanishes below the SSA turnover",
                 fontsize=11)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "volumetric_spectrum.png"),
                dpi=110)
    print("wrote", os.path.join(args.outdir, "volumetric_spectrum.png"))

    # Polarized volumetric: EHT-style EVPA ticks over the crescent.
    from light_path_tracer_tpu.polarization import (
        render_polarized_volumetric, save_polarization_figure)
    evpa, pol_frac, inten, _pst = render_polarized_volumetric(
        vol_scene, vsize, riaf=RIAFConfig())
    save_polarization_figure(
        os.path.join(args.outdir, "volumetric_polarized.png"),
        evpa, pol_frac, inten,
        title="Polarized hot flow (toroidal field, a=0.9): Stokes "
              "path integrals")
    print("wrote", os.path.join(args.outdir, "volumetric_polarized.png"))

    # Neutron-star surface: two antipodal hot caps + pulse profile.
    from light_path_tracer_tpu.star import (StarConfig, pulse_profile,
                                            render_star)
    ns_scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0,
                           theta_obs=np.radians(60.0),
                           vertical_fov_deg=10.0)
    ns = StarConfig(radius=5.0, omega=0.02,
                    spots=((30.0, 0.0, 25.0, 1.0),
                           (150.0, 180.0, 25.0, 1.0)),
                    t_surface=0.55, tone_map="sqrt")
    simg, sst = render_star(ns_scene, vsize, star=ns)
    save("neutron_star_caps.png", cm.afmhot(np.asarray(simg))[..., :3])
    phases, flux, pst = pulse_profile(ns_scene, star=ns, n_phases=48,
                                      resolution=(96, 96))
    fig, ax = plt.subplots(figsize=(6, 3.4))
    ax.plot(phases / (2 * np.pi), flux)
    ax.set_xlabel("rotation phase")
    ax.set_ylabel("flux / mean")
    ax.set_title(f"Two-cap pulse profile (R=5M, "
                 f"modulation {pst['modulation']:.1%})", fontsize=11)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "pulse_profile.png"), dpi=110)
    print("wrote", os.path.join(args.outdir, "pulse_profile.png"))

    m = make_metric(1.0, 0.0)
    fig, ax = plt.subplots(figsize=(11, 9))
    plot_trajectories(m, 50.0, [0, 2, 4, 5, 5.5, 5.97, 6.5, 8, 10, 15],
                      ax=ax)
    ax.set_xlim(-20, 60)
    ax.set_ylim(-30, 30)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "trajectories.png"), dpi=130)
    print("wrote", os.path.join(args.outdir, "trajectories.png"))

    # --- user-defined metric: rotating Hayward regular BH vs Kerr ---
    from light_path_tracer_tpu.models import CustomMetric, load_covariant_fn
    examples_dir = os.path.dirname(os.path.abspath(__file__))
    rot = load_covariant_fn(
        os.path.join(examples_dir, "user_metric.py") + ":rotating_hayward")
    hw = CustomMetric(M=1.0, a=0.9, covariant_fn=rot,
                      label="rotating-hayward")
    fig, axes = plt.subplots(1, 2, figsize=(9, 4.6))
    for ax, (label, sc) in zip(axes, [
            ("Kerr a=0.9", SceneConfig(M=1.0, a=0.9)),
            ("rotating Hayward a=0.9, l=0.9M",
             SceneConfig(M=1.0, a=0.9, custom_metric=hw))]):
        img, _st = render_shadow(sc, (size // 2, size // 2),
                                 RenderConfig(dtype="float64"))
        ax.imshow(np.asarray(img), cmap="gray")
        ax.set_title(label, fontsize=9)
        ax.axis("off")
    fig.suptitle("user-defined spacetime via --metric-py "
                 "(regular de Sitter core shrinks the shadow)",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "custom_metric_hayward.png"),
                dpi=110)
    print("wrote", os.path.join(args.outdir, "custom_metric_hayward.png"))

    # --- instance-form user metrics: binary MP + massless wormhole ---
    from light_path_tracer_tpu.models.custom import load_user_metric
    here = os.path.dirname(os.path.abspath(__file__))
    fig, axes = plt.subplots(1, 2, figsize=(9, 4.6))
    for ax, (label, attr, steps) in zip(axes, [
            ("Majumdar-Papapetrou binary (m=0.5+0.5, s=6M)",
             "mp_binary", 6000),
            ("massless Ellis wormhole (throat b=2)",
             "ellis_wormhole", 60000)]):
        metric = load_user_metric(
            os.path.join(here, "user_metric.py") + ":" + attr)
        sc = SceneConfig(M=1.0, a=0.0, r_obs_mult=60.0,
                         vertical_fov_deg=20.0, custom_metric=metric)
        img, _st = render_shadow(sc, (size // 2, size // 2),
                                 RenderConfig(max_steps=steps))
        ax.imshow(np.asarray(img), cmap="gray")
        ax.set_title(label, fontsize=9)
        ax.axis("off")
    fig.suptitle("CustomMetric instance form: two resolved shadows "
                 "with an escape corridor; a throat-capture shadow",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "binary_and_wormhole.png"),
                dpi=110)
    print("wrote", os.path.join(args.outdir, "binary_and_wormhole.png"))

    # --- source-plane products: caustics, microlens curve, time delays ---
    from light_path_tracer_tpu.pipeline import (render_caustics,
                                                render_microlens_curve,
                                                render_time_delay)
    weak = SceneConfig(M=1.0, a=0.0, r_obs_mult=1000.0,
                       vertical_fov_deg=40.0)
    cfg64 = RenderConfig(dtype="float64")
    amap, extent, _cs = render_caustics(weak, (size, size), cfg64,
                                        bins=size // 4)
    u_axis, curve, mls = render_microlens_curve(
        weak, (size, size), cfg64, impact_u=0.5, span_u=3.0,
        n_points=121)
    tau, _ts = render_time_delay(weak, (size // 2, size // 2), cfg64)
    fig, axes = plt.subplots(1, 3, figsize=(13, 4.2))
    b = np.degrees(extent[1])
    axes[0].imshow(np.log10(1.0 + np.asarray(amap)),
                   extent=(-b, b, b, -b), cmap="inferno")
    axes[0].set_title("source-plane caustic map log10(1+A)", fontsize=9)
    axes[0].set_xlabel("beta_x [deg]")
    xs = np.linspace(-3.0, 3.0, 121)
    axes[1].plot(xs, np.asarray(curve), lw=2)
    ref = (u_axis ** 2 + 2) / (u_axis * np.sqrt(u_axis ** 2 + 4))
    axes[1].plot(xs, ref, "--", lw=1, label="Paczynski point lens")
    axes[1].set_title("microlensing light curve (u0 = 0.5)", fontsize=9)
    axes[1].set_xlabel(r"track position [$\theta_E$]")
    axes[1].legend(fontsize=8)
    tau_np = np.asarray(tau)
    im = axes[2].imshow(np.log10(1.0 + np.nan_to_num(tau_np)),
                        cmap="viridis")
    axes[2].set_title("Fermat arrival-time map log10(1+tau/M)",
                      fontsize=9)
    axes[2].axis("off")
    fig.colorbar(im, ax=axes[2], shrink=0.8)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "source_plane_products.png"),
                dpi=110)
    print("wrote", os.path.join(args.outdir, "source_plane_products.png"))


if __name__ == "__main__":
    main()
