#!/usr/bin/env python
"""One-stop showcase: renders every product of the framework.

  python examples/showcase.py [--size 512] [--outdir out]

Produces:
  shadow_schwarzschild.png   integrated Schwarzschild shadow
  shadow_kerr.png            integrated Kerr a=0.9 shadow (frame dragging)
  lensed_checker.png         gravitationally lensed checkerboard
  accretion_disk.png         thin disk w/ redshift + Doppler beaming
  trajectories.png           geodesic overlay around the photon sphere
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

    m = make_metric(1.0, 0.0)
    fig, ax = plt.subplots(figsize=(11, 9))
    plot_trajectories(m, 50.0, [0, 2, 4, 5, 5.5, 5.97, 6.5, 8, 10, 15],
                      ax=ax)
    ax.set_xlim(-20, 60)
    ax.set_ylim(-30, 30)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "trajectories.png"), dpi=130)
    print("wrote", os.path.join(args.outdir, "trajectories.png"))


if __name__ == "__main__":
    main()
