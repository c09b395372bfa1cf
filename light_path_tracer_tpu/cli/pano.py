"""`pano` subcommand: 360-degree equirectangular panorama."""

from __future__ import annotations

import numpy as np

from light_path_tracer_tpu.cli._shared import (
    _add_multihost_args, _add_render_args, _add_scene_args, _is_proc0, _multihost_mesh, _render_cfg_from, _scene_from)


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


def register(sub):
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
