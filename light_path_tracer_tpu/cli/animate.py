"""`animate` subcommand: camera-pan / parameter-sweep / flyby GIFs."""

from __future__ import annotations

import time

import numpy as np

from light_path_tracer_tpu.cli._shared import (
    _add_render_args, _add_scene_args, _reject_metric_py, _render_cfg_from, _scene_from)


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


def register(sub):
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
