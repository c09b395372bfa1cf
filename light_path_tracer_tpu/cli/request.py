"""`request` subcommand: offline replay of serve-style JSON
requests."""

from __future__ import annotations

import numpy as np


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


def register(sub):
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
