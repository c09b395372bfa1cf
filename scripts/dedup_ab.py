"""A/B: the reference's unique-alpha dedup trick vs the dense TPU trace.

The reference's legacy harness rounds the per-pixel viewing angle to
`decimals` (image_lens.py:133-152 `decimals` arg) and traces only one ray
per np.unique bin (debugging_image_lense.py:634-640) — on a CPU where
each ray costs ~6 ms, collapsing ~10^6 pixels to ~10^4 bins is a real
100x. SURVEY.md P3 and the round-2 VERDICT ask for the direct
measurement on TPU: is gather/scatter around a deduplicated working set
faster than the dense per-pixel trace the TPU path uses?

Protocol (axon hygiene: perturbed psi per repeat so no dispatch is
repeat-identical; best-of over warm repeats):

  dense:  alpha grid -> trace_batch(all H*W rays)          [one dispatch]
  dedup:  alpha grid -> round(decimals) -> host np.unique
          -> trace_batch(unique bins) -> gather inverse    [device->host
          readback of the 1 MB alpha grid + host unique included, as the
          reference implementation requires]

Emits one JSON line per arm plus the accuracy cost of the binning
(final-alpha RMSE of the deduped result vs the dense unrounded trace).
Usage: python scripts/dedup_ab.py [--size 512] [--repeats 4]
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from light_path_tracer_tpu.models import Schwarzschild
from light_path_tracer_tpu import camera
from light_path_tracer_tpu.ops.batch import trace_batch


def _fetch(res):
    """Force values to host (the tunnel's block_until_ready is unreliable
    — see BASELINE.md measurement hygiene)."""
    return (np.asarray(res.final_alpha), np.asarray(res.n_half_orbits))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--decimals", type=int, nargs="*", default=[3, 4, 5])
    ap.add_argument("--r-obs", type=float, default=100.0)
    args = ap.parse_args()

    metric = Schwarzschild(M=1.0)
    dim = (args.size, args.size)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    n_px = args.size * args.size

    def alpha_grid(rep):
        # Perturbed pointing per repeat: never a repeat-identical dispatch.
        psi = (0.0, 1e-5 * (rep + 1))
        return camera.build_alpha_lookup(dim, fov, psi=psi,
                                         dtype=jnp.float32)

    # Warm both compiled programs (dense shape + a representative unique
    # shape; unique counts vary by a few bins per repeat, so the dedup
    # arm pads to a fixed power-of-two bucket to keep ONE compiled
    # program — the practical implementation).
    def dedup_trace(alpha_dev, decimals):
        a_host = np.asarray(alpha_dev)              # device -> host
        a_round = np.round(a_host, decimals)
        uniq, inverse = np.unique(a_round, return_inverse=True)
        n_u = uniq.size
        bucket = 1 << max(int(np.ceil(np.log2(max(n_u, 1)))), 6)
        bucket = min(bucket, n_px)
        pad = np.full(bucket - n_u, uniq[-1] if n_u else 0.1, np.float32)
        uniq_p = jnp.asarray(np.concatenate([uniq.astype(np.float32),
                                             pad]))
        res = trace_batch(metric, args.r_obs, uniq_p)
        fa, nh = _fetch(res)
        return fa[:n_u][inverse], nh[:n_u][inverse], n_u

    results = {}
    # -- dense arm --
    a0 = alpha_grid(0)
    fa_dense0 = None
    best_dense = None
    for rep in range(args.repeats + 1):          # rep 0 = warmup/compile
        a = alpha_grid(rep)
        t0 = time.perf_counter()
        res = trace_batch(metric, args.r_obs, a.ravel())
        fa, _nh = _fetch(res)
        dt = time.perf_counter() - t0
        if rep == 0:
            fa_dense0 = fa
        else:
            best_dense = dt if best_dense is None else min(best_dense, dt)
    results["dense"] = dict(seconds=best_dense,
                            rays=n_px,
                            rays_per_sec=n_px / best_dense)
    print(json.dumps({"metric": "dedup_ab_dense_512sq_schwarzschild",
                      "value": round(best_dense, 5), "unit": "s",
                      "rays_per_sec": round(n_px / best_dense, 1)}),
          flush=True)

    # -- dedup arms --
    for d in args.decimals:
        best = None
        n_u_last = 0
        fa_d = None
        for rep in range(args.repeats + 1):
            a = alpha_grid(rep)
            t0 = time.perf_counter()
            fa_full, _nh_full, n_u = dedup_trace(a.ravel(), d)
            dt = time.perf_counter() - t0
            n_u_last = n_u
            if rep == 0:
                fa_d = fa_full
            else:
                best = dt if best is None else min(best, dt)
        # Quantization cost vs the dense unrounded trace (same rep-0
        # pointing), escaped pixels only.
        esc = np.isfinite(fa_dense0) & np.isfinite(fa_d)
        rmse = float(np.sqrt(np.mean((fa_d[esc] - fa_dense0[esc]) ** 2)))
        print(json.dumps({
            "metric": f"dedup_ab_decimals{d}_512sq_schwarzschild",
            "value": round(best, 5), "unit": "s",
            "unique_bins": int(n_u_last),
            "speedup_vs_dense": round(best_dense / best, 2),
            "final_alpha_rmse_vs_dense": rmse}), flush=True)


if __name__ == "__main__":
    main()
