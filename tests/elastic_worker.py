"""Subprocess worker for tests/test_elastic.py (elastic recovery).

Runs render_shadow_elastic as one participant of a multi-process farm;
--die-after N simulates a crash by hard-exiting (os._exit, no cleanup,
mid-render) after committing N bands to the shared store.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--band-rows", type=int, default=8)
    ap.add_argument("--die-after", type=int, default=None)
    ap.add_argument("--no-fill", action="store_true")
    args = ap.parse_args()

    from light_path_tracer_tpu.checkpoint import ChunkStore
    from light_path_tracer_tpu.parallel.elastic import (
        render_shadow_elastic)
    from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                    SceneConfig)

    if args.die_after is not None:
        real_put = ChunkStore.put
        box = {"n": 0}

        def dying_put(self, start, res):
            real_put(self, start, res)
            box["n"] += 1
            if box["n"] >= args.die_after:
                os._exit(17)   # crash: no cleanup, mid-render

        ChunkStore.put = dying_put

    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    cfg = RenderConfig(backend="xla", max_steps=20000)
    fa, stats = render_shadow_elastic(
        scene, (args.size, args.size), args.store, cfg,
        band_rows=args.band_rows, process_id=args.pid,
        num_processes=args.nproc, fill_missing=not args.no_fill)
    print(json.dumps({"bands_traced": stats["bands_traced"],
                      "bands_reused": stats["bands_reused"],
                      "missing": stats["missing_bands"],
                      "checksum": float(
                          __import__("numpy").nansum(fa))}))


if __name__ == "__main__":
    main()
