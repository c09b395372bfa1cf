"""Measured first-save delta for the save-path prewarm (BASELINE.md
round 5, verdict item 8): at a NEVER-COMPILED output shape, time
(a) the blocking prewarm cost — what the daemon thread absorbs
concurrently with the trace, (b) save_png right after — what the user
actually waits for, (c) a control save at another fresh shape with no
prewarm (cheap once the per-process path init is paid).

Shapes are randomized odd sizes so reruns measure a cold shape, not
the persistent cache. Recorded round-5 result: prewarm absorbed
234.7 s; save after prewarm 1.2 s; later-fresh-shape control 1.7 s.
The first save in a process costs 57-235 s across sessions (per-
process tunnel path init + first-shape compile); prewarm_save must
FETCH, not merely block_until_ready — a bare block returns before the
tunnel-server-side compile has run (the block-without-fetch trap).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from light_path_tracer_tpu.utils.save import prewarm_save, save_png  # noqa: E402

rng = np.random.default_rng()
odd = lambda: int(rng.integers(150, 400)) * 2 + 1
shape_a = (odd(), odd(), 3)
shape_b = (odd(), odd(), 3)

t0 = time.perf_counter()
prewarm_save(shape_a, block=True)
t_warm = time.perf_counter() - t0

img_a = jnp.asarray(rng.random(shape_a), jnp.float32)
t0 = time.perf_counter()
save_png("/tmp/prewarm_probe_a.png", img_a)
t_after = time.perf_counter() - t0

img_b = jnp.asarray(rng.random(shape_b), jnp.float32)
t0 = time.perf_counter()
save_png("/tmp/prewarm_probe_b.png", img_b)
t_cold = time.perf_counter() - t0

print(json.dumps({
    "shapes": [shape_a, shape_b],
    "prewarm_absorbed_s": round(t_warm, 2),
    "save_after_prewarm_s": round(t_after, 2),
    "save_fresh_shape_no_prewarm_s": round(t_cold, 2),
}))
