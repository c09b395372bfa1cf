"""Measured breakdown of the 256^2 fused source-plane modes on the
tunnel (VERDICT r4 item 4 'done' evidence): per-rep stage timings of
render_time_delay / render_microlens_curve across 10 jittered
pointings, against the measured floor of dispatching ANY compiled
program + one host fetch. If precompute-stage spread ~ dispatch-floor
spread, the residual is irreducible tunnel I/O, not compute.

Round-5 recorded result (BASELINE.md "source-plane breakdown"):
trivial dispatch+fetch floor 25.6/28.2/454.8 ms (min/med/max);
time-delay fused 77-step trace 50.7/72.0/98.6 ms, epilogue ~23 ms;
microlens 51.4/79.6/93.1 ms, epilogue ~25 ms. True compute is ~4 ms —
the modes sit at the minimum number of round trips and the residual
is the link."""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from light_path_tracer_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from light_path_tracer_tpu.pipeline import (render_time_delay,
                                            render_microlens_curve)
from light_path_tracer_tpu.utils.config import RenderConfig, SceneConfig

size = (256, 256)
cfg = RenderConfig(backend="auto")
weak_kw = dict(M=1.0, a=0.9, r_obs_mult=1000.0,
               vertical_fov_deg=40.0, theta_obs=np.pi / 2)

# --- dispatch floor: trivial compiled program + 1-element fetch,
# value-perturbed per rep (memoization guard) ---
trivial = jax.jit(lambda x: x * 2.0 + 1.0)
x0 = jnp.ones((256, 256), jnp.float32)
np.asarray(trivial(x0)[0, 0])                      # warm
floor = []
for i in range(10):
    t0 = time.perf_counter()
    np.asarray(trivial(x0 + np.float32(1e-3 * (i + 1)))[0, 0])
    floor.append(time.perf_counter() - t0)

def stats(xs):
    xs = sorted(x * 1e3 for x in xs)
    return dict(min=round(xs[0], 1), med=round(xs[len(xs) // 2], 1),
                max=round(xs[-1], 1))

out = {"trivial_dispatch_plus_fetch_ms": stats(floor)}

for name, run in (
    ("time_delay", lambda s: render_time_delay(s, size, cfg)),
    ("microlens_x41", lambda s: render_microlens_curve(
        s, size, cfg, n_points=41)),
):
    run(SceneConfig(psi_y=0.0, **weak_kw))          # warm/compile
    pre, ren, tot, steps = [], [], [], []
    for i in range(10):
        s = SceneConfig(psi_y=1e-5 * (i + 1), **weak_kw)
        t0 = time.perf_counter()
        r = run(s)
        st = r[-1] if isinstance(r, tuple) else r[1]
        if isinstance(r, tuple) and isinstance(r[-1], dict):
            st = r[-1]
        tot.append(time.perf_counter() - t0)
        tm = st["timings"]
        pre.append(tm["precompute"])
        ren.append(tm.get("render", 0.0))
        steps.append(st.get("integrator_steps", -1))
    out[name] = dict(precompute_ms=stats(pre), render_ms=stats(ren),
                     wall_ms=stats(tot), steps=steps[-1])

print(json.dumps(out))
