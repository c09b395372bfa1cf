"""Audit the aux/spectral Pallas kernels' n_steps contract against the
XLA path on IDENTICAL rays (one 4096-lane tile): if the counters agree,
the roofline's steps x lanes accounting is sound and the flop model is
the discrepancy; if not, the counter is the bug.

Round-5 recorded result (BASELINE.md "roofline"): counters EQUAL —
thin 100 == 100, spectral 98 == 98 — so the extras rows' anomalous
counted-flop rates are a property of the flop model, not the counter.
"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from light_path_tracer_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from light_path_tracer_tpu import camera
from light_path_tracer_tpu.models import Kerr
from light_path_tracer_tpu.ops.kerr_trace import (trace_rays_spectral,
                                                  trace_rays_volumetric)
from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
    trace_rays_spectral_pallas, trace_rays_volumetric_pallas)
from light_path_tracer_tpu.volumetric import (
    RIAFConfig, make_spectral_transfer, make_transfer_fns)

m = Kerr(M=1.0, a=0.9)
theta_obs = float(np.radians(80.0))
n = 4096                      # exactly one (32, 128) tile
dim = (64, 64)
fov = camera.fov_from_vertical(np.radians(16.0), dim)
al = camera.build_alpha_lookup(dim, fov, dtype=jnp.float32).ravel()
th = camera.build_theta_lookup(dim, fov, dtype=jnp.float32).ravel()
riaf = RIAFConfig()
em_fn, _ = make_transfer_fns(m, riaf)
spec_fn = make_spectral_transfer(m, RIAFConfig(
    g_power=4.0, alpha0=1.0, opacity_index=3.0), (0.1, 1.0, 10.0))
lam, SAT = 5000.0, 2048

out = {}
for name, pall, xla in (
    ("thin", lambda: trace_rays_volumetric_pallas(
        m, 100.0, al, th, theta_obs, em_fn, lam, 200000,
        tile_rows=32, sat_window=SAT),
     lambda: trace_rays_volumetric(
        m, 100.0, al, th, theta_obs, em_fn, lam, 200000,
        sat_window=SAT)),
    ("spectral", lambda: trace_rays_spectral_pallas(
        m, 100.0, al, th, theta_obs, spec_fn, 3, lam, 200000,
        tile_rows=32, sat_window=SAT),
     lambda: trace_rays_spectral(
        m, 100.0, al, th, theta_obs, spec_fn, 3, lam, 200000,
        sat_window=SAT)),
):
    r_p = pall(); s_p = int(r_p.n_steps)
    r_x = xla(); s_x = int(r_x.n_steps)
    # warm timing rep each, jittered
    def t_of(fn):
        t0 = time.perf_counter()
        r = fn()
        s = int(r.n_steps); np.asarray(r.final_alpha[0])
        return time.perf_counter() - t0, s
    al = al * np.float32(1.0 + 1e-5)
    tp, sp = t_of(pall)
    tx, sx2 = t_of(xla)
    out[name] = dict(pallas_steps=s_p, xla_steps=s_x,
                     pallas_rep=(round(tp, 4), sp),
                     xla_rep=(round(tx, 4), sx2))
print(json.dumps(out))
