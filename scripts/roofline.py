#!/usr/bin/env python
"""Empirical roofline for the Kerr DP45 kernel on this chip.

Both sides are MEASURED on the same device, with the same timing
protocol, rather than quoted from datasheets:

  * VPU f32 peak, FOUR probes that together pin the machine model
    (round-5 findings, each measured because the previous one's story
    failed — see BASELINE.md "roofline, round 5"):
      (a) serial FMA chain over a (512,128) VMEM block — 1.78 TFLOP/s;
      (b) "fma8", 8 independent (512,128) accumulators — SLOWER
          (0.55x): 512 live vregs, the loop spills through VMEM;
      (c) "fma_reg", 8 independent (8,128) accumulators, fully
          register-resident — 1.02x the serial chain, proving ~1.8 TF
          is the genuine FMA-port ceiling (no hidden multi-ALU FMA
          headroom, and (a) was not VMEM-bound);
      (d) "vliw_mix", register-resident 2 FMA + 3 add + 3 mul chains —
          the TPU core is VLIW, and bodies MIXING op types co-issue
          across ports, exceeding the pure-FMA number. This is the
          honest ceiling for the mixed-arithmetic DP45 bodies, whose
          achieved counted-flop rates (spectral/order/Stokes extras)
          measurably exceed (a)-(c) — the steps counters were audited
          against the XLA path (equal), so the rates are real.
    Rates are taken as the MARGINAL cost between two chain lengths —
    this cancels the ~27 ms fixed host-readback latency of this TPU
    tunnel (every timing here forces a scalar readback, because bare
    block_until_ready can be served from tunnel-side memoization for
    repeated programs).
  * sin() throughput: same protocol with a sin chain (the theta-form RHS
    costs 2 transcendentals per evaluation).
  * Achieved: the Kerr tracer's FLOP/s from its own step counters times
    a hand-counted ~1.18 kflop/lane/step DP45 body (6 RHS evaluations at
    ~110 flops + 2 sin/cos each, tableau combinations, embedded error
    norm, Hermite event location, controller, masking), minus the same
    fixed readback latency.

Round 5 adds `--extras`: the same protocol for the volumetric/extras
VMEM tile kernels (6/7/9/10-component error-controlled states —
thin/absorbed transfer, 3-band spectra, photon-ring order buckets,
polarized Stokes). Their per-lane-step flop counts are MECHANICAL, not
hand-counted: XLA's own cost analysis of the mode's full RHS closure
(geodesic rhs5 + the emission/transfer derivatives, exactly the
function the kernel integrates) supplies the 6-stage term, and the
DP45 scaffolding (tableau combinations, embedded error norm, Hermite
event location, controller, masking) is the documented structural
formula 86*C + 55 flops per lane-step for a C-component state —
calibrated against the lens kernel's hand count (C=5: 6*rhs + 485 vs
the recorded 1,180 at rhs ~ 116; ROOFLINE_r02.jsonl). Achieved rate
uses the kernels' own tile-step counters x lanes-per-tile, minus the
measured fixed readback overhead — the identical protocol as the lens
row, so utilizations are directly comparable.

Prints one JSON line per quantity. Recorded in BASELINE.md "roofline"
and the per-round ROOFLINE_r{N}.jsonl artifact.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_path_tracer_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

ROWS, LANE, N_TILES = 512, 128, 16
N_ELEM = N_TILES * ROWS * LANE


def _chain_kernel(x_ref, o_ref, *, k, op):
    x = x_ref[:]
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    if op == "fma":
        body = lambda _, v: v * a + b
        o_ref[:] = jax.lax.fori_loop(0, k, body, x)
    elif op == "fma8":
        # 8 INDEPENDENT chains per element: exposes the instruction-
        # level parallelism the serial chain denies the VPU's multiple
        # ALUs/pipelines. k here counts per-chain iterations; total
        # flops per element per iteration = 8 FMAs. MEASURED SLOWER
        # than the serial chain (0.55x): 8 live (512,128) accumulators
        # = 512 vregs, far past the register file — every iteration
        # spills through VMEM.
        cs = tuple(jnp.float32(1e-7 * (j + 1)) for j in range(8))
        body = lambda _, vs: tuple(v * a + c for v, c in zip(vs, cs))
        vs0 = tuple(x + jnp.float32(0.01 * j) for j in range(8))
        vs = jax.lax.fori_loop(0, k, body, vs0)
        acc = vs[0]
        for v in vs[1:]:
            acc = acc + v
        o_ref[:] = acc
    elif op == "vliw_mix":
        # MIXED-PORT register-resident chain: 2 FMA + 3 add + 3 mul
        # independent (8,128) accumulators. The TPU core is VLIW — if
        # add/mul issue in slots the pure-FMA chain leaves empty, the
        # counted-flop rate exceeds the "FMA peak". This is the
        # measured ceiling the mixed-arithmetic DP45 bodies should be
        # compared against. Counted flops per iteration per element:
        # 2*2 (fma) + 3 (add) + 3 (mul) = 10.
        cs = tuple(jnp.float32(1e-7 * (j + 1)) for j in range(3))
        ds = tuple(jnp.float32(1.0000001 + 1e-8 * j) for j in range(3))

        def body(_, vs):
            f1, f2, a1, a2, a3, m1, m2, m3 = vs
            return (f1 * a + b, f2 * a + b,
                    a1 + cs[0], a2 + cs[1], a3 + cs[2],
                    m1 * ds[0], m2 * ds[1], m3 * ds[2])

        x8 = x_ref[0:8, :]
        vs0 = tuple(x8 + jnp.float32(0.01 * j) for j in range(8))
        vs = jax.lax.fori_loop(0, k, body, vs0)
        acc = vs[0]
        for v in vs[1:]:
            acc = acc + v
        o_ref[:] = jnp.zeros(o_ref.shape, acc.dtype)
        o_ref[0:8, :] = acc
    elif op == "fma_reg":
        # REGISTER-RESIDENT peak: 8 independent (8,128) accumulators =
        # 8 vregs, which fit the register file — the loop touches no
        # VMEM at all. This is the true multi-ALU compute ceiling; the
        # serial (512,128) chain above streams its 256 KB block through
        # VMEM every iteration (64 vregs live), so it measures the
        # VMEM-roundtrip bound instead. k counts per-chain iterations;
        # flops per iteration = 8 FMAs x 1024 elements per tile.
        x8 = x_ref[0:8, :]
        cs = tuple(jnp.float32(1e-7 * (j + 1)) for j in range(8))
        body = lambda _, vs: tuple(v * a + c for v, c in zip(vs, cs))
        vs0 = tuple(x8 + jnp.float32(0.01 * j) for j in range(8))
        vs = jax.lax.fori_loop(0, k, body, vs0)
        acc = vs[0]
        for v in vs[1:]:
            acc = acc + v
        o_ref[:] = jnp.zeros(o_ref.shape, acc.dtype)
        o_ref[0:8, :] = acc
    else:
        body = lambda _, v: jnp.sin(v)
        o_ref[:] = jax.lax.fori_loop(0, k, body, x)


@functools.partial(jax.jit, static_argnames=("k", "op"))
def _chain(x, k, op):
    blk = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_chain_kernel, k=k, op=op)
    return pl.pallas_call(
        kern, grid=(N_TILES,), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((N_TILES * ROWS, LANE),
                                       jnp.float32))(x)


def _timed(fn):
    """Best-of-4 wall time with forced scalar readback, fresh inputs."""
    fn(0)  # warm/compile
    best = np.inf
    for i in range(4):
        t0 = time.perf_counter()
        fn(i + 1)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_chain(op, k):
    x = jnp.ones((N_TILES * ROWS, LANE), jnp.float32) * 0.5

    def run(i):
        x_i = x + np.float32(1e-3 * i)
        return np.asarray(_chain(x_i, k, op)[0, 0])

    return _timed(run)


def _rhs_flops_per_lane(metric, extra, n_extras, n_lanes=256):
    """Per-STAGE amortized flops of the mode's full RHS closure, by XLA
    cost analysis of SIX evaluations at six different states with the
    stage-invariant inputs (p_t, p_phi, any aux constants captured in
    the closure) shared — exactly the structure of one unrolled DP45
    attempt, so subexpressions that depend only on the invariants are
    CSE/hoisted by the compiler ONCE per attempt, as the real kernel
    hoists them once per trace. A single-evaluation count charges those
    invariant terms 6x per step; round 5's first extras recording did,
    and the aux-heavy polarized row came out at an impossible 2.4x the
    measured VPU peak — the diagnostic that exposed this."""
    cpu = jax.devices("cpu")[0]
    ones = jnp.ones((n_lanes,), jnp.float32)
    p_t, p_phi = -ones, 0.31 * ones

    def f(y):
        base = metric.rhs5(y[:5], p_t, p_phi)
        if extra is None:
            return base
        return (*base, *extra(y, p_t, p_phi))

    def f6(ys6):
        outs = [f(y) for y in ys6]
        acc = outs[0]
        for o in outs[1:]:
            acc = tuple(a + b for a, b in zip(acc, o))
        return acc

    vals = [10.0, 1.2, 0.3, -0.1, 0.2] + [0.05] * n_extras
    ys6 = tuple(
        tuple(jnp.full((n_lanes,), v * (1.0 + 0.01 * s), jnp.float32)
              for v in vals)
        for s in range(6))
    with jax.default_device(cpu):
        cost = jax.jit(f6).lower(ys6).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    # The 5 adds per component that merge the six outputs are probe
    # scaffolding, not RHS work.
    n_comp = 5 + n_extras
    return (float(cost["flops"]) / n_lanes - 5.0 * n_comp) / 6.0


def _extras_rows(rate_fma, overhead, rate_ceiling):
    """Roofline rows for the volumetric/extras tile kernels."""
    from light_path_tracer_tpu import camera
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
        trace_rays_aux_pallas, trace_rays_spectral_pallas,
        trace_rays_volumetric_pallas)
    from light_path_tracer_tpu.volumetric import (
        RIAFConfig, make_order_transfer, make_spectral_transfer,
        make_transfer_fns)

    m = Kerr(M=1.0, a=0.9)
    dim = (512, 512)
    theta_obs = float(np.radians(80.0))
    fov = camera.fov_from_vertical(np.radians(16.0), dim)
    al = camera.build_alpha_lookup(dim, fov, dtype=jnp.float32).ravel()
    th = camera.build_theta_lookup(dim, fov, dtype=jnp.float32).ravel()
    rows = 32
    lanes = rows * 128
    lam = 5000.0
    SAT = 2048                       # production saturation window

    riaf = RIAFConfig()
    riaf_abs = RIAFConfig(alpha0=0.3)
    em_fn, _ = make_transfer_fns(m, riaf)
    em_a, ab_a = make_transfer_fns(m, riaf_abs)
    spec_fn = make_spectral_transfer(m, RIAFConfig(
        g_power=4.0, alpha0=1.0, opacity_index=3.0), (0.1, 1.0, 10.0))
    order_fn = make_order_transfer(m, riaf, 3)

    # Polarized Stokes: camera-side Walker-Penrose constants as aux.
    from light_path_tracer_tpu.polarization import (
        k_contravariant, make_polarized_volumetric_transfer,
        observer_basis, walker_penrose)
    pol_fn = make_polarized_volumetric_transfer(m, riaf, "toroidal",
                                                0.7)
    y0, _pt, pph = m.initial_conditions_5d(100.0, al, th, theta_obs)[:3]
    k_cam = k_contravariant(jnp.float32(1.0), jnp.float32(0.9), y0[0],
                            y0[1], y0[3], y0[4], pph)
    e1, e2 = observer_basis(jnp.float32(1.0), jnp.float32(0.9), 100.0,
                            theta_obs, k_cam)
    k11, k21 = walker_penrose(jnp.float32(0.9), y0[0], y0[1], k_cam, e1)
    k12, k22 = walker_penrose(jnp.float32(0.9), y0[0], y0[1], k_cam, e2)
    aux = (k11, k21, k12, k22)
    aux_host = tuple(np.asarray(a)[:256] for a in aux)

    def extra_thin(y, pt, pp):
        return (em_fn(y[:5], pt, pp),)

    def extra_abs(y, pt, pp):
        return (jnp.exp(-jnp.maximum(y[6], -30.0))
                * em_a(y[:5], pt, pp), ab_a(y[:5], pt, pp))

    def extra_pol(y, pt, pp):
        a = tuple(jnp.asarray(v) for v in aux_host)
        return pol_fn(y, pt, pp, a)

    modes = {
        "volumetric_thin": dict(
            n_extras=1, extra=extra_thin,
            run=lambda a: trace_rays_volumetric_pallas(
                m, 100.0, a, th, theta_obs, em_fn, lam, 200000,
                tile_rows=rows, sat_window=SAT)),
        "volumetric_absorbed": dict(
            n_extras=2, extra=extra_abs,
            run=lambda a: trace_rays_volumetric_pallas(
                m, 100.0, a, th, theta_obs, em_a, lam, 200000,
                absorption_fn=ab_a, tile_rows=rows, sat_window=SAT)),
        "spectral_3band": dict(
            n_extras=4, extra=spec_fn,
            run=lambda a: trace_rays_spectral_pallas(
                m, 100.0, a, th, theta_obs, spec_fn, 3, lam, 200000,
                tile_rows=rows, sat_window=SAT)),
        "order_decomposed_x3": dict(
            n_extras=4, extra=order_fn,
            run=lambda a: trace_rays_spectral_pallas(
                m, 100.0, a, th, theta_obs, order_fn, 3, lam, 200000,
                tile_rows=rows, sat_window=SAT,
                sat_monitor=(1, 2, 3))),
        "polarized_stokes": dict(
            n_extras=3, extra=extra_pol,
            run=lambda a: trace_rays_aux_pallas(
                m, 100.0, a, th, theta_obs, pol_fn, 3, aux, lam,
                200000, tile_rows=rows, sat_window=SAT,
                sat_monitor=(0, 1, 2))),
    }

    for name, mode in modes.items():
        n_comp = 5 + mode["n_extras"]
        rhs = _rhs_flops_per_lane(m, mode["extra"], mode["n_extras"])
        flops_step = 6.0 * rhs + 86.0 * n_comp + 55.0

        def run(i, _run=mode["run"]):
            a_i = al * np.float32(1.0 + 1e-5 * i)
            out = _run(a_i)
            steps = int(out.n_steps)                 # forces readback
            np.asarray(out.final_alpha[0])
            return steps

        # Pair each rep's time with ITS OWN step count: pointing
        # jitter moves which lanes grind between reps, so best-time
        # with another rep's steps fabricates impossible rates (first
        # recording of this section measured 7x "utilization").
        run(0)   # warm/compile
        best = None
        for i in range(4):
            t0 = time.perf_counter()
            steps = run(i + 1)
            dt = time.perf_counter() - t0
            if best is None or dt / max(steps, 1) < best[0]:
                best = (dt / max(steps, 1), dt, steps)
        _per, dt, steps = best
        t = dt - overhead
        achieved = steps * lanes * flops_step / t
        print(json.dumps({
            "metric": f"{name}_achieved_f32",
            "value": round(achieved / 1e12, 3), "unit": "TFLOP/s",
            "components": n_comp,
            "rhs_flops_per_lane_xla_cost_analysis": round(rhs, 1),
            "flops_per_lane_step": round(flops_step, 1),
            "tile_steps": steps,
            "compute_seconds": round(t, 4),
            "utilization_vs_fma_chain_peak":
                round(achieved / rate_fma, 3),
            "utilization_vs_mixed_port_ceiling":
                round(achieved / rate_ceiling, 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extras", action="store_true",
                    help="also roofline the volumetric/extras kernels")
    ap.add_argument("--skip-lens", action="store_true",
                    help="skip the 1024^2 lens-kernel achieved row")
    args = ap.parse_args()
    k1, k2 = 16384, 65536
    t1f, t2f = measure_chain("fma", k1), measure_chain("fma", k2)
    rate_fma = N_ELEM * (k2 - k1) * 2 / (t2f - t1f)     # 2 flops per FMA
    overhead = t1f - N_ELEM * k1 * 2 / rate_fma
    print(json.dumps({"metric": "vpu_f32_fma_peak_marginal",
                      "value": round(rate_fma / 1e12, 3),
                      "unit": "TFLOP/s",
                      "fixed_readback_overhead_ms":
                          round(overhead * 1e3, 1)}))

    # ILP peak: 8 independent chains per element. The serial chain
    # above is the single-dependency-issue bound (what a latency-bound
    # body achieves); wide integrator states carry many independent
    # component updates per step, so the multi-ALU/pipelined bound is
    # the honest denominator for the extras kernels.
    t1i, t2i = (measure_chain("fma8", k1 // 8),
                measure_chain("fma8", k2 // 8))
    rate_ilp = N_ELEM * (k2 - k1) * 2 / (t2i - t1i)
    print(json.dumps({"metric": "vpu_f32_fma_peak_ilp8",
                      "value": round(rate_ilp / 1e12, 3),
                      "unit": "TFLOP/s",
                      "ilp_speedup_vs_serial_chain":
                          round(rate_ilp / rate_fma, 2)}))

    # Register-resident ceiling: 8 (8,128) accumulators live entirely
    # in vregs, zero VMEM traffic in the loop. Work per (8x scaled) k
    # matches the serial chain's marginal flops — see _chain_kernel.
    t1r, t2r = (measure_chain("fma_reg", 8 * k1),
                measure_chain("fma_reg", 8 * k2))
    rate_reg = N_ELEM * (k2 - k1) * 2 / (t2r - t1r)
    print(json.dumps({"metric": "vpu_f32_fma_peak_register_resident",
                      "value": round(rate_reg / 1e12, 3),
                      "unit": "TFLOP/s",
                      "speedup_vs_serial_chain":
                          round(rate_reg / rate_fma, 2)}))

    # Mixed-port VLIW ceiling: 2 FMA + 3 add + 3 mul chains in
    # registers, 10 counted flops per (8,128)-element per iteration
    # (see _chain_kernel). Marginal counted flops between the two k's:
    # N_TILES tiles x 1024 elements x 10 flops x 8*(k2-k1) iterations.
    t1m, t2m = (measure_chain("vliw_mix", 8 * k1),
                measure_chain("vliw_mix", 8 * k2))
    rate_mix = N_TILES * 1024 * 10 * 8 * (k2 - k1) / (t2m - t1m)
    print(json.dumps({"metric": "vpu_f32_mixed_port_peak_vliw",
                      "value": round(rate_mix / 1e12, 3),
                      "unit": "TFLOP/s",
                      "speedup_vs_fma_chain":
                          round(rate_mix / rate_fma, 2)}))
    rate_best = max(rate_fma, rate_reg, rate_mix)

    t1s, t2s = measure_chain("sin", k1 // 4), measure_chain("sin", k2 // 4)
    rate_sin = N_ELEM * (k2 - k1) / 4 / (t2s - t1s)
    print(json.dumps({"metric": "vpu_f32_sin_throughput_marginal",
                      "value": round(rate_sin / 1e9, 1), "unit": "Gsin/s",
                      "sin_cost_fma_equiv":
                          round(rate_fma / 2 / rate_sin, 1)}))

    if args.extras:
        _extras_rows(rate_fma, overhead, rate_best)
    if args.skip_lens:
        return

    # Achieved by the Kerr tracer (theta form, fast tier, rows=32).
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
        trace_rays_kerr_pallas)
    from light_path_tracer_tpu import camera

    m = Kerr(M=1.0, a=0.9)
    dim = (1024, 1024)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    al = camera.build_alpha_lookup(dim, fov, dtype=jnp.float32).ravel()
    th = camera.build_theta_lookup(dim, fov, dtype=jnp.float32).ravel()
    rf = jnp.zeros(al.shape, bool)
    rows = 32
    steps_box = {}

    def run(i):
        a_i = al * np.float32(1.0 + 1e-5 * i)
        out = trace_rays_kerr_pallas(m, 100.0, a_i, th, np.pi / 2, rf,
                                     5000.0, 200000, tile_rows=rows,
                                     formulation="theta")
        steps_box["steps"] = int(out.n_steps)       # forces readback
        return np.asarray(out.final_alpha[0])

    t_kerr = _timed(run) - overhead
    flops_per_lane_step = 1180          # hand count, module docstring
    lanes = rows * 128
    achieved = steps_box["steps"] * lanes * flops_per_lane_step / t_kerr
    print(json.dumps({
        "metric": "kerr_dp45_achieved_f32",
        "value": round(achieved / 1e12, 3), "unit": "TFLOP/s",
        "tile_steps": steps_box["steps"],
        "compute_seconds": round(t_kerr, 4),
        "flops_per_lane_step_assumed": flops_per_lane_step,
        "utilization_vs_fma_chain_peak":
            round(achieved / rate_fma, 3),
        "utilization_vs_mixed_port_ceiling":
            round(achieved / rate_best, 3)}))


if __name__ == "__main__":
    main()
