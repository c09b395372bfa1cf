#!/usr/bin/env python
"""Real-Mosaic lowering smoke tests (round-4 verdict item 4).

All Pallas CI coverage runs interpret-mode on CPU (tests/test_pallas.py);
the actual Mosaic lowering of each kernel was previously exercised only
by the headline bench, so a Mosaic regression in a non-headline kernel
(disk, RN/KN, volumetric, fused pipeline) would surface as a wrong or
crashed bench with no bisecting test. This script runs every Pallas
kernel NON-interpreted on tiny (~32^2) grids on the real chip, compares
against the XLA path at tier tolerance, and emits pass/fail JSON — run
alongside bench.py each round; the artifact lands next to BENCH_rN.json
as SMOKE_rN.json.

  python scripts/chip_smoke.py [--json SMOKE_r04.json] [--size 32]

Exit code: 0 iff every kernel lowers AND agrees.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

R_OBS = 100.0


def _angles(n, seed, ac):
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp
    alphas = jnp.asarray(rng.uniform(0.3 * ac, 4 * ac, n), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    return alphas, thetas


def _agree_angles(rp, rx, alphas, ac, p99_tol=2e-3):
    """Status agreement + stable-population final-alpha p99, the
    test_pallas.py criterion (grazers amplify roundoff)."""
    sp, sx = np.asarray(rp.status), np.asarray(rx.status)
    status_frac = float((sp == sx).mean())
    both = (sp == 1) & (sx == 1)
    alb = np.asarray(alphas)
    stable = both & (np.abs(alb - ac) > 0.05 * ac)
    if stable.sum() == 0:
        return status_frac > 0.99, dict(status_frac=status_frac,
                                        stable_n=0)
    d = np.abs(np.asarray(rp.final_alpha)[stable]
               - np.asarray(rx.final_alpha)[stable])
    p99 = float(np.percentile(d, 99))
    return (status_frac > 0.99 and p99 < p99_tol), dict(
        status_frac=round(status_frac, 4), p99=p99,
        stable_n=int(stable.sum()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--size", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from light_path_tracer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    n = args.size * args.size

    from light_path_tracer_tpu.models import (Kerr, KerrNewman,
                                              ReissnerNordstrom,
                                              Schwarzschild)

    results = []

    def run(name, fn):
        try:
            ok, detail = fn()
        except Exception as e:  # a Mosaic lowering failure IS the signal
            ok, detail = False, dict(error=f"{type(e).__name__}: {e}",
                                     trace=traceback.format_exc()[-800:])
        results.append(dict(kernel=name, ok=bool(ok), **detail))
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")

    # --- Kerr lens/shadow kernel (the headline one) -----------------
    def kerr_case():
        from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr
        from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
            trace_rays_kerr_pallas)
        m = Kerr(M=1.0, a=0.9)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 0, ac)
        refine = jnp.zeros(n, bool)
        rp = trace_rays_kerr_pallas(m, R_OBS, alphas, thetas,
                                    np.pi / 2, refine, 5000.0, 20000)
        rx = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                             refine, 5000.0, 20000)
        return _agree_angles(rp, rx, alphas, ac)

    # --- Schwarzschild orbit kernel ---------------------------------
    def schw_case():
        from light_path_tracer_tpu.ops.schwarzschild_trace import (
            trace_rays_schwarzschild)
        from light_path_tracer_tpu.ops.pallas.schwarzschild_kernel \
            import trace_rays_schwarzschild_pallas
        m = Schwarzschild(M=1.0)
        ac = m.alpha_crit(R_OBS)
        alphas, _ = _angles(n, 1, ac)
        rp = trace_rays_schwarzschild_pallas(m, R_OBS, alphas)
        rx = trace_rays_schwarzschild(m, R_OBS, alphas)
        return _agree_angles(rp, rx, alphas, ac)

    # --- charged metrics ---------------------------------------------
    def rn_case():
        # RN is spherically symmetric: it rides the Schwarzschild
        # orbit-equation kernel (u'' gains the -2 Q^2 u^3 term via the
        # metric hook), not the Kerr tile kernel.
        from light_path_tracer_tpu.ops.schwarzschild_trace import (
            trace_rays_schwarzschild)
        from light_path_tracer_tpu.ops.pallas.schwarzschild_kernel \
            import trace_rays_schwarzschild_pallas
        m = ReissnerNordstrom(M=1.0, Q=0.8)
        ac = m.alpha_crit(R_OBS)
        alphas, _ = _angles(n, 2, ac)
        rp = trace_rays_schwarzschild_pallas(m, R_OBS, alphas)
        rx = trace_rays_schwarzschild(m, R_OBS, alphas)
        return _agree_angles(rp, rx, alphas, ac)

    def kn_case():
        from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr
        from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
            trace_rays_kerr_pallas)
        m = KerrNewman(M=1.0, a=0.6, Q=0.6)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 3, ac)
        refine = jnp.zeros(n, bool)
        rp = trace_rays_kerr_pallas(m, R_OBS, alphas, thetas,
                                    np.pi / 2, refine, 5000.0, 20000)
        rx = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                             refine, 5000.0, 20000)
        return _agree_angles(rp, rx, alphas, ac)

    def jp_case():
        # Johannsen-Psaltis on the tile kernel (round-4 hand RHS).
        from light_path_tracer_tpu.models import JohannsenPsaltis
        from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr
        from light_path_tracer_tpu.ops.pallas.kerr_trace_kernel import (
            trace_rays_kerr_pallas)
        m = JohannsenPsaltis(M=1.0, a=0.9, eps3=2.0)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 7, ac)
        refine = jnp.zeros(n, bool)
        rp = trace_rays_kerr_pallas(m, R_OBS, alphas, thetas,
                                    np.pi / 2, refine, 5000.0, 20000)
        rx = trace_rays_kerr(m, R_OBS, alphas, thetas, np.pi / 2,
                             refine, 5000.0, 20000)
        return _agree_angles(rp, rx, alphas, ac)

    # --- disk-recorder kernel ---------------------------------------
    def disk_case():
        from light_path_tracer_tpu.disk import DiskConfig, trace_disk_rays
        m = Kerr(M=1.0, a=0.9)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 4, ac)
        disk = DiskConfig(r_out=20.0)
        rp = trace_disk_rays(m, R_OBS, alphas, thetas,
                             np.radians(80.0), 5000.0, 20000, disk,
                             backend="pallas", two_pass=False)
        rx = trace_disk_rays(m, R_OBS, alphas, thetas,
                             np.radians(80.0), 5000.0, 20000, disk,
                             backend="xla")
        np_, nx = np.asarray(rp.n_hits), np.asarray(rx.n_hits)
        hit_frac = float((np_ == nx).mean())
        both = (np_ > 0) & (nx > 0)
        dr = (np.abs(np.asarray(rp.r_hits[0])[both]
                     - np.asarray(rx.r_hits[0])[both])
              if both.any() else np.zeros(1))
        # Median, not p99: multi-winding crossings amplify backend
        # roundoff chaotically (same gate as test_disk.py:102).
        med = float(np.median(dr))
        return (hit_frac > 0.99 and med < 1e-3), dict(
            hit_frac=round(hit_frac, 4), r_hit_median=med,
            hits=int(both.sum()))

    # --- volumetric kernel (NEW this round) -------------------------
    def vol_case(absorbed):
        from light_path_tracer_tpu.ops.kerr_trace import (
            trace_rays_volumetric)
        from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
            trace_rays_volumetric_pallas)
        from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                      make_transfer_fns)
        m = Kerr(M=1.0, a=0.9)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 5, ac)
        riaf = RIAFConfig(alpha0=0.5) if absorbed else RIAFConfig()
        em_fn, ab_fn = make_transfer_fns(m, riaf)
        rp = trace_rays_volumetric_pallas(
            m, R_OBS, alphas, thetas, np.radians(80.0), em_fn, 5000.0,
            20000, absorption_fn=ab_fn)
        rx = trace_rays_volumetric(
            m, R_OBS, alphas, thetas, np.radians(80.0), em_fn, 5000.0,
            20000, absorption_fn=ab_fn)
        sp, sx = np.asarray(rp.status), np.asarray(rx.status)
        status_frac = float((sp == sx).mean())
        ep, ex = np.asarray(rp.emission), np.asarray(rx.emission)
        ok = sp == sx
        scale = max(float(np.abs(ex).max()), 1e-12)
        p99 = float(np.percentile(np.abs(ep[ok] - ex[ok]) / scale, 99))
        return (status_frac > 0.99 and p99 < 1e-3), dict(
            status_frac=round(status_frac, 4), em_rel_p99=p99,
            em_total=float(ex.sum()))

    # --- generic coupled-extras kernel (spectral + polarized aux) ---
    def spectral_case():
        from light_path_tracer_tpu.ops.kerr_trace import (
            trace_rays_spectral)
        from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
            trace_rays_spectral_pallas)
        from light_path_tracer_tpu.volumetric import (
            RIAFConfig, make_spectral_transfer)
        m = Kerr(M=1.0, a=0.9)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 8, ac)
        riaf = RIAFConfig(g_power=4.0, alpha0=1.0, opacity_index=2.0)
        freqs = (0.5, 2.0)
        tf = make_spectral_transfer(m, riaf, freqs)
        rp = trace_rays_spectral_pallas(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf,
            len(freqs), 5000.0, 20000)
        rx = trace_rays_spectral(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf,
            len(freqs), 5000.0, 20000)
        sp, sx = np.asarray(rp.status), np.asarray(rx.status)
        status_frac = float((sp == sx).mean())
        ok = sp == sx
        worst = 0.0
        for bp, bx in zip(rp.emission, rx.emission):
            bp, bx = np.asarray(bp), np.asarray(bx)
            scale = max(float(np.abs(bx).max()), 1e-12)
            worst = max(worst, float(np.percentile(
                np.abs(bp[ok] - bx[ok]) / scale, 99)))
        return (status_frac > 0.99 and worst < 1e-3), dict(
            status_frac=round(status_frac, 4), band_rel_p99=worst)

    def aux_case():
        from light_path_tracer_tpu.ops.kerr_trace import trace_rays_aux
        from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
            trace_rays_aux_pallas)
        from light_path_tracer_tpu.polarization import (
            k_contravariant, make_polarized_volumetric_transfer,
            observer_basis, walker_penrose)
        from light_path_tracer_tpu.volumetric import RIAFConfig
        m = Kerr(M=1.0, a=0.9)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 9, ac)
        tf = make_polarized_volumetric_transfer(m, RIAFConfig(),
                                                "toroidal", 0.7)
        y0, _p_t, p_phi, _inv = m.initial_conditions_5d(
            R_OBS, alphas, thetas, np.radians(80.0))
        Mj = jnp.asarray(1.0, jnp.float32)
        aj = jnp.asarray(0.9, jnp.float32)
        k_cam = k_contravariant(Mj, aj, y0[0], y0[1], y0[3], y0[4],
                                p_phi)
        e1, e2 = observer_basis(Mj, aj, R_OBS, np.radians(80.0), k_cam)
        k11, k21 = walker_penrose(aj, y0[0], y0[1], k_cam, e1)
        k12, k22 = walker_penrose(aj, y0[0], y0[1], k_cam, e2)
        aux = (k11, k21, k12, k22)
        rp = trace_rays_aux_pallas(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
            5000.0, 20000)
        rx = trace_rays_aux(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
            5000.0, 20000)
        sp, sx = np.asarray(rp.status), np.asarray(rx.status)
        status_frac = float((sp == sx).mean())
        ok = sp == sx
        worst = 0.0
        for ep, ex in zip(rp.extras, rx.extras):
            ep, ex = np.asarray(ep), np.asarray(ex)
            scale = max(float(np.abs(ex).max()), 1e-12)
            worst = max(worst, float(np.percentile(
                np.abs(ep[ok] - ex[ok]) / scale, 99)))
        return (status_frac > 0.99 and worst < 1e-3), dict(
            status_frac=round(status_frac, 4), stokes_rel_p99=worst)

    # --- extras TWO-PASS drivers at the production config (round-5
    # verdict item 5): straggler containment + the emission-saturation
    # exit, compared against the single-pass full-budget kernel. The
    # merge is exact (per-lane arithmetic is tile-independent and the
    # re-trace restarts from lambda=0), so agreement is bitwise-level.
    def spectral_two_pass_case():
        from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
            trace_rays_spectral_pallas, trace_rays_spectral_two_pass)
        from light_path_tracer_tpu.volumetric import (
            RIAFConfig, make_spectral_transfer)
        m = Kerr(M=1.0, a=0.9)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 10, ac)
        tf = make_spectral_transfer(
            m, RIAFConfig(g_power=4.0, alpha0=1.0, opacity_index=2.0),
            (0.5, 2.0))
        r2 = trace_rays_spectral_two_pass(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf, 2, 5000.0,
            20000, pass1_steps=2048, sat_window=2048)
        r1 = trace_rays_spectral_pallas(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf, 2, 5000.0,
            20000)
        worst = 0.0
        for bp, bx in zip(r2.emission, r1.emission):
            bp, bx = np.asarray(bp), np.asarray(bx)
            scale = max(float(np.abs(bx).max()), 1e-12)
            worst = max(worst, float(np.abs(bp - bx).max() / scale))
        status_frac = float((np.asarray(r2.status)
                             == np.asarray(r1.status)).mean())
        return (status_frac > 0.99 and worst < 1e-5), dict(
            status_frac=round(status_frac, 4), band_rel_max=worst)

    def aux_two_pass_case():
        from light_path_tracer_tpu.ops.pallas.volumetric_kernel import (
            trace_rays_aux_pallas, trace_rays_aux_two_pass)
        from light_path_tracer_tpu.polarization import (
            k_contravariant, make_polarized_volumetric_transfer,
            observer_basis, walker_penrose)
        from light_path_tracer_tpu.volumetric import RIAFConfig
        m = Kerr(M=1.0, a=0.9)
        ac = m.alpha_crit(R_OBS)
        alphas, thetas = _angles(n, 11, ac)
        tf = make_polarized_volumetric_transfer(m, RIAFConfig(),
                                                "toroidal", 0.7)
        y0, _p_t, p_phi, _inv = m.initial_conditions_5d(
            R_OBS, alphas, thetas, np.radians(80.0))
        Mj = jnp.asarray(1.0, jnp.float32)
        aj = jnp.asarray(0.9, jnp.float32)
        k_cam = k_contravariant(Mj, aj, y0[0], y0[1], y0[3], y0[4],
                                p_phi)
        e1, e2 = observer_basis(Mj, aj, R_OBS, np.radians(80.0), k_cam)
        k11, k21 = walker_penrose(aj, y0[0], y0[1], k_cam, e1)
        k12, k22 = walker_penrose(aj, y0[0], y0[1], k_cam, e2)
        aux = (k11, k21, k12, k22)
        r2 = trace_rays_aux_two_pass(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
            5000.0, 20000, pass1_steps=2048, sat_window=2048,
            sat_monitor=(0, 1, 2))
        r1 = trace_rays_aux_pallas(
            m, R_OBS, alphas, thetas, np.radians(80.0), tf, 3, aux,
            5000.0, 20000)
        worst = 0.0
        for ep, ex in zip(r2.extras, r1.extras):
            ep, ex = np.asarray(ep), np.asarray(ex)
            scale = max(float(np.abs(ex).max()), 1e-12)
            worst = max(worst, float(np.abs(ep - ex).max() / scale))
        status_frac = float((np.asarray(r2.status)
                             == np.asarray(r1.status)).mean())
        return (status_frac > 0.99 and worst < 1e-5), dict(
            status_frac=round(status_frac, 4), stokes_rel_max=worst)

    # --- fused whole-pipeline program -------------------------------
    def fused_case():
        from light_path_tracer_tpu.pipeline import render_scene
        from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                        SceneConfig)
        rng = np.random.default_rng(6)
        # render_scene's output resolution = the source image's.
        src = rng.random((args.size, args.size, 3)).astype(np.float32)
        scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                            vertical_fov_deg=40.0)
        outf = render_scene(scene, src, RenderConfig(backend="pallas"))
        outx = render_scene(scene, src, RenderConfig(backend="xla"))
        imgf, imgx = outf.image, outx.image
        same = float((np.asarray(imgf) == np.asarray(imgx)).mean())
        rmse = float(np.sqrt(np.mean(
            (np.asarray(imgf, np.float64)
             - np.asarray(imgx, np.float64)) ** 2)))
        # Nearest-texel sampling flips on backend roundoff (the
        # BASELINE.md flip-noise floor), so gate on RMSE not equality.
        return rmse < 0.08, dict(pixel_match=round(same, 4),
                                 rmse=round(rmse, 5))

    run("kerr_lens", kerr_case)
    run("schwarzschild", schw_case)
    run("reissner_nordstrom", rn_case)
    run("kerr_newman", kn_case)
    run("johannsen_psaltis", jp_case)
    run("disk", disk_case)
    run("volumetric_thin", lambda: vol_case(False))
    run("volumetric_absorbed", lambda: vol_case(True))
    run("spectral_extras", spectral_case)
    run("polarized_aux", aux_case)
    run("spectral_two_pass", spectral_two_pass_case)
    run("polarized_aux_two_pass", aux_two_pass_case)
    run("fused_pipeline", fused_case)

    all_ok = all(r["ok"] for r in results)
    summary = dict(platform=platform, size=args.size, ok=all_ok,
                   kernels=results)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(dict(ok=all_ok, platform=platform,
                          n_kernels=len(results))))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
