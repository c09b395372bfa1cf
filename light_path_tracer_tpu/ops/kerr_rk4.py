"""Fixed-step RK4 Kerr tracer — the comparison integrator.

Parity: /root/reference/metrics.py:570-658, kept there "for comparison
testing". Semantics reproduced per-lane in lock-step:
  * base step h (1.0), tightened to 0.5 under axis_refine, with a floor
    (0.02 / 0.01 refined) (metrics.py:591-594);
  * semi-adaptive near-horizon shrinking: h <= 0.25/0.10/0.05
    (0.20/0.08/0.03 refined) inside r < 4/2/1.2 x r_capture
    (metrics.py:604-611);
  * halving-on-non-finite retry down to the floor (metrics.py:615-627);
  * capture/escape boundary crossing with linear interpolation
    (metrics.py:630-647).

Used by the adaptive-vs-fixed-step agreement tests (SURVEY.md §4.2) and
selectable via RenderConfig.integrator = "rk4".
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from light_path_tracer_tpu.ops.types import TraceResult
from light_path_tracer_tpu.ops.kerr_trace import (
    RUNNING, ESCAPED, CAPTURED, INVALID, _axpy, _wsum, _all_finite,
    _select, _lerp)


def _rk4_step(rhs, y, h):
    k1 = rhs(y)
    k2 = rhs(_axpy(y, _wsum(h, [k1], [0.5])))
    k3 = rhs(_axpy(y, _wsum(h, [k2], [0.5])))
    k4 = rhs(_axpy(y, _wsum(h, [k3], [1.0])))
    incr = tuple(
        (h / 6.0) * (a + 2.0 * b + 2.0 * c + d)
        for a, b, c, d in zip(k1, k2, k3, k4))
    return _axpy(y, incr)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "r_obs", "theta_obs", "lambda_max",
                     "max_steps", "h_max"))
def trace_rays_kerr_rk4(metric, r_obs, alphas, thetas, theta_obs,
                        axis_refine, lambda_max: float,
                        max_steps: int = 200000, h_max: float = 1.0):
    """Fixed-step RK4 batch tracer; same result contract as the DP45 path."""
    dtype = alphas.dtype
    r_capture = jnp.asarray(metric.capture_radius(), dtype)
    r_escape = jnp.asarray(r_obs * 2.0, dtype)
    lam_max = jnp.asarray(lambda_max, dtype)

    y0, p_t, p_phi, invalid0 = metric.initial_conditions_5d(
        r_obs, alphas, thetas, theta_obs)
    rhs = lambda y: metric.rhs5(y, p_t, p_phi)
    status0 = jnp.where(invalid0, INVALID, RUNNING).astype(jnp.int32)

    h_base = jnp.where(axis_refine, min(h_max, 0.5), h_max).astype(dtype)
    h_floor = jnp.where(axis_refine,
                        min(0.01, h_max), min(0.02, h_max)).astype(dtype)
    shr1 = jnp.where(axis_refine, 0.20, 0.25).astype(dtype)
    shr2 = jnp.where(axis_refine, 0.08, 0.10).astype(dtype)
    shr3 = jnp.where(axis_refine, 0.03, 0.05).astype(dtype)

    lam0 = jnp.zeros_like(alphas)
    scale0 = jnp.ones_like(alphas)   # halving-on-retry multiplier

    def cond(carry):
        step, y, lam, status, scale = carry
        running = (status == RUNNING) & (lam < lam_max)
        return (step < max_steps) & jnp.any(running)

    def body(carry):
        step, y, lam, status, scale = carry
        running = (status == RUNNING) & (lam < lam_max)

        # Per-lane step size: base, near-horizon shrink, remaining clamp,
        # then the retry multiplier.
        r_curr = y[0]
        h = h_base
        h = jnp.where(r_curr < r_capture * 4.0, jnp.minimum(h, shr1), h)
        h = jnp.where(r_curr < r_capture * 2.0, jnp.minimum(h, shr2), h)
        h = jnp.where(r_curr < r_capture * 1.2, jnp.minimum(h, shr3), h)
        h = jnp.minimum(h, lam_max - lam)
        h = jnp.maximum(h * scale, 0.0)

        y_next = _rk4_step(rhs, y, h)
        ok = _all_finite(y_next) & (y_next[0] > 0.0)

        # Failure: halve and retry next iteration; floor -> invalid.
        fail = running & ~ok
        dead = fail & (h * 0.5 <= h_floor)
        scale_new = jnp.where(fail, scale * 0.5, 1.0)

        adv = running & ok
        r_prev, r_next = y[0], y_next[0]
        cap = adv & (r_prev > r_capture) & (r_next <= r_capture)
        esc = adv & (r_prev < r_escape) & (r_next >= r_escape) & ~cap

        denom = r_next - r_prev
        safe_den = jnp.where(denom == 0.0, 1.0, denom)
        frac = jnp.where(
            denom == 0.0, 1.0,
            jnp.where(cap, jnp.clip((r_capture - r_prev) / safe_den, 0., 1.),
                      jnp.where(esc,
                                jnp.clip((r_escape - r_prev) / safe_den,
                                         0., 1.),
                                1.0)))
        y_evt = _lerp(y, y_next, frac)
        y_out = _select(adv, _select(cap | esc, y_evt, y_next), y)
        lam_out = jnp.where(adv, lam + frac * h, lam)

        corrupt = adv & ~_all_finite(y_out[0:5])
        status_out = jnp.where(cap, CAPTURED,
                               jnp.where(esc, ESCAPED, status))
        status_out = jnp.where(dead | corrupt, INVALID,
                               status_out).astype(jnp.int32)
        return step + 1, y_out, lam_out, status_out, scale_new

    carry0 = (jnp.asarray(0, jnp.int32), y0, lam0, status0, scale0)
    step_f, y_f, _lam_f, status_f, _scale_f = jax.lax.while_loop(
        cond, body, carry0)

    captured = status_f == CAPTURED
    ext_status, final_alpha, n_half = metric.extract_angle(
        y_f, p_t, p_phi, captured)
    invalid_f = (status_f == INVALID) | (ext_status == 0)
    cap_f = ~invalid_f & (ext_status == -1)
    status_out = jnp.where(
        invalid_f, INVALID,
        jnp.where(cap_f, CAPTURED, ESCAPED)).astype(jnp.int32)
    nan = jnp.asarray(jnp.nan, dtype)
    final_alpha = jnp.where(status_out == ESCAPED, final_alpha, nan)
    n_half = jnp.where(invalid_f & (status_f == INVALID), 0, n_half)
    return TraceResult(final_alpha, n_half, status_out, step_f)
