"""Example user-defined spacetimes for --metric-py / CustomMetric.

Each module-level callable follows the plug-in contract
(models/custom.py): (r, th) -> (g_tt, g_tphi, g_rr, g_thth, g_phiphi),
batched jax.numpy, parameters closed over. Run e.g.

    python -m light_path_tracer_tpu shadow --size 512 \
        --metric-py examples/user_metric.py:hayward --output hayward.png

    python -m light_path_tracer_tpu shadow --size 512 --a 0.9 \
        --metric-py examples/user_metric.py:rotating_hayward \
        --output rotating_hayward.png

The Hayward regular black hole (Hayward 2006, PRL 96, 031103) replaces
the singular Schwarzschild core with a de Sitter core of length scale
l: f(r) = 1 - 2 M r^2 / (r^3 + 2 M l^2). Asymptotically Schwarzschild
to O(1/r^3) — exactly the far field the camera-screen calibration
assumes — while the photon sphere and shadow shrink measurably at
l ~ M. The rotating variant uses the standard mass-function
substitution M -> m(r) = M r^3 / (r^3 + 2 M l^2) in the Kerr form
(Bambi & Modesto 2013 rotating regular black holes).
"""

import jax.numpy as jnp

M = 1.0        # asymptotic mass — match --M (default 1.0)
A = 0.9        # spin of the rotating example — match --a
L_CORE = 0.9   # de Sitter core scale l in units of M

_SIN2_FLOOR = 1e-15


def hayward(r, th):
    """Static Hayward regular black hole (l = L_CORE)."""
    sin2 = jnp.maximum(jnp.sin(th) ** 2, _SIN2_FLOOR)
    f = 1.0 - 2.0 * M * r * r / (r ** 3 + 2.0 * M * L_CORE ** 2)
    zero = jnp.zeros_like(r * th)
    return (-f + zero, zero, 1.0 / f + zero,
            r * r + zero, r * r * sin2)


def rotating_hayward(r, th):
    """Rotating Hayward (spin A, core L_CORE): Kerr with
    M -> m(r) = M r^3 / (r^3 + 2 M l^2)."""
    sin2 = jnp.maximum(jnp.sin(th) ** 2, _SIN2_FLOOR)
    cos_th = jnp.cos(th)
    m_r = M * r ** 3 / (r ** 3 + 2.0 * M * L_CORE ** 2)
    Sigma = r * r + A * A * cos_th * cos_th
    Delta = r * r - 2.0 * m_r * r + A * A
    two_mr = 2.0 * m_r * r
    g_tt = -(1.0 - two_mr / Sigma)
    g_tphi = -A * two_mr * sin2 / Sigma
    g_rr = Sigma / Delta
    g_thth = Sigma
    g_phiphi = (r * r + A * A + A * A * two_mr * sin2 / Sigma) * sin2
    return g_tt, g_tphi, g_rr, g_thth, g_phiphi
