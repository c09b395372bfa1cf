"""Example user-defined spacetimes for --metric-py / CustomMetric.

Each module-level callable follows the plug-in contract
(models/custom.py): (r, th) -> (g_tt, g_tphi, g_rr, g_thth, g_phiphi),
batched jax.numpy, parameters closed over. The `mp_binary` example is
the INSTANCE form of the plug-in (a ready CustomMetric — needed when a
metric wants more than the five components, here a non-spherical
capture predicate). Run e.g.

    python -m light_path_tracer_tpu shadow --size 512 \
        --metric-py examples/user_metric.py:hayward --output hayward.png

    python -m light_path_tracer_tpu shadow --size 512 --a 0.9 \
        --metric-py examples/user_metric.py:rotating_hayward \
        --output rotating_hayward.png

    # BINARY black-hole shadow (two extremal charged holes, exact
    # static solution) — keep the step budget modest: throat-bound
    # rays integrate to max_steps before classifying as captured.
    python -m light_path_tracer_tpu shadow --size 256 --fov-v 20 \
        --r-obs 60 --max-steps 6000 \
        --metric-py examples/user_metric.py:mp_binary --output mp.png

    # Massless Ellis wormhole (horizonless; the signature scan turns
    # the throat into the capture surface automatically)
    python -m light_path_tracer_tpu shadow --size 256 --fov-v 20 \
        --r-obs 60 --metric-py examples/user_metric.py:ellis_wormhole \
        --output wormhole.png

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


def mp_binary_covariant(m1, m2, s):
    """Majumdar-Papapetrou BINARY: two extremal (|Q_i| = m_i) charged
    black holes in static equilibrium (gravity balances electrostatic
    repulsion) — an EXACT solution, and axisymmetric when the holes
    sit on the polar axis at z = +-s, so it fits the plug-in contract.

    In isotropic coordinates ds^2 = -U^-2 dt^2 + U^2 dx.dx with
    U = 1 + m1/d1 + m2/d2; in the spherical chart the spatial part is
    diagonal: g_rr = U^2, g_thth = U^2 r^2, g_phiphi = U^2 r^2 sin^2.
    Each horizon is the POINT d_i = 0 (an infinitely deep extremal
    throat), so capture cannot be a centered sphere — mp_binary below
    pairs this with captured_fn (deep-potential test U > U_CAP, safely
    inside each hole's photon sphere where U = 2 for an isolated
    extremal hole) and a tiny capture_radius_override so the corridor
    between the holes stays traceable."""
    def fn(r, th):
        sin2 = jnp.maximum(jnp.sin(th) ** 2, _SIN2_FLOOR)
        cos_th = jnp.cos(th)
        d1 = jnp.sqrt(jnp.maximum(
            r * r + s * s - 2.0 * r * s * cos_th, 1e-30))
        d2 = jnp.sqrt(jnp.maximum(
            r * r + s * s + 2.0 * r * s * cos_th, 1e-30))
        U = 1.0 + m1 / d1 + m2 / d2
        U2 = U * U
        return (-1.0 / U2, jnp.zeros_like(U), U2,
                U2 * r * r, U2 * r * r * sin2)
    return fn


def _mp_captured(m1, m2, s, u_cap=8.0):
    def fn(r, th):
        cos_th = jnp.cos(th)
        d1 = jnp.sqrt(jnp.maximum(
            r * r + s * s - 2.0 * r * s * cos_th, 1e-30))
        d2 = jnp.sqrt(jnp.maximum(
            r * r + s * s + 2.0 * r * s * cos_th, 1e-30))
        return (1.0 + m1 / d1 + m2 / d2) > u_cap
    return fn


MP_M1, MP_M2, MP_S = 0.5, 0.5, 6.0

# The instance form of the plug-in: --metric-py .../user_metric.py:mp_binary
# M = m1 + m2 calibrates the far-field camera screen. alpha_crit is
# display-only here (two shadows — no single critical circle exists);
# the value is the outer shadow edge at the recommended r_obs = 60M:
# (MP_S + 4 m1) / 60. Render with --max-steps ~6000: throat-bound rays
# classify as captured at the budget (captured_fn), never at a sphere.
def _make_mp_binary():
    from light_path_tracer_tpu.models import CustomMetric
    return CustomMetric(
        M=MP_M1 + MP_M2, a=0.0,
        covariant_fn=mp_binary_covariant(MP_M1, MP_M2, MP_S),
        captured_fn=_mp_captured(MP_M1, MP_M2, MP_S),
        capture_radius_override=0.02,
        alpha_crit_override=(MP_S + 4.0 * MP_M1) / 60.0,
        label=f"MP binary m1={MP_M1} m2={MP_M2} s={MP_S}")


mp_binary = _make_mp_binary()


def ellis_covariant(b):
    """Ellis-Bronnikov MASSLESS wormhole in the areal chart r > b:

        ds^2 = -dt^2 + dr^2 / (1 - b^2/r^2) + r^2 dOmega^2

    (Ellis 1973 drainhole at zero mass parameter). g_tt = -1 exactly:
    no redshift, no Shapiro delay — light bends by the QUADRATIC law
    bend = pi b^2 / (4 b_imp^2) (vs Schwarzschild's 4M/b_imp), the
    classic observational discriminator. The light ring sits AT the
    throat r = b (critical impact parameter = b, so the shadow edge is
    exactly arcsin(b / r_obs)); rays inside it cross into the other
    asymptotic region — in this one-sided chart g_rr flips sign at the
    throat, which CustomMetric's signature scan detects automatically
    and converts into a capture surface at 1.02 b (throat-crossers
    render black, the standard one-sided wormhole-shadow convention).
    """
    def fn(r, th):
        sin2 = jnp.maximum(jnp.sin(th) ** 2, _SIN2_FLOOR)
        zero = jnp.zeros_like(r * th)
        g_rr = 1.0 / (1.0 - (b * b) / (r * r))
        return (-1.0 + zero, zero, g_rr + zero,
                r * r + zero, r * r * sin2)
    return fn


WH_THROAT = 2.0


def _make_ellis():
    from light_path_tracer_tpu.models import CustomMetric
    # M = 0 is honest (massless): the Bardeen screen mapping reduces
    # to the exact flat-space pinhole, and alpha_crit bisection seeds
    # its bracket from the scanned capture surface instead of 3rt3 M.
    return CustomMetric(M=0.0, a=0.0,
                        covariant_fn=ellis_covariant(WH_THROAT),
                        label=f"Ellis wormhole b={WH_THROAT}")


ellis_wormhole = _make_ellis()


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
