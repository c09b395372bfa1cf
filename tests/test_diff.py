"""Differentiable tracer: agreement, gradient correctness, inversion.

The scan tracer must agree with the production fixed-step RK4 path on
clean rays; jax.grad through it must match central finite differences;
and the headline capability — recovering the spin from an observed
deflection field by gradient descent — must actually converge.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu import diff
from light_path_tracer_tpu.models.kerr import Kerr
from light_path_tracer_tpu.ops.kerr_rk4 import trace_rays_kerr_rk4
from light_path_tracer_tpu.ops.kerr_trace import ESCAPED


R_OBS = 20.0
THETA_OBS = np.radians(80.0)


def _rays(n_alpha=4, n_theta=6, lo=0.30, hi=0.60):
    """Escaping rays bracketing the strong-deflection region, off the
    degenerate screen axes (thetas != +-pi/2: sqrt clamp boundaries)."""
    al = np.linspace(lo, hi, n_alpha)
    th = np.linspace(0.2, 2 * np.pi - 0.2, n_theta, endpoint=False)
    A, T = np.meshgrid(al, th)
    return (jnp.asarray(A.ravel(), jnp.float64),
            jnp.asarray(T.ravel(), jnp.float64))


def test_scan_tracer_matches_while_rk4():
    alphas, thetas = _rays()
    a, M = 0.7, 1.0
    fa_diff, status = diff.trace_final_alpha_diff(
        M, a, R_OBS, alphas, thetas, THETA_OBS, n_steps=1024, h_max=0.5)
    metric = Kerr(M, a)
    res = trace_rays_kerr_rk4(
        metric, R_OBS, alphas, thetas, THETA_OBS,
        axis_refine=jnp.zeros_like(alphas, bool),
        lambda_max=10_000.0, max_steps=4096, h_max=0.5)
    esc = np.asarray(status) == ESCAPED
    assert esc.sum() >= len(esc) * 0.8  # the ray set escapes
    both = esc & (np.asarray(res.status) == ESCAPED)
    assert np.array_equal(esc, np.asarray(res.status) == ESCAPED)
    d = np.abs(np.asarray(fa_diff)[both] - np.asarray(res.final_alpha)[both])
    assert d.max() < 1e-9  # same stepper, same events, f64


@pytest.mark.slow
def test_grad_matches_finite_difference():
    alphas, thetas = _rays(n_alpha=3, n_theta=4)

    def mean_alpha(a):
        fa, status = diff.trace_final_alpha_diff(
            1.0, a, R_OBS, alphas, thetas, THETA_OBS,
            n_steps=1024, h_max=0.5)
        ok = status == ESCAPED
        fa = jnp.where(ok, fa, 0.0)
        return jnp.sum(fa) / jnp.maximum(jnp.sum(ok), 1)

    a0 = 0.6
    g = float(jax.grad(mean_alpha)(jnp.asarray(a0, jnp.float64)))
    eps = 1e-5
    fd = float((mean_alpha(jnp.asarray(a0 + eps, jnp.float64))
                - mean_alpha(jnp.asarray(a0 - eps, jnp.float64)))
               / (2 * eps))
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(fd) > 1e-5  # the field IS spin-sensitive here
    assert abs(g - fd) < 1e-4 * max(1.0, abs(fd))


@pytest.mark.slow
def test_grad_wrt_mass_and_radius_finite():
    alphas, thetas = _rays(n_alpha=2, n_theta=3)

    def loss(M, r_obs):
        fa, status = diff.trace_final_alpha_diff(
            M, 0.5, r_obs, alphas, thetas, THETA_OBS,
            n_steps=1024, h_max=0.5)
        ok = status == ESCAPED
        return jnp.sum(jnp.where(ok, fa, 0.0))

    gM, gR = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(1.0, jnp.float64), jnp.asarray(R_OBS, jnp.float64))
    assert np.isfinite(float(gM)) and np.isfinite(float(gR))
    assert float(gM) != 0.0


@pytest.mark.slow
def test_fit_recovers_spin():
    # Weak-deflection rays: the final-alpha field there is SMOOTH in
    # the spin (near-critical rays oscillate — e^(pi*w) sensitivity —
    # and would make the least-squares landscape multimodal).
    alphas, thetas = _rays(lo=0.45, hi=1.0)
    a_true = 0.7
    observed, status = diff.trace_final_alpha_diff(
        1.0, a_true, R_OBS, alphas, thetas, THETA_OBS,
        n_steps=1024, h_max=0.5)

    fitted, history = diff.fit_scene_params(
        observed, alphas, thetas,
        init_params={"a": 0.35},
        fixed_params={"M": 1.0, "r_obs": R_OBS, "theta_obs": THETA_OBS},
        n_steps=1024, h_max=0.5, iters=20)
    assert history[-1] < history[0] * 1e-6
    assert abs(fitted["a"] - a_true) < 1e-4
