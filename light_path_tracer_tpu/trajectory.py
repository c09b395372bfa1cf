"""Full-trajectory geodesic integration (the reference's scipy path).

Parity surface: /root/reference/geodesic_tracer.py:22-82 — integrate the
public 8-D Hamiltonian state with terminal capture/escape events and return
the *whole path* for visualization and conservation checks (the compiled
tracers only return the final angle).

TPU-native design: a fixed-length `lax.scan` with per-step masked freezing
records the path at every step; the scan is batched over rays (vmap), so
one jitted program integrates and records any number of trajectories.
Adaptivity is approximated with a curvature-scheduled step (smaller h near
the horizon), which is enough for plotting and conservation testing; the
production angle path is ops/kerr_trace.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Trajectory(NamedTuple):
    states: jnp.ndarray    # (n_steps+1, ..., 8) recorded path
    lambdas: jnp.ndarray   # (n_steps+1, ...) affine parameter
    outcome: jnp.ndarray   # (...,) int32: 1 escaped, -1 captured, 0 invalid
    n_valid: jnp.ndarray   # (...,) int32 number of live samples


@functools.partial(
    jax.jit,
    static_argnames=("metric", "n_steps", "r_obs"))
def integrate_geodesic_8d(metric, state0, *, r_obs, n_steps: int = 4000,
                          h_base: float = 0.5):
    """Integrate 8-D states (…, 8) with capture/escape stopping.

    Stopping radii match geodesic_tracer.py:42-55: inner =
    metric.capture_radius(), outer = 2 * r_obs.
    """
    r_stop_inner = metric.capture_radius()
    r_stop_outer = 2.0 * float(r_obs)
    dtype = state0.dtype
    h_base = jnp.asarray(h_base, dtype)

    def rhs(s):
        return metric.geodesic_equations(0.0, s)

    def step(carry, _):
        s, lam, done = carry
        r = s[..., 1]
        # Curvature-scheduled step: shrink near the inner boundary.
        h = h_base * jnp.clip((r - r_stop_inner) / (10.0 * r_stop_inner),
                              0.02, 1.0)
        h = jnp.where(done, 0.0, h)[..., None]

        k1 = rhs(s)
        k2 = rhs(s + 0.5 * h * k1)
        k3 = rhs(s + 0.5 * h * k2)
        k4 = rhs(s + h * k3)
        s_next = s + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        r_next = s_next[..., 1]
        newly_done = (r_next <= r_stop_inner) | (r_next >= r_stop_outer) | \
            ~jnp.all(jnp.isfinite(s_next), axis=-1)
        s_out = jnp.where(done[..., None], s, s_next)
        lam_out = jnp.where(done, lam, lam + h[..., 0])
        done_out = done | newly_done
        return (s_out, lam_out, done_out), (s_out, lam_out, done_out)

    lam0 = jnp.zeros(state0.shape[:-1], dtype)
    done0 = jnp.zeros(state0.shape[:-1], bool)
    (_s_f, _lam_f, done_f), (path, lams, dones) = jax.lax.scan(
        step, (state0, lam0, done0), None, length=n_steps)

    states = jnp.concatenate([state0[None], path], axis=0)
    lambdas = jnp.concatenate([lam0[None], lams], axis=0)
    n_valid = 1 + jnp.sum(~dones, axis=0).astype(jnp.int32)

    final_r = _s_f[..., 1]
    outcome = jnp.where(final_r <= r_stop_inner * 1.1, -1,
                        jnp.where(jnp.all(jnp.isfinite(_s_f), axis=-1),
                                  1, 0)).astype(jnp.int32)
    return Trajectory(states, lambdas, outcome, n_valid)


def trace_ray_trajectory(metric, r_obs, alpha, theta=0.0,
                         theta_obs=np.pi / 2, n_steps: int = 4000,
                         h_base: float = 0.5, dtype=jnp.float32):
    """Single-ray full-path trace (geodesic_tracer.py:74-82 front-end).

    Returns (Trajectory, outcome_str). outcome: 'captured'/'escaped'/
    'invalid'.
    """
    alpha_arr = jnp.asarray([alpha], dtype)
    state8, invalid = metric.initial_conditions_8d(
        float(r_obs), alpha_arr, theta, theta_obs)
    if bool(invalid[0]):
        return None, "invalid"
    traj = integrate_geodesic_8d(
        metric, state8[0], r_obs=float(r_obs), n_steps=n_steps,
        h_base=h_base)
    outcome = {1: "escaped", -1: "captured", 0: "invalid"}[int(traj.outcome)]
    return traj, outcome


def plot_trajectories(metric, r_obs, angles_deg, ax=None, dtype=jnp.float32):
    """Equatorial-plane trajectory overlay (geodesic_tracer.py:89-142).

    Requires matplotlib; imports lazily so headless/TPU environments
    without display deps can use the rest of the package.
    """
    import matplotlib.pyplot as plt

    if ax is None:
        _fig, ax = plt.subplots(figsize=(10, 10))

    circle = np.linspace(0, 2 * np.pi, 200)
    r_horizon = metric.capture_radius()
    ax.fill(r_horizon * np.cos(circle), r_horizon * np.sin(circle),
            "k", label="Event horizon")
    if hasattr(metric, "R_PHOTON"):
        r_ph = metric.R_PHOTON
        ax.plot(r_ph * np.cos(circle), r_ph * np.sin(circle),
                "r--", linewidth=1.5, label="Photon sphere")
    ax.plot(r_obs, 0, "go", markersize=10, label=f"Observer (r={r_obs}M)")

    for alpha_deg in angles_deg:
        traj, outcome = trace_ray_trajectory(
            metric, r_obs, np.radians(alpha_deg), dtype=dtype)
        if traj is None:
            continue
        n = int(traj.n_valid)
        r = np.asarray(traj.states[:n, 1])
        phi = np.asarray(traj.states[:n, 3])
        x = r * np.cos(phi)
        y = r * np.sin(phi)
        color = "steelblue" if outcome == "escaped" else "crimson"
        style = "-" if outcome == "escaped" else "--"
        ax.plot(x, y, color=color, linestyle=style, linewidth=1.2,
                label=f"α={alpha_deg}° ({outcome})")

    alpha_crit = np.degrees(metric.alpha_crit(r_obs))
    ax.set_title(f"Photon trajectories (critical angle ≈ {alpha_crit:.2f}°)")
    ax.set_xlabel("x / M")
    ax.set_ylabel("y / M")
    ax.set_aspect("equal")
    ax.legend(loc="upper left", fontsize=8)
    ax.grid(True, alpha=0.3)
    return ax
