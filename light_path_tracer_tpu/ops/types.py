"""Shared result types for batched ray tracing."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TraceResult(NamedTuple):
    """Per-ray tracing outcome (structure-of-arrays over N rays).

    status matches the reference's integer codes (metrics.py:69, 451):
    1 escaped, -1 captured, 0 invalid. (Max-range rays are folded into
    'escaped' at extraction time, as the reference does.)
    final_alpha is NaN for captured/invalid rays.
    """

    final_alpha: jnp.ndarray   # (N,) float
    n_half_orbits: jnp.ndarray  # (N,) int32
    status: jnp.ndarray        # (N,) int32
    n_steps: jnp.ndarray       # () int32 — integrator iterations executed
