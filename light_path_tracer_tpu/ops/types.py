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
    # () int32 — lock-step integrator loop iterations, summed over
    # independently scheduled units: the XLA path counts its single
    # whole-batch while_loop; Pallas paths sum the per-tile counts (each
    # tile exits when its own rays finish); chunked/two-pass drivers sum
    # across dispatches. Same contract on every backend: total sequential
    # step work actually executed.
    n_steps: jnp.ndarray
