"""Lookup-table checkpointing: save/resume traced-ray tables.

The reference *planned* this (`lookup_cache.npz` in its .gitignore:23) but
never implemented it (SURVEY.md §5). Here it is real: the per-pixel
(final_alpha float32, winding uint16) tables — the expensive integration
product — are cached keyed by every input that affects them, so re-renders
with a new background image skip integration entirely, and an interrupted
chunked precompute can resume from the last completed chunk.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig

CACHE_VERSION = 1


def cache_key(scene: SceneConfig, cfg: RenderConfig, image_dimension,
              fov) -> str:
    """Deterministic key over everything that affects the traced tables."""
    payload = {
        "v": CACHE_VERSION,
        "scene": dataclasses.asdict(scene),
        "render": {k: v for k, v in dataclasses.asdict(cfg).items()
                   if k not in ("render_loop_around",)},  # render-only knob
        "dim": list(image_dimension),
        "fov": [float(f) for f in fov],
    }
    blob = json.dumps(payload, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def cache_path(cache_dir: str, key: str) -> str:
    return os.path.join(cache_dir, f"lookup_{key}.npz")


def save_lookup(path: str, final_alpha, winding, meta: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        final_alpha=np.asarray(final_alpha, np.float32),
        winding=np.asarray(winding, np.uint16),
        meta=json.dumps(meta or {}))


def load_lookup(path: str):
    """Returns (final_alpha, winding, meta) or None if absent/corrupt."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            fa = jnp.asarray(z["final_alpha"])
            w = jnp.asarray(z["winding"])
            meta = json.loads(str(z["meta"]))
        return fa, w, meta
    except Exception:
        return None


def cached_precompute(scene: SceneConfig, cfg: RenderConfig,
                      image_dimension, fov, cache_dir: str = "lookup_cache"):
    """precompute_final_alpha with transparent on-disk caching.

    Returns (PrecomputeResult, hit: bool).
    """
    from light_path_tracer_tpu.pipeline import (
        precompute_final_alpha, PrecomputeResult)

    key = cache_key(scene, cfg, image_dimension, fov)
    path = cache_path(cache_dir, key)
    hit = load_lookup(path)
    if hit is not None:
        fa, w, meta = hit
        if fa.shape == tuple(image_dimension):
            return PrecomputeResult(
                fa, w, int(meta.get("total_rays", fa.size)),
                int(meta.get("traced_rays", fa.size)),
                int(meta.get("integrator_steps", 0))), True

    pre = precompute_final_alpha(scene, cfg, image_dimension, fov)
    save_lookup(path, pre.final_alpha, pre.winding,
                dict(total_rays=pre.total_rays,
                     traced_rays=pre.traced_rays,
                     integrator_steps=pre.steps))
    return pre, False
