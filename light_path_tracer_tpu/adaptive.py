"""Adaptive supersampling: refine only the pixels where AA matters.

Uniform jittered AA (aa.py) traces every pixel aa_samples times, but in
a lensed black-hole scene the features that alias live on a measure-zero
set: the shadow boundary, the photon rings (winding transitions), and
the high-magnification band around the critical curve. Everywhere else
one sample per pixel already equals the converged average to sub-texel
accuracy. This module exploits that structure the TPU-native way:

  1. Base pass — ONE full-grid trace at the first AA offset (the same
     rotated-grid pattern aa.py uses, so refined pixels end up with the
     exact full-AA sample set).
  2. Edge score — per-pixel refinement priority from the base pass
     alone: capture-boundary flips dominate, then winding-count changes,
     then the final-alpha neighbor gradient (photon-ring magnification),
     plus local color contrast in lensed mode. Pure elementwise/shift
     ops on device.
  3. Compaction — `jax.lax.top_k` picks a STATIC budget of
     refine_frac * H * W pixels (XLA needs static shapes; top_k is the
     canonical TPU compaction primitive — no host round-trip, no
     dynamic `nonzero`).
  4. Refine pass — the remaining aa_samples-1 subpixel samples are
     traced for ONLY those pixels in one gathered dispatch
     (camera.pixel_angles_at), then scatter-averaged into the base
     image with `.at[idx].set`.

Refined pixels carry exactly the sample set uniform AA would give them
(same offsets, same integrator); unrefined pixels keep their single
centered-pattern sample. Cost: H*W + (S-1)*K rays vs S*H*W — at the
default 5% budget that is ~3.6x fewer rays for 4x AA, and the advantage
grows linearly with aa_samples (16x AA costs ~1.8 passes instead of 16).

The reference has no adaptive sampling (its AA story is the legacy
harness's uniform supersize-then-downscale); this is a capability
extension in the spirit of its axis_refine band (image_lens.py:210-216
— spend accuracy only where the scene needs it).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from light_path_tracer_tpu import camera
from light_path_tracer_tpu.aa import aa_offsets
from light_path_tracer_tpu.ops.batch import trace_batch
from light_path_tracer_tpu.render import render_lensed_image
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.utils.timing import StageTimer

# Score weights: a capture flip must outrank any winding change, which
# must outrank any smooth final-alpha gradient (|d alpha| <= pi) or
# color contrast (<= sqrt(3)). Ordering is all that matters.
_W_CAPTURE = 1e6
_W_WINDING = 1e3


def _neighbor_max_diff(x):
    """Max |difference to a 4-neighbor| per pixel, edge-replicated."""
    dy = jnp.abs(x[1:] - x[:-1])
    dx = jnp.abs(x[:, 1:] - x[:, :-1])
    d = jnp.zeros_like(x)
    d = d.at[1:, :].max(dy)
    d = d.at[:-1, :].max(dy)
    d = d.at[:, 1:].max(dx)
    d = d.at[:, :-1].max(dx)
    return d


def edge_score(final_alpha, winding, base_image=None):
    """Per-pixel refinement priority from a single-sample pass.

    Capture-boundary flips > winding transitions > final-alpha gradient
    (+ color contrast when a rendered base image is given). Returns a
    float32 (H, W) array; zero means no 4-neighbor disagrees in any
    channel.
    """
    cap = jnp.isnan(final_alpha).astype(jnp.float32)
    fa = jnp.where(jnp.isnan(final_alpha), 0.0, final_alpha)
    fa = fa.astype(jnp.float32)
    score = (_W_CAPTURE * _neighbor_max_diff(cap)
             + _W_WINDING * _neighbor_max_diff(
                 winding.astype(jnp.float32))
             + _neighbor_max_diff(fa))
    if base_image is not None:
        img = base_image if base_image.ndim == 3 else base_image[..., None]
        contrast = jnp.max(jnp.stack(
            [_neighbor_max_diff(img[..., c].astype(jnp.float32))
             for c in range(img.shape[2])]), axis=0)
        score = score + contrast
    return score


def _refine_budget(resolution, refine_frac):
    n_px = resolution[0] * resolution[1]
    return int(np.clip(int(refine_frac * n_px), 1, n_px))


def _check_samples(aa_samples):
    if aa_samples < 2:
        raise ValueError(
            f"adaptive AA needs aa_samples >= 2, got {aa_samples}")


def _refine_angles(idx, resolution, fov, offsets, scene, dtype):
    """(alpha, theta) of the S-1 refinement samples at the gathered
    pixels; both shaped (S-1, K)."""
    py, px = jnp.unravel_index(idx, resolution)
    alphas, thetas = [], []
    for off in offsets[1:]:
        al, th = camera.pixel_angles_at(
            py, px, resolution, fov, psi=scene.psi, dtype=dtype,
            pixel_offset=tuple(off), boost=scene.boost)
        alphas.append(al)
        thetas.append(th)
    return jnp.stack(alphas), jnp.stack(thetas)


def render_shadow_adaptive(scene: SceneConfig, resolution,
                           cfg: RenderConfig = RenderConfig(),
                           aa_samples: int = 4, refine_frac: float = 0.05):
    """Adaptively anti-aliased integrated shadow.

    Equivalent to render_shadow_aa wherever the budget covers the edge
    set (the shadow boundary is O(perimeter) ~ 4/H of the pixels, so the
    default 5% budget covers it with a wide margin at any resolution);
    returns (image float32, stats). Single-chip path — the multi-chip AA
    story stays the uniform stacked pass (aa.py), whose row sharding the
    scattered refine set would defeat.

    Equatorial mirror symmetry composes with adaptivity (aa.py's rule,
    via pipeline._use_tb): the base pass traces rows 0..H//2 and
    mirror-fills, the edge score FOLDS onto the traced rows (a bottom
    edge marks its top twin), and each refined top pixel's coverage
    scatters to BOTH twins — the twin's sample set is the flipped-offset
    one, equal by the scene symmetry. Halves base AND refine rays.
    """
    _check_samples(aa_samples)
    from light_path_tracer_tpu.aa import _use_tb, _mirror_fill
    metric = scene.metric()
    timer = StageTimer()
    height, width = resolution
    fov = camera.fov_from_vertical(scene.vertical_fov, resolution)
    offsets = aa_offsets(aa_samples)
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    n_px = height * width
    k = _refine_budget(resolution, refine_frac)
    # Subpixel-offset grids are jittered by construction, which makes
    # near-axis stragglers certain at ANY batch size (the disk path's
    # 13x jitter lesson, BASELINE.md) — so "auto" resolves to ON here
    # instead of trace_batch's >2M-ray rule.
    two_pass = True if cfg.two_pass == "auto" else cfg.two_pass
    use_tb = _use_tb(metric, scene, cfg)
    trace_rows = height // 2 + 1 if use_tb else height

    with timer.stage("precompute") as out:
        alpha0 = camera.build_alpha_lookup(
            resolution, fov, psi=scene.psi, dtype=dtype,
            boost=scene.boost, pixel_offset=tuple(offsets[0]))
        theta0 = (None if metric.is_spherically_symmetric else
                  camera.build_theta_lookup(
                      resolution, fov, psi=scene.psi, dtype=dtype,
                      boost=scene.boost, pixel_offset=tuple(offsets[0])))
        res0 = trace_batch(
            metric, scene.r_obs, alpha0[:trace_rows].ravel(),
            None if theta0 is None else theta0[:trace_rows].ravel(),
            scene.theta_obs, max_steps=cfg.max_steps,
            backend=cfg.backend, precision=cfg.precision,
            two_pass=two_pass, pass1_steps=cfg.pass1_steps)
        fa0 = res0.final_alpha.reshape(trace_rows, width)
        nh0 = res0.n_half_orbits.reshape(trace_rows, width)
        if use_tb:
            fa0 = _mirror_fill(fa0[None], height)[0]
            nh0 = _mirror_fill(nh0[None], height)[0]
        out.append(fa0)

    with timer.stage("refine") as out:
        score = edge_score(fa0, nh0)
        if use_tb:
            # Fold the score onto the traced rows: the twin of traced
            # row r is row H - r (row 0 and, for even H, row H//2 are
            # their own twins) — a bottom-half edge selects its top
            # twin, whose refined coverage serves both by symmetry.
            rows = jnp.arange(trace_rows)
            twin_rows = (height - rows) % height
            score_fold = jnp.maximum(score[rows], score[twin_rows])
            _, idx = lax.top_k(score_fold.ravel(), k)
        else:
            _, idx = lax.top_k(score.ravel(), k)
        al_r, th_r = _refine_angles(idx, resolution, fov, offsets,
                                    scene, dtype)
        res_r = trace_batch(
            metric, scene.r_obs, al_r.ravel(),
            None if theta0 is None else th_r.ravel(),
            scene.theta_obs, max_steps=cfg.max_steps,
            backend=cfg.backend, precision=cfg.precision,
            two_pass=two_pass, pass1_steps=cfg.pass1_steps)
        # NaN final_alpha = captured (render_shadow_aa's coverage rule).
        cov_r = (~jnp.isnan(res_r.final_alpha)).reshape(
            aa_samples - 1, k).astype(jnp.float32).sum(axis=0)
        out.append(cov_r)

    with timer.stage("render") as out:
        base_cov = (~jnp.isnan(fa0)).astype(jnp.float32).ravel()
        refined = (base_cov[idx] + cov_r) / aa_samples
        img = base_cov.at[idx].set(refined)
        if use_tb:
            # Scatter each refined value to its mirror twin as well.
            py, px = jnp.unravel_index(idx, resolution)
            twin_idx = ((height - py) % height) * width + px
            img = img.at[twin_idx].set(refined)
        img = img.reshape(resolution).astype(jnp.float32)
        out.append(img)

    stats = dict(
        alpha_crit=metric.alpha_crit(scene.r_obs, scene.theta_obs),
        total_rays=trace_rows * width + (aa_samples - 1) * k,
        traced_rays=trace_rows * width + (aa_samples - 1) * k,
        uniform_aa_rays=n_px * aa_samples,
        refined_pixels=k,
        refined_idx=idx,
        tb_symmetry=use_tb,
        # Reduced ON DEVICE: np.asarray(score) would read the full grid
        # back through the tunnel (~4 s at 4k, measured).
        edge_pixels=int(jnp.sum(score >= _W_WINDING)),
        aa_samples=aa_samples,
        refine_frac=refine_frac,
        timings=timer.finish())
    return img, stats


def render_scene_adaptive(scene: SceneConfig, source_image,
                          cfg: RenderConfig = RenderConfig(),
                          aa_samples: int = 4, refine_frac: float = 0.05):
    """Adaptively anti-aliased lensed render; returns (image, stats).

    The edge score adds the base image's local color contrast, so
    strongly sheared texture regions near the critical curve refine even
    where the winding count is flat. Display-space averaging matches
    render_scene_aa (each sample is a fully rendered color).
    """
    _check_samples(aa_samples)
    metric = scene.metric()
    timer = StageTimer()
    src = jnp.asarray(source_image)
    if src.dtype == jnp.uint8:
        src = src.astype(jnp.float32) / 255.0
    resolution = src.shape[:2]
    fov = camera.fov_from_vertical(scene.vertical_fov, resolution)
    offsets = aa_offsets(aa_samples)
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    n_px = resolution[0] * resolution[1]
    k = _refine_budget(resolution, refine_frac)
    alpha_crit = metric.alpha_crit(scene.r_obs)
    # "auto" two-pass resolves to ON (jittered grids; see shadow path).
    two_pass = True if cfg.two_pass == "auto" else cfg.two_pass

    with timer.stage("precompute") as out:
        alpha0 = camera.build_alpha_lookup(
            resolution, fov, psi=scene.psi, dtype=dtype,
            boost=scene.boost, pixel_offset=tuple(offsets[0]))
        theta0 = camera.build_theta_lookup(
            resolution, fov, psi=scene.psi, dtype=dtype,
            boost=scene.boost, pixel_offset=tuple(offsets[0]))
        res0 = trace_batch(
            metric, scene.r_obs, alpha0.ravel(),
            None if metric.is_spherically_symmetric else theta0.ravel(),
            scene.theta_obs, max_steps=cfg.max_steps,
            backend=cfg.backend, precision=cfg.precision,
            two_pass=two_pass, pass1_steps=cfg.pass1_steps)
        fa0 = res0.final_alpha.reshape(resolution)
        nh0 = res0.n_half_orbits.reshape(resolution)
        out.append(fa0)

    with timer.stage("render") as out:
        base = render_lensed_image(
            src, alpha0, fa0.astype(jnp.float32),
            jnp.clip(nh0, 0, cfg.winding_max).astype(jnp.uint16),
            alpha_crit, fov, cfg.render_loop_around, psi=scene.psi,
            theta_lookup=theta0, sampling=cfg.sampling)
        out.append(base)

    with timer.stage("refine") as out:
        score = edge_score(fa0, nh0, base)
        _, idx = lax.top_k(score.ravel(), k)
        al_r, th_r = _refine_angles(idx, resolution, fov, offsets,
                                    scene, dtype)
        res_r = trace_batch(
            metric, scene.r_obs, al_r.ravel(),
            None if metric.is_spherically_symmetric else th_r.ravel(),
            scene.theta_obs, max_steps=cfg.max_steps,
            backend=cfg.backend, precision=cfg.precision,
            two_pass=two_pass, pass1_steps=cfg.pass1_steps)
        fa_r = res_r.final_alpha.reshape(aa_samples - 1, k)
        nh_r = res_r.n_half_orbits.reshape(aa_samples - 1, k)
        # Each refinement sample rendered to a color: the renderer body
        # is elementwise in the lookups, so (S-1, K) works as an "image".
        colors_r = render_lensed_image(
            src, al_r, fa_r.astype(jnp.float32),
            jnp.clip(nh_r, 0, cfg.winding_max).astype(jnp.uint16),
            alpha_crit, fov, cfg.render_loop_around, psi=scene.psi,
            theta_lookup=th_r, sampling=cfg.sampling)
        grayscale = base.ndim == 2
        base_flat = (base.reshape(n_px, 1) if grayscale
                     else base.reshape(n_px, -1))
        col_r = (colors_r.reshape(aa_samples - 1, k, 1) if grayscale
                 else colors_r.reshape(aa_samples - 1, k, -1))
        refined = (base_flat[idx] + col_r.sum(axis=0)) / aa_samples
        img_flat = base_flat.at[idx].set(refined.astype(base.dtype))
        img = img_flat.reshape(base.shape).astype(base.dtype)
        out.append(img)

    stats = dict(
        alpha_crit=alpha_crit,
        total_rays=n_px + (aa_samples - 1) * k,
        traced_rays=n_px + (aa_samples - 1) * k,
        uniform_aa_rays=n_px * aa_samples,
        refined_pixels=k,
        refined_idx=idx,
        edge_pixels=int(jnp.sum(score >= _W_WINDING)),
        aa_samples=aa_samples,
        refine_frac=refine_frac,
        timings=timer.finish())
    return img, stats
