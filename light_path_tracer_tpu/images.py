"""Strong-lensing image-position solver: all images of a point source.

Given a point source at gnomonic sky position beta = (beta_x, beta_y)
(radians, about the BH direction — render.world_escape_beta's chart),
find every image the lens forms: the classic strong-lensing observable
set (positions, signed magnifications/parities, winding orders, and
relative Fermat time delays — the full "lensed quasar" data vector,
computed exactly in the strong field instead of the thin-lens
approximation).

No reference counterpart (/root/reference has no source-plane products
at all); this composes the framework's existing machinery:

  1. COARSE PASS — one standard traced grid (pipeline._trace_escape_beta,
     optionally mesh-sharded) gives the side-exact lens map
     beta(pixel) on the full screen.
  2. CELL DETECTION — the map is piecewise-linearized on the two
     triangles of every 2x2 pixel cell; a triangle whose source-plane
     image contains beta yields a candidate (the standard
     image-finding construction of thin-lens codes, here applied to
     the exact traced map). Barycentric coordinates give the subpixel
     seed for free.
  3. NEWTON REFINEMENT — a batched 5-point stencil (center + central
     differences in both pixel axes) is retraced per candidate in
     float64 and Newton-iterated on F(pixel) = beta(pixel) - beta_target.
     Stencils are padded to a static max_images so every iteration is
     the SAME compiled program (one small dispatch per iteration).
  4. PRODUCTS — at the converged pixel the same stencil provides the
     signed magnification as the ratio of gnomonic solid-angle
     elements (the scattered-point analogue of render.magnification_map),
     the winding order from the trace, and the Fermat arrival time
     tau = t - X.v via render.fermat_tau (record_time riding the
     integrator exactly as pipeline.render_time_delay).

Resolution limits: images closer together than ~1 coarse-grid pixel
merge (the exponentially stacked relativistic images hug the shadow
edge at e^{-2 pi n} spacings — order n >= 2 needs an absurdly fine
grid; order 0 and 1 are routine). Weak-field oracles (image positions
theta+-, magnifications mu+-, the Refsdal delay) are pinned in
tests/test_images.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu import camera
from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.utils.timing import StageTimer


@dataclass(frozen=True)
class LensedImage:
    """One image of the point source."""

    py: float             # refined pixel row (fractional)
    px: float             # refined pixel column (fractional)
    alpha_rad: float      # angular offset from the BH direction
    screen_theta_rad: float   # screen azimuth about the BH direction
    mu: float             # signed magnification (mu < 0: odd parity)
    winding: int          # n_half_orbits of the image ray
    tau: float            # Fermat arrival time [M] (relative; see below)
    beta_residual: float  # |beta(pixel) - beta_target| [rad] after Newton
    converged: bool

    @property
    def parity(self) -> int:
        return -1 if self.mu < 0 else 1

    @property
    def delay(self) -> float:
        """Alias: tau is already referenced to the earliest image."""
        return self.tau


def _triangle_candidates(bx, by, beta, tol: float = 1e-6):
    """Subpixel seeds from the piecewise-linear lens map.

    bx/by: (H, W) source coordinates of the coarse grid (NaN where
    captured/invalid). Each 2x2 cell is split into two triangles;
    a triangle contains an image of `beta` iff the barycentric
    coordinates of beta w.r.t. its source-plane vertices all lie in
    [0, 1] (up to `tol` — images exactly on shared edges are then
    claimed by both triangles and deduplicated by the caller).
    Returns (K, 2) float seeds (py, px), barycentric-interpolated.
    """
    H, W = bx.shape
    iy, ix = np.mgrid[0:H - 1, 0:W - 1]
    # Corner source positions and pixel positions per cell.
    corners = {
        "00": (bx[:-1, :-1], by[:-1, :-1], iy, ix),
        "01": (bx[:-1, 1:], by[:-1, 1:], iy, ix + 1),
        "10": (bx[1:, :-1], by[1:, :-1], iy + 1, ix),
        "11": (bx[1:, 1:], by[1:, 1:], iy + 1, ix + 1),
    }
    seeds = []
    # Triangles: (00, 01, 10) and (11, 10, 01) — together they tile
    # the cell along the main anti-diagonal.
    for tri in (("00", "01", "10"), ("11", "10", "01")):
        (ax, ay, apy, apx), (bx_, by_, bpy, bpx), (cx, cy, cpy, cpx) = (
            corners[k] for k in tri)
        finite = (np.isfinite(ax) & np.isfinite(ay) & np.isfinite(bx_)
                  & np.isfinite(by_) & np.isfinite(cx) & np.isfinite(cy))
        e1x, e1y = bx_ - ax, by_ - ay
        e2x, e2y = cx - ax, cy - ay
        det = e1x * e2y - e1y * e2x
        px_, py_ = beta[0] - ax, beta[1] - ay
        safe = np.where(np.abs(det) > 1e-30, det, 1.0)
        w_b = (px_ * e2y - py_ * e2x) / safe
        w_c = (e1x * py_ - e1y * px_) / safe
        w_a = 1.0 - w_b - w_c
        inside = (finite & (np.abs(det) > 1e-30)
                  & (w_a >= -tol) & (w_b >= -tol) & (w_c >= -tol))
        if not inside.any():
            continue
        wa, wb, wc = w_a[inside], w_b[inside], w_c[inside]
        spy = wa * apy[inside] + wb * bpy[inside] + wc * cpy[inside]
        spx = wa * apx[inside] + wb * bpx[inside] + wc * cpx[inside]
        seeds.append(np.stack([spy, spx], axis=-1))
    if not seeds:
        return np.zeros((0, 2))
    return np.concatenate(seeds, axis=0)


def _dedup(points, radius):
    """Greedy distance dedup: keep the first point of every cluster."""
    kept = []
    for p in points:
        if all(np.hypot(p[0] - q[0], p[1] - q[1]) >= radius
               for q in kept):
            kept.append(p)
    return np.asarray(kept) if kept else np.zeros((0, 2))


def _stencil_trace(metric, scene, cfg, resolution, fov, py, px, eps,
                   record_time):
    """Trace the 5-point FD stencil of K candidate pixels in float64.

    Returns (bx, by, res): (5, K) source coordinates (NaN where not
    escaped) and the raw SurfaceResult (flat (5K,)). Stencil order:
    [center, +px, -px, +py, -py].
    """
    from light_path_tracer_tpu import render as _render
    from light_path_tracer_tpu.ops.kerr_trace import (trace_rays_surface,
                                                      ESCAPED)

    import jax

    k = py.shape[0]
    off_y = np.array([0.0, 0.0, 0.0, eps, -eps])
    off_x = np.array([0.0, eps, -eps, 0.0, 0.0])
    sy = (py[None, :] + off_y[:, None]).ravel()
    sx = (px[None, :] + off_x[:, None]).ravel()
    # float64 when available (delays need it: t ~ 4 r_obs while image
    # delays are a few M); silently f32 otherwise (base.py:79 pattern).
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    al, th = camera.pixel_angles_at(
        sy, sx, resolution, fov, psi=scene.psi, dtype=dtype,
        boost=scene.boost)
    r_obs = scene.r_obs
    res = trace_rays_surface(
        metric, r_obs, al, th, scene.theta_obs,
        r_surface=float(metric.capture_radius()),
        lambda_max=max(5000.0, 6.0 * r_obs),
        max_steps=cfg.max_steps, precision=cfg.precision,
        method=cfg.integrator, record_time=record_time)
    bx, by = _render.world_escape_beta(
        metric, 2.0 * r_obs, res.theta, res.phi, res.p_r, res.p_theta,
        res.xi, res.status == ESCAPED, scene.theta_obs)
    return (np.asarray(bx).reshape(5, k),
            np.asarray(by).reshape(5, k), res)


def find_point_images(scene: SceneConfig, beta,
                      resolution=(512, 512),
                      cfg: RenderConfig = RenderConfig(),
                      max_images: int = 16,
                      refine_iters: int = 8,
                      fd_eps_px: float = 0.05,
                      mesh=None):
    """Find all images of a point source at `beta` = (beta_x, beta_y)
    [rad, gnomonic about the BH direction].

    The coarse pass runs at `cfg`'s dtype/precision (and shards over
    `mesh` if given); the Newton refinement and all per-image products
    are always float64 (delays need it: t ~ 4 r_obs while image delays
    are a few M). Returns (images, stats): a list of LensedImage sorted
    by arrival time (tau = 0 at the earliest converged image), and the
    usual stats dict.
    """
    from light_path_tracer_tpu import render as _render
    from light_path_tracer_tpu.ops.kerr_trace import ESCAPED
    from light_path_tracer_tpu.pipeline import (_metric_5d,
                                                _trace_escape_beta)

    timer = StageTimer()
    resolution = tuple(resolution)
    fov = camera.fov_from_vertical(scene.vertical_fov, resolution)
    beta = (float(beta[0]), float(beta[1]))
    metric = _metric_5d(scene.metric())

    with timer.stage("precompute") as out:
        bx, by, res_grid, _th = _trace_escape_beta(
            scene, cfg, resolution, fov, mesh=mesh)
        out.append(bx)

    with timer.stage("detect"):
        seeds = _triangle_candidates(np.asarray(bx, np.float64),
                                     np.asarray(by, np.float64), beta)
        seeds = _dedup(seeds, radius=0.75)
        n_candidates = len(seeds)
        seeds = seeds[:max_images]

    if len(seeds) == 0:
        stats = {
            "timings": timer.finish(),
            "total_rays": int(np.prod(resolution)),
            "traced_rays": int(np.prod(resolution)),
            "integrator_steps": int(res_grid.n_steps),
            "n_candidates": 0,
            "n_images": 0,
        }
        return [], stats

    # Pad to the static max_images so every Newton iteration reuses
    # one compiled stencil program regardless of how many candidates
    # this beta produced.
    k = max_images
    pos = np.full((k, 2), resolution[0] / 2.0)
    pos[:len(seeds)] = seeds
    alive = np.zeros(k, dtype=bool)
    alive[:len(seeds)] = True
    h_px = 1.0  # Newton step clamp [pixels]

    with timer.stage("refine"):
        residual = np.full(k, np.inf)
        for _ in range(refine_iters):
            sbx, sby, _res = _stencil_trace(
                metric, scene, cfg, resolution, fov,
                pos[:, 0], pos[:, 1], fd_eps_px, record_time=False)
            fx_ = sbx[0] - beta[0]
            fy_ = sby[0] - beta[1]
            residual = np.hypot(fx_, fy_)
            # J columns: d(beta)/d(px), d(beta)/d(py).
            j11 = (sbx[1] - sbx[2]) / (2 * fd_eps_px)   # dbx/dpx
            j21 = (sby[1] - sby[2]) / (2 * fd_eps_px)   # dby/dpx
            j12 = (sbx[3] - sbx[4]) / (2 * fd_eps_px)   # dbx/dpy
            j22 = (sby[3] - sby[4]) / (2 * fd_eps_px)   # dby/dpy
            det = j11 * j22 - j12 * j21
            ok = np.isfinite(det) & (np.abs(det) > 1e-30) \
                & np.isfinite(fx_) & np.isfinite(fy_)
            alive &= ok
            safe = np.where(ok, det, 1.0)
            dpx = -(j22 * fx_ - j12 * fy_) / safe
            dpy = -(-j21 * fx_ + j11 * fy_) / safe
            step = np.hypot(dpx, dpy)
            scale = np.where(step > h_px, h_px / np.maximum(step, 1e-30),
                             1.0)
            pos[:, 1] += np.where(alive, dpx * scale, 0.0)
            pos[:, 0] += np.where(alive, dpy * scale, 0.0)

    with timer.stage("products") as out:
        sbx, sby, res = _stencil_trace(
            metric, scene, cfg, resolution, fov,
            pos[:, 0], pos[:, 1], fd_eps_px, record_time=True)
        fx_ = sbx[0] - beta[0]
        fy_ = sby[0] - beta[1]
        residual = np.hypot(fx_, fy_)
        # Convergence: within a small fraction of a source-plane
        # pixel (the local Jacobian maps fd_eps_px pixels to source
        # angle, so a fixed angular tolerance would be magnification-
        # dependent; use the pixel-scale angle instead).
        px_angle = fov[1] / resolution[0]
        converged = alive & (residual < 0.05 * px_angle)

        # Signed magnification: ratio of signed gnomonic solid-angle
        # elements, d Omega_img / d Omega_src (the scattered-point
        # analogue of render.magnification_map). Image side: the
        # pinhole chart (x_cam, y_cam) has constant Jacobian
        # 1/(fx fy) per pixel^2 and measure (1 + x^2 + y^2)^{-3/2};
        # source side: det d(beta)/d(pixel) with measure
        # (1 + beta^2)^{-3/2}.
        j11 = (sbx[1] - sbx[2]) / (2 * fd_eps_px)
        j21 = (sby[1] - sby[2]) / (2 * fd_eps_px)
        j12 = (sbx[3] - sbx[4]) / (2 * fd_eps_px)
        j22 = (sby[3] - sby[4]) / (2 * fd_eps_px)
        det_src = j11 * j22 - j12 * j21
        fxl, fyl = camera.focal_lengths(resolution, fov)
        x_cam = (pos[:, 1] - resolution[1] / 2) / fxl
        y_cam = (pos[:, 0] - resolution[0] / 2) / fyl
        a_img = (1.0 / (fxl * fyl)
                 / (1.0 + x_cam ** 2 + y_cam ** 2) ** 1.5)
        b2 = sbx[0] ** 2 + sby[0] ** 2
        a_src = det_src / (1.0 + b2) ** 1.5
        safe_src = np.where(np.abs(a_src) > 1e-300, a_src, np.inf)
        mu = a_img / safe_src

        # Fermat arrival times of the stencil centers.
        tau_all = np.asarray(_render.fermat_tau(
            metric, 2.0 * scene.r_obs, res.theta, res.phi, res.p_r,
            res.p_theta, res.xi, res.t_hit,
            res.status == ESCAPED)).reshape(5, k)[0]
        winding = np.asarray(res.n_half_orbits).reshape(5, k)[0]
        out.append(res.t_hit)

    # Assemble, dedup refined positions (two seeds can converge to the
    # same image), reference tau to the earliest converged image.
    order = np.argsort(np.where(np.isfinite(tau_all), tau_all, np.inf))
    images: list[LensedImage] = []
    taken: list[tuple[float, float]] = []
    tau0 = None
    for i in order:
        if not converged[i]:
            continue
        p = (float(pos[i, 0]), float(pos[i, 1]))
        if any(math.hypot(p[0] - q[0], p[1] - q[1]) < 0.5
               for q in taken):
            continue
        taken.append(p)
        al, th = camera.pixel_angles_at(
            np.array([p[0]]), np.array([p[1]]), resolution, fov,
            psi=scene.psi, dtype=jnp.float32, boost=scene.boost)
        tau_i = float(tau_all[i])
        if tau0 is None and np.isfinite(tau_i):
            tau0 = tau_i
        images.append(LensedImage(
            py=p[0], px=p[1],
            alpha_rad=float(np.asarray(al)[0]),
            screen_theta_rad=float(np.asarray(th)[0]),
            mu=float(mu[i]),
            winding=int(winding[i]),
            tau=tau_i - (tau0 or 0.0),
            beta_residual=float(residual[i]),
            converged=True,
        ))

    stats = {
        "timings": timer.finish(),
        "total_rays": int(np.prod(resolution)) + 5 * k * (refine_iters
                                                          + 1),
        "traced_rays": int(np.prod(resolution)),
        "integrator_steps": int(res_grid.n_steps),
        "n_candidates": int(n_candidates),
        "n_images": len(images),
        "total_abs_mu": float(sum(abs(im.mu) for im in images)),
    }
    return images, stats


def format_image_table(images, stats=None) -> str:
    """Human-readable table of a find_point_images result."""
    lines = ["  #  py        px        alpha[deg]  theta[deg]  "
             "mu          parity  wind  delay[M]"]
    for i, im in enumerate(images):
        lines.append(
            f"  {i:<2d} {im.py:<9.2f} {im.px:<9.2f} "
            f"{np.degrees(im.alpha_rad):<11.4f} "
            f"{np.degrees(im.screen_theta_rad):<11.2f} "
            f"{im.mu:<11.4g} {im.parity:+d}      {im.winding:<5d} "
            f"{im.tau:.4f}")
    if stats is not None:
        lines.append(f"  ({stats['n_candidates']} candidates -> "
                     f"{stats['n_images']} images; sum|mu| = "
                     f"{stats.get('total_abs_mu', float('nan')):.4f})")
    return "\n".join(lines)
