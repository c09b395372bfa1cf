"""Multi-device tile-DP tests on the virtual 8-device CPU mesh (SURVEY §4e)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from light_path_tracer_tpu.models import Schwarzschild, Kerr
from light_path_tracer_tpu.parallel.mesh import make_mesh
from light_path_tracer_tpu.parallel.tiles import trace_grid_sharded
from light_path_tracer_tpu.ops import trace_rays_kerr, trace_rays_schwarzschild
from light_path_tracer_tpu import camera


pytestmark = pytest.mark.slow  # full-matrix lane: --runslow

DIM = (24, 16)
FOV = camera.fov_from_vertical(np.radians(40.0), DIM)
R_OBS = 100.0


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_kerr_sharded_equals_single_device():
    mesh = make_mesh()
    alpha = camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64)
    theta = camera.build_theta_lookup(DIM, FOV, dtype=jnp.float64)
    m = Kerr(M=1.0, a=0.9)
    res = trace_rays_kerr(
        m, R_OBS, alpha.ravel(), theta.ravel(), np.pi / 2,
        jnp.zeros(alpha.size, bool), 5000.0, 200000)
    fa_1 = np.asarray(res.final_alpha.reshape(DIM))

    # Both layouts agree with the single-device result to the last ulp
    # (different batch shapes may vectorize with different FMA
    # contraction, so exact bitwise equality is not guaranteed).
    ok = np.isfinite(fa_1)
    for layout in ("bands", "stripes"):
        fa, nh, st = trace_grid_sharded(m, R_OBS, alpha, theta, mesh=mesh,
                                        layout=layout)
        np.testing.assert_array_equal(
            np.asarray(st), np.asarray(res.status.reshape(DIM)))
        np.testing.assert_array_equal(
            np.asarray(nh), np.asarray(res.n_half_orbits.reshape(DIM)))
        assert (np.isfinite(np.asarray(fa)) == ok).all()
        np.testing.assert_allclose(np.asarray(fa)[ok], fa_1[ok],
                                   rtol=1e-12)


def test_schwarzschild_sharded_equals_single_device():
    mesh = make_mesh()
    alpha = camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64)
    m = Schwarzschild(M=1.0)
    fa, nh, st = trace_grid_sharded(m, R_OBS, alpha, mesh=mesh)
    res = trace_rays_schwarzschild(m, R_OBS, alpha.ravel())
    np.testing.assert_array_equal(
        np.asarray(fa), np.asarray(res.final_alpha.reshape(DIM)))


def test_row_padding_non_divisible():
    """Row counts not divisible by the mesh size are padded internally."""
    mesh = make_mesh()
    dim = (21, 16)   # 21 rows over 8 devices
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    alpha = camera.build_alpha_lookup(dim, fov, dtype=jnp.float64)
    m = Schwarzschild(M=1.0)
    fa, _, st = trace_grid_sharded(m, R_OBS, alpha, mesh=mesh)
    assert fa.shape == dim
    res = trace_rays_schwarzschild(m, R_OBS, alpha.ravel())
    np.testing.assert_array_equal(
        np.asarray(fa), np.asarray(res.final_alpha.reshape(dim)))


def test_subset_mesh():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    alpha = camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64)
    m = Schwarzschild(M=1.0)
    fa, _, _ = trace_grid_sharded(m, R_OBS, alpha, mesh=mesh)
    assert fa.shape == DIM


def test_graft_entry_contract():
    """The driver contract: entry() jit-compiles; dryrun_multichip runs."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    jax.block_until_ready(out)

    mod.dryrun_multichip(8)


def test_disk_sharded_equals_single_device():
    """Disk-mode tile DP: crossings, azimuths, and escape headings match
    the single-device trace across the mesh."""
    from light_path_tracer_tpu.disk import trace_disk_rays, DiskConfig
    from light_path_tracer_tpu.parallel.tiles import trace_disk_grid_sharded

    mesh = make_mesh()
    dim = (24, 16)
    alpha = camera.build_alpha_lookup(dim, FOV, dtype=jnp.float64)
    theta = camera.build_theta_lookup(dim, FOV, dtype=jnp.float64)
    m = Kerr(M=1.0, a=0.9)
    disk = DiskConfig()
    single = trace_disk_rays(m, R_OBS, alpha.ravel(), theta.ravel(),
                             np.radians(80.0), 5000.0, 200000, disk,
                             backend="xla")
    sharded = trace_disk_grid_sharded(m, R_OBS, alpha, theta,
                                      np.radians(80.0), disk, mesh=mesh,
                                      backend="xla")
    np.testing.assert_array_equal(np.asarray(sharded.n_hits),
                                  np.asarray(single.n_hits).reshape(dim))
    np.testing.assert_array_equal(np.asarray(sharded.status),
                                  np.asarray(single.status).reshape(dim))
    hit = np.asarray(single.n_hits).reshape(dim) > 0
    assert hit.sum() > 20
    np.testing.assert_allclose(
        np.asarray(sharded.r_hits[0])[hit],
        np.asarray(single.r_hits[0]).reshape(dim)[hit], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sharded.phi_hits[0])[hit],
        np.asarray(single.phi_hits[0]).reshape(dim)[hit], rtol=1e-12)
    esc = np.isfinite(np.asarray(single.final_alpha).reshape(dim))
    np.testing.assert_allclose(
        np.asarray(sharded.final_alpha)[esc],
        np.asarray(single.final_alpha).reshape(dim)[esc], rtol=1e-12)


def test_kerr_newman_sharded_equals_single_device():
    """Charged metrics ride the same mesh path (the tile DP is
    metric-generic)."""
    from light_path_tracer_tpu.models import KerrNewman
    mesh = make_mesh()
    alpha = camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64)
    theta = camera.build_theta_lookup(DIM, FOV, dtype=jnp.float64)
    m = KerrNewman(M=1.0, a=0.6, Q=0.6)
    res = trace_rays_kerr(
        m, R_OBS, alpha.ravel(), theta.ravel(), np.pi / 2,
        jnp.zeros(alpha.size, bool), 5000.0, 200000)
    fa_1 = np.asarray(res.final_alpha.reshape(DIM))
    ok = np.isfinite(fa_1)
    fa, nh, st = trace_grid_sharded(m, R_OBS, alpha, theta, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(st), np.asarray(res.status.reshape(DIM)))
    np.testing.assert_array_equal(
        np.asarray(nh), np.asarray(res.n_half_orbits.reshape(DIM)))
    assert (np.isfinite(np.asarray(fa)) == ok).all()
    # rtol 1e-11 (vs the Kerr test's 1e-12): the sharded batch shape
    # vectorizes with different FMA contraction and one near-grazing
    # lane lands at 2.3e-12 relative.
    np.testing.assert_allclose(np.asarray(fa)[ok], fa_1[ok], rtol=1e-11)


def test_volumetric_sharded_equals_single_device():
    """Volumetric tile DP: the sharded path-integral grid matches the
    single-device trace (tolerance: different batch shapes may
    vectorize with different FMA contraction)."""
    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_volumetric
    from light_path_tracer_tpu.parallel.tiles import (
        trace_volumetric_grid_sharded)
    from light_path_tracer_tpu.volumetric import RIAFConfig, make_emission_fn

    mesh = make_mesh()
    alpha = camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64)
    theta = camera.build_theta_lookup(DIM, FOV, dtype=jnp.float64)
    m = Kerr(M=1.0, a=0.9)
    fn = make_emission_fn(m, RIAFConfig())
    res1 = trace_rays_volumetric(m, R_OBS, alpha.ravel(), theta.ravel(),
                                 np.pi / 2, fn, 5000.0, 200000)
    em1 = np.asarray(res1.emission.reshape(DIM))

    res = trace_volumetric_grid_sharded(m, R_OBS, alpha, theta,
                                        np.pi / 2, fn, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(res.status),
                                  np.asarray(res1.status.reshape(DIM)))
    np.testing.assert_allclose(np.asarray(res.emission), em1,
                               rtol=1e-10, atol=1e-12)
    assert int(res.n_steps) > 0
    assert np.all(np.asarray(res.optical_depth) == 0.0)  # thin mode


def test_surface_sharded_equals_single_device():
    """Stellar-surface tile DP: sharded hit coordinates/momenta match
    the single-device trace, and the rendered star image is identical
    through render_star(mesh=...)."""
    from light_path_tracer_tpu.ops.kerr_trace import (CAPTURED,
                                                      trace_rays_surface)
    from light_path_tracer_tpu.parallel.tiles import (
        trace_surface_grid_sharded)
    from light_path_tracer_tpu.star import StarConfig, render_star
    from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                    SceneConfig)

    mesh = make_mesh()
    alpha = camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64)
    theta = camera.build_theta_lookup(DIM, FOV, dtype=jnp.float64)
    m = Kerr(M=1.0, a=0.0)
    res1 = trace_rays_surface(m, R_OBS, alpha.ravel(), theta.ravel(),
                              np.pi / 2, 5.0, 5000.0, 200000)
    res = trace_surface_grid_sharded(m, R_OBS, alpha, theta,
                                     np.pi / 2, 5.0, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(res.status), np.asarray(res1.status.reshape(DIM)))
    cap = np.asarray(res.status) == CAPTURED
    assert cap.any()
    for field in ("theta", "phi", "p_r", "xi"):
        np.testing.assert_allclose(
            np.asarray(getattr(res, field))[cap],
            np.asarray(getattr(res1, field).reshape(DIM))[cap],
            rtol=1e-10, atol=1e-12)

    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2, vertical_fov_deg=6.0)
    cfg = RenderConfig(backend="xla", dtype="float64")
    star = StarConfig(radius=5.0, omega=0.02)
    img1, st1 = render_star(scene, (32, 32), cfg, star)
    img8, st8 = render_star(scene, (32, 32), cfg, star, mesh=mesh)
    np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                               rtol=1e-6, atol=1e-9)
    assert st8["captured"] == st1["captured"]


def test_spectral_and_polarized_sharded_equal_single_device():
    """The generic coupled-extras traces ride the same tile DP:
    spectral band images and polarized Stokes maps match the
    single-device paths through the mesh= arguments."""
    from light_path_tracer_tpu.volumetric import (
        RIAFConfig, render_volumetric_spectrum)
    from light_path_tracer_tpu.polarization import (
        render_polarized_volumetric)
    from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                    SceneConfig)

    mesh = make_mesh()
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=R_OBS,
                        theta_obs=np.pi / 2, vertical_fov_deg=16.0)
    cfg = RenderConfig(backend="xla", dtype="float64")
    riaf = RIAFConfig(g_power=4.0, alpha0=1.0, opacity_index=2.0)
    freqs = (0.5, 2.0)
    _i1, st1 = render_volumetric_spectrum(scene, (16, 16), freqs, cfg,
                                          riaf)
    _i8, st8 = render_volumetric_spectrum(scene, (16, 16), freqs, cfg,
                                          riaf, mesh=mesh)
    np.testing.assert_allclose(st8["emission"], st1["emission"],
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(st8["tau_hat"], st1["tau_hat"],
                               rtol=1e-10, atol=1e-14)

    pr = RIAFConfig()
    evpa1, pf1, i1, _s1 = render_polarized_volumetric(
        scene, (16, 16), cfg, pr)
    evpa8, pf8, i8, _s8 = render_polarized_volumetric(
        scene, (16, 16), cfg, pr, mesh=mesh)
    np.testing.assert_allclose(i8, i1, rtol=1e-10, atol=1e-14)
    fin = np.isfinite(evpa1)
    np.testing.assert_array_equal(fin, np.isfinite(evpa8))
    np.testing.assert_allclose(evpa8[fin], evpa1[fin],
                               rtol=1e-8, atol=1e-10)


def test_polarized_disk_sharded_equal_single_device():
    """Polarized-disk tile DP (render_polarization mesh= →
    trace_disk_grid_sharded with record_momentum): EVPA / pol-frac /
    intensity maps match the single-device path."""
    from light_path_tracer_tpu.disk import DiskConfig
    from light_path_tracer_tpu.polarization import render_polarization
    from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                    SceneConfig)

    mesh = make_mesh()
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=R_OBS,
                        theta_obs=np.radians(60.0),
                        vertical_fov_deg=16.0)
    cfg = RenderConfig(backend="xla", dtype="float64")
    disk = DiskConfig(r_out=18.0)
    e1, p1, i1, st1 = render_polarization(scene, (24, 24), cfg, disk)
    e8, p8, i8, st8 = render_polarization(scene, (24, 24), cfg, disk,
                                          mesh=mesh)
    np.testing.assert_allclose(i8, i1, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(p8, p1, rtol=1e-10, atol=1e-14)
    fin = np.isfinite(e1)
    np.testing.assert_array_equal(fin, np.isfinite(e8))
    np.testing.assert_allclose(e8[fin], e1[fin], rtol=1e-8, atol=1e-10)
    assert st8["disk_pixels"] == st1["disk_pixels"]


def test_volumetric_absorbed_sharded_equals_single_device():
    """Self-absorbed transfer rides the same tile DP: sharded
    (emission, optical depth) match the single-device trace."""
    from light_path_tracer_tpu.ops.kerr_trace import trace_rays_volumetric
    from light_path_tracer_tpu.parallel.tiles import (
        trace_volumetric_grid_sharded)
    from light_path_tracer_tpu.volumetric import (RIAFConfig,
                                                  make_transfer_fns)

    mesh = make_mesh()
    alpha = camera.build_alpha_lookup(DIM, FOV, dtype=jnp.float64)
    theta = camera.build_theta_lookup(DIM, FOV, dtype=jnp.float64)
    m = Kerr(M=1.0, a=0.9)
    em_fn, ab_fn = make_transfer_fns(m, RIAFConfig(alpha0=0.3))
    assert ab_fn is not None
    res1 = trace_rays_volumetric(m, R_OBS, alpha.ravel(), theta.ravel(),
                                 np.pi / 2, em_fn, 5000.0, 200000,
                                 absorption_fn=ab_fn)
    res = trace_volumetric_grid_sharded(m, R_OBS, alpha, theta,
                                        np.pi / 2, em_fn, mesh=mesh,
                                        absorption_fn=ab_fn)
    np.testing.assert_allclose(
        np.asarray(res.emission),
        np.asarray(res1.emission.reshape(DIM)), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res.optical_depth),
        np.asarray(res1.optical_depth.reshape(DIM)),
        rtol=1e-10, atol=1e-12)
    assert float(np.asarray(res.optical_depth).max()) > 0.1


def test_decomposed_volumetric_sharded_equals_single_device():
    """The photon-ring decomposition rides the same spectral tile DP:
    sharded order layers + winding map match the single-device trace."""
    from light_path_tracer_tpu.volumetric import (
        RIAFConfig, render_volumetric_decomposed)
    from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                    SceneConfig)

    mesh = make_mesh()
    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=R_OBS,
                        theta_obs=np.radians(30.0),
                        vertical_fov_deg=16.0)
    cfg = RenderConfig(backend="xla", dtype="float64")
    riaf = RIAFConfig(alpha0=0.3)
    l1, st1 = render_volumetric_decomposed(scene, (16, 16), cfg, riaf,
                                           n_orders=3)
    l8, st8 = render_volumetric_decomposed(scene, (16, 16), cfg, riaf,
                                           n_orders=3, mesh=mesh)
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(st8["winding"], st1["winding"],
                               rtol=1e-10, atol=1e-14)


def test_source_plane_modes_sharded_equal_single_device():
    """Caustics / microlens / time-delay tile DP: the mesh-routed
    raw-escape trace (trace_surface_grid_sharded) reproduces the
    single-device source-plane products."""
    from light_path_tracer_tpu.pipeline import (render_caustics,
                                                render_microlens_curve,
                                                render_time_delay)
    from light_path_tracer_tpu.utils.config import (RenderConfig,
                                                    SceneConfig)

    mesh = make_mesh()
    scene = SceneConfig(M=1.0, a=0.4, r_obs_mult=1000.0,
                        vertical_fov_deg=40.0)
    cfg = RenderConfig(dtype="float64")

    a1, _e1, s1 = render_caustics(scene, (48, 48), cfg, bins=16)
    a8, _e8, s8 = render_caustics(scene, (48, 48), cfg, bins=16,
                                  mesh=mesh)
    np.testing.assert_allclose(np.asarray(a8), np.asarray(a1),
                               rtol=1e-8, atol=1e-10)

    u1, c1, _ = render_microlens_curve(scene, (48, 48), cfg,
                                       n_points=7)
    u8, c8, _ = render_microlens_curve(scene, (48, 48), cfg,
                                       n_points=7, mesh=mesh)
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c1),
                               rtol=1e-8, atol=1e-10)

    t1, st1 = render_time_delay(scene, (48, 48), cfg)
    t8, st8 = render_time_delay(scene, (48, 48), cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1),
                               rtol=1e-8, atol=1e-8)
    assert st8["shadow_pixels"] == st1["shadow_pixels"]
