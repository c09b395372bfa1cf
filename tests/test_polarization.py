"""Polarization tests.

The load-bearing oracle is numerical: starting from a camera pixel's
photon, the polarization vector is parallel-transported along the
geodesic by direct integration (Christoffel symbols from autodiff of
the covariant Kerr metric — an implementation with NOTHING in common
with the Walker-Penrose algebra), and the Walker-Penrose constant
evaluated from polarization.walker_penrose must stay constant along
the whole path. This pins the WP formula, the k reconstruction, and
the metric components in one test.

The EVPA-pattern tests pin the screen-orientation convention through
physics: a toroidal field seen nearly face-on must give image-radial
ticks in the weak field (E ~ k x B), a radial field azimuthal ticks,
and an a=0 scene must be mirror-symmetric.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu.utils.config import SceneConfig, RenderConfig
from light_path_tracer_tpu.disk import DiskConfig
from light_path_tracer_tpu.models import Kerr
from light_path_tracer_tpu import polarization as pol

CFG = RenderConfig(backend="xla", dtype="float64")


def _g4(M, a):
    """Full covariant BL metric as a (4, 4) function of x = (t, r, th,
    phi) — independent input for the autodiff Christoffels."""
    def g(x):
        _t, r, th, _ph = x
        g_tt, g_tphi, g_rr, g_thth, g_phiphi = pol.covariant_metric(
            M, a, r, th)
        z = jnp.zeros_like(r)
        return jnp.array([[g_tt, z, z, g_tphi],
                          [z, g_rr, z, z],
                          [z, z, g_thth, z],
                          [g_tphi, z, z, g_phiphi]])
    return g


@pytest.mark.slow
def test_walker_penrose_conserved_along_transported_polarization():
    M, a = 1.0, 0.9
    metric = Kerr(M=M, a=a)
    g = _g4(M, a)

    def hamiltonian(x, p):
        ginv = jnp.linalg.inv(g(x))
        return 0.5 * p @ ginv @ p

    dg = jax.jacfwd(g)          # (4, 4, 4): dg[s, r, n] = d_n g_sr

    def rhs(state):
        x, p, f = state[:4], state[4:8], state[8:12]
        dx = jax.grad(hamiltonian, argnums=1)(x, p)       # k^mu
        dp = -jax.grad(hamiltonian, argnums=0)(x, p)
        ginv = jnp.linalg.inv(g(x))
        dgx = dg(x)
        # T[n, s, r] = d_n g_sr + d_r g_sn - d_s g_nr with
        # dgx[s, r, n] = d_n g_sr (jacfwd appends the derivative axis).
        gamma = 0.5 * jnp.einsum(
            "ms,nsr->mnr",
            ginv, (jnp.transpose(dgx, (2, 0, 1))
                   + jnp.transpose(dgx, (1, 0, 2))
                   - jnp.transpose(dgx, (0, 2, 1))))
        # gamma[m, n, r] = Gamma^m_{nr}
        df = -jnp.einsum("mnr,n,r->m", gamma, dx, f)
        return jnp.concatenate([dx, dp, df])

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def integrate(state0, h, n):
        def step(s, _):
            k1 = rhs(s)
            k2 = rhs(s + 0.5 * h * k1)
            k3 = rhs(s + 0.5 * h * k2)
            k4 = rhs(s + h * k3)
            s2 = s + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            # Freeze once inside the capture radius or far outside.
            r = s2[4 + 1 - 4]  # noqa — readability: s2[1] is r
            stop = (s2[1] < 2.2) | (s2[1] > 250.0)
            s2 = jnp.where(stop, s, s2)
            return s2, s2
        _sf, path = jax.lax.scan(step, state0, None, length=n)
        return path

    # A photon aimed just outside the shadow (it plunges close and
    # escapes — strong-field transport), plus an easier wide ray.
    for alpha_view, th_screen in [(0.06, 1.1), (0.09, -2.0)]:
        alphas = jnp.asarray([alpha_view], jnp.float64)
        thetas = jnp.asarray([th_screen], jnp.float64)
        y0, p_t, p_phi, inv = metric.initial_conditions_5d(
            100.0, alphas, thetas, np.radians(70.0))
        assert not bool(inv[0])
        x0 = jnp.array([0.0, float(y0[0][0]), float(y0[1][0]),
                        float(y0[2][0])])
        p0 = jnp.array([-1.0, float(y0[3][0]), float(y0[4][0]),
                        float(p_phi[0])])
        k0 = jnp.linalg.inv(g(x0)) @ p0
        # Transport the screen-transverse basis vector e1 (orthogonal
        # to k by construction).
        e1, _e2 = pol.observer_basis(M, a, 100.0, np.radians(70.0),
                                     tuple(k0[i] * jnp.ones(1)
                                           for i in range(4)))
        f0 = jnp.array([float(e1[i][0]) for i in range(4)])
        state0 = jnp.concatenate([x0, p0, f0])

        path = integrate(state0, 0.05, 6000)
        xs, ps, fs = path[:, :4], path[:, 4:8], path[:, 8:12]
        rs, ths = xs[:, 1], xs[:, 2]
        ks = jnp.einsum("nij,nj->ni",
                        jnp.linalg.inv(jax.vmap(g)(xs)), ps)

        k1s, k2s = pol.walker_penrose(
            a, rs, ths,
            tuple(ks[:, i] for i in range(4)),
            tuple(fs[:, i] for i in range(4)))
        kap = np.stack([np.asarray(k1s), np.asarray(k2s)], axis=1)
        mag0 = float(np.linalg.norm(kap[0]))
        assert mag0 > 1e-6
        drift = np.linalg.norm(kap - kap[0], axis=1) / mag0
        # RK4 transport at h=0.05 in f64: conservation to ~1e-5.
        assert float(drift.max()) < 1e-4, drift.max()

        # The transported f stays orthogonal to k (consistency of the
        # transport integration itself).
        gs = jax.vmap(g)(xs)
        fk = jnp.einsum("ni,nij,nj->n", fs, gs, ks)
        assert float(jnp.abs(fk).max()) < 1e-6


def _render(a, inc_deg, field, res=(64, 64), r_out=30.0):
    scene = SceneConfig(M=1.0, a=a, r_obs_mult=100.0,
                        theta_obs=np.radians(inc_deg))
    disk = DiskConfig(r_out=r_out)
    return pol.render_polarization(scene, res, CFG, disk, field=field)


def _image_angles(resolution):
    """Per-pixel angle of the image-radial direction from +x (the
    pixel-center offset from the grid center), matching the camera
    convention x right / y down."""
    h, w = resolution
    yy, xx = np.meshgrid(np.arange(h) - h / 2, np.arange(w) - w / 2,
                         indexing="ij")
    return np.arctan2(yy, xx)


def _ang_diff_mod_pi(x, y):
    d = np.mod(x - y + np.pi / 2, np.pi) - np.pi / 2
    return np.abs(d)


@pytest.mark.slow
def test_toroidal_field_gives_radial_ticks_weak_field():
    """Nearly face-on, far from the hole: B azimuthal in the image, k
    along the line of sight, so E ~ k x B is image-RADIAL. Pins the
    absolute screen-orientation convention."""
    evpa, polf, inten, st = _render(0.0, 20.0, "toroidal")
    radial = _image_angles(evpa.shape)
    good = np.isfinite(evpa) & (inten > 0) & (inten < np.nanmax(inten)
                                              * 0.05)
    assert good.sum() > 50         # outer-disk pixels (low emissivity)
    d = _ang_diff_mod_pi(evpa[good], radial[good])
    assert np.degrees(np.median(d)) < 20.0


def test_radial_field_gives_azimuthal_ticks_weak_field():
    evpa, polf, inten, st = _render(0.0, 20.0, "radial")
    radial = _image_angles(evpa.shape)
    good = np.isfinite(evpa) & (inten > 0) & (inten < np.nanmax(inten)
                                              * 0.05)
    d = _ang_diff_mod_pi(evpa[good], radial[good] + np.pi / 2)
    assert np.degrees(np.median(d)) < 20.0


@pytest.mark.slow
def test_vertical_field_faceon_weakly_polarized():
    """B parallel to the line of sight emits little synchrotron
    polarization: sin^2(xi) far below the toroidal case."""
    _e1, pol_v, inten, _s1 = _render(0.0, 15.0, "vertical")
    _e2, pol_t, _i2, _s2 = _render(0.0, 15.0, "toroidal")
    sel = inten > 0
    assert pol_v[sel].mean() < 0.4 * pol_t[sel].mean()


def test_schwarzschild_mirror_symmetry():
    """a=0 scenes are symmetric under the image left-right flip; EVPA
    (measured from +x) flips sign mod pi."""
    evpa, _p, _i, _s = _render(0.0, 60.0, "toroidal", res=(64, 64))
    flipped = -evpa[:, ::-1]
    both = np.isfinite(evpa) & np.isfinite(flipped)
    assert both.sum() > 100
    d = _ang_diff_mod_pi(evpa[both], flipped[both])
    assert np.degrees(np.median(d)) < 3.0


def test_polarization_requires_centered_camera():
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0, psi_y=0.1)
    with pytest.raises(ValueError, match="psi"):
        pol.render_polarization(scene, (8, 8), CFG, DiskConfig())


@pytest.mark.slow
def test_hotspot_qu_loop_closes_and_rotates():
    """Polarized hot-spot flare: (Q, U) traces a CLOSED loop with
    nonzero area once per orbit (the GRAVITY/EHT flare signature), and
    the total-intensity channel matches spectra.hotspot_light_curve
    exactly (same trace, same emission law)."""
    from light_path_tracer_tpu.disk import HotSpot, keplerian_omega
    from light_path_tracer_tpu.spectra import hotspot_light_curve

    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0,
                        theta_obs=np.radians(70.0))
    spot = HotSpot()
    period = abs(2 * np.pi / keplerian_omega(1.0, 0.9, spot.r0, True))
    ts = np.linspace(0.0, period, 13)
    t, I, Q, U, st = pol.hotspot_qu_loop(
        scene, (48, 48), ts, CFG, DiskConfig(), spot, field="toroidal")
    assert np.isfinite(I).all() and (I > 0).all()
    # Closure over one orbit.
    np.testing.assert_allclose([Q[0], U[0]], [Q[-1], U[-1]], rtol=1e-5)
    # The loop sweeps actual area in the (Q, U) plane (EVPA rotates).
    area = 0.5 * abs(np.sum(Q[:-1] * U[1:] - Q[1:] * U[:-1]))
    scale = max((Q.max() - Q.min()), (U.max() - U.min()))
    assert scale > 0
    assert area > 0.05 * scale ** 2
    # Total intensity agrees with the unpolarized light curve.
    _t2, flux, _s2 = hotspot_light_curve(scene, (48, 48), ts, CFG,
                                         DiskConfig(), spot)
    np.testing.assert_allclose(I, flux, rtol=1e-10)


# ---------------------------------------------------------------------
# Polarized VOLUMETRIC transfer (Stokes path integrals).
# ---------------------------------------------------------------------

def _render_volumetric_pol(a, inc_deg, field, res=(32, 32), **riaf_kw):
    from light_path_tracer_tpu.volumetric import RIAFConfig
    riaf_kw.setdefault("g_power", 3.0)
    scene = SceneConfig(M=1.0, a=a, r_obs_mult=2000.0,
                        theta_obs=np.radians(inc_deg),
                        vertical_fov_deg=16.0)
    riaf = RIAFConfig(profile="shell", shell_in=200.0, shell_out=260.0,
                      **riaf_kw)
    return pol.render_polarized_volumetric(scene, res, CFG, riaf,
                                           field=field)


@pytest.mark.slow
def test_volumetric_toroidal_radial_ticks_weak_field():
    """Distant emitting shell, near-face-on: every path element's
    E ~ k x B is image-radial for a toroidal field — the integrated
    Stokes EVPA must stay radial (same absolute-orientation oracle as
    the disk path, now through the coupled (I, Q, U) integrals)."""
    evpa, pf, inten, _st = _render_volumetric_pol(0.0, 20.0, "toroidal")
    radial = _image_angles(evpa.shape)
    good = np.isfinite(evpa) & (inten > 0.01 * inten.max())
    assert good.sum() > 200
    d = _ang_diff_mod_pi(evpa[good], radial[good])
    assert np.degrees(np.median(d)) < 5.0
    # Every element emits at p0 = 0.7; the aligned weak-field geometry
    # keeps most of it, while some sightlines beam-depolarize.
    assert np.nanmax(pf[good]) <= 0.7 + 1e-6
    assert np.nanmax(pf[good]) > 0.6


@pytest.mark.slow
def test_volumetric_radial_field_azimuthal_ticks():
    evpa, _pf, inten, _st = _render_volumetric_pol(0.0, 20.0, "radial")
    radial = _image_angles(evpa.shape)
    good = np.isfinite(evpa) & (inten > 0.01 * inten.max())
    d = _ang_diff_mod_pi(evpa[good], radial[good] + np.pi / 2)
    assert np.degrees(np.median(d)) < 5.0


@pytest.mark.slow
def test_volumetric_pol_mirror_symmetry_and_depolarization():
    """a = 0: the phi -> -phi isometry maps the PROGRADE scene to the
    image-mirrored RETROGRADE scene exactly (mirroring the image alone
    leaves the flow sense unmirrored — measured 2.5 deg EVPA residual
    from velocity aberration), so EVPA_pro(k) = -EVPA_ret(W-k).
    Line-of-sight superposition of crossed EVPAs depolarizes
    (pol_frac < p0 on a real fraction of the image)."""
    from light_path_tracer_tpu.volumetric import RIAFConfig
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0,
                        theta_obs=np.radians(75.0),
                        vertical_fov_deg=16.0)
    evpa, pf, inten, _st = pol.render_polarized_volumetric(
        scene, (32, 32), CFG, RIAFConfig(), field="toroidal")
    evpa_r, _pf_r, inten_r, _st_r = pol.render_polarized_volumetric(
        scene, (32, 32), CFG, RIAFConfig(prograde=False),
        field="toroidal")
    # Column W//2 is exactly on-axis (no half-pixel camera offset), so
    # column k mirrors to column W-k — a plain [::-1] flip is off by
    # one column (cf. test_volumetric._mirror_halves).
    ev = evpa[:, 1:]
    flipped = -evpa_r[:, :0:-1]
    both = (np.isfinite(ev) & np.isfinite(flipped)
            & (inten[:, 1:] > 0.01 * inten.max())
            & (inten_r[:, :0:-1] > 0.01 * inten_r.max()))
    assert both.sum() > 100
    d = _ang_diff_mod_pi(ev[both], flipped[both])
    assert np.degrees(np.median(d)) < 0.5
    sel = np.isfinite(pf) & (inten > 0.01 * inten.max())
    assert pf[sel].max() <= 0.7 + 1e-6
    assert (pf[sel] < 0.5).mean() > 0.1     # genuine depolarization


def test_volumetric_pol_validation():
    from light_path_tracer_tpu.volumetric import RIAFConfig
    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    with pytest.raises(ValueError, match="optically thin"):
        pol.render_polarized_volumetric(
            scene, (8, 8), CFG, RIAFConfig(alpha0=0.5))
    with pytest.raises(ValueError, match="Kerr"):
        pol.render_polarized_volumetric(
            SceneConfig(M=1.0, Q=0.5), (8, 8), CFG, RIAFConfig())
    with pytest.raises(ValueError, match="static"):
        pol.render_polarized_volumetric(
            SceneConfig(M=1.0, boost=(0.0, 0.0, 0.1)), (8, 8), CFG,
            RIAFConfig())
