"""Johannsen-Psaltis deformed Kerr: the test-GR metric family.

Johannsen & Psaltis 2011 (PRD 83, 124015) construct a stationary,
axisymmetric, asymptotically-flat deformation of Kerr used throughout
the EHT/X-ray literature to test the no-hair theorem: if astrophysical
black holes are Kerr, every shadow/disk observable must be consistent
with deformation parameter eps3 = 0. Keeping the leading deformation
h(r, theta) = eps3 M^3 r / Sigma^2, the line element is Kerr's with

    g_tt     = -(1 + h) (1 - 2 M r / Sigma)
    g_tphi   = -(2 a M r sin^2(theta) / Sigma) (1 + h)
    g_rr     = Sigma (1 + h) / (Delta + a^2 h sin^2(theta))
    g_thth   = Sigma
    g_phiphi = sin^2(theta) [r^2 + a^2 + 2 a^2 M r sin^2(theta)/Sigma]
               + h a^2 sin^2(theta) (Sigma + 2 M r) / Sigma

(Sigma, Delta as in Kerr). The key STRUCTURAL difference from every
other family in this package: the JP metric is not Petrov type D —
there is NO Carter constant, so the Kerr/Kerr-Newman separability
tricks (Bardeen screen band, (xi, eta) photon-orbit formulas, mu
chart, plunge early-exit) do not exist. What survives is exactly what
the reduced 5-D integrator actually needs — the two Killing
symmetries (t, phi cyclic => conserved p_t, p_phi) — which is why
this family runs on the UNMODIFIED hot loop with

  * `_inv_terms` = the five contravariant components from the exact
    2x2 (t, phi)-block inversion of the covariant metric above, and
  * `rhs5` = the generic jax.grad-of-Hamiltonian RHS
    (_KerrHotPath.rhs5_autodiff) — for Kerr/KN that autodiff form is
    the ORACLE for the hand-derived RHS; here it is the PRIMARY
    integrator, demonstrating the extension contract: any stationary
    axisymmetric metric is one `_inv_terms` away from full shadow /
    lensing / magnification / trajectory support.

The critical angle has no closed form without separability;
`alpha_crit` bisects the traced capture boundary along a fan of
screen azimuths and returns the envelope (the same numeric approach
validates against Kerr's analytic envelope to <1e-3 in tests).

Approximations, stated: the initial conditions reuse Kerr's Bardeen
screen mapping at the OBSERVER, where h(r_obs) = eps3 (M/r_obs)^3
(~1e-6 at 100M) — the ray's momentum is then made exactly null
through the JP `_inv_terms`, so only the screen parametrization (not
the physics) is asymptotic. Angle extraction runs at the escape
radius (2 r_obs) with the same justification. XLA backend only
(supports_pallas = False: jax.grad does not lower inside the Mosaic
tile kernel); disk/orbital machinery (ISCO, Keplerian Omega) keeps
its Kerr closed forms and is NOT wired for eps3 != 0 — shadow, lens,
magnification, AA, and trajectories are the supported surfaces.
Validity: moderate deformations (|eps3| of a few); large negative
eps3 deforms the horizon region pathologically (JP 2011 Sec. IV).

Reference parity anchor: the reference has a two-metric family tree
(metrics.py:735,840); this is the third+ family the SURVEY's Metric
ABC row anticipated, built on the same extension surface as
Reissner-Nordstrom (round 3) and Kerr-Newman (round 3).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from light_path_tracer_tpu.models.kerr import Kerr, _SIN2_FLOOR


def _covariant_terms_jp(M, a, eps3, r, th):
    """Covariant JP components (g_tt, g_tphi, g_rr, g_thth, g_phiphi)
    plus shared intermediates (Sigma, Delta, sin_th, cos_th, sin2)."""
    sin_th = jnp.sin(th)
    cos_th = jnp.cos(th)
    sin2 = jnp.maximum(sin_th * sin_th, _SIN2_FLOOR)
    r2 = r * r
    a2 = a * a
    Sigma = r2 + a2 * cos_th * cos_th
    Delta = r2 - 2.0 * M * r + a2
    h = eps3 * (M ** 3) * r / (Sigma * Sigma)
    two_Mr = 2.0 * M * r
    g_tt = -(1.0 + h) * (1.0 - two_Mr / Sigma)
    g_tphi = -(a * two_Mr * sin2 / Sigma) * (1.0 + h)
    g_rr = Sigma * (1.0 + h) / (Delta + a2 * h * sin2)
    g_thth = Sigma
    g_phiphi = (sin2 * (r2 + a2 + a2 * two_Mr * sin2 / Sigma)
                + h * a2 * sin2 * (Sigma + two_Mr) / Sigma)
    return (g_tt, g_tphi, g_rr, g_thth, g_phiphi,
            Sigma, Delta, sin_th, cos_th, sin2)


@dataclasses.dataclass(frozen=True)
class JohannsenPsaltis(Kerr):
    eps3: float = 0.0

    #: jax.grad does not lower inside the Mosaic tile kernel; the
    #: batch dispatcher (ops.batch._kerr_backend) resolves this family
    #: to the XLA while_loop path.
    supports_pallas: bool = dataclasses.field(
        default=False, init=False, repr=False)

    def __post_init__(self):
        super().__post_init__()
        # The deformation moves the inner pathology OUTSIDE Kerr's
        # horizon for eps3 < 0: g^rr flips sign where
        # Delta + a^2 h sin^2(theta) = 0, and (1 + h) = 0 kills the
        # whole (t, phi) block — both lie at r > r_+ for negative h.
        # Integrating into either surface produces NaN lanes, so the
        # capture surface must park rays just OUTSIDE the outermost
        # such root (for eps3 >= 0 both surfaces sit inside r_+ and
        # this reduces to Kerr's 1.01 r_+). Host-side numeric scan at
        # config time; frozen dataclass -> object.__setattr__.
        M, a, eps3 = self.M, self.a, self.eps3
        r = np.linspace(1e-3, 4.0 * self.r_plus + 4.0, 4001)
        th = np.linspace(1e-3, np.pi - 1e-3, 61)[:, None]
        Sigma = r[None, :] ** 2 + a ** 2 * np.cos(th) ** 2
        Delta = r ** 2 - 2.0 * M * r + a ** 2
        h = eps3 * M ** 3 * r[None, :] / Sigma ** 2
        sin2 = np.sin(th) ** 2
        bad = ((Delta[None, :] + a ** 2 * h * sin2) <= 0.0) \
            | ((1.0 + h) <= 0.0)
        bad_any = bad.any(axis=0)
        r_barrier = float(r[bad_any.nonzero()[0].max()]) \
            if bad_any.any() else 0.0
        object.__setattr__(
            self, "_r_capture",
            max(1.01 * self.r_plus, 1.02 * r_barrier))

    def capture_radius(self):
        return self._r_capture

    def _freeze_radius(self):
        # Just inside the capture surface (which itself clears the
        # numeric barrier by 2%): intermediate RK stages probing below
        # the capture radius stay on finite metric components.
        return 0.995 * self._r_capture

    def _inv_terms(self, r, th):
        """Exact contravariant components: the (t, phi) block inverts
        as a 2x2 (g^tt = g_phiphi/D, g^tphi = -g_tphi/D,
        g^phiphi = g_tt/D with D = g_tt g_phiphi - g_tphi^2); r and
        theta are diagonal. Same return contract as Kerr's
        _inverse_metric_terms (the trailing intermediates carry Kerr's
        A slot as the 2x2 determinant's negative — only the leading
        five are consumed by the shared machinery)."""
        dtype = r.dtype if hasattr(r, "dtype") else jnp.float64
        M = jnp.asarray(self.M, dtype)
        a = jnp.asarray(self.a, dtype)
        eps3 = jnp.asarray(self.eps3, dtype)
        (g_tt, g_tphi, g_rr, g_thth, g_phiphi,
         Sigma, Delta, sin_th, cos_th, sin2) = _covariant_terms_jp(
            M, a, eps3, r, th)
        D = g_tt * g_phiphi - g_tphi * g_tphi
        D_safe = jnp.where(jnp.abs(D) < 1e-30, 1e-30, D)
        inv_tt = g_phiphi / D_safe
        inv_tphi = -g_tphi / D_safe
        inv_phiphi = g_tt / D_safe
        inv_rr = 1.0 / g_rr
        inv_thth = 1.0 / g_thth
        return (inv_tt, inv_tphi, inv_rr, inv_thth, inv_phiphi,
                Sigma, Delta, -D, sin_th, cos_th, sin2)

    def rhs5(self, state5, p_t, p_phi):
        """No hand form exists for JP — the autodiff Hamiltonian RHS
        over this class's `_inv_terms` IS the integrator (for Kerr/KN
        the same code is the oracle of the hand form, so its
        correctness is pinned by those roundoff-agreement tests plus
        the eps3 -> 0 limit here)."""
        return self.rhs5_autodiff(state5, p_t, p_phi)

    def rhs5_mu(self, state5, p_t, p_phi):
        raise NotImplementedError(
            "the mu = cos(theta) chart is wired for the hand-derived "
            "Kerr/Kerr-Newman RHS only; JP integrates in theta form")

    def plunge_radii(self, r_obs, alphas, thetas, theta_obs):
        """Certain-capture early exit DISABLED (radius 0 per ray): the
        (xi, eta) photon-orbit band argument needs Carter separability,
        which JP lacks. Purely conservative — classification is done
        by the integrator alone."""
        return jnp.zeros_like(alphas)

    def alpha_crit(self, r_obs, theta_obs=None, n_azimuth: int = 16,
                   iters: int = 26, max_steps: int = 60000) -> float:
        """Shadow-envelope critical angle by bisection on TRACED
        outcomes (models/numeric.py:alpha_crit_traced — shared with
        CustomMetric): per screen azimuth, bisect the capture/escape
        boundary in viewing angle, return the envelope max. ~iters
        compiled trace calls of n_azimuth rays each — host-side
        analysis, not a render path. Validated against Kerr's analytic
        envelope in tests/test_johannsen_psaltis.py."""
        from light_path_tracer_tpu.models.numeric import (
            alpha_crit_traced)
        return alpha_crit_traced(self, r_obs, theta_obs,
                                 n_azimuth=n_azimuth, iters=iters,
                                 max_steps=max_steps)
