"""Kerr-Newman metric: charged, rotating black hole.

Fourth metric family — the full charge x spin corner of the model
space. In Boyer-Lindquist coordinates Kerr-Newman is structurally Kerr
with two substitutions:

    Delta = r^2 - 2 M r + a^2 + Q^2          (horizon function)
    2 M r -> 2 M r - Q^2                     (the g_tphi numerator;
                                              identically r^2+a^2-Delta)

so all five inverse-metric components keep the Kerr FORM with the
shifted Delta. The null-geodesic structure survives (Kerr-Newman is
Petrov type D; the Carter constant exists with the same expression),
so the reduced 5-D state, the Bardeen screen mapping, and the
angle-extraction epilogue all flow through the Kerr machinery via the
`_Delta_b` / `_inv_terms` / `_two_M_r` hooks.

The hot-loop RHS is Kerr's hand-derived form with the charge folded
in through the static `_q2` branch (kerr.rhs5 / rhs5_mu): only Delta
and the g_tphi numerator W = 2Mr - Q^2 change, and dW/dr = 2M keeps
every derivative expression's structure — so Kerr-Newman runs on BOTH
backends, including the Pallas fused tile kernel (the kernel is
metric-generic; `_q2` is static dataclass metadata, so the branch
costs nothing and Kerr's own path is bitwise-unchanged). The
independent oracle is `rhs5_autodiff` below: Hamilton's equations from
`jax.grad` of H = (1/2) g^{mu nu}(r, theta) p_mu p_nu, which must
match the hand form to roundoff at every (a, Q) — and at a = 0 traced
escape angles must match the independent Reissner-Nordstrom
orbit-equation path (tests/test_kerr_newman.py).

Spherical photon orbits: with u(r) = 4 r Delta / Delta'(r), the
critical conserved quantities are

    xi(r)  = (r^2 + a^2 - u) / a,
    eta(r) = u^2 / Delta - (xi - a)^2,

from R(r) = R'(r) = 0 with R = [(r^2+a^2) - a xi]^2 -
Delta [(xi-a)^2 + eta] — the general-Delta form (reduces to Bardeen's
Kerr expressions at Q = 0, pinned by test). The photon-orbit radius
band is bracketed numerically as the eta >= 0 region.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from light_path_tracer_tpu.models.kerr import Kerr, _SIN2_FLOOR


def _inverse_metric_terms_kn(M, a, Q, r, th):
    """Contravariant Kerr-Newman components (same return contract as
    kerr._inverse_metric_terms)."""
    sin_th = jnp.sin(th)
    cos_th = jnp.cos(th)
    sin2 = jnp.maximum(sin_th * sin_th, _SIN2_FLOOR)
    r2 = r * r
    a2 = a * a
    Sigma = r2 + a2 * cos_th * cos_th
    Delta = r2 - 2.0 * M * r + a2 + Q * Q
    ra2 = r2 + a2
    A = ra2 * ra2 - a2 * Delta * sin2
    SD = Sigma * Delta
    g_tt = -A / SD
    g_tphi = -a * (2.0 * M * r - Q * Q) / SD
    g_rr = Delta / Sigma
    g_thth = 1.0 / Sigma
    g_phiphi = (Delta - a2 * sin2) / (SD * sin2)
    return (g_tt, g_tphi, g_rr, g_thth, g_phiphi,
            Sigma, Delta, A, sin_th, cos_th, sin2)


@dataclasses.dataclass(frozen=True)
class KerrNewman(Kerr):
    Q: float = 0.0

    def __post_init__(self):
        if self.a ** 2 + self.Q ** 2 > self.M ** 2 * (1 + 1e-12):
            raise ValueError(
                f"a^2 + Q^2 must be <= M^2 (naked singularity): "
                f"a={self.a}, Q={self.Q}, M={self.M}")

    # ---- closed-form geometry ----

    @property
    def r_plus(self) -> float:
        return float(self.M + np.sqrt(max(
            self.M ** 2 - self.a ** 2 - self.Q ** 2, 0.0)))

    def _Delta(self, r):
        # Factored (r - r_+)(r - r_-): exact roots, no cancellation
        # near the horizon (see Kerr._Delta — at the extremal corner
        # a^2 + Q^2 = M^2 the expanded form loses every significant
        # digit for r - r_+ ~ 1e-9 and poisoned eta -> alpha_crit).
        s = np.sqrt(max(self.M**2 - self.a**2 - self.Q**2, 0.0))
        return (r - (self.M + s)) * (r - (self.M - s))

    # ---- hot-path hooks (batched jnp) ----

    @property
    def _q2(self) -> float:
        return self.Q * self.Q

    def _Delta_b(self, r):
        return (r * r - 2.0 * self.M * r
                + self.a * self.a + self.Q * self.Q)

    def _inv_terms(self, r, th):
        return _inverse_metric_terms_kn(self.M, self.a, self.Q, r, th)

    def _two_M_r(self, r):
        return 2.0 * self.M * r - self.Q * self.Q

    # ---- Hamilton's equations by autodiff (ORACLE, not hot path) ----

    # rhs5_autodiff is inherited from _KerrHotPath (kerr.py): the
    # generic jax.grad-of-Hamiltonian RHS over this class's _inv_terms
    # — the independent roundoff-level oracle for the inherited hand
    # form (pinned at every (a, Q) in tests/test_kerr_newman.py).

    def plunge_radii(self, r_obs, alphas, thetas, theta_obs):
        """Per-ray certain-capture radius (Kerr's argument, general
        Delta): the radial potential R(r) keeps its structure under
        Delta -> Delta + Q^2, so every spherical photon orbit still
        satisfies r >= r_prograde and a non-vortical (eta >= 0) photon
        crossing below the band inbound is a guaranteed plunge.
        r_prograde comes from the numeric eta >= 0 band edge
        (unstable_photon_radii) — a host float, fine for this static
        (never-traced) metric. Purely an optimization; classification
        is unchanged (equivalence pinned in tests)."""
        dtype = alphas.dtype
        a = jnp.asarray(self.a, dtype)
        th = jnp.asarray(theta_obs, dtype)
        sin_th, cos_th = jnp.sin(th), jnp.cos(th)
        r = jnp.asarray(r_obs, dtype)
        Sigma = r * r + a * a * cos_th * cos_th
        Delta = self._Delta_b(r)
        rho = r * jnp.sin(alphas) * jnp.sqrt(Sigma) / jnp.sqrt(
            jnp.maximum(Delta, 1e-30))
        alpha_s = -rho * jnp.sin(thetas)
        beta_s = -rho * jnp.cos(thetas)
        eta = (beta_s * beta_s
               + cos_th * cos_th * (alpha_s * alpha_s - a * a))
        r_pro = jnp.asarray(self.unstable_photon_radii()[0], dtype)
        return jnp.where(eta >= 0.0, 0.999 * r_pro, 0.0).astype(dtype)

    # ---- spherical photon orbits (general-Delta forms) ----

    def _xi_eta(self, r_ph):
        M, a = self.M, self.a
        Delta = self._Delta(r_ph)
        dDelta = 2.0 * (r_ph - M)
        u = 4.0 * r_ph * Delta / dDelta
        xi = (r_ph ** 2 + a ** 2 - u) / a
        eta = u ** 2 / Delta - (xi - a) ** 2
        return xi, eta

    def unstable_photon_radii(self):
        """(r_prograde, r_retrograde): the eta(r) >= 0 band edges,
        bracketed numerically (Bardeen's closed form is Kerr-only)."""
        if self.a == 0:
            r_ph = 0.5 * (3.0 * self.M + np.sqrt(
                9.0 * self.M ** 2 - 8.0 * self.Q ** 2))
            return float(r_ph), float(r_ph)
        r_lo = self.r_plus * (1.0 + 1e-9)
        rs = np.linspace(r_lo, 4.5 * self.M, 4001)
        rs = rs[np.abs(rs - self.M) > 1e-9]    # Delta' = 0 pole
        _xi, eta = self._xi_eta(rs)
        pos = eta >= 0.0
        if not pos.any():
            # Degenerate band (extremal corners): single equatorial
            # orbit at the eta maximum.
            r_star = float(rs[np.argmax(eta)])
            return r_star, r_star
        i0, i1 = np.argmax(pos), len(pos) - np.argmax(pos[::-1]) - 1

        def bisect(ra, rb):
            for _ in range(80):
                rm = 0.5 * (ra + rb)
                if self._xi_eta(np.asarray([rm]))[1][0] >= 0.0:
                    rb = rm
                else:
                    ra = rm
            return rb

        r_pro = (bisect(rs[i0 - 1], rs[i0]) if i0 > 0 else rs[0])
        r_ret = (bisect(rs[i1 + 1], rs[i1]) if i1 < len(rs) - 1
                 else rs[-1])
        return float(r_pro), float(r_ret)

    def alpha_crit(self, r_obs, theta_obs=None, n_samples=50) -> float:
        """Shadow-envelope critical angle (Kerr's sampling recipe with
        the general-Delta (xi, eta) and the Reissner-Nordstrom floor)."""
        if theta_obs is None:
            theta_obs = np.pi / 2
        M, a, Q = self.M, self.a, self.Q
        # a = 0 closed form (Reissner-Nordstrom).
        r_ph0 = 0.5 * (3.0 * M + np.sqrt(9.0 * M ** 2 - 8.0 * Q ** 2))
        f0 = 1.0 - 2.0 * M / r_ph0 + Q ** 2 / r_ph0 ** 2
        b_floor = r_ph0 / np.sqrt(f0)
        if a == 0:
            b_crit = b_floor
        else:
            r_pro, r_ret = self.unstable_photon_radii()
            r_arr = np.linspace(r_pro, r_ret, n_samples)
            xi, eta = self._xi_eta(r_arr)
            b2 = xi ** 2 + np.maximum(eta, 0.0)
            b_crit = max(float(np.sqrt(np.max(b2))), float(b_floor))

        Delta_o = self._Delta(r_obs)
        Sigma_o = self._Sigma(r_obs, theta_obs)
        sin_th = np.sin(theta_obs)
        A = (r_obs ** 2 + a ** 2) ** 2 - a ** 2 * Delta_o * sin_th ** 2
        arg = b_crit * np.sqrt(Sigma_o * Delta_o / A) / r_obs
        return float(np.arcsin(np.clip(arg, -1.0, 1.0)))

    def viewing_angle_to_impact_parameter(self, alpha, r_obs,
                                          theta_obs=None):
        if theta_obs is None:
            theta_obs = np.pi / 2
        Delta = self._Delta(r_obs)
        Sigma = self._Sigma(r_obs, theta_obs)
        sin_th = np.sin(theta_obs)
        A = (r_obs ** 2 + self.a ** 2) ** 2 \
            - self.a ** 2 * Delta * sin_th ** 2
        return r_obs * np.sin(alpha) * np.sqrt(A / (Sigma * Delta))
