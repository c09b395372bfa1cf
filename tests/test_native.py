"""Native C++ engine tests: cross-check against the JAX tracers."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_path_tracer_tpu import native
from light_path_tracer_tpu.models import Schwarzschild, Kerr
from light_path_tracer_tpu.ops import (
    trace_rays_schwarzschild, trace_rays_kerr)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built")

R_OBS = 100.0


def test_native_schwarzschild_matches_jax():
    m = Schwarzschild(M=1.0)
    ac = m.alpha_crit(R_OBS)
    angles = np.linspace(0.1 * ac, 5 * ac, 80)
    fa_n, w_n, s_n = native.schwarzschild_trace_batch(1.0, R_OBS, angles)
    res = trace_rays_schwarzschild(m, R_OBS, jnp.asarray(angles,
                                                         jnp.float64))
    np.testing.assert_array_equal(s_n, np.asarray(res.status))
    ok = s_n == 1
    np.testing.assert_allclose(fa_n[ok], np.asarray(res.final_alpha)[ok],
                               atol=1e-10)
    np.testing.assert_array_equal(w_n[ok],
                                  np.asarray(res.n_half_orbits)[ok])


def test_native_kerr_matches_jax():
    m = Kerr(M=1.0, a=0.9)
    ac = m.alpha_crit(R_OBS)
    rng = np.random.default_rng(12)
    n = 100
    angles = rng.uniform(0.3 * ac, 4 * ac, n)
    screens = rng.uniform(-np.pi, np.pi, n)
    fa_n, w_n, s_n = native.kerr_trace_batch(
        1.0, 0.9, R_OBS, angles, screens)
    res = trace_rays_kerr(
        m, R_OBS, jnp.asarray(angles, jnp.float64),
        jnp.asarray(screens, jnp.float64), np.pi / 2,
        jnp.zeros(n, bool), 5000.0, 200000)
    s_j = np.asarray(res.status)
    # Same algorithm in both languages; fp-order detail may flip only
    # pathological grazers.
    assert (s_n == s_j).mean() > 0.98
    both = (s_n == 1) & (s_j == 1)
    stable = both & (np.abs(angles - ac) > 0.05 * ac)
    d = np.abs(fa_n[stable] - np.asarray(res.final_alpha)[stable])
    assert np.median(d) < 1e-9
    assert np.percentile(d, 95) < 1e-5


def test_native_refine_and_linear_modes_run():
    angles = np.array([0.06, 0.1])
    screens = np.array([0.3, -0.5])
    fa1, _, s1 = native.kerr_trace_batch(
        1.0, 0.5, R_OBS, angles, screens,
        refine=np.array([1, 0], np.uint8))
    fa2, _, s2 = native.kerr_trace_batch(
        1.0, 0.5, R_OBS, angles, screens, hermite_events=False)
    assert s1.shape == s2.shape == (2,)
    assert np.isfinite(fa1[np.asarray(s1) == 1]).all()
