"""User-defined metric plug-in (models/custom.py).

The extension contract: any stationary axisymmetric asymptotically-flat
metric, given as five covariant components, traces through the full
shadow/lens machinery with the autodiff-Hamiltonian RHS. Oracles:

* closure identity — CustomMetric(kerr_covariant(M, a)) must reproduce
  Kerr(M, a) ray-for-ray (same statuses, final angles to roundoff);
* cross-integrator — CustomMetric(reissner_nordstrom_covariant) runs
  the 5-D Kerr machinery, while models.ReissnerNordstrom has an
  analytic critical angle: the traced bisection must match it;
* family equivalence — the Johannsen-Psaltis covariant form fed
  through CustomMetric must match the dedicated JP class;
* known physics — the Hayward regular black hole (examples/
  user_metric.py) has a smaller shadow than Schwarzschild.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from light_path_tracer_tpu.models import (
    Kerr, Schwarzschild, ReissnerNordstrom, JohannsenPsaltis,
    CustomMetric, kerr_covariant, reissner_nordstrom_covariant,
    load_covariant_fn)
from light_path_tracer_tpu.models.johannsen_psaltis import (
    _covariant_terms_jp)
from light_path_tracer_tpu.ops.kerr_trace import trace_rays_kerr

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir,
                        "examples", "user_metric.py")


def _trace_fan(metric, n=48, r_obs=100.0, seed=0):
    rng = np.random.default_rng(seed)
    alphas = jnp.asarray(rng.uniform(0.02, 0.25, n), jnp.float64)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float64)
    res = trace_rays_kerr(metric, r_obs, alphas, thetas, np.pi / 2,
                          jnp.zeros(n, bool), 5000.0, 60000)
    return np.asarray(res.status), np.asarray(res.final_alpha)


@pytest.mark.slow
def test_kerr_closure_identity():
    """CustomMetric(kerr_covariant) == Kerr, ray for ray."""
    M, a = 1.0, 0.7
    km = Kerr(M=M, a=a)
    cm = CustomMetric(M=M, a=a, covariant_fn=kerr_covariant(M, a))
    sk, fk = _trace_fan(km)
    sc, fc = _trace_fan(cm)
    np.testing.assert_array_equal(sk, sc)
    esc = sk == 1
    assert esc.sum() >= 10
    np.testing.assert_allclose(fk[esc], fc[esc], atol=1e-9)


def test_signature_barrier_finds_kerr_horizon():
    M, a = 1.0, 0.7
    cm = CustomMetric(M=M, a=a, covariant_fn=kerr_covariant(M, a))
    r_plus = Kerr(M=M, a=a).r_plus
    assert 1.01 * r_plus <= cm.capture_radius() <= 1.05 * r_plus


def test_rn_alpha_crit_vs_analytic():
    """Traced bisection through the user-metric path vs the dedicated
    Reissner-Nordstrom family's analytic critical angle."""
    M, Q = 1.0, 0.6
    cm = CustomMetric(M=M, a=0.0,
                      covariant_fn=reissner_nordstrom_covariant(M, Q))
    ac_analytic = ReissnerNordstrom(M=M, Q=Q).alpha_crit(100.0)
    ac_traced = cm.alpha_crit(100.0, n_azimuth=4, iters=20)
    assert abs(ac_traced - ac_analytic) / ac_analytic < 1e-3


@pytest.mark.slow
def test_jp_covariant_matches_jp_class():
    """The JP covariant form through CustomMetric == JohannsenPsaltis."""
    M, a, eps3 = 1.0, 0.5, 1.5

    def jp_cov(r, th):
        return _covariant_terms_jp(M, a, eps3, r, th)[:5]

    jp = JohannsenPsaltis(M=M, a=a, eps3=eps3)
    cm = CustomMetric(M=M, a=a, covariant_fn=jp_cov)
    # Same barrier logic family: capture radii agree to a few percent.
    assert cm.capture_radius() == pytest.approx(
        jp.capture_radius(), rel=0.05)
    sj, fj = _trace_fan(jp, n=32)
    sc, fc = _trace_fan(cm, n=32)
    np.testing.assert_array_equal(sj, sc)
    esc = sj == 1
    assert esc.sum() >= 8
    np.testing.assert_allclose(fj[esc], fc[esc], atol=1e-7)


def test_hayward_shadow_smaller_than_schwarzschild():
    """Known physics: the regular de Sitter core weakens the field —
    the Hayward shadow is strictly smaller (examples/user_metric.py)."""
    hayward = load_covariant_fn(EXAMPLES + ":hayward")
    cm = CustomMetric(M=1.0, a=0.0, covariant_fn=hayward,
                      label="hayward")
    ac_h = cm.alpha_crit(100.0, n_azimuth=4, iters=20)
    ac_s = Schwarzschild(M=1.0).alpha_crit(100.0)
    assert ac_h < ac_s
    assert ac_h > 0.8 * ac_s        # but not wildly off


def test_capture_radius_override_and_validation():
    flat = kerr_covariant(1e-12, 0.0)   # effectively Minkowski
    cm = CustomMetric(M=1.0, a=0.0, covariant_fn=flat,
                      capture_radius_override=3.0)
    assert cm.capture_radius() == 3.0
    with pytest.raises(ValueError):
        CustomMetric(M=1.0, a=0.0)     # no covariant_fn
    with pytest.raises(ValueError):
        CustomMetric(M=1.0, a=0.0, covariant_fn=flat,
                     capture_radius_override=-1.0)


def test_load_covariant_fn_errors(tmp_path):
    with pytest.raises(ValueError):
        load_covariant_fn("no_colon.py")
    with pytest.raises(FileNotFoundError):
        load_covariant_fn("/does/not/exist.py:fn")
    bad = tmp_path / "bad.py"
    bad.write_text("not_callable = 3\n")
    with pytest.raises(TypeError):
        load_covariant_fn(str(bad) + ":not_callable")


def test_scene_config_metric_dispatch():
    from light_path_tracer_tpu.utils.config import SceneConfig
    cm = CustomMetric(M=1.0, a=0.3,
                      covariant_fn=kerr_covariant(1.0, 0.3))
    scene = SceneConfig(M=1.0, a=0.3, custom_metric=cm)
    assert scene.metric() is cm
    assert isinstance(SceneConfig(a=0.3).metric(), Kerr)
    # frozen + hashable: scenes stay valid jit cache keys
    hash(scene)


@pytest.mark.slow
def test_render_shadow_custom_metric():
    """End-to-end shadow render through the pipeline with a custom
    metric: the rotating-Hayward image must agree with Kerr's at the
    same spin in the l -> 0 limit sense (same capture topology) and
    differ for l = 0.9."""
    from light_path_tracer_tpu.pipeline import render_shadow
    from light_path_tracer_tpu.utils.config import (SceneConfig,
                                                    RenderConfig)
    rot = load_covariant_fn(EXAMPLES + ":rotating_hayward")
    cm = CustomMetric(M=1.0, a=0.9, covariant_fn=rot,
                      label="rotating-hayward")
    cfg = RenderConfig(dtype="float64", max_steps=20000)
    img_h, _ = render_shadow(
        SceneConfig(M=1.0, a=0.9, custom_metric=cm), (32, 32), cfg)
    img_k, _ = render_shadow(SceneConfig(M=1.0, a=0.9), (32, 32), cfg)
    img_h = np.asarray(img_h)
    img_k = np.asarray(img_k)
    assert np.isfinite(img_h).all()
    # Both have a shadow; Hayward's is smaller (fewer captured pixels).
    assert 0 < (img_h == 0).sum() < (img_k == 0).sum()


@pytest.mark.slow
def test_cli_metric_py(tmp_path, monkeypatch):
    from light_path_tracer_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    examples = os.path.abspath(EXAMPLES)
    rc = main(["shadow", "--size", "24", "--dtype", "float64",
               "--metric-py", examples + ":hayward",
               "--output", "h.png"])
    assert rc == 0 and os.path.exists("h.png")


def test_cli_metric_py_rejections(tmp_path, monkeypatch, capsys):
    from light_path_tracer_tpu.cli import main
    monkeypatch.chdir(tmp_path)
    examples = os.path.abspath(EXAMPLES)
    # disk mode rejects
    rc = main(["disk", "--size", "24",
               "--metric-py", examples + ":hayward",
               "--output", "d.png"])
    assert rc == 2
    # --Q conflicts
    with pytest.raises(SystemExit):
        main(["shadow", "--size", "24", "--Q", "0.5",
              "--metric-py", examples + ":hayward",
              "--output", "h.png"])
