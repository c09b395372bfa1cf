"""Animation-path tests: traced-psi camera + one-compile sequences."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from light_path_tracer_tpu.utils.config import SceneConfig
from light_path_tracer_tpu import camera
from light_path_tracer_tpu.sequence import render_sequence


def test_dynamic_camera_matches_static():
    dim = (40, 56)
    fov = camera.fov_from_vertical(np.radians(35.0), dim)
    for psi in [(0.0, 0.0), (0.05, -0.08)]:
        a_s = camera.build_alpha_lookup(dim, fov, psi=psi,
                                        dtype=jnp.float64)
        t_s = camera.build_theta_lookup(dim, fov, psi=psi,
                                        dtype=jnp.float64)
        a_d, t_d = camera.build_angle_lookups_dynamic(
            dim, fov, jnp.asarray(psi[0], jnp.float64),
            jnp.asarray(psi[1], jnp.float64), dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(a_d), np.asarray(a_s),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_s),
                                   atol=1e-12)


@pytest.mark.slow
def test_shadow_sequence_one_compile():
    scene = SceneConfig(M=1.0, a=0.8, r_obs_mult=100.0)
    psis = [(0.0, 0.0), (0.0, 0.01), (0.005, -0.01)]
    frames = render_sequence(scene, psis, resolution=(24, 24))
    assert len(frames) == 3
    for f in frames:
        img = np.asarray(f)
        assert img.shape == (24, 24)
        assert set(np.unique(img)).issubset({0.0, 1.0})
        assert (img == 0).sum() > 0       # the shadow is in frame
    # Panning moves the shadow centroid.
    c0 = np.argwhere(np.asarray(frames[0]) == 0).mean(0)
    c1 = np.argwhere(np.asarray(frames[1]) == 0).mean(0)
    assert abs(c1[1] - c0[1]) > 0.1

    # One compile for the whole sequence: adding more frames must not
    # trigger new traces.
    from light_path_tracer_tpu.sequence import _render_frame_dynamic
    n0 = _render_frame_dynamic._cache_size()
    more = render_sequence(scene, [(0.0, 0.02), (0.01, 0.0)],
                           resolution=(24, 24))
    assert _render_frame_dynamic._cache_size() == n0
    assert len(more) == 2


@pytest.mark.slow
def test_lensed_sequence():
    rng = np.random.default_rng(0)
    src = rng.random((32, 40, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.6, r_obs_mult=100.0)
    frames = render_sequence(scene, [(0.0, 0.0), (0.01, 0.0)], src)
    assert len(frames) == 2
    for f in frames:
        img = np.asarray(f)
        assert img.shape == src.shape
        assert np.isfinite(img).all()
    assert not np.array_equal(np.asarray(frames[0]),
                              np.asarray(frames[1]))


@pytest.mark.slow
def test_param_sequence_spin_sweep():
    """Traced (M, a): one compile serves a spin ramp; frames match the
    static pipeline's shadows."""
    from light_path_tracer_tpu.sequence import (
        render_param_sequence, _shadow_frame_param_dynamic)
    from light_path_tracer_tpu.pipeline import render_shadow
    from light_path_tracer_tpu.utils.config import RenderConfig

    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    spins = [0.0, 0.5, 0.9]
    # Other tests (e.g. the CLI animate path) may have compiled this
    # kernel at another resolution in the same process — count only the
    # compiles THIS sweep adds.
    _shadow_frame_param_dynamic._clear_cache()
    frames = render_param_sequence(
        scene, [(0.0, 0.0, 1.0, a) for a in spins], (24, 24))
    assert _shadow_frame_param_dynamic._cache_size() == 1

    for a, frame in zip(spins, frames):
        ref_scene = SceneConfig(M=1.0, a=a, r_obs_mult=100.0)
        # Static pipeline without symmetry (the dynamic path traces all
        # rows) for an apples-to-apples shadow mask.
        img_ref, _ = render_shadow(
            ref_scene, (24, 24),
            RenderConfig(use_tb_symmetry=False, backend="xla"))
        agree = (np.asarray(frame) == np.asarray(img_ref)).mean()
        assert agree > 0.99, (a, agree)

    # The sweep actually changes the image (shadow grows/shifts with a).
    assert not np.array_equal(np.asarray(frames[0]),
                              np.asarray(frames[2]))


@pytest.mark.slow
def test_flyby_shadow_approach():
    """render_flyby: (r_obs, boost) in the traced carry — one compile
    for an approach; shadow grows as the observer closes in, shrinks
    under forward boost (aberration), and the rest frame matches
    render_sequence exactly."""
    from light_path_tracer_tpu.sequence import (
        render_flyby, _flyby_frame_dynamic)

    scene = SceneConfig(M=1.0, a=0.9, r_obs_mult=100.0)
    # The CLI flyby test compiles this kernel at another resolution in
    # the same pytest process — count only THIS approach's compiles.
    _flyby_frame_dynamic._clear_cache()
    frames = render_flyby(
        scene,
        [(100.0, (0, 0, 0.0)), (60.0, (0, 0, 0.0)),
         (30.0, (0, 0, 0.0)), (30.0, (0, 0, 0.5))],
        resolution=(48, 48))
    assert _flyby_frame_dynamic._cache_size() == 1   # one compile total
    px = [int((1.0 - np.asarray(f)).sum()) for f in frames]
    # Approach grows the apparent shadow monotonically...
    assert px[0] < px[1] < px[2]
    # ...and flying toward it at 0.5c shrinks it back (aberration).
    assert px[3] < px[2]

    # Rest-frame flyby frame == the psi-sequence path (shared kernel,
    # traced params exercised vs folded constants).
    seq = render_sequence(scene, [(0.0, 0.0)], resolution=(48, 48))
    assert np.array_equal(np.asarray(frames[0]), np.asarray(seq[0]))


@pytest.mark.slow
def test_flyby_lensed_and_psi_override():
    """Lensed flyby frames: finite, vary along the approach, and accept
    per-frame psi in the 4-tuple form."""
    from light_path_tracer_tpu.sequence import render_flyby

    rng = np.random.default_rng(1)
    src = rng.random((32, 40, 3)).astype(np.float32)
    scene = SceneConfig(M=1.0, a=0.6, r_obs_mult=100.0)
    frames = render_flyby(
        scene,
        [(0.0, 0.0, 100.0, (0, 0, 0.0)),
         (0.01, 0.0, 50.0, (0, 0, 0.3))],
        source_image=src)
    assert len(frames) == 2
    for f in frames:
        img = np.asarray(f)
        assert img.shape == src.shape
        assert np.isfinite(img).all()
    assert not np.array_equal(np.asarray(frames[0]),
                              np.asarray(frames[1]))


def test_flyby_rejects_superluminal():
    from light_path_tracer_tpu.sequence import render_flyby
    scene = SceneConfig()
    try:
        render_flyby(scene, [(100.0, (0, 0, 1.0))], resolution=(8, 8))
    except ValueError as e:
        assert "boost" in str(e)
    else:
        raise AssertionError("|boost|>=1 must raise")


def test_dynamic_boost_camera_matches_static():
    """aberrate_view_dynamic == aberrate_view (traced vs host boost)."""
    dim = (24, 32)
    fov = camera.fov_from_vertical(np.radians(35.0), dim)
    boost = (0.1, -0.2, 0.3)
    a_s, t_s = camera.build_angle_lookups_dynamic(
        dim, fov, 0.05, -0.03, dtype=jnp.float64, boost=boost)
    a_d, t_d = camera.build_angle_lookups_dynamic(
        dim, fov, 0.05, -0.03, dtype=jnp.float64,
        boost_dynamic=tuple(jnp.asarray(b, jnp.float64) for b in boost))
    np.testing.assert_allclose(np.asarray(a_d), np.asarray(a_s),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_s),
                               atol=1e-12)
    # b = 0 is exact passthrough (the guarded 0/0 selects identity).
    a0, t0 = camera.build_angle_lookups_dynamic(
        dim, fov, 0.05, -0.03, dtype=jnp.float64)
    ad0, td0 = camera.build_angle_lookups_dynamic(
        dim, fov, 0.05, -0.03, dtype=jnp.float64,
        boost_dynamic=(jnp.float64(0), jnp.float64(0), jnp.float64(0)))
    np.testing.assert_array_equal(np.asarray(ad0), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(td0), np.asarray(t0))


@pytest.mark.slow
def test_charged_pan_sequence_and_flyby_rejection():
    """Pan sequences carry the static Kerr-Newman metric; the
    traced-metric paths (flyby, param sweeps) reject charge."""
    import pytest
    from light_path_tracer_tpu.sequence import (
        render_sequence, render_flyby, render_param_sequence)
    from light_path_tracer_tpu.utils.config import SceneConfig
    scene = SceneConfig(M=1.0, a=0.5, Q=0.6)
    frames = render_sequence(scene, [(0.0, 0.0), (0.0, 0.02)],
                             resolution=(16, 16))
    assert len(frames) == 2
    a0 = np.asarray(frames[0])
    assert np.isfinite(a0).all()
    # Charged shadow is smaller than the uncharged one at equal spin.
    k_frames = render_sequence(SceneConfig(M=1.0, a=0.5),
                               [(0.0, 0.0)], resolution=(16, 16))
    assert a0.sum() >= np.asarray(k_frames[0]).sum()
    with pytest.raises(ValueError, match="uncharged"):
        render_flyby(scene, [(100.0, (0.0, 0.0, 0.0))],
                     resolution=(8, 8))
    with pytest.raises(ValueError, match="uncharged"):
        render_param_sequence(scene, [(0.0, 0.0, 1.0, 0.5)], (8, 8))
