"""Animation-path tests: traced-psi camera + one-compile sequences."""

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


def test_param_sequence_spin_sweep():
    """Traced (M, a): one compile serves a spin ramp; frames match the
    static pipeline's shadows."""
    from light_path_tracer_tpu.sequence import (
        render_param_sequence, _shadow_frame_param_dynamic)
    from light_path_tracer_tpu.pipeline import render_shadow
    from light_path_tracer_tpu.utils.config import RenderConfig

    scene = SceneConfig(M=1.0, a=0.0, r_obs_mult=100.0)
    spins = [0.0, 0.5, 0.9]
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
