"""utils/save.py: on-device uint8 quantization must produce PNG files
byte-identical to matplotlib's float save path (the round-4 readback
optimization is only valid if the artifact is unchanged)."""

import numpy as np
import matplotlib.image as mpimg
import jax.numpy as jnp

from light_path_tracer_tpu.utils.save import quantize_u8, save_png


def test_png_bytes_identical_to_float_imsave(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((48, 64, 3)).astype(np.float32)
    # include exact-boundary and out-of-range values (cli clips, but
    # the helper must be safe without it)
    img[0, 0] = [0.0, 1.0, 0.5]
    img[0, 1] = [-0.2, 1.3, 0.999999]

    f_float = tmp_path / "float.png"
    f_dev = tmp_path / "dev.png"
    mpimg.imsave(str(f_float), np.clip(img, 0.0, 1.0))
    save_png(str(f_dev), jnp.asarray(img))
    assert f_float.read_bytes() == f_dev.read_bytes()


def test_quantize_matches_matplotlib_truncation():
    rng = np.random.default_rng(1)
    img = rng.random((32, 32, 3)).astype(np.float32)
    q = np.asarray(quantize_u8(jnp.asarray(img)))
    ref = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    np.testing.assert_array_equal(q, ref)


def test_save_png_numpy_passthrough(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.random((8, 8, 3)).astype(np.float64)
    f1 = tmp_path / "a.png"
    f2 = tmp_path / "b.png"
    mpimg.imsave(str(f1), img)
    save_png(str(f2), img)
    assert f1.read_bytes() == f2.read_bytes()


def test_cmap_index_matches_matplotlib_float_path():
    from matplotlib import cm
    from light_path_tracer_tpu.utils.save import quantize_cmap_index
    rng = np.random.default_rng(3)
    x = rng.random((40, 40)).astype(np.float32)
    x[0, :4] = [0.0, 1.0, 0.5, 0.999999]
    ref = cm.afmhot(x)
    idx = np.asarray(quantize_cmap_index(jnp.asarray(x)))
    assert idx.dtype == np.uint8
    alt = cm.afmhot(idx)
    np.testing.assert_array_equal(ref, alt)


def test_gray_cmap_bytes_roundtrip_identical(tmp_path):
    """The shadow CLI's save path: uint8 index + cm.gray(bytes=True)
    must byte-match mpimg.imsave(float, cmap='gray', vmin=0, vmax=1)."""
    from matplotlib import cm
    from light_path_tracer_tpu.utils.save import quantize_cmap_index
    rng = np.random.default_rng(4)
    img = rng.random((24, 24)).astype(np.float32)
    img[0, :4] = [0.0, 1.0, 0.5, 0.999999]
    f1 = tmp_path / "float.png"
    f2 = tmp_path / "idx.png"
    mpimg.imsave(str(f1), img, cmap="gray", vmin=0, vmax=1)
    idx = np.asarray(quantize_cmap_index(jnp.asarray(img)))
    mpimg.imsave(str(f2), cm.gray(idx, bytes=True))
    assert f1.read_bytes() == f2.read_bytes()


def test_prewarm_save_is_idempotent_and_harmless(tmp_path):
    """prewarm_save compiles the quantize program ahead of the save
    (round-5 item 8): the warm thread completes, a repeat is a no-op,
    and the subsequent save is byte-identical to an unwarmed one."""
    from light_path_tracer_tpu.utils.save import prewarm_save, save_png
    shape = (17, 23, 3)
    t = prewarm_save(shape, block=True)
    assert t is not None and not t.is_alive()
    assert prewarm_save(shape) is None          # already warmed
    rng = np.random.default_rng(5)
    img = rng.random(shape).astype(np.float32)
    f1 = tmp_path / "warm.png"
    f2 = tmp_path / "ref.png"
    save_png(str(f1), jnp.asarray(img))
    mpimg.imsave(str(f2), (np.clip(img, 0, 1) * 255).astype(np.uint8))
    assert f1.read_bytes() == f2.read_bytes()
