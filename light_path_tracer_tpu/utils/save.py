"""PNG save with on-device uint8 quantization (round-4 verdict item 5).

The 4k float32 image readback through the axon tunnel costs ~1 s and is
the floor under adaptive AA and the fused lens frame (BASELINE.md); the
saved PNG is 8-bit anyway. Quantizing to uint8 ON DEVICE cuts the
readback 4x (12 B/px f32 RGB -> 3 B/px) with BYTE-IDENTICAL output
files: matplotlib's imsave converts float RGB(A) input by truncation —
``(x * 255).astype(uint8)`` (mcolorizer.Colorizer.to_rgba(bytes=True),
verified empirically; NOT round-half-up) — so the device applies exactly
that before the transfer. Pinned in tests/test_save.py.

Reference analogue: the save path /root/reference/image_lens.py:510
(mpimg.imsave of the float image).
"""

from __future__ import annotations

import numpy as np


def quantize_u8(img):
    """[0,1] float image -> uint8 on the SAME device, matplotlib-
    identical quantization (clip then truncate)."""
    import jax.numpy as jnp
    q = jnp.clip(img, 0.0, 1.0) * 255.0
    return q.astype(jnp.uint8)


def quantize_cmap_index(img):
    """[0,1] float gray image -> uint8 colormap INDEX on the same
    device, matching matplotlib Colormap.__call__'s float
    quantization exactly (``clip(int(x * 256), 0, 255)``; verified
    byte-identical vs cm.afmhot(float) in tests/test_save.py). Read
    back 1 byte/px instead of 4 and apply the LUT host-side:
    ``cm.afmhot(np.asarray(quantize_cmap_index(img)))``."""
    import jax.numpy as jnp
    idx = jnp.clip((img * 256.0).astype(jnp.int32), 0, 255)
    return idx.astype(jnp.uint8)


_PREWARMED: set = set()


def prewarm_save(shape, dtype=None, block=False):
    """Compile the on-device uint8 quantize program for an output shape
    CONCURRENTLY with the render (round-5 verdict item 8).

    On the axon tunnel the first compile of ANY program at a new shape
    costs ~1-2 minutes (persistent-cached afterwards), so the first
    save of a fresh image shape used to stall the CLI at the very end
    of an otherwise-finished render. Kicking the compile off on a
    daemon thread as soon as the output shape is known (the CLI calls
    this right after the background image is loaded) overlaps it with
    the trace — by save time the program is compiled (or the thread is
    still absorbing the cost in parallel, never additively).

    Idempotent per (shape, dtype); returns the Thread (or None if this
    shape was already warmed) — block=True joins it, for tests and for
    measuring the cold-cache delta (BASELINE.md round 5).
    """
    import jax.numpy as jnp

    dtype = jnp.float32 if dtype is None else dtype
    key = (tuple(int(s) for s in shape), jnp.dtype(dtype).name)
    if key in _PREWARMED:
        return None
    _PREWARMED.add(key)

    def _warm():
        try:
            # np.asarray, not block_until_ready: on the axon tunnel a
            # bare block can return before the server-side compile has
            # actually run (the block-without-fetch trap,
            # BASELINE.md round 5) — only a host FETCH forces the
            # quantize chain compiled, executed, and the uint8
            # transfer path initialized. The fetch itself releases the
            # GIL while it waits, so the render keeps tracing.
            np.asarray(quantize_u8(jnp.zeros(key[0], dtype)))
        except Exception:
            # Warmup is best-effort: a failure here surfaces (if real)
            # at the actual save instead.
            pass

    import threading
    t = threading.Thread(target=_warm, daemon=True,
                         name="lpt-prewarm-save")
    t.start()
    if block:
        t.join()
    return t


def save_png(path, img, *, already_clipped=False):
    """mpimg.imsave(path, img) with the float->uint8 conversion done
    device-side when `img` is a device array (readback transfers 1/4
    the bytes; identical file contents).

    already_clipped: skip the [0,1] clip (caller guarantees range) —
    the clip is cheap and fused, so this is documentation more than
    optimization.
    """
    import matplotlib.image as mpimg

    if isinstance(img, np.ndarray):
        arr = img
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    else:
        arr = np.asarray(quantize_u8(img))
    mpimg.imsave(path, arr)
