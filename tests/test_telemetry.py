"""Telemetry / timing utility tests."""

import time

import jax.numpy as jnp

from light_path_tracer_tpu.utils.timing import StageTimer
from light_path_tracer_tpu.utils.telemetry import (
    HostTelemetry, device_memory)


def test_stage_timer_blocks_and_accumulates():
    t = StageTimer()
    with t.stage("a") as out:
        x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
        out.append(x)
    with t.stage("b"):
        time.sleep(0.05)
    with t.stage("b"):
        time.sleep(0.05)
    timings = t.finish()
    assert timings["a"] > 0
    assert timings["b"] >= 0.1          # accumulates across entries
    assert timings["total"] >= timings["b"]


def test_host_telemetry():
    t = HostTelemetry()
    _ = sum(i * i for i in range(200000))
    s = t.sample()
    assert s["wall_s"] > 0
    assert s["cpu_s"] >= 0
    assert s["rss_mib"] > 10
    assert s["peak_rss_mib"] >= s["rss_mib"] - 1


def test_device_memory_shape():
    out = device_memory()
    assert len(out) >= 1   # stats may be None on CPU; keys exist


def test_live_bar_renders_and_completes():
    """LiveBar writes an in-place ANSI line with chunk count, CPU%% and
    RSS, and terminates with a newline at completion."""
    import io
    from light_path_tracer_tpu.utils.progress import LiveBar, chunk_iterator

    buf = io.StringIO()
    bar = LiveBar(4, desc="Test", stream=buf, min_interval=0.0)
    for i in range(4):
        bar.update(i + 1)
    out = buf.getvalue()
    assert out.count("\r") == 4
    assert out.endswith("\n")
    assert "4/4" in out and "cpu" in out and "MiB" in out
    assert "[" in out and "#" in out

    # chunk_iterator dispatch: live -> generator, True -> tqdm, False -> iter
    got = list(chunk_iterator(range(0, 30, 10), False))
    assert got == [0, 10, 20]
    got = list(chunk_iterator(range(0, 30, 10), "live"))
    assert got == [0, 10, 20]
