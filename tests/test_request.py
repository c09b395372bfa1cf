"""Offline replay of serve-style requests (`serve.render_request` +
CLI `request` subcommand): the POST /render body rendered locally
through the exact serving contract — shared decode (decode_request),
shared mode dispatch (RenderService), shared display encodings
(_display_encode). Reproducible scene files; local debugging of
recorded production requests."""

import io
import json

import numpy as np
import pytest

from light_path_tracer_tpu.serve import (render_request, decode_request,
                                         RenderService)
from light_path_tracer_tpu.cli import main


def test_render_request_shadow_png():
    body, ctype, dt, cache = render_request(
        {"mode": "shadow", "size": [24, 24], "scene": {"a": 0.6}})
    assert ctype == "image/png" and body[:8] == b"\x89PNG\r\n\x1a\n"
    assert cache == "cold" and dt > 0


def test_render_request_npy_matches_direct_render():
    from light_path_tracer_tpu.utils.config import (SceneConfig,
                                                    RenderConfig)
    from light_path_tracer_tpu.pipeline import render_shadow
    body, ctype, _dt, _cache = render_request(
        {"mode": "shadow", "size": [24, 24], "scene": {"a": 0.6},
         "format": "npy"})
    assert ctype == "application/octet-stream"
    got = np.load(io.BytesIO(body))
    want, _stats = render_shadow(SceneConfig(a=0.6), (24, 24),
                                 RenderConfig())
    np.testing.assert_array_equal(got, np.asarray(want))


def test_render_request_warm_cache_on_shared_service():
    svc = RenderService()
    req = {"mode": "shadow", "size": [24, 24]}
    _b, _c, _d, cache0 = render_request(req, svc=svc)
    _b, _c, _d, cache1 = render_request(req, svc=svc)
    assert (cache0, cache1) == ("cold", "warm")


def test_render_request_lens_with_source_image_override():
    src = np.random.default_rng(0).uniform(
        size=(16, 16, 3)).astype(np.float32)
    body, ctype, *_ = render_request(
        {"mode": "lens", "scene": {"r_obs_mult": 100.0}},
        source_image=src)
    assert ctype == "image/png" and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_decode_request_rejects_missing_lens_image():
    # The HTTP path must keep classifying a lens request without
    # image_b64 as a CLIENT error (KeyError -> 400).
    with pytest.raises(KeyError):
        decode_request({"mode": "lens"})


def test_decode_request_rejects_bad_mode_and_custom_metric():
    with pytest.raises(ValueError):
        decode_request({"mode": "warp-drive"})
    with pytest.raises(ValueError):
        decode_request({"mode": "shadow",
                        "scene": {"custom_metric": "x.py:f"}})
    with pytest.raises(ValueError):
        decode_request({"mode": "shadow", "size": [0, 24]})


def test_cli_request_roundtrip(tmp_path):
    req = tmp_path / "req.json"
    req.write_text(json.dumps({"mode": "shadow", "size": [24, 24]}))
    out = tmp_path / "out.png"
    assert main(["request", str(req), "--output", str(out)]) == 0
    assert out.exists() and out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_request_bad_mode_exits(tmp_path):
    req = tmp_path / "req.json"
    req.write_text(json.dumps({"mode": "nope"}))
    with pytest.raises(SystemExit):
        main(["request", str(req),
              "--output", str(tmp_path / "x.png")])
