"""Render-server tests: live HTTP round trips against an in-process
server (stdlib only), covering warm-cache reuse, every mode, and error
handling."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from light_path_tracer_tpu.serve import make_server, RenderService


@pytest.fixture(scope="module")
def server_url():
    server = make_server(port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", server
    server.shutdown()
    server.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/render", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read(), dict(resp.headers)


def _npy(body: bytes) -> np.ndarray:
    return np.load(io.BytesIO(body), allow_pickle=False)


def test_healthz(server_url):
    url, _server = server_url
    with urllib.request.urlopen(url + "/healthz") as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["devices"] >= 1


def test_shadow_roundtrip_and_warm_cache(server_url):
    url, _server = server_url
    payload = {"mode": "shadow", "size": [48, 48], "format": "npy",
               "scene": {"a": 0.9, "theta_obs": 90.0},
               "render": {"dtype": "float64"}}
    status, body, hdr = _post(url, payload)
    assert status == 200 and hdr["X-Cache"] == "cold"
    img = _npy(body)
    assert img.shape == (48, 48)
    assert (img == 0.0).sum() > 10          # shadow present

    # Same signature again: warm, and typically much faster.
    status2, body2, hdr2 = _post(url, payload)
    assert status2 == 200 and hdr2["X-Cache"] == "warm"
    np.testing.assert_array_equal(_npy(body2), img)

    # Stats reflect both requests on one signature.
    with urllib.request.urlopen(url + "/stats") as resp:
        stats = json.loads(resp.read())
    shadow_sigs = [s for s in stats["per_signature"]
                   if s["mode"] == "shadow"]
    assert any(s["count"] >= 2 for s in shadow_sigs)


@pytest.mark.slow
def test_lens_and_composite_roundtrip(server_url):
    url, _server = server_url
    rng = np.random.default_rng(2)
    src = rng.uniform(0.1, 0.9, (32, 40, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, src, allow_pickle=False)
    b64 = base64.b64encode(buf.getvalue()).decode()

    status, body, _hdr = _post(url, {
        "mode": "lens", "format": "npy", "image_b64": b64,
        "scene": {"a": 0.9, "theta_obs": 80.0},
        "render": {"dtype": "float64"}})
    assert status == 200
    assert _npy(body).shape == (32, 40, 3)

    status, body, _hdr = _post(url, {
        "mode": "composite", "format": "npy", "image_b64": b64,
        "scene": {"a": 0.9, "theta_obs": 80.0},
        "render": {"dtype": "float64"},
        "disk": {"spectrum": "blackbody"}})
    assert status == 200
    comp = _npy(body)
    assert comp.shape == (32, 40, 3) and np.isfinite(comp).all()


@pytest.mark.slow
def test_disk_png_roundtrip(server_url):
    url, _server = server_url
    status, body, hdr = _post(url, {
        "mode": "disk", "size": [32, 32], "format": "png",
        "scene": {"a": 0.9, "theta_obs": 80.0},
        "render": {"dtype": "float64"}})
    assert status == 200
    assert hdr["Content-Type"] == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_bad_request_is_400_not_crash(server_url):
    url, _server = server_url
    req = urllib.request.Request(
        url + "/render", data=json.dumps({"mode": "nope"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as err:
        raised = True
        assert err.code == 400
        assert b"error" in err.read()
    assert raised
    # Server still healthy afterwards.
    with urllib.request.urlopen(url + "/healthz") as resp:
        assert json.loads(resp.read())["ok"]


def test_scene_degrees_and_boost_parsing():
    svc = RenderService()
    from light_path_tracer_tpu.serve import _scene_from_json
    scene = _scene_from_json({"a": 0.5, "theta_obs": 80.0,
                              "psi_x": 2.0, "boost": [0, 0, 0.3]})
    assert np.isclose(scene.theta_obs, np.radians(80.0))
    assert np.isclose(scene.psi_x, np.radians(2.0))
    assert scene.boost == (0.0, 0.0, 0.3)
    assert svc.stats()["requests"] == 0


def test_png_background_decode(server_url):
    """PNG (not npy) background images decode through the same endpoint."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    rng = np.random.default_rng(8)
    src = rng.uniform(0.2, 0.8, (24, 30, 3)).astype(np.float32)
    buf = io.BytesIO()
    mpimg.imsave(buf, src, format="png")
    b64 = base64.b64encode(buf.getvalue()).decode()
    url, _server = server_url
    status, body, _hdr = _post(url, {
        "mode": "lens", "format": "npy", "image_b64": b64,
        "scene": {"a": 0.9}, "render": {"dtype": "float64"}})
    assert status == 200
    out = _npy(body)
    assert out.shape[0] == 24 and out.shape[1] == 30


def test_server_error_taxonomy(server_url):
    """Bad client input -> 400; internal render failure -> 500."""
    url, _server = server_url
    # Unknown scene field and invalid size are CLIENT errors -> 400.
    for bad in ({"mode": "shadow", "scene": {"nonsense_field": 1}},
                {"mode": "shadow", "size": [-4, 0]}):
        req = urllib.request.Request(
            url + "/render", data=json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as err:
            assert err.code == 400, bad

    # A genuine render-side failure -> 500 (separate server whose
    # service is broken, standing in for compile errors / device OOM).
    from light_path_tracer_tpu.serve import make_server

    class BrokenService(RenderService):
        def render(self, *a, **kw):
            raise RuntimeError("device exploded")

    srv = make_server(port=0, service=BrokenService())
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        host, port = srv.server_address[:2]
        req = urllib.request.Request(
            f"http://{host}:{port}/render",
            data=json.dumps({"mode": "shadow", "size": [8, 8]}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as err:
            assert err.code == 500
            assert b"device exploded" in err.read()
    finally:
        srv.shutdown()
        srv.server_close()


def _post_raw(url, payload):
    """POST that surfaces non-2xx statuses instead of raising."""
    import urllib.error
    req = urllib.request.Request(
        url + "/render", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as err:
        return err.code, err.read(), dict(err.headers)


@pytest.fixture()
def busy_server():
    """Server whose render lock is HELD (simulating a long render in
    flight) with a tiny queue — the overload/deadline/liveness story."""
    svc = RenderService(max_queue=1, default_deadline_s=0.2)
    server = make_server(port=0, service=svc)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    assert svc._lock.acquire(timeout=1.0)   # occupy the "running" slot
    yield f"http://{host}:{port}", svc
    svc._lock.release()
    server.shutdown()
    server.server_close()


def test_deadline_exceeded_is_503(busy_server):
    """A request stuck behind a long render gets 503 deadline exceeded
    within its deadline, not an indefinite hang."""
    url, _svc = busy_server
    import time as _time
    t0 = _time.perf_counter()
    status, body, _ = _post_raw(url, {"mode": "shadow",
                                      "size": [16, 16],
                                      "deadline_s": 0.1})
    waited = _time.perf_counter() - t0
    assert status == 503
    assert json.loads(body)["error"] == "deadline exceeded"
    assert waited < 5.0


def test_queue_overflow_is_503_with_retry_after(busy_server):
    """Beyond max_queue waiting requests, new ones are rejected
    IMMEDIATELY (503 overloaded + Retry-After) instead of piling up."""
    url, svc = busy_server
    results = []

    def waiter():
        results.append(_post_raw(url, {"mode": "shadow",
                                       "size": [16, 16],
                                       "deadline_s": 3.0}))

    # Fill the queue (max_queue=1) with one long-deadline waiter...
    t = threading.Thread(target=waiter)
    t.start()
    for _ in range(100):
        with svc._meta:
            if svc._waiting >= 1:
                break
        threading.Event().wait(0.02)
    assert svc.stats()["waiting"] >= 1
    # ...then the next request must bounce instantly.
    status, body, headers = _post_raw(url, {"mode": "shadow",
                                            "size": [16, 16]})
    assert status == 503
    assert json.loads(body)["error"] == "overloaded"
    assert headers.get("Retry-After") == "1"
    # Release the lock so the queued waiter can finish cleanly.
    svc._lock.release()
    t.join(timeout=30)
    assert svc._lock.acquire(timeout=5.0)   # re-acquire for teardown
    assert not t.is_alive()
    assert results and results[0][0] in (200, 503)


def test_healthz_responsive_while_render_lock_held(busy_server):
    """/healthz and /stats never touch the render lock: liveness
    probes answer fast even while a long render runs."""
    url, _svc = busy_server
    import time as _time
    t0 = _time.perf_counter()
    with urllib.request.urlopen(url + "/healthz") as resp:
        ok = json.loads(resp.read())["ok"]
    with urllib.request.urlopen(url + "/stats") as resp:
        stats = json.loads(resp.read())
    assert ok and stats["max_queue"] == 1
    assert _time.perf_counter() - t0 < 2.0


@pytest.mark.slow
def test_charged_scene_over_http(server_url):
    """SceneConfig.Q flows through the JSON scene dict: a charged
    shadow is smaller than the uncharged one at equal spin."""
    url, _server = server_url
    imgs = {}
    for q in (0.0, 0.8):
        payload = {"mode": "shadow", "size": [40, 40], "format": "npy",
                   "scene": {"a": 0.4, "Q": q, "theta_obs": 90.0},
                   "render": {"dtype": "float64"}}
        status, body, _hdr = _post(url, payload)
        assert status == 200
        imgs[q] = _npy(body)
    dark_uncharged = int((imgs[0.0] == 0.0).sum())
    dark_charged = int((imgs[0.8] == 0.0).sum())
    assert 0 < dark_charged < dark_uncharged


def test_magnification_mode(server_url):
    url, _server = server_url
    payload = {"mode": "magnification", "size": [32, 32],
               "format": "npy",
               "scene": {"a": 0.0, "vertical_fov_deg": 40.0}}
    status, body, _hdr = _post(url, payload)
    assert status == 200
    mu = _npy(body)
    assert mu.shape == (32, 32)
    fin = np.isfinite(mu)
    assert fin.any() and (~fin).any()           # far field + shadow
    assert (mu[fin] < 0).any() and (mu[fin] > 0).any()  # both parities
    # png format ships the display encoding (no NaN in the bytes).
    payload["format"] = "png"
    status2, body2, hdr2 = _post(url, payload)
    assert status2 == 200 and hdr2["Content-Type"] == "image/png"


@pytest.mark.slow
def test_volumetric_mode(server_url):
    url, _server = server_url
    payload = {"mode": "volumetric", "size": [24, 24], "format": "npy",
               "scene": {"a": 0.9, "theta_obs": 80.0},
               "riaf": {"profile": "torus", "g_power": 3.0},
               "render": {"max_steps": 20000}}
    status, body, hdr = _post(url, payload)
    assert status == 200
    img = _npy(body)
    assert img.shape == (24, 24)
    assert np.isfinite(img).all()
    assert img.max() > 0                         # emission present
    # Second identical request hits the warm compiled-program cache.
    status2, _body2, hdr2 = _post(url, payload)
    assert status2 == 200 and hdr2["X-Cache"] == "warm"
    # Bad riaf field -> 400 (client error, not a crash).
    bad = dict(payload, riaf={"profile": "blob"})
    status3, body3, _ = _post_raw(url, bad)
    assert status3 == 400
    assert b"profile" in body3


def test_star_mode(server_url):
    url, _server = server_url
    payload = {"mode": "star", "size": [24, 24], "format": "npy",
               "scene": {"a": 0.0, "theta_obs": 90.0,
                         "vertical_fov_deg": 8.0},
               "star": {"radius": 5.0, "omega": 0.02,
                        "spots": [[30.0, 0.0, 20.0, 1.0]]},
               "render": {"max_steps": 20000}}
    status, body, hdr = _post(url, payload)
    assert status == 200
    img = _npy(body)
    assert img.shape == (24, 24)
    assert np.isfinite(img).all() and img.max() > 0
    status2, _body2, hdr2 = _post(url, payload)
    assert status2 == 200 and hdr2["X-Cache"] == "warm"
    # Malformed spot -> 400; unphysical radius -> 500 (server-side
    # geometry validation needs the metric, so it fails in render).
    bad = dict(payload, star={"spots": [[1.0, 2.0]]})
    status3, body3, _ = _post_raw(url, bad)
    assert status3 == 400 and b"spot" in body3


@pytest.mark.slow
def test_caustics_and_timedelay_modes(server_url):
    url, _server = server_url
    payload = {"mode": "caustics", "size": [24, 24], "format": "npy",
               "scene": {"a": 0.0, "r_obs_mult": 1000.0,
                         "vertical_fov_deg": 40.0},
               "render": {"dtype": "float64"}}
    status, body, _hdr = _post(url, payload)
    assert status == 200
    amap = _npy(body)
    assert amap.shape == (12, 12) and (amap >= 0).all()
    payload["format"] = "png"
    status2, _body2, hdr2 = _post(url, payload)
    assert status2 == 200 and hdr2["Content-Type"] == "image/png"

    payload = {"mode": "timedelay", "size": [24, 24], "format": "npy",
               "scene": {"a": 0.0, "r_obs_mult": 1000.0,
                         "vertical_fov_deg": 40.0},
               "render": {"dtype": "float64"}}
    status, body, _hdr = _post(url, payload)
    assert status == 200
    tau = _npy(body)
    assert tau.shape == (24, 24)
    fin = np.isfinite(tau)
    assert fin.any() and np.nanmin(tau) == 0.0
    payload["format"] = "png"
    status2, _body2, hdr2 = _post(url, payload)
    assert status2 == 200 and hdr2["Content-Type"] == "image/png"


@pytest.mark.slow
def test_shear_mode(server_url):
    url, _server = server_url
    payload = {"mode": "shear", "size": [24, 24], "format": "npy",
               "scene": {"a": 0.5, "vertical_fov_deg": 40.0},
               "render": {"dtype": "float32"}}
    status, body, _hdr = _post(url, payload)
    assert status == 200
    maps = _npy(body)
    # (kappa, gamma1, gamma2, omega, gamma) stacked.
    assert maps.shape == (5, 24, 24)
    gamma = maps[4]
    fin = np.isfinite(gamma)
    assert fin.any() and (gamma[fin] >= 0).all()
    payload["format"] = "png"
    status2, _body2, hdr2 = _post(url, payload)
    assert status2 == 200 and hdr2["Content-Type"] == "image/png"


def test_custom_metric_rejected_over_http(server_url):
    url, _server = server_url
    payload = {"mode": "shadow", "size": [16, 16],
               "scene": {"a": 0.0, "custom_metric": "evil"}}
    status, body, _hdr = _post_raw(url, payload)
    assert status == 400
    assert b"custom_metric" in body
