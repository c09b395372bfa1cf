"""Multi-host (multi-process) path: 2 CPU processes x 4 virtual devices.

The standard hardware-free recipe for validating jax.distributed: spawn
two real OS processes, each with 4 virtual CPU devices, joined through a
local coordinator with gloo collectives; the 8-device global-mesh render
must equal the single-process render (SURVEY.md §5, VERDICT r1 item 4).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from light_path_tracer_tpu.models import Kerr
from light_path_tracer_tpu import camera
from light_path_tracer_tpu.parallel.multihost import trace_grid_multihost
from light_path_tracer_tpu.parallel.mesh import make_mesh

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _reference_render():
    dim = (16, 16)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    alpha = np.asarray(camera.build_alpha_lookup(dim, fov,
                                                 dtype=jnp.float64))
    theta = np.asarray(camera.build_theta_lookup(dim, fov,
                                                 dtype=jnp.float64))
    return trace_grid_multihost(
        Kerr(M=1.0, a=0.9), 100.0, alpha, theta,
        mesh=make_mesh(8), max_steps=20000)


def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH"), repo_root) if p)
    env.pop("XLA_FLAGS", None)

    outs = [str(tmp_path / f"proc{i}.npy") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), outs[i]],
            env=env, cwd=os.path.dirname(os.path.dirname(_WORKER)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    fa0 = np.load(outs[0])
    fa1 = np.load(outs[1])
    # Every process assembled the same global image.
    np.testing.assert_array_equal(fa0, fa1)

    # And it matches the single-process 8-virtual-device render.
    fa_ref, _nh, st_ref = _reference_render()
    st0 = np.load(outs[0].replace(".npy", "_status.npy"))
    np.testing.assert_array_equal(st0, np.asarray(st_ref))
    both = ~np.isnan(fa0) & ~np.isnan(np.asarray(fa_ref))
    np.testing.assert_allclose(fa0[both], np.asarray(fa_ref)[both],
                               rtol=0, atol=1e-12)
    assert (np.isnan(fa0) == np.isnan(np.asarray(fa_ref))).all()

    # Disk-mode trace: both processes agree, and match the
    # single-process sharded disk trace.
    dn0 = np.load(outs[0].replace(".npy", "_diskn.npy"))
    dn1 = np.load(outs[1].replace(".npy", "_diskn.npy"))
    np.testing.assert_array_equal(dn0, dn1)
    dr0 = np.load(outs[0].replace(".npy", "_diskr.npy"))

    from light_path_tracer_tpu.parallel.tiles import trace_disk_grid_sharded
    from light_path_tracer_tpu.disk import DiskConfig
    dim = (16, 16)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    alpha = camera.build_alpha_lookup(dim, fov, dtype=jnp.float64)
    theta = camera.build_theta_lookup(dim, fov, dtype=jnp.float64)
    ref = trace_disk_grid_sharded(
        Kerr(M=1.0, a=0.9), 100.0, alpha, theta, np.radians(80.0),
        DiskConfig(), mesh=make_mesh(8), max_steps=20000, backend="xla")
    np.testing.assert_array_equal(dn0, np.asarray(ref.n_hits))
    hit = dn0 > 0
    assert hit.sum() > 5
    np.testing.assert_allclose(dr0[hit], np.asarray(ref.r_hits[0])[hit],
                               rtol=0, atol=1e-12)
