"""Worker process for tests/test_multihost.py.

Usage: python multihost_worker.py <process_id> <num_processes> <port> \
           <out.npy> [mode]

Joins a 2-process x 4-virtual-CPU-device jax.distributed cluster (gloo
collectives — the standard way to exercise the multi-host path without
hardware), renders a small Kerr grid sharded over the 8 global devices,
and writes the assembled final_alpha grid (identical on every process).

mode (default "normal"):
  * "die"     — after the first render completes (a known-good sync
                point), hard-exit with os._exit(42) WITHOUT
                participating in any further collective: simulates a
                host crash mid-job.
  * "survive" — after the first render, attempt a SECOND render. With
                the peer dead, its allgather cannot complete; the
                distributed runtime (heartbeat_timeout_s=10 here) must
                surface a clear error in bounded time rather than hang
                (round-4 verdict item 7).
"""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "normal"

    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_enable_x64", True)

    from light_path_tracer_tpu.parallel.multihost import (
        initialize_multihost, make_global_mesh, trace_grid_multihost)

    initialize_multihost(coordinator_address=f"localhost:{port}",
                         num_processes=num_procs, process_id=proc_id,
                         heartbeat_timeout_s=(
                             10.0 if mode != "normal" else None))
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

    import numpy as np
    from light_path_tracer_tpu.models import Kerr
    from light_path_tracer_tpu import camera

    dim = (16, 16)
    fov = camera.fov_from_vertical(np.radians(40.0), dim)
    import jax.numpy as jnp
    alpha = np.asarray(camera.build_alpha_lookup(dim, fov,
                                                 dtype=jnp.float64))
    theta = np.asarray(camera.build_theta_lookup(dim, fov,
                                                 dtype=jnp.float64))

    mesh = make_global_mesh()
    fa, nh, st = trace_grid_multihost(
        Kerr(M=1.0, a=0.9), 100.0, alpha, theta, mesh=mesh,
        max_steps=20000)

    np.save(out_path, fa)
    np.save(out_path.replace(".npy", "_status.npy"), st)

    if mode == "die":
        print(f"worker {proc_id} dying now (simulated crash)",
              flush=True)
        os._exit(42)
    if mode == "survive":
        # Second render: the peer is dead, so the cross-process
        # allgather cannot complete — the runtime must error out, not
        # hang. The render itself (local shards) still executes.
        print(f"worker {proc_id} starting post-crash render",
              flush=True)
        trace_grid_multihost(
            Kerr(M=1.0, a=0.9), 100.0, alpha * 1.000001, theta,
            mesh=mesh, max_steps=20000)
        print(f"worker {proc_id} post-crash render UNEXPECTEDLY "
              f"succeeded", flush=True)
        sys.exit(3)

    # Disk-mode trace over the same global mesh (crossing recorder on).
    from light_path_tracer_tpu.parallel.multihost import (
        trace_disk_grid_multihost)
    from light_path_tracer_tpu.disk import DiskConfig
    dres = trace_disk_grid_multihost(
        Kerr(M=1.0, a=0.9), 100.0, alpha, theta, np.radians(80.0),
        DiskConfig(), mesh=mesh, max_steps=20000, backend="xla")
    np.save(out_path.replace(".npy", "_diskn.npy"), dres.n_hits)
    np.save(out_path.replace(".npy", "_diskr.npy"), dres.r_hits[0])
    print(f"worker {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
