"""Child program for the 2-process ``jax.distributed`` test.

Each process owns 2 virtual CPU devices; together they form one 4-device
(sample=2, knot=2) mesh and run a mesh-sharded zero-order estimation sweep
whose moments are psum-reduced ACROSS the process boundary.  This is the
repo's analogue of the reference's actually-exercised deployment mode — the
multi-process ZMQ farm (``/root/reference/zmq_parallel_cmp/
simple_task_vent.py:13-51``, 18-30 worker processes per example) — driven
for real instead of as a single-process no-op.

Run by ``tests/test_parallel.py::test_jax_distributed_two_process`` with
env: IRS_COORD_PORT, IRS_PROC_ID, IRS_NUM_PROCS, IRS_OUT.  Also runnable by
hand (two shells, same port, IRS_PROC_ID=0/1).
"""
import os
import sys


def main():
    port = os.environ["IRS_COORD_PORT"]
    pid = int(os.environ["IRS_PROC_ID"])
    nproc = int(os.environ["IRS_NUM_PROCS"])
    out_path = os.environ["IRS_OUT"]

    # 2 virtual CPU devices per process (strip any inherited forcing first).
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax
    jax.config.update("jax_platforms", "cpu")  # before ANY computation

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from irs_mpc_tpu.parallel import multihost

    # Must come before backend init; multihost.initialize guards this.
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert multihost.is_coordinator() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from irs_mpc_tpu import make_pendulum
    from irs_mpc_tpu.ops.estimators import SmoothingConfig
    from irs_mpc_tpu.parallel.sharded import sharded_estimate_tv_matrices

    system = make_pendulum(0.05)
    T = 12
    rng = np.random.RandomState(0)
    u_trj = (0.5 * rng.randn(T, 1)).astype(np.float32)
    x_trj = np.asarray(system.rollout(jnp.zeros(2), jnp.asarray(u_trj)))

    mesh = multihost.pod_mesh(knot_shards=2)   # (sample=2, knot=2) global
    rep = NamedSharding(mesh, P())

    def gput(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, rep, lambda idx: a[idx])

    cfg = SmoothingConfig(num_samples=64, std_u=0.2, std_x=0.2)
    fn = jax.jit(lambda x, u, k, i: sharded_estimate_tv_matrices(
        system, "zero_order", x, u, k, i, cfg, mesh))
    lin = fn(gput(x_trj), gput(u_trj),
             gput(jax.random.PRNGKey(7)), gput(np.float32(1.0)))

    A = multihost_utils.process_allgather(lin.A, tiled=True)
    B = multihost_utils.process_allgather(lin.B, tiled=True)
    c = multihost_utils.process_allgather(lin.c, tiled=True)
    np.savez(f"{out_path}.{pid}.npz", A=np.asarray(A), B=np.asarray(B),
             c=np.asarray(c), n_devices=len(jax.devices()),
             n_local=len(jax.local_devices()))
    print(f"proc {pid}: ok ({len(jax.local_devices())} local / "
          f"{len(jax.devices())} global devices)", flush=True)


if __name__ == "__main__":
    main()
