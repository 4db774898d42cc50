"""Scaling-efficiency benchmark: estimation throughput vs mesh size.

Supplemental to bench.py (BASELINE.md north star: >=80% scaling efficiency
to N devices).  Measures the mesh-sharded estimation sweep (the reference's
only distributed phase — its ZMQ farm's role) at 1, 2, 4, ... devices and
reports efficiency vs linear scaling.  On single-chip hardware, run under
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to exercise the SPMD path on virtual devices.  CAVEAT: virtual CPU devices
share the same physical cores, so measured "scaling" there is bounded by
how under-saturated the 1-device run was — it validates the code path and
collective overheads, NOT real efficiency; only real chips measure that.
"""
import json
import time

import numpy as np


def measure(mesh, system, cfg, T=64, reps=20):
    import jax
    import jax.numpy as jnp
    from irs_mpc_tpu.parallel.sharded import sharded_estimate_tv_matrices

    u_trj = jnp.ones((T, system.dim_u)) * 0.1
    x_trj = system.rollout(jnp.zeros(system.dim_x), u_trj)
    key = jax.random.PRNGKey(0)

    f = jax.jit(lambda k: sharded_estimate_tv_matrices(
        system, "zero_order", x_trj, u_trj, k, 1.0, cfg, mesh))
    out = f(key)
    jax.block_until_ready(out.A)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(key)
    jax.block_until_ready(out.A)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    from irs_mpc_tpu import SmoothingConfig, make_pendulum
    from irs_mpc_tpu.parallel.sharded import make_mesh

    n_dev = len(jax.devices())
    system = make_pendulum(0.05)
    # Fixed GLOBAL problem size (strong scaling).
    cfg = SmoothingConfig(num_samples=1 << 14, std_x=1.0, std_u=1.0)

    results = {}
    sizes = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]
    for s in sizes:
        mesh = make_mesh(s, 1, jax.devices()[:s])
        dt = measure(mesh, system, cfg)
        results[s] = dt
    base = results[sizes[0]]
    report = {
        str(s): {
            "seconds_per_sweep": round(results[s], 5),
            "speedup": round(base / results[s], 2),
            "efficiency": round(base / results[s] / s, 3),
        } for s in sizes
    }
    out = {"metric": "estimation_sweep_scaling",
           "devices": n_dev, "platform": jax.default_backend(),
           "results": report}
    if jax.default_backend() == "cpu":
        out["caveat"] = ("virtual CPU devices share physical cores: this "
                         "validates the SPMD code path and collective "
                         "overheads, NOT real scaling efficiency (the "
                         "1-device XLA CPU run already saturates the host)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
