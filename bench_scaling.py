"""Scaling-efficiency benchmark: estimation throughput vs mesh size.

Supplemental to bench.py (BASELINE.md north star: >=80% scaling efficiency
to N devices).  Measures the mesh-sharded estimation sweep (the reference's
only distributed phase — its ZMQ farm's role, ``irs_lqr_quasistatic.py:
228-273``) three ways:

* STRONG scaling — fixed global sample count, devices 1, 2, 4, ...;
  efficiency = t(1) / (t(s) * s).
* WEAK scaling — fixed per-device sample count (global grows with the
  mesh); efficiency = t(1) / t(s) (ideal: flat).
* PER-PHASE breakdown — the sweep is one fused XLA program, so phases are
  isolated by timing structurally-identical sub-programs: the ``psum``
  collective of the per-knot regression moments alone (same shapes and
  mesh as the real reduction), and the per-knot least-squares fit alone.
  ``compute`` is reported as the remainder.  On virtual CPU devices the
  collective column is the only number that generalizes to hardware —
  virtual devices share physical cores, so "scaling" of the compute phase
  there only measures how under-saturated the 1-device run was.

Run under
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to exercise the SPMD path on virtual devices; on a real slice it measures
true efficiency.
"""
import json
import os
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    # The axon TPU plugin registers via sitecustomize, so JAX_PLATFORMS=cpu
    # alone is not honored (same dance as tests/conftest.py): force the
    # virtual 8-device CPU mesh through jax.config before any computation.
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")


def _time(f, *args, reps=20):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure_sweep(mesh, system, cfg, T=64, reps=20):
    """Full estimation sweep seconds/iteration on the given mesh."""
    import jax
    import jax.numpy as jnp
    from irs_mpc_tpu.parallel.sharded import sharded_estimate_tv_matrices

    u_trj = jnp.ones((T, system.dim_u)) * 0.1
    x_trj = system.rollout(jnp.zeros(system.dim_x), u_trj)
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda k: sharded_estimate_tv_matrices(
        system, "zero_order", x_trj, u_trj, k, 1.0, cfg, mesh))
    return _time(f, key, reps=reps)


def measure_collective(mesh, n, m, T=64, reps=50):
    """The moment-psum alone: same tensor shapes, mesh, and axis as the real
    reduction inside ``sharded_estimate_tv_matrices`` (G (p,p), M (p,n) per
    local knot), nothing else."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    p = n + m
    n_knot = mesh.shape["knot"]
    T_local = (T + n_knot - 1) // n_knot

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("knot"), P("knot")), out_specs=P("knot"))
    def reduce_moments(G, M):
        return (jax.lax.psum(G, "sample"),
                jax.lax.psum(M, "sample"))

    G = jnp.ones((T_local * n_knot, p, p), jnp.float32)
    M = jnp.ones((T_local * n_knot, p, n), jnp.float32)
    return _time(lambda: reduce_moments(G, M), reps=reps)


def measure_fit(n, m, T=64, reps=50):
    """The per-knot least-squares fit alone (replicated: every device does
    all T fits in the real sweep's tail)."""
    import jax
    import jax.numpy as jnp
    from irs_mpc_tpu.ops.estimators import fit_from_moments

    p = n + m
    rng = np.random.RandomState(0)
    S = rng.randn(T, 256, p).astype(np.float32)
    G = jnp.einsum("tsp,tsq->tpq", S, S)
    M = jnp.asarray(rng.randn(T, p, n), jnp.float32)
    f = jax.jit(jax.vmap(fit_from_moments))
    return _time(lambda: f(G, M), reps=reps)


def main():
    import jax
    from irs_mpc_tpu import SmoothingConfig, make_pendulum
    from irs_mpc_tpu.parallel.sharded import make_mesh

    n_dev = len(jax.devices())
    system = make_pendulum(0.05)
    n, m = system.dim_x, system.dim_u
    sizes = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]

    GLOBAL_SAMPLES = 1 << 14          # strong-scaling problem size
    PER_DEVICE_SAMPLES = 1 << 12      # weak-scaling per-device size

    fit_t = measure_fit(n, m)
    strong, weak = {}, {}
    for s in sizes:
        mesh = make_mesh(s, 1, jax.devices()[:s])
        coll_t = measure_collective(mesh, n, m)
        cfg_s = SmoothingConfig(num_samples=GLOBAL_SAMPLES,
                                std_x=1.0, std_u=1.0)
        t_s = measure_sweep(mesh, system, cfg_s)
        strong[s] = {"total": t_s, "collective": coll_t, "fit": fit_t,
                     "compute": max(0.0, t_s - coll_t - fit_t)}
        cfg_w = SmoothingConfig(num_samples=PER_DEVICE_SAMPLES * s,
                                std_x=1.0, std_u=1.0)
        t_w = measure_sweep(mesh, system, cfg_w)
        weak[s] = {"total": t_w, "collective": coll_t, "fit": fit_t,
                   "compute": max(0.0, t_w - coll_t - fit_t)}

    def table(res, weak_mode):
        base = res[sizes[0]]["total"]
        out = {}
        for s in sizes:
            r = res[s]
            eff = (base / r["total"] if weak_mode
                   else base / r["total"] / s)
            out[str(s)] = {
                "seconds_per_sweep": round(r["total"], 5),
                "collective_s": round(r["collective"], 6),
                "fit_s": round(r["fit"], 6),
                "compute_s": round(r["compute"], 5),
                "collective_frac": round(r["collective"] / r["total"], 4),
                "efficiency": round(eff, 3),
            }
        return out

    out = {"metric": "estimation_sweep_scaling",
           "devices": n_dev, "platform": jax.default_backend(),
           "strong": {"global_samples": GLOBAL_SAMPLES,
                      "results": table(strong, weak_mode=False)},
           "weak": {"per_device_samples": PER_DEVICE_SAMPLES,
                    "results": table(weak, weak_mode=True)}}
    if jax.default_backend() == "cpu":
        out["caveat"] = (
            "virtual CPU devices share physical cores: compute-phase "
            "scaling here only measures how under-saturated the 1-device "
            "run was; the collective column (the real SPMD overhead) is "
            "the honest hardware-relevant signal")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
