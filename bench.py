"""Benchmark: smoothed-rollout throughput of the full iRS-MPC iteration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Monte-Carlo sample rollouts per second per chip, counted inside the
full jitted iteration (sampling + rollout + least-squares fit + Riccati +
line-searched forward pass) on the pendulum flagship — i.e. useful work, not
a microbenchmark.  Baseline (BASELINE.json): 10,000 smoothed rollouts/s/chip
on the reference's CPU worker farm design.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from irs_mpc_tpu import (IrsMpc, IrsMpcParams, SmoothingConfig,
                             make_pendulum)

    T = 200
    num_samples = 1000  # matches pendulum_zero_order.py:33
    params = IrsMpcParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2),
        xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)),
        gradient_mode="zero_order",
        smoothing=SmoothingConfig(num_samples=num_samples, std_x=1.0,
                                  std_u=1.0),
        # NOTE: parallel_riccati (associative scan) measures ~10% faster per
        # iteration at T=200 but its compile time on the axon remote-compile
        # path is erratic; the benchmark must complete reliably, so it uses
        # the sequential scan.
    )
    solver = IrsMpc(make_pendulum(0.05), params)

    it = jnp.asarray(1.0, jnp.float32)
    # Warm up / compile.
    x, u, key, out = solver._iteration_jit(solver.x_trj, solver.u_trj,
                                           solver.key, it)
    jax.block_until_ready(out[0])

    n_reps = 50
    t0 = time.perf_counter()
    for _ in range(n_reps):
        x, u, key, out = solver._iteration_jit(x, u, key, it)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / n_reps

    rollouts_per_iter = T * num_samples
    value = rollouts_per_iter / dt
    baseline = 10_000.0
    print(json.dumps({
        "metric": "smoothed_rollouts_per_s_per_chip",
        "value": round(value, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
