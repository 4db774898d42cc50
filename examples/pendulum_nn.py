"""Learned-dynamics pendulum: train an MLP model, then swing up through it.

Mirrors ``/root/reference/examples/pendulum/pendulum_nn.py``: MLP trained on
20k random transitions, then IrsMpcExact/ZeroOrder run against the learned
model unchanged (solver is dynamics-agnostic).  Final rollout is evaluated on
the TRUE dynamics to report the real achieved cost.
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig, make_pendulum
from irs_mpc_tpu.models.mlp import train_mlp_dynamics


def main():
    true_sys = make_pendulum(0.05)
    nn_sys = train_mlp_dynamics(true_sys, num_transitions=20_000,
                                hidden=(64, 64), epochs=600)
    print(f"MLP train loss: {nn_sys.final_loss:.2e}")

    T = 100
    for mode in ["exact", "zero_order"]:
        params = IrsMpcParams(
            Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
            x0=np.zeros(2),
            xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
            u_trj_init=np.tile([0.1], (T, 1)),
            gradient_mode=mode,
            smoothing=SmoothingConfig(num_samples=500, std_x=0.5, std_u=0.5))
        solver = IrsMpc(nn_sys, params)
        solver.iterate(10, verbose=False)
        report(solver, f"pendulum_nn_{mode}", save=False)
        # Cross-evaluate the learned-model plan on the true dynamics.
        import jax.numpy as jnp
        x_true = true_sys.rollout(jnp.zeros(2),
                                  jnp.asarray(solver.u_trj_best))
        true_cost = float(solver.eval_cost(x_true,
                                           jnp.asarray(solver.u_trj_best))[0])
        print(f"  plan evaluated on TRUE dynamics: {true_cost:.2f}")


if __name__ == "__main__":
    main()
