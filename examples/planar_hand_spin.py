"""Planar hand 'spin' task: rotate the ball a full half-turn in place.

Mirrors ``/root/reference/examples/planar_hand/run_planar_hand_spin.py``
(same setup as run_planar_hand but the goal is dominated by rotation).
"""
from common import report

import numpy as np

from planar_hand import build_solver as _build_base

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig
from irs_mpc_tpu.models.contact.systems import make_planar_hand


def build_solver(gradient_mode="zero_order_B", num_samples=50, T=30):
    solver, model = _build_base(gradient_mode=gradient_mode,
                                num_samples=num_samples, T=T)
    # Override the goal: pure in-place rotation by pi/2.
    q0 = {"sphere": np.array([0.0, 0.35, 0.0]),
          "arm_left": np.array([-np.pi / 4, -np.pi / 4]),
          "arm_right": np.array([np.pi / 4, np.pi / 4])}
    xd_dict = {"sphere": q0["sphere"] + np.array([0.0, 0.0, np.pi / 2]),
               "arm_left": q0["arm_left"], "arm_right": q0["arm_right"]}
    xd = model.get_x_from_q_dict(xd_dict)
    import jax.numpy as jnp
    solver.xd_trj = jnp.asarray(np.tile(xd, (T + 1, 1)), jnp.float32)
    solver.cost = float(solver.eval_cost(solver.x_trj, solver.u_trj)[0])
    solver.cost_lst = [solver.cost]
    solver.cost_best = solver.cost
    return solver, model


MODES = ("exact", "first_order", "zero_order_AB")


def main(modes=MODES, num_iters=12):
    """Sweep the reference's spin-task modes, one curve per mode
    (planar_hand_spin_{exact,first_order,zero_order_AB}.csv,
    ref: 249.63 -> 63.79 / 62.73 / 53.51)."""
    solver = None
    for mode in modes:
        solver, model = build_solver(gradient_mode=mode)
        solver.iterate(num_iters, verbose=False)
        report(solver, f"planar_hand_spin_{mode}")
        print(f"  [{mode}] ball final:", solver.x_trj_best[-1][:3],
              "(goal theta pi/2)")
    return solver


if __name__ == "__main__":
    main()


def build_cem_solver(T=30, batch_size=100, n_elite=15):
    """CEM on the spin task (run_planar_hand_spin_cem.py analogue)."""
    import numpy as np
    from planar_hand_cem import build_solver as _cem_base
    cem, model = _cem_base(T=T, batch_size=batch_size, n_elite=n_elite)
    q0 = {"sphere": np.array([0.0, 0.35, 0.0]),
          "arm_left": np.array([-np.pi / 4, -np.pi / 4]),
          "arm_right": np.array([np.pi / 4, np.pi / 4])}
    xd_dict = {"sphere": q0["sphere"] + np.array([0.0, 0.0, np.pi / 2]),
               "arm_left": q0["arm_left"], "arm_right": q0["arm_right"]}
    xd = model.get_x_from_q_dict(xd_dict)
    import jax.numpy as jnp
    cem.xd_trj = jnp.asarray(np.tile(xd, (T + 1, 1)), jnp.float32)
    cem.cost = float(cem._cost(cem.x_trj, cem.u_trj))
    cem.cost_lst = [cem.cost]
    cem.cost_best = cem.cost
    return cem, model
