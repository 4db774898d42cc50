"""Plate pickup: gripper grasps a plate off the ground and lifts it.

Mirrors ``/root/reference/examples/plate_pickup/run_plate_pickup.py``
(dim_x=8, dim_u=5, uses relative input bounds u_bounds_rel,
``run_plate_pickup.py:136-137``).
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig
from irs_mpc_tpu.models.contact.systems import make_plate_pickup


def build_solver(gradient_mode="zero_order_B", num_samples=100, T=30):
    model = make_plate_pickup(h=0.1)
    system = model.system()
    idx_u = model.indices_u_into_x()

    # Plate on the ground; gripper hovering above it, fingers open.
    q0 = {"plate": np.array([0.0, 0.04, 0.0]),
          "gripper": np.array([0.0, 0.30, 0.0, -0.10, -0.10])}
    x0 = model.get_x_from_q_dict(q0)
    # Goal: plate lifted 0.3 m.
    xd_dict = {"plate": np.array([0.0, 0.35, 0.0]),
               "gripper": np.array([0.0, 0.6, 0.0, 0.0, 0.0])}
    xd = model.get_x_from_q_dict(xd_dict)

    Q_dict = {"plate": np.array([1.0, 50.0, 5.0]),
              "gripper": np.array([1e-4] * 5)}
    Qd_dict = {k: v * 100 for k, v in Q_dict.items()}
    R_dict = {"gripper": np.array([1.0, 1.0, 1.0, 1.0, 1.0])}

    params = IrsMpcParams(
        Q=model.get_Q_from_Q_dict(Q_dict),
        Qd=model.get_Q_from_Q_dict(Qd_dict),
        R=model.get_R_from_R_dict(R_dict),
        x0=x0, xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile(x0[idx_u], (T, 1)),
        u_bounds_rel=np.array([-np.ones(5) * 0.06, np.ones(5) * 0.06]),
        indices_u_into_x=idx_u,
        unactuated_indices=np.array([0, 1, 2]),
        gradient_mode=gradient_mode,
        decouple_AB=True,
        smoothing=SmoothingConfig(
            num_samples=num_samples, std_u=0.1, std_x=1e-3,
            decay=lambda it: 1.0 / it ** 0.8, decay_std_x=False),
        admm_iters=30,
        report_final_cost_with_Q=False,
    )
    return IrsMpc(system, params), model


def main():
    solver, model = build_solver()
    solver.iterate(10, verbose=False)
    report(solver, "plate_pickup_zero_order")
    print("plate final:", solver.x_trj_best[-1][:3])


if __name__ == "__main__":
    main()
