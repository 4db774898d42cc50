"""Carrots: many-object manipulation — gather 20 pieces toward a goal point.

Mirrors ``/root/reference/examples/carrots/run_carrots.py`` (45-dof state:
5-dof gripper + 20 two-dof pieces, h=1.0, dict cost over all 20 object
models, ``run_carrots.py:106-110``; carrot_setup.py).
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig
from irs_mpc_tpu.models.contact.systems import make_carrots


def build_solver(gradient_mode="zero_order_B", num_samples=30, T=10,
                 n_pieces=20):
    model = make_carrots(n_pieces=n_pieces, h=1.0)
    system = model.system()
    idx_u = model.indices_u_into_x()
    rng = np.random.RandomState(0)

    # Gripper LOW enough that the hanging fingers (length 0.2 below the
    # slide line) actually reach the pieces (radius 0.05 on the ground):
    # base z = 0.22 puts finger tips at z = 0.02.  Start left of the pile.
    q0 = {"gripper": np.array([-0.85, 0.22, 0.0, -0.05, -0.05])}
    for k in range(n_pieces):
        q0[f"carrot_{k}"] = np.array([rng.uniform(-0.6, 0.2), 0.05])
    x0 = model.get_x_from_q_dict(q0)

    # Staged desired trajectory: the gripper reference sweeps left-to-right
    # THROUGH the pile (the plow pass); pieces are pulled toward y = +0.4.
    # A static gripper goal gives the bundled gradient nothing to work with
    # for pieces outside finger reach.
    xd_rows = []
    for t in range(T + 1):
        frac = t / max(T, 1)
        xd_dict = {"gripper": np.array([-0.85 + 1.25 * frac, 0.22, 0.0,
                                        -0.05, -0.05])}
        for k in range(n_pieces):
            xd_dict[f"carrot_{k}"] = np.array([0.4, 0.05])
        xd_rows.append(model.get_x_from_q_dict(xd_dict))
    xd_trj = np.stack(xd_rows)

    Q_dict = {"gripper": np.array([2.0, 0.5, 0.1, 0.1, 0.1])}
    for k in range(n_pieces):
        Q_dict[f"carrot_{k}"] = np.array([1.0, 0.1])
    Qd_dict = {k: v * 10 for k, v in Q_dict.items()}
    R_dict = {"gripper": np.full(5, 0.5)}

    params = IrsMpcParams(
        Q=model.get_Q_from_Q_dict(Q_dict),
        Qd=model.get_Q_from_Q_dict(Qd_dict),
        R=model.get_R_from_R_dict(R_dict),
        x0=x0, xd_trj=xd_trj,
        u_trj_init=np.tile(x0[idx_u], (T, 1)),
        u_bounds_abs=np.array([-np.full(5, 0.15), np.full(5, 0.15)]),
        bounds_trust_region=True,
        indices_u_into_x=idx_u,
        unactuated_indices=np.arange(5, 5 + 2 * n_pieces),
        gradient_mode=gradient_mode,
        decouple_AB=True,
        smoothing=SmoothingConfig(
            num_samples=num_samples, std_u=0.1, std_x=1e-3,
            decay=lambda it: 1.0 / it ** 0.8, decay_std_x=False),
        admm_iters=20,
        report_final_cost_with_Q=False,
    )
    return IrsMpc(system, params), model


def main():
    solver, model = build_solver()
    solver.iterate(6)
    report(solver, "carrots_zero_order")
    pieces = solver.x_trj_best[-1][5::2]
    print("mean piece y:", float(np.mean(pieces)), "(goal 0.4)")


if __name__ == "__main__":
    main()
