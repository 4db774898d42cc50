"""Box pushing with the CEM baseline.

Mirrors ``/root/reference/examples/box_pushing/run_box_pushing_cem.py``.
"""
from common import report

import numpy as np

from box_pushing import build_solver as _build_irs

from irs_mpc_tpu.models.contact.systems import make_box_pushing
from irs_mpc_tpu.solvers.cem import CemParams, CrossEntropyMethod


def build_solver(T=60, batch_size=100, n_elite=15):
    model = make_box_pushing(h=0.1)
    system = model.system()
    idx_u = model.indices_u_into_x()

    q0 = {"box": np.array([0.0, 0.5, 0.0]), "hand": np.array([0.0, -0.2])}
    x0 = model.get_x_from_q_dict(q0)
    xd_dict = {"box": np.array([0.5, 1.0, -0.3]),
               "hand": np.array([0.0, -0.2])}
    xd = model.get_x_from_q_dict(xd_dict)

    Q_dict = {"box": np.array([10.0, 10.0, 10.0]),
              "hand": np.array([1e-4, 1e-4])}
    Qd_dict = {k: v * 100 for k, v in Q_dict.items()}
    R_dict = {"hand": np.array([1.0, 1.0])}

    params = CemParams(
        Q=model.get_Q_from_Q_dict(Q_dict),
        Qd=model.get_Q_from_Q_dict(Qd_dict),
        R=model.get_R_from_R_dict(R_dict),
        x0=x0, xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile(x0[idx_u], (T, 1)),
        n_elite=n_elite, batch_size=batch_size,
        initial_std=np.ones(2) * 0.1,
        indices_u_into_x=idx_u,
        report_final_cost_with_Q=False)
    return CrossEntropyMethod(system, params), model


def main():
    solver, model = build_solver()
    solver.iterate(15, verbose=False)
    report(solver, "box_pushing_cem")
    print("box final:", solver.x_trj_best[-1][:3])


if __name__ == "__main__":
    main()
