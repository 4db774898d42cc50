"""Box pushing with the CEM baseline.

Mirrors ``/root/reference/examples/box_pushing/run_box_pushing_cem.py``:
same task as the iRS driver (box +(0.5, 0.5, -pi/4), Q = [3, 3, 1.2],
Qd = 0, R = 1e1), n_elite = 5, batch 100, initial_std 0.2
(``run_box_pushing_cem.py:101-119``).
"""
from common import report

import numpy as np

from irs_mpc_tpu.models.contact.systems import make_box_pushing
from irs_mpc_tpu.solvers.cem import CemParams, CrossEntropyMethod


def build_solver(T=60, batch_size=100, n_elite=5):
    model = make_box_pushing(h=0.1)
    system = model.system()   # warm chains; see planar_hand_cem.py note
    idx_u = model.indices_u_into_x()

    q0 = {"box": np.array([0.0, 0.5, 0.0]), "hand": np.array([0.0, -0.2])}
    x0 = model.get_x_from_q_dict(q0)
    xd_dict = {"box": q0["box"] + np.array([0.5, 0.5, -np.pi / 4]),
               "hand": q0["hand"]}
    xd = model.get_x_from_q_dict(xd_dict)

    Q_dict = {"box": np.array([3.0, 3.0, 1.2]),
              "hand": np.array([0.0, 0.0])}
    Qd_dict = {k: v * 0 for k, v in Q_dict.items()}
    R_dict = {"hand": 1e1 * np.array([1.0, 1.0])}

    params = CemParams(
        Q=model.get_Q_from_Q_dict(Q_dict),
        Qd=model.get_Q_from_Q_dict(Qd_dict),
        R=model.get_R_from_R_dict(R_dict),
        x0=x0, xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile(x0[idx_u], (T, 1)),
        n_elite=n_elite, batch_size=batch_size,
        initial_std=np.ones(2) * 0.2,
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
