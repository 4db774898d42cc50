"""Quadrotor 12-state trajectory optimization + CEM.

Mirrors ``/root/reference/examples/quadrotor/quadrotor_{exact,first_order,
zero_order,cem}.py``: hover-to-goal repositioning with all estimators.
Reference curve: 178342 -> ~3400-3500 in 7 rows.
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig, make_quadrotor
from irs_mpc_tpu.solvers.cem import CemParams, CrossEntropyMethod

HOVER_U = 0.775 * 9.81 / 4.0    # per-rotor force balancing gravity


def build_params(mode, T=200):
    Q = np.diag([10, 10, 10, 10, 10, 10, 1, 1, 1, 1, 1, 1]).astype(float)
    Qd = Q * 10
    R = np.eye(4) * 0.1
    xd = np.zeros(12)
    xd[0:3] = [2.0, 1.0, 1.0]
    return IrsMpcParams(
        Q=Q, Qd=Qd, R=R,
        x0=np.zeros(12),
        xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile([HOVER_U] * 4, (T, 1)),
        gradient_mode=mode,
        smoothing=SmoothingConfig(num_samples=1000, std_x=0.2, std_u=0.2),
    )


def main():
    quad = make_quadrotor(0.02)
    for mode in ["exact", "first_order", "zero_order"]:
        solver = IrsMpc(quad, build_params(mode))
        solver.iterate(8, verbose=False)
        report(solver, f"quadrotor_{mode}")

    T = 200
    xd = np.zeros(12)
    xd[0:3] = [2.0, 1.0, 1.0]
    cem = CrossEntropyMethod(make_quadrotor(0.02), CemParams(
        Q=np.diag([10.] * 6 + [1.] * 6), Qd=np.diag([100.] * 6 + [10.] * 6),
        R=np.eye(4) * 0.1,
        x0=np.zeros(12), xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile([HOVER_U] * 4, (T, 1)),
        n_elite=30, batch_size=300, initial_std=np.ones(4) * 0.5))
    cem.iterate(20, verbose=False)
    report(cem, "quadrotor_cem")


if __name__ == "__main__":
    main()
