"""Planar hand with full second-order dynamics (MBP equivalent).

Mirrors ``/root/reference/examples/planar_hand/run_planar_hand_second_order
{,_position}.py`` driving ``IrsLqrMbp`` / ``IrsLqrMbpPosition``:
x = (q, v) with 14 states; either torque control (plain u'Ru cost, absolute
bounds — ``irs_lqr_mbp.py:246-266``) or PID position control (Δu-cost +
trajectory-centred trust region — ``irs_lqr_mbp_position.py``).
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig
from irs_mpc_tpu.models.contact.mbp2d import Mbp2DModel
from irs_mpc_tpu.models.contact.systems import make_planar_hand


def build_solver(control_mode="position", num_samples=50, T=40,
                 gradient_mode="zero_order_AB"):
    base = make_planar_hand(h=0.05)
    mbp = Mbp2DModel(base=base, actuated_mass=(0.5, 0.3, 0.5, 0.3),
                     control_mode=control_mode, damping=0.5)
    system = mbp.system()
    nq = base.nq

    q0 = np.array([0., 0.45, 0., -np.pi / 4, -np.pi / 4,
                   np.pi / 4, np.pi / 4], np.float32)
    x0 = np.concatenate([q0, np.zeros(nq)])
    qd = q0.copy()
    qd[0:3] = q0[0:3] + np.array([0.2, -0.05, 0.4])
    xd = np.concatenate([qd, np.zeros(nq)])

    # Position weights mirror the quasistatic task; velocity weights small.
    Qq = np.array([1e-3, 1e-3, 10.0, 1e-3, 1e-3, 1e-3, 1e-3])
    Qv = np.full(nq, 1e-4)
    Q = np.diag(np.concatenate([Qq, Qv]))
    Qd = Q * 100

    if control_mode == "position":
        R = np.eye(4) * 5.0
        idx_u = mbp.indices_u_into_x()
        u0 = q0[idx_u]
        extra = dict(indices_u_into_x=idx_u,
                     u_bounds_abs=np.array([-np.ones(4) * 0.05,
                                            np.ones(4) * 0.05]),
                     bounds_trust_region=True)
    else:
        R = np.eye(4) * 0.05
        u0 = np.zeros(4)
        extra = dict(u_bounds_abs=np.array([-np.ones(4) * 10.0,
                                            np.ones(4) * 10.0]))

    params = IrsMpcParams(
        Q=Q, Qd=Qd, R=R,
        x0=x0, xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile(u0, (T, 1)),
        unactuated_indices=np.array([0, 1, 2]),
        gradient_mode=gradient_mode,
        smoothing=SmoothingConfig(
            num_samples=num_samples, std_u=0.2, std_x=1e-3,
            decay=lambda it: 1.0 / it ** 0.8, decay_std_x=False,
            damp=1e-5),
        admm_iters=30,
        report_final_cost_with_Q=False,
        **extra,
    )
    return IrsMpc(system, params), mbp


def build_cem_solver(control_mode="position", T=40, batch_size=100,
                     n_elite=15):
    """CEM on the second-order plant — the reference's
    ``run_planar_hand_second_order{,_position}_cem.py`` drivers
    (``CrossEntropyMethodMbp`` / ``CrossEntropyMethodMbpPosition``,
    ``irs_lqr/cem_mbp{,_position}.py``): Δu-cost + input clipping in
    position mode, plain u'Ru in torque mode."""
    from irs_mpc_tpu.solvers.cem import CemParams, CrossEntropyMethod
    base = make_planar_hand(h=0.05)
    mbp = Mbp2DModel(base=base, actuated_mass=(0.5, 0.3, 0.5, 0.3),
                     control_mode=control_mode, damping=0.5)
    system = mbp.system()
    nq = base.nq

    q0 = np.array([0., 0.45, 0., -np.pi / 4, -np.pi / 4,
                   np.pi / 4, np.pi / 4], np.float32)
    x0 = np.concatenate([q0, np.zeros(nq)])
    qd = q0.copy()
    qd[0:3] = q0[0:3] + np.array([0.2, -0.05, 0.4])
    xd = np.concatenate([qd, np.zeros(nq)])

    Qq = np.array([1e-3, 1e-3, 10.0, 1e-3, 1e-3, 1e-3, 1e-3])
    Q = np.diag(np.concatenate([Qq, np.full(nq, 1e-4)]))

    if control_mode == "position":
        idx_u = mbp.indices_u_into_x()
        extra = dict(indices_u_into_x=idx_u, R=np.eye(4) * 5.0,
                     u_trj_init=np.tile(q0[idx_u], (T, 1)),
                     initial_std=np.ones(4) * 0.05)
    else:
        extra = dict(R=np.eye(4) * 0.05,
                     u_trj_init=np.zeros((T, 4), np.float32),
                     initial_std=np.ones(4) * 2.0)

    params = CemParams(
        Q=Q, Qd=Q * 100,
        x0=x0, xd_trj=np.tile(xd, (T + 1, 1)),
        n_elite=n_elite, batch_size=batch_size,
        report_final_cost_with_Q=False, **extra)
    return CrossEntropyMethod(system, params), mbp


def main():
    for mode in ["position", "torque"]:
        solver, mbp = build_solver(control_mode=mode)
        solver.iterate(8, verbose=False)
        report(solver, f"planar_hand_second_{mode}")
        print("  ball final:", solver.x_trj_best[-1][:3])
    cem, mbp = build_cem_solver()
    cem.iterate(10, verbose=False)
    report(cem, "planar_hand_second_cem")
    print("  [cem] ball final:", cem.x_trj_best[-1][:3])


if __name__ == "__main__":
    main()
