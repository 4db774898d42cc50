"""Box pushing with second-order dynamics, position-controlled.

Mirrors ``/root/reference/examples/box_pushing/run_box_pushing_second_order
_position.py`` (MbpDynamicsPosition + IrsLqrMbpPosition): x = (q, v),
PID position control of the pusher, Δu-cost, trajectory-centred trust
region.
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig
from irs_mpc_tpu.models.contact.mbp2d import Mbp2DModel
from irs_mpc_tpu.models.contact.systems import make_box_pushing


def build_solver(num_samples=50, T=60, gradient_mode="zero_order_AB"):
    # h=0.05: stable because mbp2d integrates ALL viscous terms implicitly
    # (explicit damping would diverge here: kd*h/m = 100*0.05/0.3 >> 2).
    base = make_box_pushing(h=0.05)
    mbp = Mbp2DModel(base=base, actuated_mass=(0.3, 0.3),
                     control_mode="position", damping=1.0)
    system = mbp.system()
    nq = base.nq

    # Hand starts nearly touching (gap 0.01): a second-order step moves the
    # hand only ~h^2*Kp/m * du per knot, so distant starts leave every
    # sample contact-free and the bundled B is zero (the flat-gradient
    # failure the reference documents for box_pushing exact mode).
    q0 = np.array([0.0, 0.5, 0.0, 0.0, -0.11], np.float32)
    x0 = np.concatenate([q0, np.zeros(nq)])
    qd = np.array([0.3, 0.8, 0.0, 0.0, -0.11], np.float32)
    xd = np.concatenate([qd, np.zeros(nq)])

    Qq = np.array([10.0, 10.0, 10.0, 1e-4, 1e-4])
    Qv = np.full(nq, 1e-4)
    Q = np.diag(np.concatenate([Qq, Qv]))

    idx_u = mbp.indices_u_into_x()
    params = IrsMpcParams(
        Q=Q, Qd=Q * 100, R=np.eye(2) * 1.0,
        x0=x0, xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile(q0[idx_u], (T, 1)),
        indices_u_into_x=idx_u,
        u_bounds_abs=np.array([-np.ones(2) * 0.04, np.ones(2) * 0.04]),
        bounds_trust_region=True,
        unactuated_indices=np.array([0, 1, 2]),
        gradient_mode=gradient_mode,
        smoothing=SmoothingConfig(
            num_samples=num_samples, std_u=0.1, std_x=1e-3,
            decay=lambda it: 1.0 / it ** 0.8, decay_std_x=False,
            damp=1e-5),
        admm_iters=25,
        report_final_cost_with_Q=False,
    )
    return IrsMpc(system, params), mbp


def main():
    solver, mbp = build_solver()
    solver.iterate(10, verbose=False)
    report(solver, "box_pushing_second_order_position")
    print("box final:", solver.x_trj_best[-1][:3])


if __name__ == "__main__":
    main()
