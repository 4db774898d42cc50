"""Bicycle trajectory optimization, easy goal + hard goal, all estimators.

Mirrors ``/root/reference/examples/bicycle/bicycle_{exact,first_order,
zero_order}{,_hard}.py``: T=100, Q=diag(5,5,3,.1,.1), Qd=diag(50,50,30,1,1),
R=diag(1,.1), steering state-bound +-pi/4, 10000 samples with per-dim stds
(2,2,1,2,0.01)/(2,1) and 1/sqrt(iter) decay.  On the hard goal the smoothed
estimators beat exact (reference: 13301 -> 1661 exact vs 782/794 smoothed).
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig, make_bicycle


def build_params(mode, hard=False, num_samples=2000):
    T = 100
    # Reference goals: easy = ahead-left quarter turn; hard = BEHIND the
    # car ([-3, -1, -pi/2], bicycle_exact_hard.py) — the config where exact
    # gradients plateau (13301 -> 1661) and smoothing wins (-> 782/794).
    xd = (np.array([-3., -1., -np.pi / 2, 0., 0.]) if hard
          else np.array([3., 1., np.pi / 2, 0., 0.]))
    return IrsMpcParams(
        Q=np.diag([5., 5., 3., 0.1, 0.1]),
        Qd=np.diag([50., 50., 30., 1., 1.]),
        R=np.diag([1., 0.1]),
        x0=np.zeros(5),
        xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile([0.1, 0.0], (T, 1)),
        x_bounds_abs=np.array([[-1e4, -1e4, -1e4, -1e4, -np.pi / 4],
                               [1e4, 1e4, 1e4, 1e4, np.pi / 4]]),
        u_bounds_abs=np.array([[-1e4, -1e4], [1e4, 1e4]]),
        gradient_mode=mode,
        admm_iters=40,
        smoothing=SmoothingConfig(
            num_samples=num_samples,
            std_x=np.array([2., 2., 1., 2., 0.01]),
            std_u=np.array([2., 1.])),
    )


def build_cem_solver(hard=False, T=100, batch_size=100, n_elite=10):
    """CEM baseline, mirroring ``/root/reference/examples/bicycle/
    bicycle_cem_easy.py`` / ``bicycle_cem_hard.py``: same Q/Qd/R as the iRS
    drivers, initial_std (1, 1), batch 100, n_elite 10, 10 iterations easy /
    25 hard."""
    from irs_mpc_tpu.solvers.cem import CemParams, CrossEntropyMethod
    xd = (np.array([-3., -1., -np.pi / 2, 0., 0.]) if hard
          else np.array([3., 1., np.pi / 2, 0., 0.]))
    params = CemParams(
        Q=np.diag([5., 5., 3., 0.1, 0.1]),
        Qd=np.diag([50., 50., 30., 1., 1.]),
        R=np.diag([1., 0.1]),
        x0=np.zeros(5),
        xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.tile([0.1, 0.0], (T, 1)),
        initial_std=np.array([1.0, 1.0]),
        batch_size=batch_size, n_elite=n_elite)
    return CrossEntropyMethod(make_bicycle(0.1), params)


def main():
    bike = make_bicycle(0.1)
    for hard in (False, True):
        tag = "hard" if hard else "easy"
        for mode in ["exact", "first_order", "zero_order"]:
            solver = IrsMpc(bike, build_params(mode, hard))
            solver.iterate(26 if hard else 12, verbose=False)
            report(solver, f"bicycle_{tag}_{mode}")
        cem = build_cem_solver(hard)
        cem.iterate(25 if hard else 10, verbose=False)
        report(cem, f"bicycle_{tag}_cem")


if __name__ == "__main__":
    main()
