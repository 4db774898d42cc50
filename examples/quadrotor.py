"""Quadrotor 12-state helix tracking + CEM.

Mirrors ``/root/reference/examples/quadrotor/quadrotor_{exact,first_order,
zero_order,cem}.py`` EXACTLY: h=0.05, T=200, desired trajectory a rising
helix (1.5 cos 0.05i, 1.5 sin 0.05i, 0.02i), Q=diag(10 x6, 0 x6),
Qd=10 diag(10 x6, 1 x6), R=I, u0=2.0, std 0.1 / sqrt(iter), 1000 samples.
Reference cost curve: 178342 -> ~3400-3500 in 7 rows
(quadrotor_{exact,first,zero}.csv).
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig, make_quadrotor
from irs_mpc_tpu.solvers.cem import CemParams, CrossEntropyMethod


def helix_xd(T):
    xd = np.zeros((T + 1, 12))
    for i in range(T + 1):
        xd[i, 0] = 1.5 * np.cos(0.05 * i)
        xd[i, 1] = 1.5 * np.sin(0.05 * i)
        xd[i, 2] = 0.02 * i
    return xd


def build_params(mode, T=200):
    return IrsMpcParams(
        Q=1.0 * np.diag([10.] * 6 + [0.] * 6),
        Qd=10.0 * np.diag([10.] * 6 + [1.] * 6),
        R=np.eye(4),
        x0=np.zeros(12),
        xd_trj=helix_xd(T),
        u_trj_init=np.tile([2.0] * 4, (T, 1)),
        gradient_mode=mode,
        smoothing=SmoothingConfig(num_samples=1000, std_x=0.1, std_u=0.1),
    )


def main():
    quad = make_quadrotor(0.05)
    for mode in ["exact", "first_order", "zero_order"]:
        solver = IrsMpc(quad, build_params(mode))
        solver.iterate(7, verbose=False)
        report(solver, f"quadrotor_{mode}")
    # 3D helix-tracking animation (reference quadrotor_animation.py).
    from irs_mpc_tpu.utils.viz import animate_analytic_trajectory
    from common import ANALYSIS_DIR
    animate_analytic_trajectory("quadrotor", solver.x_trj_best,
                                ANALYSIS_DIR / "quadrotor.gif")

    T = 200
    cem = CrossEntropyMethod(make_quadrotor(0.05), CemParams(
        Q=1.0 * np.diag([10.] * 6 + [0.] * 6),
        Qd=10.0 * np.diag([10.] * 6 + [1.] * 6),
        R=np.eye(4),
        x0=np.zeros(12), xd_trj=helix_xd(T),
        u_trj_init=np.tile([2.0] * 4, (T, 1)),
        # Reference cost setup (quadrotor_cem.py:29-31) with the
        # population scaled for the 800-dim input search (16000/160 vs the
        # reference's 100/10/7 serial python rollouts).  The 800-dim search
        # needs structure to avoid divergent-rollout elites: thrusts clipped
        # to the physical [0, 4] box (hover = 2.0), mild AR(1) noise
        # (beta=0.5 — beta >= 0.9 destabilizes the 200-step RPY dynamics),
        # elite persistence, light refit momentum.  Sweep: vanilla/4000
        # plateaus at 25k; 8000/600-iter reaches 10.7k; band-limited
        # noise_knots stalls at 17.5k (the helix needs fine corrections);
        # doubling the population AND the budget (16000/1200) plateaus
        # near 8.2k (iRS reaches 3.3k — the remaining gap is the
        # expected CEM-vs-gradient cost at this dimensionality; the
        # coarse-to-fine anneal probe, quadrotor_cem_anneal.py, lands at
        # 9.25k at equal budget, pinning the plateau as schedule-
        # independent).
        n_elite=160, batch_size=16000, initial_std=np.ones(4) * 0.02,
        noise_beta=0.5, momentum=0.1, elite_keep=20,
        u_bounds_abs=np.array([np.zeros(4), 4.0 * np.ones(4)])))
    cem.iterate(1200, verbose=False)
    report(cem, "quadrotor_cem")


if __name__ == "__main__":
    main()
