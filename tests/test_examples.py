"""Smoke tests locking every example driver's build path green (small
budgets; the full-budget runs live in examples/run_all.py)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


def test_box_pushing_descends():
    from box_pushing import build_solver
    # Needs the full T=60 horizon: on shorter horizons the pusher cannot
    # reach the box within the trust region and the bundled gradient is
    # legitimately flat (same failure the reference documents for exact
    # mode, box_pushing_exact.csv).
    # (30 samples is too noisy for this task's B estimate — the line
    # search rejects every step; the reference uses 100, box_pushing_setup
    # .py:33.)
    s, _ = build_solver(num_samples=100, T=60)
    c0 = s.cost
    s.iterate(3, verbose=False)
    assert s.cost_best < c0


def test_box_pivoting_descends():
    from box_pivoting import build_solver
    s, _ = build_solver(num_samples=30, T=20)
    c0 = s.cost
    s.iterate(4, verbose=False)
    assert s.cost_best < c0


def test_plate_pickup_descends():
    from plate_pickup import build_solver
    s, _ = build_solver(num_samples=30, T=18)
    c0 = s.cost
    s.iterate(4, verbose=False)
    assert s.cost_best < c0


def test_second_order_examples_build():
    from planar_hand_second_order import build_solver
    s, _ = build_solver(num_samples=10, T=10)
    s.iterate(2, verbose=False)
    assert np.isfinite(s.cost)


def test_second_order_cem_spin_builds():
    """The iCEM plant-floor-bracket builder (translate AND spin variants)
    constructs and descends at toy population sizes."""
    from planar_hand_second_order import build_cem_solver
    for spin in (False, True):
        cem, _ = build_cem_solver(batch_size=40, n_elite=8, T=10, spin=spin)
        u0 = cem.u_trj.copy()
        cem.iterate(3, verbose=False)
        # cost_best starts AT the initial rollout cost, so `<= c0` would be
        # vacuous; assert the iterations actually ran and moved the mean.
        assert len(cem.cost_lst) == 4
        assert np.isfinite(cem.cost_lst).all()
        assert not np.allclose(cem.u_trj, u0)


def test_carrots_builds_small():
    from carrots import build_solver
    s, model = build_solver(num_samples=5, T=4, n_pieces=6)
    s.iterate(1, verbose=False)
    assert np.isfinite(s.cost)


def test_bicycle_cem_descends():
    """CEM baselines exist for bicycle easy/hard (reference
    bicycle_cem_{easy,hard}.py)."""
    from bicycle import build_cem_solver
    cem = build_cem_solver(hard=True, T=40, batch_size=60, n_elite=6)
    c0 = cem.cost
    cem.iterate(4, verbose=False)
    assert cem.cost_best < c0


def test_box_pivoting_cem_descends():
    """CEM baseline on the pivoting task (reference
    run_box_pivoting_cem.py)."""
    from box_pivoting import build_cem_solver
    cem, _ = build_cem_solver(T=15, batch_size=40, n_elite=4)
    c0 = cem.cost
    cem.iterate(3, verbose=False)
    assert cem.cost_best < c0


def test_opaque_quadrotor_zero_order_descends():
    """The 'external simulator' usage pattern (reference
    quadrotor_dynamics_drake.py): a gradient-walled RK4 sub-stepped plant
    where only zero-order smoothing applies."""
    import dataclasses
    from quadrotor import build_params
    from quadrotor_opaque import make_opaque_quadrotor
    from irs_mpc_tpu import IrsMpc, SmoothingConfig

    sys_op = make_opaque_quadrotor()
    J = sys_op.jacobian_xu(np.zeros(12, np.float32) + 0.1,
                           np.ones(4, np.float32) * 2.0)
    assert float(abs(J).max()) == 0.0, "gradient wall must hold"
    p = dataclasses.replace(
        build_params("zero_order", T=40),
        smoothing=SmoothingConfig(num_samples=200, std_x=0.1, std_u=0.1))
    s = IrsMpc(sys_op, p)
    c0 = s.cost
    s.iterate(3, verbose=False)
    assert s.cost_best < c0


def test_quadrotor_cem_anneal_phases_build():
    """The coarse-to-fine noise_knots phases chain through the (T, m)
    initial_std continuation path."""
    from quadrotor_cem_anneal import build
    c1 = build(T=40, batch_size=60, n_elite=10, noise_knots=8)
    c1.iterate(2, verbose=False)
    std = np.maximum(np.asarray(c1.std_trj, np.float32), 0.005)
    c2 = build(T=40, batch_size=60, n_elite=10, noise_knots=0,
               u_trj_init=np.asarray(c1.u_trj_best, np.float32),
               initial_std=std, seed=1)
    c2.iterate(2, verbose=False)
    assert np.isfinite(c2.cost_lst).all()
    assert c2.std_trj.shape == (40, 4)
