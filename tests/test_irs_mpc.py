"""Golden-convergence regression tests against the reference's published
cost curves (BASELINE.md; reference ``examples/*/analysis/*.csv``)."""
import jax.numpy as jnp
import numpy as np
import pytest

from irs_mpc_tpu import (IrsMpc, IrsMpcParams, SmoothingConfig, make_bicycle,
                         make_pendulum)


def _pendulum_params(mode, **kw):
    T = 200
    return IrsMpcParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2),
        xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)),
        gradient_mode=mode,
        smoothing=SmoothingConfig(num_samples=1000, std_x=1.0, std_u=1.0),
        **kw)


def test_pendulum_initial_cost_golden():
    """Initial rollout cost must equal the reference CSV row 1 exactly:
    1856.15 (examples/pendulum/analysis/pendulum_*.csv:1)."""
    s = IrsMpc(make_pendulum(0.05), _pendulum_params("exact"))
    assert abs(s.cost - 1856.1541) < 0.01


@pytest.mark.parametrize("mode", ["exact", "first_order", "zero_order"])
def test_pendulum_converges_to_reference(mode):
    """Reference finals: 357.30 / 357.46 / 357.45 after 8 descents.
    This framework reaches <= 360 (observed ~349.5, slightly better)."""
    s = IrsMpc(make_pendulum(0.05), _pendulum_params(mode))
    s.iterate(8, verbose=False)
    assert s.cost <= 360.0
    assert s.cost_best <= 360.0


def test_pendulum_parallel_riccati_matches():
    s1 = IrsMpc(make_pendulum(0.05), _pendulum_params("exact"))
    s2 = IrsMpc(make_pendulum(0.05),
                _pendulum_params("exact", parallel_riccati=True))
    s1.iterate(4, verbose=False)
    s2.iterate(4, verbose=False)
    assert abs(s1.cost - s2.cost) / s1.cost < 1e-3


def _bicycle_params(mode):
    # Reference config (bicycle_exact.py / bicycle_zero_order_hard.py):
    # T=100, goal [3, 1, pi/2], steering state-bound +-pi/4.
    T = 100
    xd = np.array([3., 1., np.pi / 2, 0., 0.])
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
            num_samples=2000,
            std_x=np.array([2., 2., 1., 2., 0.01]),
            std_u=np.array([2., 1.])),
    )


@pytest.mark.parametrize("mode", ["exact", "first_order", "zero_order"])
def test_bicycle_converges(mode):
    s = IrsMpc(make_bicycle(0.1), _bicycle_params(mode))
    assert abs(s.cost - 3302.09) < 0.05  # reference bicycle_easy csv row 1
    s.iterate(12, verbose=False)
    # Reference finals (bicycle_easy_{exact,first,zero}.csv): 671.2 / 671.0 /
    # 671.2 after 12 iterations.  Accept within ~5%.
    assert s.cost_best < 705.0


def test_delta_u_cost_mode_runs():
    """Position-controlled Δu-cost mode end to end on a smooth system."""
    T = 30
    p = IrsMpcParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)),
        gradient_mode="exact",
        indices_u_into_x=np.array([0]),
    )
    s = IrsMpc(make_pendulum(0.05), p)
    c0 = s.cost
    s.iterate(5, verbose=False)
    assert s.cost < c0


def test_u_bounds_respected():
    T = 50
    p = _pendulum_params("exact")
    p = IrsMpcParams(**{**p.__dict__,
                        "u_trj_init": np.tile([0.1], (T, 1)),
                        "xd_trj": np.tile([np.pi, 0.], (T + 1, 1)),
                        "u_bounds_abs": np.array([[-1.5], [1.5]])})
    s = IrsMpc(make_pendulum(0.05), p)
    s.iterate(5, verbose=False)
    assert np.all(np.abs(s.u_trj_lst[-1]) <= 1.5 + 1e-5)


def test_history_and_best_tracking():
    s = IrsMpc(make_pendulum(0.05), _pendulum_params("exact"))
    s.iterate(3, verbose=False)
    assert len(s.cost_lst) == 4 and len(s.x_trj_lst) == 4
    assert s.cost_best == min(s.cost_lst)
    assert s.stats_lst[0].cost == s.cost_lst[1]


def test_resolve_mode_matches_feedback_unconstrained():
    """With non-binding bounds the per-knot resolve must land near the
    feedback-mode result (both equal the reference semantics)."""
    T = 40
    base = dict(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)),
        u_bounds_abs=np.array([[-1e4], [1e4]]),
        gradient_mode="exact", admm_iters=25)
    s_fb = IrsMpc(make_pendulum(0.05), IrsMpcParams(**base))
    s_rs = IrsMpc(make_pendulum(0.05),
                  IrsMpcParams(forward_mode="resolve", **base))
    s_fb.iterate(5, verbose=False)
    s_rs.iterate(5, verbose=False)
    assert abs(s_fb.cost - s_rs.cost) / s_fb.cost < 0.05


def test_resolve_mode_respects_binding_bounds():
    """Per-knot resolve with a BINDING input box: bounds hold exactly and
    the converged cost matches the feedback-mode solve of the identical
    problem (resolve converges to ~340.2 in 2 iterations on this task)."""
    T = 50
    base = dict(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)),
        u_bounds_abs=np.array([[-2.0], [2.0]]),
        gradient_mode="exact", admm_iters=40)
    s = IrsMpc(make_pendulum(0.05),
               IrsMpcParams(forward_mode="resolve", **base))
    s.iterate(5, verbose=False)
    assert np.all(np.abs(s.u_trj_lst[-1]) <= 2.0 + 1e-3)
    s_fb = IrsMpc(make_pendulum(0.05), IrsMpcParams(**base))
    s_fb.iterate(8, verbose=False)
    assert abs(s.cost_best - s_fb.cost_best) / s_fb.cost_best < 0.2


def test_estimation_surrogate_system():
    """A cheaper estimation surrogate must not change the API or break
    convergence (targets are Monte-Carlo noisy anyway)."""
    import dataclasses as dc
    T = 60
    pend = make_pendulum(0.05)
    coarse = dc.replace(pend, name="pendulum_coarse")  # stand-in surrogate
    p = IrsMpcParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)),
        gradient_mode="zero_order",
        smoothing=SmoothingConfig(num_samples=300, std_x=1.0, std_u=1.0),
        estimation_system=coarse)
    s = IrsMpc(pend, p)
    c0 = s.cost
    s.iterate(6, verbose=False)
    # T=60 pendulum converges to ~345 (the task optimum) from 566.
    assert s.cost_best < 0.65 * c0


def test_quadrotor_golden_reference_config():
    """Exact reference config (quadrotor_zero_order.py): helix tracking,
    h=0.05, T=200.  Initial cost must equal the reference's 178342 (proves
    dynamics parity with its hand-written RPY model); final beats the
    reference CSVs (3379-3525 after 7 rows)."""
    import sys as _s
    from pathlib import Path
    _s.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from quadrotor import build_params
    from irs_mpc_tpu import make_quadrotor
    s = IrsMpc(make_quadrotor(0.05), build_params("zero_order"))
    assert abs(s.cost - 178342.0) < 5.0
    s.iterate(7, verbose=False)
    assert s.cost_best < 3400.0


def test_bicycle_hard_golden_smoothing_wins():
    """Reference hard config (goal behind the car): initial 13301.09 exact;
    reference finals: exact stuck at 1661, smoothed 782/794.  This framework
    reaches <= 800 even in exact mode (the line search avoids the plateau)."""
    import sys as _s
    from pathlib import Path
    _s.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from bicycle import build_params
    s = IrsMpc(make_bicycle(0.1), build_params("zero_order", hard=True))
    assert abs(s.cost - 13301.09) < 0.1
    s.iterate(26, verbose=False)
    assert s.cost_best < 800.0
