"""CEM baseline tests (reference: cem.py drivers, e.g. quadrotor_cem.py)."""
import jax.numpy as jnp
import numpy as np

from irs_mpc_tpu import make_pendulum
from irs_mpc_tpu.solvers.cem import CemParams, CrossEntropyMethod


def test_cem_pendulum_descends():
    T = 60
    p = CemParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([0.1]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.zeros((T, 1)),
        n_elite=20, batch_size=300, initial_std=np.array([1.0]))
    cem = CrossEntropyMethod(make_pendulum(0.05), p)
    c0 = cem.cost
    cem.iterate(15, verbose=False)
    assert cem.cost_best < 0.5 * c0
    assert len(cem.cost_lst) == 16
    assert cem.cost_best == min(cem.cost_lst)


def test_cem_adaptive_std_shrinks():
    T = 30
    p = CemParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([0.1]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.zeros((T, 1)),
        n_elite=10, batch_size=100, initial_std=np.array([1.0]))
    cem = CrossEntropyMethod(make_pendulum(0.05), p)
    s0 = float(jnp.mean(cem.std_trj))
    cem.iterate(10, verbose=False)
    assert float(jnp.mean(cem.std_trj)) < s0


def test_cem_respects_u_bounds():
    T = 30
    p = CemParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([0.1]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.zeros((T, 1)),
        n_elite=10, batch_size=100, initial_std=np.array([1.0]),
        u_bounds_abs=np.array([[-0.7], [0.7]]))
    cem = CrossEntropyMethod(make_pendulum(0.05), p)
    cem.iterate(5, verbose=False)
    assert np.all(np.abs(cem.u_trj_lst[-1]) <= 0.7 + 1e-6)


def test_cem_contact_delta_u():
    """CEM against the quasistatic contact engine with Δu cost
    (CrossEntropyMethodQuasistatic analogue)."""
    import sys as _s
    from pathlib import Path
    _s.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from planar_hand_cem import build_solver
    cem, model = build_solver(T=15, batch_size=50, n_elite=8)
    c0 = cem.cost
    cem.iterate(5, verbose=False)
    assert cem.cost_best < c0
    assert np.all(np.isfinite(cem.u_trj_lst[-1]))


def test_cem_divergent_mean_rollout_rejected():
    """If the elites' mean rollout blows up, the refit is rejected: cost
    history stays finite and the previous mean is kept (regression for the
    all-NaN quadrotor_cem curve)."""
    from irs_mpc_tpu.models.base import System

    def step(x, u):
        # Explosive beyond |x| > 2: overflows to inf/nan within a few steps.
        return jnp.where(jnp.abs(x) > 2.0, x * x * 1e10, x + 0.1 * u)

    sys_ = System(name="explosive", dim_x=1, dim_u=1, h=0.1, step=step)
    T = 20
    cem = CrossEntropyMethod(sys_, CemParams(
        Q=np.eye(1), Qd=np.eye(1), R=np.eye(1) * 1e-3,
        x0=np.zeros(1), xd_trj=np.tile([1.9], (T + 1, 1)),
        u_trj_init=np.zeros((T, 1)),
        n_elite=5, batch_size=50, initial_std=np.array([5.0]), seed=0))
    cem.iterate(8, verbose=False)
    assert np.all(np.isfinite(cem.cost_lst)), cem.cost_lst
    assert np.isfinite(cem.cost_best)
