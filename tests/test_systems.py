"""System-level tests: batch==unbatched consistency, Jacobian vs finite
differences, rollout shapes.  Formalizes the reference's informal dynamics
sanity scripts (``examples/three_cart/three_cart_simulation.py:18-71``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irs_mpc_tpu import (make_bicycle, make_pendulum, make_quadrotor,
                         make_three_cart)

SYSTEMS = {
    "pendulum": make_pendulum(0.05),
    "bicycle": make_bicycle(0.1),
    "quadrotor": make_quadrotor(0.01),
    "three_cart": make_three_cart(0.1),
}


def _rand_xu(sys, B, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, sys.dim_x).astype(np.float32)
    u = rng.randn(B, sys.dim_u).astype(np.float32)
    if sys.name == "three_cart":
        # Spread carts out so most samples are collision-free but some collide.
        x[:, 0] -= 0.5
        x[:, 2] += 0.5
    return jnp.asarray(x), jnp.asarray(u)


@pytest.mark.parametrize("name", list(SYSTEMS))
def test_batch_matches_unbatched(name):
    sys = SYSTEMS[name]
    x, u = _rand_xu(sys, 32)
    batched = sys.step_batch(x, u)
    single = jnp.stack([sys.step(x[i], u[i]) for i in range(32)])
    np.testing.assert_allclose(batched, single, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", ["pendulum", "bicycle", "quadrotor"])
def test_jacobian_vs_finite_difference(name):
    sys = SYSTEMS[name]
    x, u = _rand_xu(sys, 1, seed=3)
    x, u = x[0] * 0.3, u[0] * 0.3
    J = np.asarray(sys.jacobian_xu(x, u))
    eps = 1e-3
    J_fd = np.zeros_like(J)
    xu = np.concatenate([np.asarray(x), np.asarray(u)])
    n = sys.dim_x

    def f(xu_):
        return np.asarray(sys.step(jnp.asarray(xu_[:n]), jnp.asarray(xu_[n:])))

    for i in range(len(xu)):
        dp = xu.copy(); dp[i] += eps
        dm = xu.copy(); dm[i] -= eps
        J_fd[:, i] = (f(dp) - f(dm)) / (2 * eps)
    np.testing.assert_allclose(J, J_fd, rtol=2e-2, atol=2e-3)


def test_rollout_shape_and_consistency():
    sys = SYSTEMS["pendulum"]
    u_trj = jnp.ones((50, 1)) * 0.1
    x_trj = sys.rollout(jnp.zeros(2), u_trj)
    assert x_trj.shape == (51, 2)
    # Manual re-roll.
    x = jnp.zeros(2)
    for t in range(50):
        x = sys.step(x, u_trj[t])
    np.testing.assert_allclose(x_trj[-1], x, rtol=1e-6)


def test_three_cart_collision_cases():
    sys = SYSTEMS["three_cart"]
    # No collision: carts far apart, zero input -> drift only.
    x = jnp.array([0.0, 1.0, 2.0, 0.0, 0.0, 0.0])
    out = sys.step(x, jnp.zeros(2))
    np.testing.assert_allclose(out, x, atol=1e-6)
    # 1-2 collision: momentum conservation (velocities average).
    x = jnp.array([0.0, 0.15, 2.0, 1.0, 0.0, 0.0])
    out = sys.step(x, jnp.zeros(2))
    assert out[3] == out[4]  # v1 == v2 after inelastic impact
    assert abs(float(out[1] - out[0]) - sys.h * 0 - 0.2) < 0.25
    # All three: common velocity.
    x = jnp.array([0.0, 0.1, 0.2, 3.0, 0.0, -3.0])
    out = sys.step(x, jnp.zeros(2))
    assert out[3] == out[4] == out[5]


def test_three_cart_projection():
    sys = SYSTEMS["three_cart"]
    x = jnp.array([0.0, 0.5, 1.0, 0.0, 0.0, 0.0])
    dx = jnp.array([[0.45, 0.0, 0.0, 0.0, 0.0, 0.0]])  # pushes 1 into 2
    du = jnp.zeros((1, 2))
    xp, up = sys.projection(x, dx, jnp.zeros(2), du)
    # After projection carts 1,2 are exactly d apart.
    assert float(xp[0, 1] - xp[0, 0]) >= sys.h * 0 + 0.2 - 1e-6


def test_mlp_dynamics_learns_and_plugs_in():
    """models/mlp: trained surrogate approximates the true step and works
    through the full System API (pendulum_nn.py analogue)."""
    from irs_mpc_tpu.models.mlp import train_mlp_dynamics
    true_sys = SYSTEMS["pendulum"]
    nn_sys = train_mlp_dynamics(true_sys, num_transitions=4000,
                                hidden=(32, 32), epochs=150, batch=512,
                                x_range=2.0, u_range=2.0)
    assert nn_sys.final_loss < 1e-2
    x = jnp.array([0.5, -0.3])
    u = jnp.array([0.4])
    err = float(jnp.max(jnp.abs(nn_sys.step(x, u) - true_sys.step(x, u))))
    assert err < 0.1
    # Jacobians derive for free.
    J = nn_sys.jacobian_xu(x, u)
    assert J.shape == (2, 3) and bool(jnp.all(jnp.isfinite(J)))
