"""Learned MLP dynamics — the reference's ``pendulum_nn.py`` path, in Flax.

Capability parity with ``/root/reference/examples/pendulum/pendulum_nn.py``:
train a small MLP on random transitions of a true system, wrap it as a
``System`` (Jacobians via ``jax.jacfwd`` replace torch autograd), and run any
iRS-MPC estimator against it unchanged — demonstrating the solver stack is
dynamics-agnostic.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import System

try:
    import flax.linen as nn
    import optax
    _HAVE_FLAX = True
except Exception:   # pragma: no cover - flax is in the base image
    _HAVE_FLAX = False


if _HAVE_FLAX:
    class _DynamicsMlp(nn.Module):
        hidden: Sequence[int]
        dim_x: int

        @nn.compact
        def __call__(self, xu):
            h = xu
            for w in self.hidden:
                h = nn.tanh(nn.Dense(w)(h))
            # Residual parameterization: predict the state delta.
            return xu[..., :self.dim_x] + nn.Dense(self.dim_x)(h)


def train_mlp_dynamics(
        system: System,
        num_transitions: int = 20_000,
        hidden: Sequence[int] = (64, 64),
        x_range: float = 4.0,
        u_range: float = 4.0,
        epochs: int = 400,
        batch: int = 2048,
        lr: float = 1e-3,
        seed: int = 0) -> System:
    """Train an MLP on random one-step transitions of ``system`` and return
    it wrapped as a new System (reference pendulum_nn.py:34-91)."""
    if not _HAVE_FLAX:
        raise RuntimeError("flax/optax unavailable")
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.uniform(k1, (num_transitions, system.dim_x),
                           minval=-x_range, maxval=x_range)
    U = jax.random.uniform(k2, (num_transitions, system.dim_u),
                           minval=-u_range, maxval=u_range)
    Y = system.step_batch(X, U)

    model = _DynamicsMlp(hidden=tuple(hidden), dim_x=system.dim_x)
    params = model.init(k3, jnp.zeros(system.dim_x + system.dim_u))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    XU = jnp.concatenate([X, U], axis=1)

    @jax.jit
    def train_step(params, opt_state, idx):
        def loss_fn(p):
            pred = model.apply(p, XU[idx])
            return jnp.mean((pred - Y[idx]) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    loss = None
    for _ in range(epochs):
        idx = jnp.asarray(rng.randint(0, num_transitions, size=batch))
        params, opt_state, loss = train_step(params, opt_state, idx)

    def step(x, u):
        return model.apply(params, jnp.concatenate([x, u]))

    sys_nn = System(name=f"{system.name}_mlp", dim_x=system.dim_x,
                    dim_u=system.dim_u, h=system.h, step=step)
    # System is frozen; stash the training loss for diagnostics.
    object.__setattr__(sys_nn, "final_loss", float(loss))
    return sys_nn
