"""Kinematic bicycle (Dubins car with steering dynamics), explicit Euler.

Capability parity with ``/root/reference/examples/bicycle/bicycle_dynamics.py:47-64``:
state = [x, y, heading, speed, steer], input = [accel, steer_rate].
"""
import jax.numpy as jnp

from .base import System


def make_bicycle(h: float = 0.1) -> System:
    def step(x, u):
        heading, v, steer = x[2], x[3], x[4]
        dxdt = jnp.stack([
            v * jnp.cos(heading),
            v * jnp.sin(heading),
            v * jnp.tan(steer),
            u[0],
            u[1],
        ])
        return x + h * dxdt

    return System(name="bicycle", dim_x=5, dim_u=2, h=h, step=step)
