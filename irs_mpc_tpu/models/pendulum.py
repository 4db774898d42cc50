"""Pendulum: 2-state torque-driven pendulum, semi-implicit Euler.

Capability parity with ``/root/reference/examples/pendulum/pendulum_dynamics.py:45-63``
(state = [angle, speed], input = [torque], gravity normalized to 1):

    speed' = speed + h * (-sin(angle) + u)
    angle' = angle + h * speed'
"""
import jax.numpy as jnp

from .base import System


def make_pendulum(h: float = 0.05) -> System:
    def step(x, u):
        angle, speed = x[0], x[1]
        next_speed = speed + h * (-jnp.sin(angle) + u[0])
        next_angle = angle + h * next_speed
        return jnp.stack([next_angle, next_speed])

    return System(name="pendulum", dim_x=2, dim_u=1, h=h, step=step)
