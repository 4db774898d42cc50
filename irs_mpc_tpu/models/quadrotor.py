"""12-state quadrotor with roll-pitch-yaw parameterization, explicit Euler.

Capability parity with
``/root/reference/examples/quadrotor/quadrotor_dynamics.py:25-77`` (same
physical constants, same RPY kinematics).  The reference computes Jacobians by
pushing object-dtype autodiff scalars through a numpy copy of the dynamics
(``:93-138``); here ``jax.jacfwd`` on the single step function is exact and
batched for free.

State x = [xyz (3), rpy (3), xyz_dot (3), rpy_dot (3)]; input u = 4 rotor
commands (squared rotor speeds, force = kF * u).
"""
import jax.numpy as jnp
import numpy as np

from .base import System

# Physical constants (reference quadrotor_dynamics.py:26-38).
# NOTE: numpy, not jnp — a module-level jnp.array initializes the XLA
# backend at import time, which forbids a later jax.distributed.initialize
# (the multi-process pod path imports this package first).  jnp ops convert
# numpy operands for free.
M = 0.775
L = 0.15
G = 9.81
INERTIA = np.array([
    [0.0015, 0.0, 0.0],
    [0.0, 0.0025, 0.0],
    [0.0, 0.0, 0.0035],
])
KF = 1.0
KM = 0.0245


def _rot_wb(rpy):
    """Body-to-world rotation from roll-pitch-yaw (Rz @ Ry @ Rx)."""
    cr, sr = jnp.cos(rpy[0]), jnp.sin(rpy[0])
    cp, sp = jnp.cos(rpy[1]), jnp.sin(rpy[1])
    cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
    rx = jnp.array([[1., 0., 0.], [0., cr, -sr], [0., sr, cr]])
    ry = jnp.array([[cp, 0., sp], [0., 1., 0.], [-sp, 0., cp]])
    rz = jnp.array([[cy, -sy, 0.], [sy, cy, 0.], [0., 0., 1.]])
    return rz @ ry @ rx


def _phi_inv(rpy):
    """Maps rpy rates to body angular velocity pqr."""
    sr, cr = jnp.sin(rpy[0]), jnp.cos(rpy[0])
    sp, cp = jnp.sin(rpy[1]), jnp.cos(rpy[1])
    return jnp.array([
        [1., 0., -sp],
        [0., cr, sr * cp],
        [0., -sr, cr * cp],
    ])


def _phi(rpy):
    """Maps body angular velocity pqr to rpy rates."""
    sr, cr = jnp.sin(rpy[0]), jnp.cos(rpy[0])
    sp, cp = jnp.sin(rpy[1]), jnp.cos(rpy[1])
    tp = sp / cp
    return jnp.array([
        [1., sr * tp, cr * tp],
        [0., cr, -sr],
        [0., sr / cp, cr / cp],
    ])


def make_quadrotor(h: float = 0.01) -> System:
    inertia_inv = jnp.linalg.inv(INERTIA)

    def step(x, u):
        uf = KF * u
        um = KM * u
        fg = jnp.array([0., 0., -M * G])
        force = jnp.array([0., 0., jnp.sum(uf)])
        moment = jnp.stack([
            L * (-uf[0] - uf[1] + uf[2] + uf[3]),
            L * (-uf[0] - uf[3] + uf[1] + uf[2]),
            -um[0] + um[1] - um[2] + um[3],
        ])

        rpy = x[3:6]
        rpy_d = x[9:12]
        r_wb = _rot_wb(rpy)
        xyz_dd = (r_wb @ force + fg) / M

        pqr = _phi_inv(rpy) @ rpy_d
        pqr_d = inertia_inv @ (moment - jnp.cross(pqr, INERTIA @ pqr))

        # rpy_dd = d(Phi)/dt @ pqr + Phi @ pqr_d, with d(Phi)/dt obtained by
        # differentiating Phi along rpy_d (jvp replaces the reference's
        # hand-derived 3x3x3 tensor CalcPhiD, quadrotor_dynamics.py:210-229).
        import jax
        phi_val, phi_dot = jax.jvp(_phi, (rpy,), (rpy_d,))
        rpy_dd = phi_dot @ pqr + phi_val @ pqr_d

        xdot = jnp.concatenate([x[6:12], xyz_dd, rpy_dd])
        return x + h * xdot

    return System(name="quadrotor", dim_x=12, dim_u=4, h=h, step=step)
