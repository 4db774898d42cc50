"""Opaque-simulator quadrotor: the "sim in the loop, zero-order only" usage.

Mirrors the reference's alternate quadrotor backend
(``/root/reference/examples/quadrotor/quadrotor_dynamics_drake.py:15-48``),
where dynamics = advancing a Drake ``Simulator`` by h — a black box with NO
analytic Jacobian, so only the zero-order estimator applies.  Here the
"external simulator" is a 4-substep RK4 integrator of the quadrotor ODE
(a different discretization from the analytic model's Euler step, exactly
like the Drake variant differs from ``quadrotor_dynamics.py``), and its
opacity is ENFORCED with ``jax.lax.stop_gradient``: ``jacobian_xu`` returns
zeros, so ``exact``/``first_order`` modes are structurally useless — as
they are against any external simulator — and the zero-order estimator
must recover the smoothed linearization purely from rollout differences.

This is the usage pattern for plugging ANY non-differentiable step into
the framework: wrap it as a ``System`` and set gradient_mode="zero_order".
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import numpy as np

from common import report
from quadrotor import build_params

from irs_mpc_tpu import IrsMpc, make_quadrotor
from irs_mpc_tpu.models.base import System


def make_opaque_quadrotor(h=0.05, substeps=4) -> System:
    """A 'simulator-backed' quadrotor: RK4 sub-stepping behind a gradient
    wall.  ``jax.jacfwd`` through it yields exactly zero — the framework
    analogue of a C++ simulator's missing Jacobian."""
    analytic = make_quadrotor(h / substeps)

    def substep_derivative(x, u):
        # Recover the continuous-time derivative from the analytic
        # (explicit-Euler) step: f(x, u) = (step(x, u) - x) / h_sub.
        return (analytic.step(x, u) - x) / (h / substeps)

    def rk4_step(x, u):
        dt = h / substeps
        for _ in range(substeps):
            k1 = substep_derivative(x, u)
            k2 = substep_derivative(x + 0.5 * dt * k1, u)
            k3 = substep_derivative(x + 0.5 * dt * k2, u)
            k4 = substep_derivative(x + dt * k3, u)
            x = x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return jax.lax.stop_gradient(x)

    return System(name="quadrotor_opaque", dim_x=12, dim_u=4, h=h,
                  step=rk4_step)


def main():
    sys_opaque = make_opaque_quadrotor()
    # Sanity: the gradient wall is real — the exact Jacobian is zero.
    J = sys_opaque.jacobian_xu(np.zeros(12, np.float32) + 0.1,
                               np.ones(4, np.float32) * 2.0)
    assert float(abs(J).max()) == 0.0, "simulator must be opaque"

    solver = IrsMpc(sys_opaque, build_params("zero_order"))
    solver.iterate(7, verbose=False)
    report(solver, "quadrotor_opaque_zero_order")
    print("final pos:", solver.x_trj_best[-1][:3],
          "goal:", np.asarray(solver.xd_trj[-1][:3]))


if __name__ == "__main__":
    main()
