"""Three-cart non-smooth collision system, zero-order with sample projection.

Mirrors ``/root/reference/examples/three_cart/three_cart_zero_order.py``
EXACTLY: h=0.05, T=100, x0=(0,1,2), goal +2 on every cart (the MIDDLE cart
is unactuated and can only be moved by pushing through collisions),
Q=0.01 diag(50,50,50,20,100,20), Qd=diag(same), R=0.01 I,
std (4.0, 0.5)/iter^0.2, 1000 samples with projection onto the
non-penetration set.  NOTE the reference feeds projected *absolute* samples
into a delta-expecting estimator (``three_cart_zero_order.py:38-43``) —
documented quirk; this framework's projection hook keeps deltas consistent.
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig, make_three_cart


def build_params(T=100):
    return IrsMpcParams(
        Q=0.01 * np.diag([50., 50., 50., 20., 100., 20.]),
        Qd=np.diag([50., 50., 50., 20., 100., 20.]),
        R=0.01 * np.diag([1., 1.]),
        x0=np.array([0., 1., 2., 0., 0., 0.]),
        xd_trj=np.tile([2., 3., 4., 0., 0., 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1, -0.1], (T, 1)),
        u_bounds_abs=np.array([[-1000., -1000.], [1000., 1000.]]),
        gradient_mode="zero_order",
        smoothing=SmoothingConfig(
            num_samples=1000, std_x=4.0, std_u=0.5,
            decay=lambda it: 1.0 / it ** 0.2),
    )


def main():
    carts = make_three_cart(0.05)
    solver = IrsMpc(carts, build_params())
    solver.iterate(20, verbose=False)
    report(solver, "three_cart_zero_order")
    print("final carts:", solver.x_trj_best[-1][:3], "(goal 2, 3, 4)")
    # Collision-chain animation (reference three_cart_animation.py:6-42).
    from irs_mpc_tpu.utils.viz import animate_analytic_trajectory
    from common import ANALYSIS_DIR
    animate_analytic_trajectory("three_cart", solver.x_trj_best,
                                ANALYSIS_DIR / "three_cart.gif")


if __name__ == "__main__":
    main()
