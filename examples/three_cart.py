"""Three-cart non-smooth collision system, zero-order with sample projection.

Mirrors ``/root/reference/examples/three_cart/three_cart_zero_order.py``:
push the middle cart to a goal through inelastic collisions; zero-order only
(the system is non-differentiable) with samples projected onto the
non-penetration set.  NOTE the reference feeds projected *absolute* samples
into a delta-expecting estimator (``three_cart_zero_order.py:38-43``) —
documented quirk; this framework's projection hook keeps deltas consistent.
"""
from common import report

import numpy as np

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig, make_three_cart


def build_params(T=100):
    x0 = np.array([-0.5, 0.0, 0.5, 0.0, 0.0, 0.0])
    xd = np.array([0.3, 0.5, 0.7, 0.0, 0.0, 0.0])
    return IrsMpcParams(
        Q=np.diag([1., 10., 1., 0.1, 0.1, 0.1]),
        Qd=np.diag([10., 100., 10., 1., 1., 1.]),
        R=np.diag([0.1, 0.1]),
        x0=x0,
        xd_trj=np.tile(xd, (T + 1, 1)),
        u_trj_init=np.zeros((T, 2)),
        gradient_mode="zero_order",
        smoothing=SmoothingConfig(num_samples=2000, std_x=0.1, std_u=0.5),
    )


def main():
    carts = make_three_cart(0.05)
    solver = IrsMpc(carts, build_params())
    solver.iterate(12, verbose=False)
    report(solver, "three_cart_zero_order")
    print("final carts:", solver.x_trj_best[-1][:3])


if __name__ == "__main__":
    main()
