"""Bundled-gradient visualization study.

Mirrors ``/root/reference/examples/box_pushing/analysis/box_on_box.py`` and
``examples/box_pivoting/analysis/box_pivoting_bundle.py:63-157``: near a
contact boundary, scatter-plot sampled one-step outcomes and compare the
exact (one-sided) linearization against the first-order-averaged and
zero-order (bundled) estimates — the "bundled dynamics vs true dynamics"
picture that motivates randomized smoothing.

Outputs: examples/analysis/bundle_study.png
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from irs_mpc_tpu import SmoothingConfig, estimate_tv_matrices
from irs_mpc_tpu.models.contact.systems import make_box_pushing


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model = make_box_pushing(h=0.1)
    sys_ = model.system()
    # Hand just below the box: moving up makes contact, down does nothing —
    # a kink in the one-step map.
    x = jnp.asarray([0., 0.5, 0., 0., -0.13], jnp.float32)
    u = x[3:5]

    # Sweep the commanded hand height around the contact boundary.
    du_z = jnp.linspace(-0.1, 0.1, 101)
    us = jnp.stack([jnp.zeros_like(du_z), -0.13 + du_z], axis=1)
    xs = jnp.broadcast_to(x, (101, 5))
    box_z_next = sys_.step_batch(xs, us)[:, 1]

    # Exact linearization at the nominal (one-sided: sees no contact).
    AB = sys_.jacobian_xu(x, u)
    exact_slope = float(AB[1, 6])          # d box_z / d u_z

    # Smoothed estimates at three stds.
    slopes = {}
    for std in (0.01, 0.03, 0.06):
        cfg = SmoothingConfig(num_samples=3000, std_x=1e-4, std_u=std,
                              decay=lambda it: 1.0)
        tv = estimate_tv_matrices(sys_, "zero_order_B",
                                  jnp.stack([x, x]), u[None],
                                  jax.random.PRNGKey(0), 1.0, cfg)
        slopes[std] = float(tv.B[0, 1, 1])

    fig, ax = plt.subplots(figsize=(6, 4.5))
    ax.plot(np.asarray(du_z), np.asarray(box_z_next), "k-",
            label="true one-step dynamics")
    z0 = float(sys_.step(x, u)[1])
    ax.plot(np.asarray(du_z), z0 + exact_slope * np.asarray(du_z), "r--",
            label=f"exact gradient (slope {exact_slope:.2f})")
    for std, s in slopes.items():
        ax.plot(np.asarray(du_z), z0 + s * np.asarray(du_z), "--",
                label=f"bundled, std={std} (slope {s:.2f})")
    ax.set_xlabel("hand command delta-z")
    ax.set_ylabel("box z next")
    ax.legend()
    ax.grid(True)
    out = Path(__file__).parent / "bundle_study.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("exact slope:", exact_slope, "bundled:", slopes)
    print("saved", out)


if __name__ == "__main__":
    main()
