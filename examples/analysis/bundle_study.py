"""Bundled-gradient visualization study.

Mirrors ``/root/reference/examples/box_pushing/analysis/box_on_box.py`` and
``examples/box_pivoting/analysis/box_pivoting_bundle.py:63-157``: near a
contact boundary, scatter-plot sampled one-step outcomes and compare the
exact (one-sided) linearization against the first-order-averaged and
zero-order (bundled) estimates — the "bundled dynamics vs true dynamics"
picture that motivates randomized smoothing.  Panel 2 is the reference's
two-contact-model comparison (``box_on_box.py:57-111``): the exact LCP
complementarity scheme (step-function response at phi = 0) vs Anitescu's
convex relaxation (force ramp through the positive-gap boundary layer),
each with its smoothed/bundled counterpart — here computed with the real
QP contact engine in both modes (``QuasistaticModel.contact_model``)
rather than the reference's hand-written 1-D toy maps.

Outputs: examples/analysis/bundle_study.png
"""
import dataclasses
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

    fig, (ax, ax2) = plt.subplots(1, 2, figsize=(12, 4.5))
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
    ax.set_title("bundled vs exact linearization (Anitescu)")
    ax.legend()
    ax.grid(True)

    # ---- Panel 2: LCP vs Anitescu, true + bundled one-step maps ---------
    # (the reference's box_on_box.py:57-111 comparison, with the real
    # contact engine).  Sweep the hand start height through the contact
    # boundary with a fixed upward command; plot the box response under
    # each contact model and its Monte-Carlo-smoothed (bundled) version.
    # Deep-overlap QPs (hand start above the boundary + full push) need
    # more PDIP iterations than the production budget to trace a clean
    # "true dynamics" curve.
    deep = dataclasses.replace(model, qp_iters=80)
    sys_deep = deep.system()
    sys_lcp = dataclasses.replace(deep, contact_model="lcp").system()
    n_pts, n_mc, std_w = 81, 800, 0.02
    hand_z = jnp.linspace(-0.20, -0.06, n_pts)     # box bottom at -0.05
    push = 0.06                                    # commanded upward step

    def response(system, z_batch):
        xs = jnp.broadcast_to(x, (z_batch.shape[0], 5)).at[:, 4].set(z_batch)
        us = jnp.stack([jnp.zeros_like(z_batch), z_batch + push], axis=1)
        return system.step_batch(xs, us)[:, 1]     # box z next

    curves = {}
    key = jax.random.PRNGKey(1)
    w = std_w * jax.random.normal(key, (n_mc,))
    # One flat (n_mc * n_pts) batch per model — a single step_batch call.
    z_flat = (hand_z[None, :] + w[:, None]).reshape(-1)
    for tag, s in (("Anitescu", sys_deep), ("LCP", sys_lcp)):
        true_c = jax.jit(lambda z: response(s, z))(hand_z)
        bundle = jax.jit(lambda z: response(s, z))(z_flat)
        bundle = jnp.mean(bundle.reshape(n_mc, n_pts), axis=0)
        curves[tag] = (np.asarray(true_c), np.asarray(bundle))

    zs = np.asarray(hand_z)
    for (tag, (true_c, bundle)), color in zip(curves.items(),
                                              ("springgreen", "blue")):
        ax2.plot(zs, true_c, "-", color=color, label=f"{tag} dynamics")
        ax2.plot(zs, bundle, "--", color=color,
                 label=f"bundled ({tag}, std={std_w})")
    ax2.set_xlabel("hand start height (contact boundary at -0.10)")
    ax2.set_ylabel("box z next")
    ax2.set_title("contact models: LCP step vs Anitescu ramp, and bundles")
    ax2.legend()
    ax2.grid(True)

    out = Path(__file__).parent / "bundle_study.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("exact slope:", exact_slope, "bundled:", slopes)
    for tag, (true_c, bundle) in curves.items():
        print(f"{tag}: true range [{true_c.min():.3f},{true_c.max():.3f}] "
              f"bundle range [{bundle.min():.3f},{bundle.max():.3f}]")
    print("saved", out)


if __name__ == "__main__":
    main()
