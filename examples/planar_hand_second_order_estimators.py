"""Estimator-family comparison on the second-order (MBP) planar hand.

The repo analogue of the reference's
``examples/planar_hand/analysis/planar_hand_second_order_test.py:122-158``,
which heatmap-compares the exact autodiff Jacobian against the three smoothed
estimates (``calc_AB_first_order`` / ``calc_B_zero_order`` /
``calc_AB_zero_order``, ``mbp_dynamics.py:325-434``) on the x=(q,v) plant.

Artifacts:
  * ``analysis/planar_hand_second_estimators.png`` — 4-panel [A|B] heatmaps.
  * ``analysis/planar_hand_second_estimators.csv`` — per-mode max abs error
    of each block (A, B) vs the exact Jacobian, at matched sample budgets.

This closes the diagnostic loop on the second-order parity study: the
estimators track jacfwd to within sampling noise, so the residual cost floor
(see PARITY.md §"second-order floor analysis") is a property of the plant,
not of the estimation layer.
"""
from common import ANALYSIS_DIR

import numpy as np

import jax
import jax.numpy as jnp

from irs_mpc_tpu.ops.estimators import SmoothingConfig, estimate_tv_matrices
from planar_hand_second_order import Q0, _make_mbp


def main(num_samples=500, std_u=0.01, seed=0):
    base, mbp = _make_mbp("position")
    system = mbp.system()
    nq = base.nq
    # The reference test probes at the initial cradle state with a small
    # left-finger command offset (planar_hand_second_order_test.py:128-133).
    x0 = np.concatenate([Q0, np.zeros(nq)]).astype(np.float32)
    u0 = Q0[mbp.indices_u_into_x()].astype(np.float32)
    u0[0] += 0.1

    x_trj = jnp.asarray(np.stack([x0, x0]))   # one knot
    u_trj = jnp.asarray(u0[None])
    key = jax.random.PRNGKey(seed)

    AB_exact = np.asarray(system.jacobian_xu(jnp.asarray(x0),
                                             jnp.asarray(u0)))

    results = {"exact_jacfwd": AB_exact}
    rows = []
    for mode, a_src in (("first_order", "exact"),
                        ("zero_order_B", "first_order"),
                        ("zero_order_AB", "exact")):
        cfg = SmoothingConfig(num_samples=num_samples, std_u=std_u,
                              std_x=1e-3, decay=lambda it: 1.0,
                              decay_std_x=False, damp=3e-3,
                              zero_order_B_A_source=a_src)
        tv = estimate_tv_matrices(system, mode, x_trj, u_trj, key,
                                  jnp.asarray(1.0), cfg)
        AB = np.concatenate([np.asarray(tv.A[0]), np.asarray(tv.B[0])],
                            axis=1)
        results[mode] = AB
        errA = np.abs(AB[:, :2 * nq] - AB_exact[:, :2 * nq]).max()
        errB = np.abs(AB[:, 2 * nq:] - AB_exact[:, 2 * nq:]).max()
        scale = np.abs(AB_exact).max()
        rows.append((mode, errA, errB, errA / scale, errB / scale))
        print(f"[{mode:15s}] max|dA|={errA:.4f} max|dB|={errB:.4f} "
              f"(rel {errA / scale:.4f} / {errB / scale:.4f})")

    ANALYSIS_DIR.mkdir(exist_ok=True)
    with open(ANALYSIS_DIR / "planar_hand_second_estimators.csv", "w") as f:
        f.write("mode,max_abs_err_A,max_abs_err_B,rel_err_A,rel_err_B\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]:.6f},{r[2]:.6f},{r[3]:.6f},{r[4]:.6f}\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(4, 1, figsize=(8, 11))
    vmax = np.abs(AB_exact).max()
    titles = ["Exact AB (jacfwd)", "First order smoothing AB",
              "Zero order smoothing B (A: averaged first-order)",
              "Zero order smoothing AB"]
    for ax, (k, v), t in zip(axes, results.items(), titles):
        im = ax.imshow(v, vmin=-vmax, vmax=vmax, cmap="RdBu_r",
                       aspect="auto")
        ax.set_title(t)
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    out = ANALYSIS_DIR / "planar_hand_second_estimators.png"
    fig.savefig(out, dpi=110)
    print("saved", out)
    return rows


if __name__ == "__main__":
    main()
