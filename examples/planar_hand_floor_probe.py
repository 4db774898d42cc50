"""The anneal/hold + exact-polish probes that settle the quasistatic
planar-hand floor story (PARITY.md §"Quasistatic planar-hand floor").

Round-3 state: CEM brackets the plant floor at ~6.9; iRS restarted from the
CEM solution under the PUBLISHED schedule (std_u 0.3 decaying from iteration
1) climbs back to ~14.7 — but that run smooths with std strong enough to
erase the narrow valley *by construction*.  These probes close the gap, and
add the FEASIBILITY diagnostic the first probe round exposed: the solver's
trust region is recentred on the achieved trajectory (|u_t - x_t[idx]| <=
0.5h = 0.05), so if the CEM solution commands larger per-knot arm motion,
iRS cannot even REPRESENT it — the projected-feedback rollout clips the
nominal inputs at alpha = 0 and the "climb away" is partly a projection
out of an infeasible point, not purely a smoothed-landscape preference.

(a) FEASIBILITY — max |u_t - x_t[idx_u]| of the CEM solution vs the trust
    bound, and the fraction of saturated knots.
(b) HOLD — iRS from the CEM input trajectory with the std schedule
    CONTINUED from its 21-descent terminal value (~0.026) instead of
    restarted: ``decay(it) = 1/(it+20)^0.8``.
(c) POLISH — exact-gradient descent from the standard ~14.7 solution and
    from the CEM solution, with a WIDE trust region (+-2h) so the box
    never clips the initial trajectory (the r3-suggested +-0.25h box
    clips both initializations and only measures the projection).

Artifacts: analysis/planar_hand_{hold,polish,cem_polish}_probe.csv, the
u/x trajectories as .npy, and a printed summary consumed by PARITY.md.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import ANALYSIS_DIR, report
from planar_hand import build_solver
from planar_hand_cem import build_solver as build_cem


def du_stats(model, x, u):
    idx = model.indices_u_into_x()
    du = np.abs(np.asarray(u) - np.asarray(x)[:-1][:, idx])
    return float(du.max()), float((du > 0.5 * model.h).mean())


def main(cem_iters=40, descents=21, polish_descents=15):
    from irs_mpc_tpu import SmoothingConfig

    # ---- stage 0: the CEM bracket (plant-floor witness, ~6.9) ----------
    cem, model = build_cem()
    cem.iterate(cem_iters, verbose=False)
    u_cem = np.asarray(cem.u_trj_best, np.float32)
    np.save(ANALYSIS_DIR / "planar_hand_u_cem.npy", u_cem)
    du_max, frac = du_stats(model, cem.x_trj_best, u_cem)
    print(f"[cem] best {cem.cost_best:.3f}; max|du| {du_max:.4f} vs trust "
          f"bound {0.5 * model.h:.3f}; saturated knot-dofs {frac:.1%}",
          flush=True)

    # ---- probe (b): hold under the CONTINUED schedule ------------------
    hold, _ = build_solver(
        gradient_mode="zero_order_B",
        u_trj_init=u_cem,
        smoothing=SmoothingConfig(
            num_samples=50, std_u=0.3, std_x=1e-3,
            decay=lambda it: 1.0 / (it + 20.0) ** 0.8, decay_std_x=False))
    hold.iterate(descents, verbose=False)
    report(hold, "planar_hand_hold_probe")
    print(f"[hold] init {hold.cost_lst[0]:.3f} "
          f"final {hold.cost:.3f} best {hold.cost_best:.3f}", flush=True)

    # ---- standard 21-descent run (the ~14.7 baseline) ------------------
    std_run, _ = build_solver(gradient_mode="zero_order_B")
    std_run.iterate(descents, verbose=False)
    u_std = np.asarray(std_run.u_trj_best, np.float32)
    np.save(ANALYSIS_DIR / "planar_hand_u_std.npy", u_std)
    sdu_max, sfrac = du_stats(model, std_run.x_trj_best, u_std)
    print(f"[standard] best {std_run.cost_best:.3f}; max|du| {sdu_max:.4f}; "
          f"saturated {sfrac:.1%}", flush=True)

    # ---- probe (c): exact polish, wide trust region --------------------
    wide = np.array([-np.ones(4) * 2.0 * model.h,
                     np.ones(4) * 2.0 * model.h])
    polish, _ = build_solver(gradient_mode="exact", u_trj_init=u_std,
                             u_bounds_abs=wide)
    polish.iterate(polish_descents, verbose=False)
    report(polish, "planar_hand_polish_probe")
    print(f"[polish std] init {polish.cost_lst[0]:.3f} "
          f"final {polish.cost:.3f} best {polish.cost_best:.3f}", flush=True)

    cem_polish, _ = build_solver(gradient_mode="exact", u_trj_init=u_cem,
                                 u_bounds_abs=wide)
    cem_polish.iterate(polish_descents, verbose=False)
    report(cem_polish, "planar_hand_cem_polish_probe")
    print(f"[polish cem] init {cem_polish.cost_lst[0]:.3f} "
          f"final {cem_polish.cost:.3f} best {cem_polish.cost_best:.3f}",
          flush=True)

    print("\nsummary:",
          {"cem_bracket": round(cem.cost_best, 3),
           "cem_du_max": round(du_max, 4),
           "cem_du_saturated_frac": round(frac, 3),
           "hold_best": round(hold.cost_best, 3),
           "hold_final": round(hold.cost, 3),
           "standard_best": round(std_run.cost_best, 3),
           "standard_du_max": round(sdu_max, 4),
           "polish_std_best": round(polish.cost_best, 3),
           "polish_std_final": round(polish.cost, 3),
           "polish_cem_best": round(cem_polish.cost_best, 3),
           "polish_cem_final": round(cem_polish.cost, 3)})
    return cem, hold, std_run, polish, cem_polish


if __name__ == "__main__":
    main()
