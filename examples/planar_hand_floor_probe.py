"""The anneal/hold + exact-polish probes that settle the quasistatic
planar-hand floor story (PARITY.md §"Quasistatic planar-hand floor").

Round-3 state: CEM brackets the plant floor at ~6.9; iRS restarted from the
CEM solution under the PUBLISHED schedule (std_u 0.3 decaying from iteration
1) climbs back to ~14.7 — but that run smooths with std strong enough to
erase the narrow valley *by construction*, so it proves nothing about
whether the valley survives weaker smoothing.  These probes close the gap:

(a) HOLD — iRS from the CEM input trajectory with the std schedule
    CONTINUED from its 21-descent terminal value (~0.026) instead of
    restarted: ``decay(it) = 1/(it+20)^0.8`` with the same base std.  If
    the smoothed objective at terminal std still prefers ~14.5, the valley
    is genuinely invisible to ANY std the published schedule ever uses; if
    iRS holds <= 12, annealing is all that was missing.
(b) POLISH — exact-gradient (no sampling) descent with a tight +-0.25h
    trust region from the standard 21-descent solution (~14.5): does a
    noiseless local method escape the smoothed attractor?
(c) CEM-POLISH — the same exact polish from the CEM ~6.9 solution: is 6.9 a
    genuine local optimum of the TRUE (unsmoothed) objective (polish holds
    or improves), or a sampling fluke (polish walks away)?

Artifacts: analysis/planar_hand_{hold,polish,cem_polish}_probe.csv, one
cost-per-descent column each (same format as the mode sweep CSVs), plus a
printed summary consumed by PARITY.md.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import report
from planar_hand import build_solver
from planar_hand_cem import build_solver as build_cem


def main(cem_iters=40, descents=21, polish_descents=15):
    # ---- stage 0: the CEM bracket (plant-floor witness, ~6.9) ----------
    cem, model = build_cem()
    cem.iterate(cem_iters, verbose=False)
    u_cem = np.asarray(cem.u_trj_best, np.float32)
    print(f"[cem] best {cem.cost_best:.3f} (bracket; expect ~6.9)")

    # ---- probe (a): hold under the CONTINUED schedule ------------------
    # Iteration i of this run sees std_u * 1/(i+20)^0.8 — exactly where the
    # published schedule left off after 21 descents.
    from irs_mpc_tpu import SmoothingConfig
    hold, _ = build_solver(
        gradient_mode="zero_order_B",
        u_trj_init=u_cem,
        smoothing=SmoothingConfig(
            num_samples=50, std_u=0.3, std_x=1e-3,
            decay=lambda it: 1.0 / (it + 20.0) ** 0.8, decay_std_x=False))
    hold.iterate(descents, verbose=False)
    report(hold, "planar_hand_hold_probe")
    print(f"[hold] init {hold.cost_lst[0]:.3f} "
          f"final {hold.cost:.3f} best {hold.cost_best:.3f}")

    # ---- probe (b): exact polish of the standard solution --------------
    std_run, _ = build_solver(gradient_mode="zero_order_B")
    std_run.iterate(descents, verbose=False)
    print(f"[standard] best {std_run.cost_best:.3f} (expect ~14.5)")
    tight = np.array([-np.ones(4) * 0.25 * model.h,
                      np.ones(4) * 0.25 * model.h])
    polish, _ = build_solver(
        gradient_mode="exact",
        u_trj_init=np.asarray(std_run.u_trj_best, np.float32),
        u_bounds_abs=tight)
    polish.iterate(polish_descents, verbose=False)
    report(polish, "planar_hand_polish_probe")
    print(f"[polish std] init {polish.cost_lst[0]:.3f} "
          f"final {polish.cost:.3f} best {polish.cost_best:.3f}")

    # ---- probe (c): exact polish of the CEM solution -------------------
    cem_polish, _ = build_solver(
        gradient_mode="exact", u_trj_init=u_cem, u_bounds_abs=tight)
    cem_polish.iterate(polish_descents, verbose=False)
    report(cem_polish, "planar_hand_cem_polish_probe")
    print(f"[polish cem] init {cem_polish.cost_lst[0]:.3f} "
          f"final {cem_polish.cost:.3f} best {cem_polish.cost_best:.3f}")

    print("\nsummary:",
          {"cem_bracket": round(cem.cost_best, 3),
           "hold_best": round(hold.cost_best, 3),
           "hold_final": round(hold.cost, 3),
           "standard_best": round(std_run.cost_best, 3),
           "polish_std_best": round(polish.cost_best, 3),
           "polish_cem_best": round(cem_polish.cost_best, 3)})
    return cem, hold, std_run, polish, cem_polish


if __name__ == "__main__":
    main()
