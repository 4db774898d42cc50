"""Run every example driver end-to-end and regenerate all analysis
artifacts (cost CSVs + aggregate plot).  ~10-20 min on CPU, less on TPU.

Usage:  python examples/run_all.py [--quick]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DRIVERS = [
    "pendulum", "bicycle", "quadrotor", "three_cart", "pendulum_nn",
    "planar_hand", "planar_hand_cem", "planar_hand_spin",
    "planar_hand_second_order", "box_pushing", "box_pushing_cem",
    "box_pushing_second_order", "box_pivoting", "plate_pickup", "carrots",
]


def main():
    t_total = time.time()
    failures = []
    for name in DRIVERS:
        t0 = time.time()
        print(f"=== {name} ===", flush=True)
        try:
            mod = __import__(name)
            mod.main()
        except Exception as e:   # keep going; report at the end
            failures.append((name, repr(e)))
            print(f"  FAILED: {e!r}")
        print(f"  ({time.time() - t0:.1f}s)", flush=True)
    import plot_all
    plot_all.main()
    print(f"total: {time.time() - t_total:.1f}s; "
          f"{len(DRIVERS) - len(failures)}/{len(DRIVERS)} drivers OK")
    for name, err in failures:
        print(f"  FAILED {name}: {err}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
