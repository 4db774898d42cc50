"""Aggregate cost-curve plots across all examples.

Mirrors ``/root/reference/examples/plot_iterations.py`` (the paper-figure
aggregator over the per-example analysis CSVs): reads every
``examples/analysis/*.csv`` produced by the drivers and renders a grid of
convergence curves to ``examples/analysis/all_curves.png``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ANALYSIS = Path(__file__).resolve().parent / "analysis"


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    csvs = sorted(ANALYSIS.glob("*.csv"))
    if not csvs:
        print("no analysis CSVs yet — run the example drivers first")
        return
    ncols = 3
    nrows = (len(csvs) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(4 * ncols, 2.8 * nrows))
    axes = np.atleast_2d(axes)
    for i, path in enumerate(csvs):
        ax = axes[i // ncols][i % ncols]
        try:
            ys = np.loadtxt(path, delimiter=",")
        except ValueError:
            # Probe/bracket artifacts carry header rows — not cost curves.
            ax.set_title(f"{path.stem} (non-curve)", fontsize=9)
            ax.axis("off")
            continue
        ax.plot(ys)
        ax.set_title(path.stem, fontsize=9)
        ax.set_yscale("log")
        ax.grid(True, alpha=0.3)
    for j in range(len(csvs), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    out = ANALYSIS / "all_curves.png"
    fig.savefig(out, dpi=110)
    print(f"saved {out} ({len(csvs)} curves)")


if __name__ == "__main__":
    main()
