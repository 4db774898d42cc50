"""Visualization: cost-curve plots and 2D scene animation.

Replaces the reference's meshcat streaming (``publish_trajectory``,
``quasistatic_dynamics.py:121-124``) and per-example matplotlib frame dumps
(``pendulum_animation.py``, ``three_cart_animation.py``) with a single
matplotlib-based renderer that understands the contact engine's geometry.
Headless-safe (Agg backend).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_cost_curves(curves: dict, path, logy: bool = False,
                     title: str = "Trajectory cost"):
    """curves: {label: [cost per iteration]} -> saved PNG
    (reference: run_planar_hand.py:208-221)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, ys in curves.items():
        ax.plot(ys, label=label)
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel("Iterations")
    ax.set_title(title)
    ax.legend()
    ax.grid(True)
    fig.tight_layout()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def _draw_shape(ax, shape, color):
    import matplotlib.patches as mp
    kind = shape[0]
    if kind == "circle":
        c, r = np.asarray(shape[1]), float(shape[2])
        ax.add_patch(mp.Circle(c, r, fill=False, color=color, lw=1.5))
    elif kind == "capsule":
        a, b, r = np.asarray(shape[1]), np.asarray(shape[2]), float(shape[3])
        ax.plot([a[0], b[0]], [a[1], b[1]], color=color,
                lw=2 * r * 72, alpha=0.4, solid_capstyle="round")
        ax.plot([a[0], b[0]], [a[1], b[1]], color=color, lw=1.5)
    elif kind == "box":
        c, half, th = (np.asarray(shape[1]), np.asarray(shape[2]),
                       float(shape[3]))
        corners = []
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        for sx, sy in [(1, 1), (-1, 1), (-1, -1), (1, -1)]:
            corners.append(c + R @ (half * np.array([sx, sy])))
        ax.add_patch(mp.Polygon(np.asarray(corners), fill=False,
                                color=color, lw=1.5))
    elif kind == "halfspace":
        n, off = np.asarray(shape[1]), float(shape[2])
        p0 = n * off
        t = np.array([-n[1], n[0]])
        a, b = p0 - 3 * t, p0 + 3 * t
        ax.plot([a[0], b[0]], [a[1], b[1]], color=color, lw=1.0, ls="--")


def animate_contact_trajectory(model, x_trj, path, fps: int = 10,
                               xlim=(-1.5, 1.5), ylim=(-0.5, 1.5)):
    """Render a contact-system trajectory to an animated GIF.

    ``model`` is a QuasistaticModel; ``x_trj`` (T+1, nq) configurations."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation, PillowWriter
    import jax.numpy as jnp

    colors = ["tab:blue", "tab:orange", "tab:green", "tab:red",
              "tab:purple", "tab:brown", "tab:gray"]
    fig, ax = plt.subplots(figsize=(5, 5))

    def draw_frame(i):
        ax.clear()
        ax.set_xlim(*xlim)
        ax.set_ylim(*ylim)
        ax.set_aspect("equal")
        q = jnp.asarray(x_trj[i], jnp.float32)
        for b_i, body in enumerate(model.bodies):
            for shape in body.world_shapes(q):
                _draw_shape(ax, shape, colors[b_i % len(colors)])
        ax.set_title(f"{model.name} t={i}")

    anim = FuncAnimation(fig, draw_frame, frames=len(x_trj))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return path


def plot_phase_trajectories(x_trj_lst, path, dims=(0, 1),
                            title: str = "iterates"):
    """Phase-space convergence plot across iterations (the reference's
    colormap-fade plot, pendulum_zero_order.py:53-65)."""
    plt = _mpl()
    from matplotlib import cm
    fig, ax = plt.subplots(figsize=(5, 5))
    colormap = cm.get_cmap("jet")
    n = len(x_trj_lst)
    for i, x_trj in enumerate(x_trj_lst):
        col = colormap(i / max(n - 1, 1))
        ax.plot(x_trj[:, dims[0]], x_trj[:, dims[1]],
                color=(col[0], col[1], col[2], (i + 1) / n))
    ax.set_title(title)
    fig.tight_layout()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
