"""Checkpoint / resume for iRS-MPC solves.

The reference has none (SURVEY §5.4): state lives in memory and is dumped to
CSV only at the end of a run; a crash loses everything.  The full algorithm
state here is tiny — (u_trj, PRNG key, iteration counter, cost history) —
so per-iteration checkpointing is effectively free.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def save_checkpoint(path, solver) -> Path:
    """Snapshot an IrsMpc (or CEM) solver's resumable state to an .npz."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    key = np.asarray(solver.key)
    payload = dict(
        u_trj=np.asarray(solver.u_trj),
        x_trj=np.asarray(solver.x_trj),
        key=key,
        iteration=np.asarray(solver.iter),
        cost_lst=np.asarray(solver.cost_lst),
        cost_best=np.asarray(solver.cost_best),
        u_trj_best=np.asarray(solver.u_trj_best),
        x_trj_best=np.asarray(solver.x_trj_best),
    )
    np.savez(path, **payload)
    return path


def load_checkpoint(path, solver) -> None:
    """Restore a solver's state in place; continue with ``iterate``."""
    import jax.numpy as jnp
    data = np.load(path)
    solver.u_trj = jnp.asarray(data["u_trj"])
    solver.x_trj = jnp.asarray(data["x_trj"])
    solver.key = jnp.asarray(data["key"])
    solver.iter = int(data["iteration"])
    solver.cost_lst = list(data["cost_lst"])
    solver.cost = float(solver.cost_lst[-1])
    solver.cost_best = float(data["cost_best"])
    solver.u_trj_best = data["u_trj_best"]
    solver.x_trj_best = data["x_trj_best"]
