"""TV-LQR backend registry.

API parity with the reference's ``get_solver`` (``irs_lqr/tv_lqr.py:11-27``),
which maps names to Drake solver objects (osqp|snopt|clp|scs|gurobi).  Here
backends are on-device solve strategies; external commercial solvers have no
role.  Reference names are accepted as aliases and map to the nearest
equivalent so ported driver scripts keep working (the reference's
``ScsSolver`` is referenced without an import — a bug, ``tv_lqr.py:21-22``).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SolverSpec:
    name: str
    kind: str            # "riccati" | "riccati_parallel" | "admm"
    description: str


_REGISTRY = {
    "riccati": SolverSpec("riccati", "riccati",
                          "sequential Riccati scan (unconstrained, exact)"),
    "riccati_parallel": SolverSpec(
        "riccati_parallel", "riccati_parallel",
        "associative-scan Riccati, O(log T) depth"),
    "admm": SolverSpec("admm", "admm",
                       "boxed QP via ADMM with Riccati inner solves"),
}

# Reference aliases -> nearest on-device equivalent.
_ALIASES = {
    "osqp": "admm",      # OSQP is ADMM; same algorithm family, on-device
    "gurobi": "admm",
    "scs": "admm",
    "clp": "admm",
    "snopt": "admm",
}


def get_solver(name: str) -> SolverSpec:
    key = name.lower()
    key = _ALIASES.get(key, key)
    if key not in _REGISTRY:
        raise ValueError(
            f"Do not recognize solver {name!r}; known: "
            f"{sorted(_REGISTRY) + sorted(_ALIASES)}")
    return _REGISTRY[key]
