"""Unified config layer.

The reference configures experiments through per-example python modules of
globals consumed via ``from X_setup import *`` by both runner and workers
(``planar_hand_setup.py:8-36``) — a weakness its own TODO acknowledges
("make workers system-agnostic. Maybe passing in a yml file",
``planar_hand_worker.py:14-15``).  Here: one dataclass serializable to/from
JSON or YAML that fully determines a solve.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

@dataclasses.dataclass
class ExperimentConfig:
    """Everything needed to reproduce a solve (system + algorithm + budget)."""
    system: str = "pendulum"              # registry name
    h: float = 0.1
    T: int = 100
    gradient_mode: str = "zero_order"
    num_samples: int = 100
    std_u: float = 0.3
    std_x: float = 1e-3
    decay_power: float = 0.8
    num_iters: int = 10
    seed: int = 0
    decouple_AB: bool = False
    use_delta_u_cost: bool = False
    admm_iters: int = 30
    parallel_riccati: bool = False
    mesh_sample_shards: int = 1
    mesh_knot_shards: int = 1
    # Contact time-stepping scheme for the quasistatic systems:
    # "anitescu" (convex relaxation) or "lcp" (exact one-sided
    # complementarity) — see models/contact/quasistatic.QuasistaticModel.
    contact_model: str = "anitescu"

    def to_json(self, path) -> Path:
        path = Path(path)
        path.write_text(json.dumps(dataclasses.asdict(self), indent=2))
        return path

    @classmethod
    def from_json(cls, path) -> "ExperimentConfig":
        return cls(**json.loads(Path(path).read_text()))

    @classmethod
    def from_yaml(cls, path) -> "ExperimentConfig":
        try:
            import yaml
        except ImportError as e:   # pragma: no cover
            raise RuntimeError("pyyaml not available; use from_json") from e
        return cls(**yaml.safe_load(Path(path).read_text()))

    def build_system(self):
        """Build the configured system with every relevant field threaded
        through (in particular ``contact_model`` — constructing via
        ``make_system(cfg.system, cfg.h)`` alone would silently drop it)."""
        return make_system(self.system, self.h,
                           contact_model=self.contact_model)


SYSTEM_REGISTRY = {}
# Quasistatic model builders (returning QuasistaticModel, not System) so
# make_system can apply contact_model overrides.
CONTACT_SYSTEMS = {}


def register_system(name: str):
    def deco(fn):
        SYSTEM_REGISTRY[name] = fn
        return fn
    return deco


def make_system(name: str, h: float, contact_model: str = "anitescu"):
    """Build a system by registry name (analytic + contact families).

    ``contact_model`` selects the quasistatic time-stepping scheme
    ("anitescu" | "lcp"); it is ignored by the analytic systems."""
    if not SYSTEM_REGISTRY:
        _populate_registry()
    if name not in SYSTEM_REGISTRY:
        raise KeyError(f"unknown system {name!r}; known: "
                       f"{sorted(SYSTEM_REGISTRY)}")
    if name in CONTACT_SYSTEMS:
        import dataclasses as _dc
        model = CONTACT_SYSTEMS[name](h)
        if contact_model != model.contact_model:
            model = _dc.replace(model, contact_model=contact_model)
        return model.system()
    if contact_model != "anitescu":
        # A non-default scheme was requested for a system with no contact
        # builder: refusing beats silently running the wrong model.
        raise ValueError(
            f"system {name!r} has no contact-model variants; got "
            f"contact_model={contact_model!r} (only quasistatic systems "
            f"{sorted(CONTACT_SYSTEMS)} support it)")
    return SYSTEM_REGISTRY[name](h)


def _populate_registry():
    from ..models.bicycle import make_bicycle
    from ..models.pendulum import make_pendulum
    from ..models.quadrotor import make_quadrotor
    from ..models.three_cart import make_three_cart
    from ..models.contact import systems as contact_systems
    SYSTEM_REGISTRY.update({
        "pendulum": make_pendulum,
        "bicycle": make_bicycle,
        "quadrotor": make_quadrotor,
        "three_cart": make_three_cart,
    })
    # Contact (quasistatic) systems register the MODEL builder once; the
    # System entry is derived so the two registries cannot drift.
    CONTACT_SYSTEMS.update({
        "planar_hand": contact_systems.make_planar_hand,
        "box_pushing": contact_systems.make_box_pushing,
        "box_pivoting": contact_systems.make_box_pivoting,
        "plate_pickup": contact_systems.make_plate_pickup,
        "carrots": lambda h: contact_systems.make_carrots(h=h),
    })
    for _name, _builder in CONTACT_SYSTEMS.items():
        SYSTEM_REGISTRY[_name] = (
            lambda h, _b=_builder: _b(h).system())
