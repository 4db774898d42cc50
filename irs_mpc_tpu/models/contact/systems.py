"""Contact-rich example systems (quasistatic), capability parity with the
reference's five contact examples (SURVEY §2.3).

The reference loads Drake SDF/YAML models from an external repo
(``quasistatic_simulator``, e.g. ``planar_hand_setup.py:8-10``); those files
are not part of the reference repo, so the geometries here are re-designed to
the same structure (same dof layout, same dof counts, same actuation
pattern, stiffness values from the setup files).  Convergence targets are
therefore qualitative (large cost reduction, contact-driven motion), not the
reference CSV values, which depend on the unavailable model files.

| system        | dim_x / dim_u | layout                                    |
|---------------|---------------|-------------------------------------------|
| planar_hand   | 7 / 4         | ball (y,z,th); arm_l (2); arm_r (2)       |
| box_pushing   | 5 / 2         | box (y,z,th); hand (y,z)                  |
| box_pivoting  | 5 / 2         | box (y,z,th); hand (y,z)  + wall, ground  |
| plate_pickup  | 8 / 5         | plate (y,z,th); gripper (y,z,th,f1,f2)    |
| carrots       | 45 / 5        | gripper (5); 20 pieces (y,z) each         |
"""
from __future__ import annotations

import numpy as np

from . import geometry as geom
from .quasistatic import ContactPair, ModelInstance, QuasistaticModel


def make_planar_hand(h: float = 0.1, mu: float = 0.8) -> QuasistaticModel:
    """Two 2-link arms + free ball (reference planar_hand_setup.py: Kp=[50,25],
    h=0.1, gravity -10; ball = sphere r=0.25 at (0, 0.35)).

    Geometry is dimensioned so the reference drivers' initial configuration
    q0 = (arms at +-(pi/4, pi/4), ball at (0, 0.35)) is a TRUE resting
    equilibrium: at q0 both second links are horizontal rails at z = 0.05
    (base z -0.1 + 0.15 elbow rise), and rail capsule radius 0.05 + ball
    radius 0.25 puts the resting ball centre exactly at z = 0.35.  The
    reference task "move the ball (+0.3, -0.1)" then means carrying it past
    the rail ends (|y| = 0.2) down to rest on the ground (z = 0.25)."""
    ball = geom.FreeBody2D(idx_pos=(0, 1), idx_rot=2,
                           shapes=(geom.Circle((0., 0.), 0.25),))
    arm_l = geom.Arm2D(base=(-0.35, -0.1), link_lengths=(0.15 * np.sqrt(2.),
                                                         0.28),
                       joint_idx=(3, 4), radius=0.05, angle_offset=np.pi)
    arm_r = geom.Arm2D(base=(0.35, -0.1), link_lengths=(0.15 * np.sqrt(2.),
                                                        0.28),
                       joint_idx=(5, 6), radius=0.05, angle_offset=np.pi)
    ground = geom.StaticBody(shapes=(geom.HalfSpace((0.0, 1.0), 0.0),))
    bodies = (ball, arm_l, arm_r, ground)
    pairs = []
    for arm_i in (1, 2):
        for link in (0, 1):
            pairs.append(ContactPair(body_a=arm_i, body_b=0,
                                     shape_a=link, shape_b=0, mu=mu))
    pairs.append(ContactPair(body_a=3, body_b=0, shape_a=0, shape_b=0,
                             mu=mu))
    return QuasistaticModel(
        name="planar_hand", h=h, nq=7,
        models=(
            ModelInstance("sphere", (0, 1, 2), actuated=False,
                          mass=(1.0, 1.0, 0.05)),
            ModelInstance("arm_left", (3, 4), actuated=True,
                          stiffness=(50.0, 25.0)),
            ModelInstance("arm_right", (5, 6), actuated=True,
                          stiffness=(50.0, 25.0)),
        ),
        bodies=bodies, pairs=tuple(pairs), gravity=(0.0, -10.0))


def make_box_pushing(h: float = 0.1, mu: float = 0.3) -> QuasistaticModel:
    """Point pusher + 1m box, gravity off (box_pushing_setup.py: Kp=500,
    gravity 0, box at (0, 0.5), hand at (0, -0.2))."""
    box = geom.FreeBody2D(idx_pos=(0, 1), idx_rot=2,
                          shapes=(geom.Box((0.5, 0.5)),))
    hand = geom.FreeBody2D(idx_pos=(3, 4), idx_rot=None,
                           shapes=(geom.Circle((0., 0.), 0.1),))
    return QuasistaticModel(
        name="box_pushing", h=h, nq=5,
        models=(
            ModelInstance("box", (0, 1, 2), actuated=False,
                          mass=(1.0, 1.0, 0.17)),
            ModelInstance("hand", (3, 4), actuated=True,
                          stiffness=(500.0, 500.0)),
        ),
        bodies=(box, hand),
        pairs=(ContactPair(body_a=1, body_b=0, mu=mu),),
        gravity=(0.0, 0.0))


def make_box_pivoting(h: float = 0.05, mu: float = 0.6) -> QuasistaticModel:
    """Box against a wall under gravity, very stiff pusher
    (box_pivoting_setup.py: Kp=50000)."""
    box = geom.FreeBody2D(idx_pos=(0, 1), idx_rot=2,
                          shapes=(geom.Box((0.5, 0.5)),))
    hand = geom.FreeBody2D(idx_pos=(3, 4), idx_rot=None,
                           shapes=(geom.Circle((0., 0.), 0.1),))
    world = geom.StaticBody(shapes=(
        geom.HalfSpace((0.0, 1.0), 0.0),       # ground z >= 0
        geom.HalfSpace((-1.0, 0.0), -1.0),     # wall  y <= 1
    ))
    pairs = (
        ContactPair(body_a=2, body_b=0, shape_a=0, shape_b=0, mu=mu),  # ground
        ContactPair(body_a=2, body_b=0, shape_a=1, shape_b=0, mu=mu),  # wall
        ContactPair(body_a=1, body_b=0, mu=mu),                        # hand
    )
    return QuasistaticModel(
        name="box_pivoting", h=h, nq=5,
        models=(
            ModelInstance("box", (0, 1, 2), actuated=False,
                          mass=(1.0, 1.0, 0.17)),
            ModelInstance("hand", (3, 4), actuated=True,
                          stiffness=(50000.0, 50000.0)),
        ),
        bodies=(box, hand, world), pairs=pairs, gravity=(0.0, -10.0),
        # Opt into the canonical dual carry: it is what stabilizes the
        # Kp=5e4 warm chains enough for the whole-chain rollout kernel
        # (measured 186.8 best vs 228.6 on the XLA chain; the friction-
        # memory downside documented on canon_warm_duals does not bite
        # this task — pivoting is normal-force dominated).
        canon_warm_duals=True)


def make_plate_pickup(h: float = 0.1, mu: float = 0.9) -> QuasistaticModel:
    """Gripper (floating base + 2 prismatic fingers) + plate on the ground
    (plate_pickup_setup.py analogue; dim_x=8, dim_u=5)."""
    plate = geom.FreeBody2D(idx_pos=(0, 1), idx_rot=2,
                            shapes=(geom.Box((0.4, 0.04)),))
    finger_l = geom.PrismaticFinger2D(
        idx_base_pos=(3, 4), idx_base_rot=5, idx_slide=6,
        axis=(1.0, 0.0), offset=(-0.3, 0.0), radius=0.04, length=0.25)
    finger_r = geom.PrismaticFinger2D(
        idx_base_pos=(3, 4), idx_base_rot=5, idx_slide=7,
        axis=(-1.0, 0.0), offset=(0.3, 0.0), radius=0.04, length=0.25)
    ground = geom.StaticBody(shapes=(geom.HalfSpace((0.0, 1.0), 0.0),))
    pairs = (
        ContactPair(body_a=1, body_b=0, mu=mu),   # finger_l vs plate
        ContactPair(body_a=2, body_b=0, mu=mu),   # finger_r vs plate
        ContactPair(body_a=3, body_b=0, mu=0.3),  # ground vs plate
    )
    return QuasistaticModel(
        name="plate_pickup", h=h, nq=8,
        models=(
            ModelInstance("plate", (0, 1, 2), actuated=False,
                          mass=(1.0, 1.0, 0.06)),
            ModelInstance("gripper", (3, 4, 5, 6, 7), actuated=True,
                          stiffness=(200.0, 200.0, 100.0, 400.0, 400.0)),
        ),
        bodies=(plate, finger_l, finger_r, ground),
        pairs=pairs, gravity=(0.0, -10.0))


def make_carrots(n_pieces: int = 20, h: float = 1.0,
                 mu: float = 0.4) -> QuasistaticModel:
    """Many-object pile: gripper (5 dof) + ``n_pieces`` round pieces (2 dof
    each, dim_x = 5 + 2n = 45 for n=20, matching carrot_setup.py h=1.0)."""
    ng = 5
    piece_r = 0.05
    bodies = []
    models = [ModelInstance("gripper", tuple(range(ng)), actuated=True,
                            stiffness=(100.0, 100.0, 50.0, 200.0, 200.0))]
    finger_l = geom.PrismaticFinger2D(
        idx_base_pos=(0, 1), idx_base_rot=2, idx_slide=3,
        axis=(1.0, 0.0), offset=(-0.25, 0.0), radius=0.03, length=0.2)
    finger_r = geom.PrismaticFinger2D(
        idx_base_pos=(0, 1), idx_base_rot=2, idx_slide=4,
        axis=(-1.0, 0.0), offset=(0.25, 0.0), radius=0.03, length=0.2)
    ground = geom.StaticBody(shapes=(geom.HalfSpace((0.0, 1.0), 0.0),))
    bodies = [finger_l, finger_r, ground]
    pairs = []
    for k in range(n_pieces):
        i0 = ng + 2 * k
        bodies.append(geom.FreeBody2D(
            idx_pos=(i0, i0 + 1), idx_rot=None,
            shapes=(geom.Circle((0., 0.), piece_r),)))
        models.append(ModelInstance(f"carrot_{k}", (i0, i0 + 1),
                                    actuated=False, mass=(0.1, 0.1)))
        body_idx = 3 + k
        pairs.append(ContactPair(body_a=0, body_b=body_idx, mu=mu))
        pairs.append(ContactPair(body_a=1, body_b=body_idx, mu=mu))
        pairs.append(ContactPair(body_a=2, body_b=body_idx, mu=mu))
    # piece-piece contacts
    for a in range(n_pieces):
        for b in range(a + 1, n_pieces):
            pairs.append(ContactPair(body_a=3 + a, body_b=3 + b, mu=mu))
    return QuasistaticModel(
        name="carrots", h=h, nq=ng + 2 * n_pieces,
        models=tuple(models), bodies=tuple(bodies), pairs=tuple(pairs),
        gravity=(0.0, -10.0))
