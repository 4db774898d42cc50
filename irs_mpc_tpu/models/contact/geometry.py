"""2D contact geometry: signed distances, contact frames, body kinematics.

Replaces the role of Drake's SceneGraph + the quasistatic simulator's
collision queries (reference dependency ``QuasistaticSimulatorCpp``,
SURVEY §2.4) with pure-JAX primitives in the y-z plane.  Every function is
differentiable and vmap-safe; contact sets are enumerated statically at trace
time so shapes stay fixed under jit.

Conventions:
* configuration q is a flat (nq,) vector; each body owns a set of indices;
* a contact between bodies A and B returns (phi, p, n) with n the unit
  normal pointing from A into B at world contact point p;
* bodies expose ``point_jacobian(q, p) -> (2, nq)``: the map from q-velocity
  to the world velocity of a body-fixed point currently at p.  The contact
  row Jacobians are then J_n = n.(J_B - J_A), J_t = t.(J_B - J_A), which
  captures rotation-induced tangential sliding (friction torque on rotating
  bodies) without hand-derived per-pair formulas.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _perp(v):
    """90-degree counter-clockwise rotation."""
    return jnp.stack([-v[1], v[0]])


def _rot(th):
    c, s = jnp.cos(th), jnp.sin(th)
    return jnp.array([[c, -s], [s, c]])


# ---------------------------------------------------------------------------
# Shapes (parameters in body frame)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Circle:
    center: Tuple[float, float] = (0.0, 0.0)
    radius: float = 0.1


@dataclasses.dataclass(frozen=True)
class Capsule:
    p0: Tuple[float, float]
    p1: Tuple[float, float]
    radius: float = 0.05


@dataclasses.dataclass(frozen=True)
class Box:
    half: Tuple[float, float]
    center: Tuple[float, float] = (0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class HalfSpace:
    """Free space is n . p >= offset.  World-fixed (static bodies only)."""
    normal: Tuple[float, float]
    offset: float = 0.0


# ---------------------------------------------------------------------------
# Primitive distance queries (world-frame shape parameters)
# ---------------------------------------------------------------------------

def circle_circle(ca, ra, cb, rb):
    """Returns (phi, p, n): n from A to B."""
    delta = cb - ca
    dist = jnp.sqrt(jnp.sum(delta ** 2) + 1e-12)
    n = delta / dist
    phi = dist - ra - rb
    p = ca + n * (ra + 0.5 * phi)
    return phi, p, n


def segment_closest_point(p, a, b):
    """Closest point to p on segment ab."""
    ab = b - a
    t = jnp.clip(jnp.dot(p - a, ab) / (jnp.dot(ab, ab) + 1e-12), 0.0, 1.0)
    return a + t * ab


def capsule_circle(a0, a1, ra, cb, rb):
    """Capsule (segment a0-a1, radius ra) vs circle: n from capsule to circle."""
    cp = segment_closest_point(cb, a0, a1)
    return circle_circle(cp, ra, cb, rb)


def circle_halfspace(c, r, normal, offset):
    n_hs = jnp.asarray(normal)
    phi = jnp.dot(n_hs, c) - offset - r
    p = c - n_hs * r
    # Normal from the half-space INTO the circle body.
    return phi, p, n_hs


def point_halfspace(p, normal, offset):
    n_hs = jnp.asarray(normal)
    phi = jnp.dot(n_hs, p) - offset
    return phi, p, n_hs


def circle_box(c, r, box_center, box_half, box_theta):
    """Circle vs oriented box.  Returns (phi, p, n) with n from box to circle.

    Outside: closest-point construction; inside: nearest-face pushout.
    Both branches blended with jnp.where (single trace).
    """
    R = _rot(box_theta)
    local = R.T @ (c - box_center)
    half = jnp.asarray(box_half)
    clamped = jnp.clip(local, -half, half)
    delta_out = local - clamped
    dist_out = jnp.sqrt(jnp.sum(delta_out ** 2) + 1e-12)
    inside = jnp.all(jnp.abs(local) < half)

    # Outside normal (local frame).
    n_out = delta_out / dist_out
    # Inside: push out through the nearest face.
    face_dists = half - jnp.abs(local)          # (2,)
    axis = jnp.argmin(face_dists)
    sign = jnp.sign(local[axis]) + (local[axis] == 0.0)
    n_in = jnp.zeros(2).at[axis].set(sign)
    phi_out = dist_out - r
    phi_in = -jnp.min(face_dists) - r
    phi = jnp.where(inside, phi_in, phi_out)
    n_local = jnp.where(inside, n_in, n_out)
    p_local = jnp.where(inside,
                        local + n_in * face_dists[axis],
                        clamped)
    n = R @ n_local
    p = box_center + R @ p_local
    return phi, p, n


def box_corners(box_center, box_half, box_theta):
    """(4, 2) world corners of an oriented box."""
    hx, hy = box_half
    local = jnp.array([[hx, hy], [-hx, hy], [-hx, -hy], [hx, -hy]])
    R = _rot(box_theta)
    return box_center[None, :] + local @ R.T


# ---------------------------------------------------------------------------
# Bodies
# ---------------------------------------------------------------------------

class BodyBase:
    """Static config objects; all q-dependent math happens in methods."""
    shapes: tuple

    def point_jacobian(self, q: Array, p: Array) -> Array:
        raise NotImplementedError

    def world_shapes(self, q: Array):
        """Returns a list of (shape_kind, params...) in world frame."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class StaticBody(BodyBase):
    """World-fixed geometry (grounds, walls)."""
    shapes: tuple = ()

    def point_jacobian(self, q, p):
        return jnp.zeros((2, q.shape[0]), q.dtype)

    def world_shapes(self, q):
        out = []
        for s in self.shapes:
            if isinstance(s, HalfSpace):
                out.append(("halfspace", jnp.asarray(s.normal, jnp.float32),
                            jnp.asarray(s.offset, jnp.float32)))
            elif isinstance(s, Circle):
                out.append(("circle", jnp.asarray(s.center, jnp.float32),
                            jnp.asarray(s.radius, jnp.float32)))
            elif isinstance(s, Capsule):
                out.append(("capsule", jnp.asarray(s.p0, jnp.float32),
                            jnp.asarray(s.p1, jnp.float32),
                            jnp.asarray(s.radius, jnp.float32)))
            elif isinstance(s, Box):
                out.append(("box", jnp.asarray(s.center, jnp.float32),
                            jnp.asarray(s.half, jnp.float32),
                            jnp.asarray(0.0, jnp.float32)))
            else:
                raise TypeError(s)
        return out


@dataclasses.dataclass(frozen=True)
class FreeBody2D(BodyBase):
    """Rigid body with pose (y, z[, theta]) read from q at given indices."""
    idx_pos: Tuple[int, int]
    idx_rot: Optional[int] = None
    shapes: tuple = ()

    def _pose(self, q):
        c = jnp.stack([q[self.idx_pos[0]], q[self.idx_pos[1]]])
        th = q[self.idx_rot] if self.idx_rot is not None else jnp.asarray(0.0)
        return c, th

    def point_jacobian(self, q, p):
        c, _ = self._pose(q)
        J = jnp.zeros((2, q.shape[0]), q.dtype)
        J = J.at[0, self.idx_pos[0]].set(1.0)
        J = J.at[1, self.idx_pos[1]].set(1.0)
        if self.idx_rot is not None:
            arm = _perp(p - c)
            J = J.at[:, self.idx_rot].set(arm)
        return J

    def world_shapes(self, q):
        c, th = self._pose(q)
        R = _rot(th)
        out = []
        for s in self.shapes:
            if isinstance(s, Circle):
                out.append(("circle", c + R @ jnp.asarray(s.center),
                            jnp.asarray(s.radius, jnp.float32)))
            elif isinstance(s, Capsule):
                out.append(("capsule", c + R @ jnp.asarray(s.p0),
                            c + R @ jnp.asarray(s.p1),
                            jnp.asarray(s.radius, jnp.float32)))
            elif isinstance(s, Box):
                out.append(("box", c + R @ jnp.asarray(s.center),
                            jnp.asarray(s.half, jnp.float32), th))
            else:
                raise TypeError(s)
        return out


@dataclasses.dataclass(frozen=True)
class Arm2D(BodyBase):
    """Planar revolute chain anchored at ``base``; joint angles from q.

    Link k is a capsule from joint k to joint k+1 (absolute angle =
    cumulative sum of joint angles, first measured from -z axis like a
    hanging arm; sign convention: positive = counter-clockwise).
    """
    base: Tuple[float, float]
    link_lengths: Tuple[float, ...]
    joint_idx: Tuple[int, ...]
    radius: float = 0.05
    # Added to the cumulative angle: 0 = hanging (-z); pi = pointing up.
    angle_offset: float = 0.0

    def _joint_positions(self, q):
        """Returns (L+1, 2) positions: base, joint2, ..., tip."""
        angles = jnp.cumsum(jnp.stack([q[i] for i in self.joint_idx])) \
            + self.angle_offset
        pts = [jnp.asarray(self.base, jnp.float32)]
        for k, l in enumerate(self.link_lengths):
            d = jnp.stack([jnp.sin(angles[k]), -jnp.cos(angles[k])]) * l
            pts.append(pts[-1] + d)
        return jnp.stack(pts)

    def link_segment(self, q, k):
        pts = self._joint_positions(q)
        return pts[k], pts[k + 1]

    def point_jacobian_link(self, q, p, k):
        """Jacobian for a point attached to link k (0-based)."""
        pts = self._joint_positions(q)
        J = jnp.zeros((2, q.shape[0]), q.dtype)
        for j in range(k + 1):
            arm = _perp(p - pts[j])
            J = J.at[:, self.joint_idx[j]].set(arm)
        return J

    def point_jacobian(self, q, p):
        raise RuntimeError(
            "Arm2D needs the link index; use point_jacobian_link.")

    def world_shapes(self, q):
        out = []
        for k in range(len(self.link_lengths)):
            a, b = self.link_segment(q, k)
            out.append(("capsule", a, b,
                        jnp.asarray(self.radius, jnp.float32)))
        return out


@dataclasses.dataclass(frozen=True)
class PrismaticFinger2D(BodyBase):
    """A finger shape on a prismatic slide attached to a floating base.

    World position of the finger geometry:
        p = base_pos + R(theta) (offset + q[idx_slide] * axis)
    where base_pos/theta come from (idx_base_pos, idx_base_rot).  Used for
    gripper fingers (plate_pickup / carrots analogues).
    """
    idx_base_pos: Tuple[int, int]
    idx_base_rot: Optional[int]
    idx_slide: int
    axis: Tuple[float, float]          # slide axis in base frame
    offset: Tuple[float, float]        # finger rest offset in base frame
    radius: float = 0.04
    length: float = 0.0                # >0: capsule along -axis-perp

    def _frame(self, q):
        c = jnp.stack([q[self.idx_base_pos[0]], q[self.idx_base_pos[1]]])
        th = (q[self.idx_base_rot] if self.idx_base_rot is not None
              else jnp.asarray(0.0))
        return c, th

    def _tip(self, q):
        c, th = self._frame(q)
        R = _rot(th)
        local = jnp.asarray(self.offset) + q[self.idx_slide] * \
            jnp.asarray(self.axis)
        return c + R @ local, th, R

    def point_jacobian(self, q, p):
        c, th = self._frame(q)
        J = jnp.zeros((2, q.shape[0]), q.dtype)
        J = J.at[0, self.idx_base_pos[0]].set(1.0)
        J = J.at[1, self.idx_base_pos[1]].set(1.0)
        if self.idx_base_rot is not None:
            J = J.at[:, self.idx_base_rot].set(_perp(p - c))
        R = _rot(th)
        J = J.at[:, self.idx_slide].set(R @ jnp.asarray(self.axis))
        return J

    def world_shapes(self, q):
        tip, th, R = self._tip(q)
        if self.length > 0:
            # Capsule hanging straight DOWN in the base frame.  (Deriving
            # the direction from the slide axis is wrong: mirrored fingers
            # with axis (-1, 0) would point upward and never touch.)
            d = R @ jnp.asarray([0.0, -self.length], jnp.float32)
            return [("capsule", tip, tip + d,
                     jnp.asarray(self.radius, jnp.float32))]
        return [("circle", tip, jnp.asarray(self.radius, jnp.float32))]


# ---------------------------------------------------------------------------
# Pairwise narrow-phase dispatch
# ---------------------------------------------------------------------------

def shape_contact(sa, sb):
    """Contact between two world-frame shapes -> list of (phi, p, n).

    n points from shape A into shape B.  Multi-contact pairs (box vs
    halfspace) return several entries; the count is static.
    """
    ka, kb = sa[0], sb[0]
    if ka == "circle" and kb == "circle":
        phi, p, n = circle_circle(sa[1], sa[2], sb[1], sb[2])
        return [(phi, p, n)]
    if ka == "capsule" and kb == "circle":
        phi, p, n = capsule_circle(sa[1], sa[2], sa[3], sb[1], sb[2])
        return [(phi, p, n)]
    if ka == "circle" and kb == "capsule":
        phi, p, n = capsule_circle(sb[1], sb[2], sb[3], sa[1], sa[2])
        return [(phi, p, -n)]
    if ka == "halfspace" and kb == "circle":
        phi, p, n = circle_halfspace(sb[1], sb[2], sa[1], sa[2])
        return [(phi, p, n)]
    if ka == "circle" and kb == "halfspace":
        phi, p, n = circle_halfspace(sa[1], sa[2], sb[1], sb[2])
        return [(phi, p, -n)]
    if ka == "halfspace" and kb == "capsule":
        out = []
        for end in (sb[1], sb[2]):
            phi, p, n = circle_halfspace(end, sb[3], sa[1], sa[2])
            out.append((phi, p, n))
        return out
    if ka == "box" and kb == "circle":
        phi, p, n = circle_box(sb[1], sb[2], sa[1], sa[2], sa[3])
        return [(phi, p, n)]
    if ka == "circle" and kb == "box":
        phi, p, n = circle_box(sa[1], sa[2], sb[1], sb[2], sb[3])
        return [(phi, p, -n)]
    if ka == "capsule" and kb == "box":
        # Approximate: test both capsule endpoints against the box.
        out = []
        for end in (sa[1], sa[2]):
            phi, p, n = circle_box(end, sa[3], sb[1], sb[2], sb[3])
            out.append((phi, p, -n))
        return out
    if ka == "box" and kb == "capsule":
        out = []
        for end in (sb[1], sb[2]):
            phi, p, n = circle_box(end, sb[3], sa[1], sa[2], sa[3])
            out.append((phi, p, n))
        return out
    if ka == "halfspace" and kb == "box":
        corners = box_corners(sb[1], sb[2], sb[3])
        out = []
        for i in range(4):
            phi, p, n = point_halfspace(corners[i], sa[1], sa[2])
            out.append((phi, p, n))
        return out
    if ka == "box" and kb == "halfspace":
        corners = box_corners(sa[1], sa[2], sa[3])
        out = []
        for i in range(4):
            phi, p, n = point_halfspace(corners[i], sb[1], sb[2])
            out.append((phi, p, -n))
        return out
    raise NotImplementedError(f"contact pair {ka}-{kb}")
