"""Pallas TPU kernel: the ENTIRE line-searched contact forward rollout.

The true-dynamics forward pass of a contact iRS-MPC iteration is a serial
chain: 30 knots, each = feedback law + contact-geometry narrow phase + one
warm-started PDIP contact QP (the reference's hot loop re-solves every knot
cold through Gurobi, ``/root/reference/irs_lqr/quasistatic_dynamics.py:
242-266``).  Under XLA the chain is a ``lax.scan`` whose body schedules
~100 tiny kernels per knot — at ~6 line-search lanes of (7-11)-dim math the
iteration is pure dispatch latency (bench.py roofline: the 6.4 ms contact
iteration has ~1.5 us of compute at peak f32 throughput).  This kernel runs
the WHOLE chain — all line-search alphas, all knots, geometry + QP +
feedback — as one VMEM-resident Pallas program with zero HBM round-trips
between knots.

Layout: the line-search alphas ride the leading (sublane) axis (B = 8 >=
n_alpha; spare lanes recompute alpha 0), per-knot quantities are (B, k)
tiles and small dense (B, k, l) arrays.  The geometry is re-expressed at
BUILD time into Mosaic-safe primitives: body index structure becomes rows
of an identity input (no scatter/gather; Pallas kernels cannot capture
non-scalar constants, so every constant matrix arrives as an input ref),
contact rows accumulate structurally-sparse one-hot outer products, and the
narrow phase (capsule/circle/halfspace against Arm2D / FreeBody2D / static
bodies) is scalar column math on the VPU.  The warm-started PDIP mirrors
``qp._pdip_solve(init=...)`` exactly (same shift/floor/cap constants) so
the kernel and the XLA chain agree numerically.

Scope: quasistatic models whose pairs use circle/capsule/halfspace shapes
on FreeBody2D / Arm2D / StaticBody bodies under the Anitescu contact model
(planar_hand and friends); anything else falls back to the XLA scan.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import geometry as geom

Array = jax.Array

_B = 8                      # sublane batch: line-search lanes (padded)
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Build-time support check + constant extraction
# ---------------------------------------------------------------------------

_PAIR_KINDS = (
    ("capsule", "circle"), ("circle", "capsule"),
    ("halfspace", "circle"), ("circle", "halfspace"),
    ("circle", "circle"),
    ("box", "circle"), ("circle", "box"),
    ("capsule", "box"), ("box", "capsule"),
    ("halfspace", "box"), ("box", "halfspace"),
)

# VMEM / op-count gate: the dense-batched PDIP materializes (B, mr, nq, nq)
# products; beyond this the kernel stops paying (carrots: mr=500, nq=45
# stays on the XLA scan).
_MAX_ROWS = 64
_MAX_NQ = 16


def supports_model(model) -> bool:
    """True if every contact pair lowers to the kernel-safe narrow phase."""
    if model.contact_model != "anitescu" or not model.pairs:
        return False
    if model.nq > _MAX_NQ or model.n_constraint_rows() > _MAX_ROWS:
        return False
    for pair in model.pairs:
        ba, bb = model.bodies[pair.body_a], model.bodies[pair.body_b]
        kinds = (_body_kind(ba, pair.shape_a), _body_kind(bb, pair.shape_b))
        if None in kinds or kinds not in _PAIR_KINDS:
            return False
    return True


def chain_gate(model) -> bool:
    """Quality gate ON TOP of supports_model: attach the kernel only where
    the warm chain preserves the recorded convergence curves.

    The kernel and the XLA scan run the SAME warm PDIP to the same primal
    accuracy, but the Anitescu DUALS are non-unique: the two cone rows of
    a non-sliding contact are degenerate, so the dual split between them
    is a free direction along which float-order dust grows to O(1)
    relative within one solve (measured: identical inputs + identical
    warm starts give dq agreeing to 7e-5 while lam differs 87%).  The
    warm-start carry feeds that split forward; on contact-mode-sensitive
    systems the two equally-valid chains then drift ~1e-3/knot and the
    line search lands in a different basin.  Measured r4 on hardware
    (pre-canonicalization): planar hand 14.68 (recorded 14.5-14.9) and
    box_pushing 46.09 (46.1) preserved; box_pivoting (Kp = 5e4) degraded
    228.6 -> 417 (242 even at double warm iterations) and plate_pickup
    (prismatic-finger grasping) 3.31 -> 4.06.

    r5: ``canon_warm_duals`` (QuasistaticModel, opt-in) projects the
    carried duals onto the canonical cone-pair split after every knot, in
    BOTH chains — removing the free direction the stiff-actuation drift
    lived in.  Measured on hardware (kernel + canon): box_pivoting 786.4
    -> best 186.8 at 10 descents, clearly BETTER than the recorded
    XLA-chain 228.6 (r4's un-canonicalized kernel degraded it to 417) —
    so the pivoting factory opts in and this gate admits stiff systems
    that do.  Canonicalization is NOT free: it resets the friction-force
    component mu*(lam1-lam2) each knot, and friction-memory tasks
    measurably lose their basins with it (planar_hand_spin first_order
    54.1 -> 127.9 on the XLA chain alone; plate_pickup's kernel-chain
    grasp 3.39 -> 6.20 — the kernel's ~1e-2-class chain accuracy cannot
    rebuild the grasp force within the warm budget), hence opt-in
    per model, prismatic-finger grasping excluded outright, and the
    legacy stiffness exclusion for models that do not opt in."""
    for body in model.bodies:
        if isinstance(body, geom.PrismaticFinger2D):
            return False
    if model.canon_warm_duals:
        return True
    for mi in model.models:
        if mi.actuated and max(mi.stiffness) > 1000.0:
            return False
    return True


def _body_kind(body, shape_idx):
    if isinstance(body, geom.Arm2D):
        return "capsule"
    if isinstance(body, geom.StaticBody):
        s = body.shapes[shape_idx]
        if isinstance(s, geom.HalfSpace):
            return "halfspace"
        if isinstance(s, geom.Circle):
            return "circle"
        return None
    if isinstance(body, geom.PrismaticFinger2D):
        return "capsule" if body.length > 0 else "circle"
    if isinstance(body, geom.FreeBody2D):
        s = body.shapes[shape_idx]
        if isinstance(s, geom.Circle) and tuple(s.center) == (0.0, 0.0):
            # Off-center circles would need the body rotation applied to
            # the center offset; not needed by any bundled model.
            return "circle"
        if isinstance(s, geom.Box) and tuple(s.center) == (0.0, 0.0):
            return "box"
        return None
    return None


def _hessian_constants(model):
    """P diagonal (constant), and b(q, u) = pq_vec*q - u@KU' - tau_vec."""
    nq, m = model.nq, model.dim_u
    p_diag = np.zeros(nq, np.float32)
    pq_vec = np.zeros(nq, np.float32)     # multiplies q in b
    KU = np.zeros((nq, m), np.float32)    # multiplies u in b
    tau = np.zeros(nq, np.float32)
    gz = np.asarray(model.gravity, np.float32)
    iu = 0
    for mi in model.models:
        idx = np.asarray(mi.q_indices)
        if mi.actuated:
            kp = np.asarray(mi.stiffness, np.float32)
            p_diag[idx] = kp
            pq_vec[idx] = kp
            for j, qi in enumerate(idx):
                KU[qi, iu + j] = kp[j]
            iu += len(idx)
        else:
            mass = np.asarray(mi.mass, np.float32)
            p_diag[idx] = mass / model.h ** 2
            t = np.zeros(len(idx), np.float32)
            if len(idx) >= 2:
                t[0] = mass[0] * gz[0]
                t[1] = mass[1] * gz[1]
            tau[idx] += t
    return p_diag, pq_vec, KU, tau


# ---------------------------------------------------------------------------
# Batched scalar-column geometry (everything is a (B, 1) column).
#
# ``consts`` carries the constant matrices as VALUES read from kernel input
# refs (Pallas kernels cannot capture non-scalar constants):
#   eye   (nq, nq)  identity — row i is the one-hot e_i
#   pq    (1, nq)   stiffness row multiplying q in the bias
#   KUT   (m, nq)   maps u into the bias
#   tau   (1, nq)   gravity bias row
#   pdiag (1, nq)   QP Hessian diagonal
# ---------------------------------------------------------------------------

def _col(x, i):
    return x[:, i:i + 1]


def _rot_apply(ct, st, vy, vz):
    """R(theta) @ v with ct/st scalar columns (or floats)."""
    return ct * vy - st * vz, st * vy + ct * vz


def _rot_apply_T(ct, st, vy, vz):
    return ct * vy + st * vz, -st * vy + ct * vz


class _BodyFrame:
    """Per-step world data + dense Jacobian rows for one body."""

    def __init__(self, body, x, consts):
        self.body = body
        self.x = x
        self.eye = consts["eye"]
        if isinstance(body, geom.Arm2D):
            zero_c = _col(x, 0) * 0.0
            angles, pts = [], [(zero_c + float(body.base[0]),
                                zero_c + float(body.base[1]))]
            acc = None
            for k, l in enumerate(body.link_lengths):
                a = _col(x, body.joint_idx[k])
                acc = a if acc is None else acc + a
                ang = acc + float(body.angle_offset)
                angles.append(ang)
                py, pz = pts[-1]
                pts.append((py + jnp.sin(ang) * float(l),
                            pz - jnp.cos(ang) * float(l)))
            self.joints = pts          # [(py, pz)] length L+1
        elif isinstance(body, geom.FreeBody2D):
            self.c = (_col(x, body.idx_pos[0]), _col(x, body.idx_pos[1]))
            self.th = (_col(x, body.idx_rot) if body.idx_rot is not None
                       else _col(x, 0) * 0.0)
        elif isinstance(body, geom.PrismaticFinger2D):
            self.c = (_col(x, body.idx_base_pos[0]),
                      _col(x, body.idx_base_pos[1]))
            self.th = (_col(x, body.idx_base_rot)
                       if body.idx_base_rot is not None
                       else _col(x, 0) * 0.0)
            ct, st = jnp.cos(self.th), jnp.sin(self.th)
            self.ct, self.st = ct, st
            slide = _col(x, body.idx_slide)
            ly = float(body.offset[0]) + slide * float(body.axis[0])
            lz = float(body.offset[1]) + slide * float(body.axis[1])
            wy, wz = _rot_apply(ct, st, ly, lz)
            self.tip = (self.c[0] + wy, self.c[1] + wz)

    def _e(self, i):
        return self.eye[i:i + 1, :]           # (1, nq) one-hot

    def shape_world(self, shape_idx):
        """Returns ("kind", params...) with scalar-column params."""
        b = self.body
        if isinstance(b, geom.Arm2D):
            a0 = self.joints[shape_idx]
            a1 = self.joints[shape_idx + 1]
            return ("capsule", a0, a1, float(b.radius))
        if isinstance(b, geom.StaticBody):
            s = b.shapes[shape_idx]
            if isinstance(s, geom.HalfSpace):
                return ("halfspace", (float(s.normal[0]),
                                      float(s.normal[1])), float(s.offset))
            zero_c = _col(self.x, 0) * 0.0
            return ("circle", (zero_c + float(s.center[0]),
                               zero_c + float(s.center[1])),
                    float(s.radius))
        if isinstance(b, geom.PrismaticFinger2D):
            if b.length > 0:
                # Capsule hanging straight down in the base frame
                # (geometry.PrismaticFinger2D.world_shapes).
                dy, dz = _rot_apply(self.ct, self.st, 0.0,
                                    -float(b.length))
                end = (self.tip[0] + dy, self.tip[1] + dz)
                return ("capsule", self.tip, end, float(b.radius))
            return ("circle", self.tip, float(b.radius))
        if isinstance(b, geom.FreeBody2D):
            s = b.shapes[shape_idx]
            if isinstance(s, geom.Circle):
                return ("circle", (self.c[0], self.c[1]), float(s.radius))
            if isinstance(s, geom.Box):
                return ("box", (self.c[0], self.c[1]),
                        (float(s.half[0]), float(s.half[1])), self.th)
        raise NotImplementedError(type(b))

    def point_jacobian_rows(self, p, shape_idx):
        """Dense (B, nq) rows (Jy, Jz) for a point p = (py, pz) on this
        body — the scatter-free re-expression of geometry.point_jacobian:
        every q-index becomes a one-hot row of the identity input."""
        b = self.body
        zero = self.x * 0.0
        if isinstance(b, geom.StaticBody):
            return zero, zero
        py, pz = p
        if isinstance(b, geom.FreeBody2D):
            Jy = zero + self._e(b.idx_pos[0])
            Jz = zero + self._e(b.idx_pos[1])
            if b.idx_rot is not None:
                cy, cz = self.c
                # perp(p - c) = (-(pz - cz), (py - cy))
                Jy = Jy + (-(pz - cz)) * self._e(b.idx_rot)
                Jz = Jz + (py - cy) * self._e(b.idx_rot)
            return Jy, Jz
        if isinstance(b, geom.Arm2D):
            Jy, Jz = zero, zero
            for j in range(shape_idx + 1):
                jy, jz = self.joints[j]
                Jy = Jy + (-(pz - jz)) * self._e(b.joint_idx[j])
                Jz = Jz + (py - jy) * self._e(b.joint_idx[j])
            return Jy, Jz
        if isinstance(b, geom.PrismaticFinger2D):
            Jy = zero + self._e(b.idx_base_pos[0])
            Jz = zero + self._e(b.idx_base_pos[1])
            if b.idx_base_rot is not None:
                cy, cz = self.c
                Jy = Jy + (-(pz - cz)) * self._e(b.idx_base_rot)
                Jz = Jz + (py - cy) * self._e(b.idx_base_rot)
            ay, az = _rot_apply(self.ct, self.st, float(b.axis[0]),
                                float(b.axis[1]))
            Jy = Jy + ay * self._e(b.idx_slide)
            Jz = Jz + az * self._e(b.idx_slide)
            return Jy, Jz
        raise NotImplementedError(type(b))


def _circle_circle(ca, ra, cb, rb):
    dy = cb[0] - ca[0]
    dz = cb[1] - ca[1]
    dist = jnp.sqrt(dy * dy + dz * dz + 1e-12)
    ny, nz = dy / dist, dz / dist
    phi = dist - ra - rb
    py = ca[0] + ny * (ra + 0.5 * phi)
    pz = ca[1] + nz * (ra + 0.5 * phi)
    return phi, (py, pz), (ny, nz)


def _capsule_circle(a0, a1, ra, cb, rb):
    aby = a1[0] - a0[0]
    abz = a1[1] - a0[1]
    den = aby * aby + abz * abz + 1e-12
    t = jnp.clip(((cb[0] - a0[0]) * aby + (cb[1] - a0[1]) * abz) / den,
                 0.0, 1.0)
    cp = (a0[0] + t * aby, a0[1] + t * abz)
    return _circle_circle(cp, ra, cb, rb)


def _circle_halfspace(c, r, normal, offset):
    ny, nz = float(normal[0]), float(normal[1])
    phi = ny * c[0] + nz * c[1] - offset - r
    p = (c[0] - ny * r, c[1] - nz * r)
    zero_c = c[0] * 0.0
    return phi, p, (zero_c + ny, zero_c + nz)


def _circle_box(c, r, bc, half, th):
    """Scalar-column form of geometry.circle_box (outside closest-point /
    inside nearest-face pushout, where-blended; argmin ties pick axis 0)."""
    hx, hy = half
    ct, st = jnp.cos(th), jnp.sin(th)
    ly, lz = _rot_apply_T(ct, st, c[0] - bc[0], c[1] - bc[1])
    cly = jnp.clip(ly, -hx, hx)
    clz = jnp.clip(lz, -hy, hy)
    dly, dlz = ly - cly, lz - clz
    dist = jnp.sqrt(dly * dly + dlz * dlz + 1e-12)
    inside = (jnp.abs(ly) < hx) & (jnp.abs(lz) < hy)
    n_out_y, n_out_z = dly / dist, dlz / dist
    fd0 = hx - jnp.abs(ly)
    fd1 = hy - jnp.abs(lz)
    axis0 = fd0 <= fd1
    s0 = jnp.sign(ly) + (ly == 0.0)
    s1 = jnp.sign(lz) + (lz == 0.0)
    n_in_y = jnp.where(axis0, s0, 0.0)
    n_in_z = jnp.where(axis0, 0.0, s1)
    phi = jnp.where(inside, -jnp.minimum(fd0, fd1) - r, dist - r)
    n_ly = jnp.where(inside, n_in_y, n_out_y)
    n_lz = jnp.where(inside, n_in_z, n_out_z)
    p_ly = jnp.where(inside, jnp.where(axis0, ly + s0 * fd0, ly), cly)
    p_lz = jnp.where(inside, jnp.where(axis0, lz, lz + s1 * fd1), clz)
    ny, nz = _rot_apply(ct, st, n_ly, n_lz)
    wy, wz = _rot_apply(ct, st, p_ly, p_lz)
    return phi, (bc[0] + wy, bc[1] + wz), (ny, nz)


def _box_corners(bc, half, th):
    """World corners in geometry.box_corners order: (+,+), (-,+), (-,-),
    (+,-)."""
    hx, hy = half
    ct, st = jnp.cos(th), jnp.sin(th)
    out = []
    for lx, lz in ((hx, hy), (-hx, hy), (-hx, -hy), (hx, -hy)):
        wy, wz = _rot_apply(ct, st, lx, lz)
        out.append((bc[0] + wy, bc[1] + wz))
    return out


def _point_halfspace(p, normal, offset):
    ny, nz = float(normal[0]), float(normal[1])
    phi = ny * p[0] + nz * p[1] - offset
    zero_c = p[0] * 0.0
    return phi, p, (zero_c + ny, zero_c + nz)


def _narrow_phase(sa, sb):
    """Contacts between two world shapes -> list of (phi, p, n), n pointing
    A -> B — the scalar-column mirror of geometry.shape_contact (same
    contact count, order, and sign conventions)."""
    ka, kb = sa[0], sb[0]

    def neg(n):
        return (-n[0], -n[1])

    if (ka, kb) == ("circle", "circle"):
        phi, p, n = _circle_circle(sa[1], sa[2], sb[1], sb[2])
        return [(phi, p, n)]
    if (ka, kb) == ("capsule", "circle"):
        phi, p, n = _capsule_circle(sa[1], sa[2], sa[3], sb[1], sb[2])
        return [(phi, p, n)]
    if (ka, kb) == ("circle", "capsule"):
        phi, p, n = _capsule_circle(sb[1], sb[2], sb[3], sa[1], sa[2])
        return [(phi, p, neg(n))]
    if (ka, kb) == ("halfspace", "circle"):
        phi, p, n = _circle_halfspace(sb[1], sb[2], sa[1], sa[2])
        return [(phi, p, n)]
    if (ka, kb) == ("circle", "halfspace"):
        phi, p, n = _circle_halfspace(sa[1], sa[2], sb[1], sb[2])
        return [(phi, p, neg(n))]
    if (ka, kb) == ("box", "circle"):
        phi, p, n = _circle_box(sb[1], sb[2], sa[1], sa[2], sa[3])
        return [(phi, p, n)]
    if (ka, kb) == ("circle", "box"):
        phi, p, n = _circle_box(sa[1], sa[2], sb[1], sb[2], sb[3])
        return [(phi, p, neg(n))]
    if (ka, kb) == ("capsule", "box"):
        out = []
        for end in (sa[1], sa[2]):
            phi, p, n = _circle_box(end, sa[3], sb[1], sb[2], sb[3])
            out.append((phi, p, neg(n)))
        return out
    if (ka, kb) == ("box", "capsule"):
        out = []
        for end in (sb[1], sb[2]):
            phi, p, n = _circle_box(end, sb[3], sa[1], sa[2], sa[3])
            out.append((phi, p, n))
        return out
    if (ka, kb) == ("halfspace", "box"):
        return [_point_halfspace(corner, sa[1], sa[2])
                for corner in _box_corners(sb[1], sb[2], sb[3])]
    if (ka, kb) == ("box", "halfspace"):
        out = []
        for corner in _box_corners(sa[1], sa[2], sa[3]):
            phi, p, n = _point_halfspace(corner, sb[1], sb[2])
            out.append((phi, p, neg(n)))
        return out
    raise NotImplementedError((ka, kb))


def _assemble(model, consts, x, u):
    """b (B, nq), C (B, mr, nq), d (B, mr) in the solver's C dq <= d form
    (Anitescu).  Pure jnp on traced values + ``consts`` — safe both inside
    Pallas kernels and in plain XLA (tests)."""
    b = consts["pq"] * x \
        - jnp.dot(u, consts["KUT"], preferred_element_type=jnp.float32,
                  precision=_HI) - consts["tau"]
    frames = [_BodyFrame(body, x, consts) for body in model.bodies]
    C_rows: List[Array] = []
    d_cols: List[Array] = []
    for pair in model.pairs:
        fa, fb = frames[pair.body_a], frames[pair.body_b]
        sa = fa.shape_world(pair.shape_a)
        sb = fb.shape_world(pair.shape_b)
        for phi, p, (ny, nz) in _narrow_phase(sa, sb):
            Jay, Jaz = fa.point_jacobian_rows(p, pair.shape_a)
            Jby, Jbz = fb.point_jacobian_rows(p, pair.shape_b)
            Jrel_y = Jby - Jay
            Jrel_z = Jbz - Jaz
            Jn = ny * Jrel_y + nz * Jrel_z
            # t = perp(n) = (-nz, ny)
            Jt = (-nz) * Jrel_y + ny * Jrel_z
            # Anitescu rows in solver form: C = -G, d = phi.
            C_rows.append(-(Jn + pair.mu * Jt))
            C_rows.append(-(Jn - pair.mu * Jt))
            d_cols.append(phi)
            d_cols.append(phi)
    C = jnp.stack(C_rows, axis=1)                    # (B, mr, nq)
    d = jnp.concatenate(d_cols, axis=1)              # (B, mr)
    return b, C, d


def make_consts(model):
    """The constant-matrix inputs the kernel/assembly needs, as jnp arrays
    (host side; they become VMEM input refs of the kernel)."""
    p_diag, pq_vec, KU, tau = _hessian_constants(model)
    # Cone-pair averaging matrix: lam @ pair replaces each contact's two
    # dual rows by their mean (QuasistaticModel.canon_duals), expressed as
    # a dot because Mosaic cannot reshape (B, mr) -> (B, mr/2, 2) in-kernel.
    mr = model.n_constraint_rows()
    pair = 0.5 * np.kron(np.eye(max(mr, 2) // 2, dtype=np.float32),
                         np.ones((2, 2), np.float32))
    return {
        "eye": jnp.eye(model.nq, dtype=jnp.float32),
        "pq": jnp.asarray(pq_vec[None, :]),
        "KUT": jnp.asarray(KU.T),
        "tau": jnp.asarray(tau[None, :]),
        "pdiag": jnp.asarray(p_diag[None, :]),
        "pair": jnp.asarray(pair),
    }


_CONST_KEYS = ("eye", "pq", "KUT", "tau", "pdiag", "pair")


def assemble_xla(model, x, u):
    """Host/XLA entry for tests: batched (b, C, d) assembly."""
    return _assemble(model, make_consts(model), x, u)


# ---------------------------------------------------------------------------
# Dense-batched warm PDIP (mirrors qp._pdip_solve(init=...) exactly)
# ---------------------------------------------------------------------------

def _gauss_batched(H, rhs, eye):
    """Solve H x = rhs for H (B, n, n), rhs (B, n) by Gauss-Jordan with
    batched elementwise row ops (no pivoting — same as ops/linalg).  ``eye``
    is the (n, n) identity value (one-hot source)."""
    B, n, _ = H.shape
    M = jnp.concatenate([H, rhs[:, :, None]], axis=2)    # (B, n, n+1)
    for k in range(n):
        piv = M[:, k:k + 1, k:k + 1]                     # (B, 1, 1)
        rowk = M[:, k:k + 1, :] / piv                    # (B, 1, n+1)
        f = M[:, :, k:k + 1]                             # (B, n, 1)
        # Eliminate into every row; the masked term restores row k itself
        # (a scatter-free way to write "rows != k").
        mask_k = eye[:, k:k + 1][None]                   # (1, n, 1)
        M = M - f * rowk + mask_k * rowk
    return M[:, :, n]


def _pdip_warm_dense(consts, b, C, d, dq0, lam0, iters, sigma=0.25):
    """Warm-started PDIP on B independent QPs with diagonal P — the dense-
    batched form of qp._pdip_solve's init branch (same delta shift, floors,
    caps, fraction-to-boundary, last-finite tracking)."""
    delta = 1e-2
    ok0 = jnp.all(jnp.isfinite(dq0), axis=1, keepdims=True)
    x = jnp.where(ok0, dq0, 0.0)
    Cx = jnp.sum(C * x[:, None, :], axis=2)
    slack = d - Cx
    shift = jnp.maximum(0.0, -jnp.min(slack, axis=1, keepdims=True)) + delta
    s = slack + shift
    lam = jnp.where(jnp.isfinite(lam0), lam0, 1.0)
    lam = jnp.clip(lam, delta, 1e6)
    return _pdip_loop_dense(consts, b, C, d, x, s, lam, iters, sigma)


def _pdip_loop_dense(consts, b, C, d, x, s, lam, iters, sigma):
    B, nq = b.shape
    mr = d.shape[1]
    mu_floor = 3e-7
    w_cap = 1e10
    eye = consts["eye"]
    Pd = consts["pdiag"]                                  # (1, nq)
    Pdmat = (eye * (Pd + 1e-8))[None]                     # (1, nq, nq)

    x_keep = x
    # Python unroll (not fori_loop): at the rollout kernel's B=8 lanes the
    # ~10-iteration unrolled body compiles fine and runs ~0.4 ms/iteration
    # faster than the in-kernel loop (measured 3.73 vs 4.24 ms full
    # contact iterations).
    for _ in range(int(iters)):
        mu = jnp.maximum(jnp.sum(s * lam, axis=1, keepdims=True) / mr,
                         mu_floor)
        Cx = jnp.sum(C * x[:, None, :], axis=2)           # (B, mr)
        r_d = Pd * x + b + jnp.sum(C * lam[:, :, None], axis=1)
        r_p = Cx + s - d
        r_c = lam * s - sigma * mu
        s_safe = jnp.maximum(s, 1e-7)
        w = jnp.minimum(lam / s_safe, w_cap)              # (B, mr)
        # H = P + sum_k w_k C_k C_k' as a static per-row accumulation of
        # 3D outers — the one-shot 4D (B, mr, nq, nq) product stalls
        # Mosaic at estimation-sweep batch sizes.
        H = jnp.broadcast_to(Pdmat, (B, nq, nq))
        for k in range(mr):
            Ck = C[:, k, :]
            H = H + (w[:, k:k + 1] * Ck)[:, :, None] * Ck[:, None, :]
        t_k = w * r_p - r_c / s_safe
        rhs = -(r_d + jnp.sum(C * t_k[:, :, None], axis=1))
        dx = _gauss_batched(H, rhs, eye)
        Cdx = jnp.sum(C * dx[:, None, :], axis=2)
        ds = -r_p - Cdx
        dlam = (-r_c - lam * ds) / s_safe

        ratio_s = jnp.where(ds < 0, -s / jnp.where(ds < 0, ds, -1.0),
                            jnp.inf)
        ratio_l = jnp.where(dlam < 0, -lam / jnp.where(dlam < 0, dlam, -1.0),
                            jnp.inf)
        amax = jnp.minimum(jnp.min(ratio_s, axis=1, keepdims=True),
                           jnp.min(ratio_l, axis=1, keepdims=True))
        alpha = jnp.minimum(1.0, 0.995 * amax)
        x_new = x + alpha * dx
        s = s + alpha * ds
        lam = lam + alpha * dlam
        ok = jnp.all(jnp.isfinite(x_new), axis=1, keepdims=True)
        x_keep = jnp.where(ok, x_new, x_keep)
        x = x_new

    # Sanitize non-finite duals to 0.0 — the same value qp._pdip_solve
    # carries forward on rescued solves, so the next knot's warm-start clip
    # floors both chains to the identical delta (= 1e-2) and kernel/scan
    # rollouts stay in lockstep through transiently non-finite solves.
    lam = jnp.where(jnp.isfinite(lam), lam, 0.0)
    return x_keep, lam


# ---------------------------------------------------------------------------
# The whole-chain kernel
# ---------------------------------------------------------------------------

def _rollout_kernel(model, T, nq, m, aug, has_rel, iters,
                    K_ref, zrx_ref, zrw_ref, ur_ref,
                    lb_ref, ub_ref, rlb_ref, rub_ref,
                    x0_ref, up0_ref,
                    eye_ref, pq_ref, kut_ref, tau_ref, pdiag_ref, pair_ref,
                    x_out, u_out,
                    x_scr, up_scr, dq_scr, lam_scr):
    f32 = jnp.float32
    consts = {"eye": eye_ref[:], "pq": pq_ref[:], "KUT": kut_ref[:],
              "tau": tau_ref[:], "pdiag": pdiag_ref[:]}
    x_scr[:] = x0_ref[:]
    up_scr[:] = up0_ref[:]
    dq_scr[:] = x0_ref[:] * 0.0
    lam_scr[:] = lam_scr[:] * 0.0 + 1.0
    x_out[0] = x0_ref[:]

    def knot(t, _):
        x = x_scr[:]                          # (B, nq)
        up = up_scr[:]                        # (B, m)
        Kt = K_ref[t]                         # (m, nz)
        # u = u_ref - K (z - z_ref); z split into (x | w) blocks.
        dz_x = x - zrx_ref[t]
        fb = jnp.dot(dz_x, jnp.transpose(Kt[:, :nq]),
                     preferred_element_type=f32, precision=_HI)
        if aug:
            dz_w = up - zrw_ref[t]
            fb = fb + jnp.dot(dz_w, jnp.transpose(Kt[:, nq:]),
                              preferred_element_type=f32, precision=_HI)
        u = ur_ref[t] - fb
        if has_rel:
            u = jnp.clip(u, up + rlb_ref[t], up + rub_ref[t])
        u = jnp.clip(u, lb_ref[t], ub_ref[t])

        b, C, d = _assemble(model, consts, x, u)
        dq, lam = _pdip_warm_dense(consts, b, C, d, dq_scr[:], lam_scr[:],
                                   iters)
        dq_scr[:] = dq
        if model.canon_warm_duals:
            # Same cone-pair dual canonicalization as step_ws (see
            # QuasistaticModel.canon_duals), as a dot with the constant
            # pair-averaging matrix (Mosaic cannot reshape to pairs).
            lam = jnp.dot(lam, pair_ref[:], preferred_element_type=f32,
                          precision=_HI)
        lam_scr[:] = lam
        xn = x + dq
        x_out[t + 1] = xn
        u_out[t] = u
        x_scr[:] = xn
        up_scr[:] = u
        return 0

    jax.lax.fori_loop(0, T, knot, 0)


def linesearch_rollout_pallas(model, x0, u_prev0, K, z_ref_x, z_ref_w,
                              u_ref, lb, ub, rel_lb, rel_ub,
                              interpret: bool = False):
    """Run the full line-searched contact rollout chain in one kernel.

    Shapes: x0 (nq,), u_prev0 (m,), K (T, m, nz), z_ref_x (A, T, nq),
    z_ref_w (A, T, m) or None, u_ref (A, T, m), lb/ub (T, m) and
    rel_lb/rel_ub (T, m) or None.  Returns xs (A, T+1, nq), us (A, T, m)
    matching the XLA scan path (modulo float reassociation).
    """
    A_ls, T, m = u_ref.shape
    nq = model.nq
    mr = model.n_constraint_rows()
    aug = z_ref_w is not None
    has_rel = rel_lb is not None
    f32 = jnp.float32
    iters = int(model.qp_iters_ws)

    def pad_lanes(a):
        """(A, T, k) -> (T, B, k): alpha axis onto sublanes, pad with lane 0
        (computes a duplicate of alpha 0 — finite, discarded)."""
        pad = jnp.broadcast_to(a[0:1], (_B - A_ls,) + a.shape[1:])
        return jnp.swapaxes(jnp.concatenate([a, pad], axis=0), 0, 1)

    big = 1e9

    def bound_rows(bv, side):
        """Finite-ize a bound row.  inf -> +-big; a NaN bound (user error)
        becomes the side's no-op value (+-big) — i.e. "unconstrained" —
        rather than nan_to_num's silent active 0.0 clip.  (The XLA scan
        path instead propagates the NaN into the lane's cost, which the
        totals-isnan guard rejects; either way no trajectory is silently
        clamped to 0.)"""
        bv = jnp.asarray(bv, f32)
        bv = jnp.where(jnp.isnan(bv), side * big, bv)
        bv = jnp.clip(bv, -big, big)
        return jnp.broadcast_to(bv[:, None, :], (T, _B, m))

    consts = make_consts(model)
    inputs = [
        K.astype(f32),
        pad_lanes(z_ref_x.astype(f32)),
        (pad_lanes(z_ref_w.astype(f32)) if aug
         else jnp.zeros((T, _B, m), f32)),
        pad_lanes(u_ref.astype(f32)),
        bound_rows(lb, -1.0), bound_rows(ub, +1.0),
        (bound_rows(rel_lb, -1.0) if has_rel
         else jnp.zeros((T, _B, m), f32)),
        (bound_rows(rel_ub, +1.0) if has_rel
         else jnp.zeros((T, _B, m), f32)),
        jnp.broadcast_to(x0.astype(f32), (_B, nq)),
        jnp.broadcast_to(u_prev0.astype(f32), (_B, m)),
    ] + [consts[k] for k in _CONST_KEYS]
    kernel = functools.partial(
        _rollout_kernel, model, T, nq, m, aug, has_rel, iters)
    x_t, u_t = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((T + 1, _B, nq), f32),
                   jax.ShapeDtypeStruct((T, _B, m), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(2)),
        scratch_shapes=[
            pltpu.VMEM((_B, nq), f32),     # x carry
            pltpu.VMEM((_B, m), f32),      # u_prev carry
            pltpu.VMEM((_B, nq), f32),     # warm dq carry
            pltpu.VMEM((_B, mr), f32),     # warm lam carry
        ],
        interpret=interpret,
    )(*inputs)
    xs = jnp.swapaxes(x_t, 0, 1)[:A_ls]
    us = jnp.swapaxes(u_t, 0, 1)[:A_ls]
    return xs, us
