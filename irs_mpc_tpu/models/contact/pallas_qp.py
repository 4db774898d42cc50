"""Pallas TPU kernel: batched small-QP primal-dual interior point.

The Monte-Carlo estimation sweep solves thousands of independent tiny QPs
(one contact step per sample x knot).  The vmapped XLA path lays the batch
out batch-major, wasting most of each VPU tile on the tiny (n, n) matrix
dims.  This kernel transposes to batch-LAST layout: every scalar of the
small problem becomes an (8, 128)-shaped register holding 1024 QPs, every
arithmetic op is a full VPU tile, and the entire PDIP iteration runs in
VMEM with zero HBM round-trips.

Forward-only (no JVP): the sample rollouts that dominate estimation never
need gradients — the differentiable path (exact Jacobians, single steps)
stays on models/contact/qp.solve_qp.

Same algorithm and safety floors as qp._pdip_solve (validated against it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_SUB = 8
_BLOCK = _LANE * _SUB        # QPs per kernel instance


def _kernel(n: int, m: int, iters: int, sigma: float, warm: bool,
            want_lam: bool, *refs):
    """One block of 1024 QPs; every list entry is an (8, 128) tile.

    Ref layout: (P, q, C, d[, x0, lam0]) inputs, then (x_out[, lam_out]).
    ``warm`` starts the PDIP from a caller-supplied (x0, lam0) — the
    dense-lane mirror of ``qp._pdip_solve(init=...)`` (same delta shift,
    floor, cap); ``want_lam`` additionally writes the final duals (for
    warm-starting downstream solves from this one).
    """
    P_ref, q_ref, C_ref, d_ref = refs[:4]
    idx = 4
    if warm:
        x0_ref, lam0_ref = refs[idx:idx + 2]
        idx += 2
    x_out_ref = refs[idx]
    lam_out_ref = refs[idx + 1] if want_lam else None
    # Block shapes carry a singleton grid axis: P_ref is (n, n, 1, 8, 128).
    P = [[P_ref[i, j, 0] for j in range(n)] for i in range(n)]
    qv = [q_ref[i, 0] for i in range(n)]
    C = [[C_ref[k, j, 0] for j in range(n)] for k in range(m)]
    d = [d_ref[k, 0] for k in range(m)]

    def gauss(H, rhs):
        """Solve H x = rhs (lists of (8,128) tiles), H (s x s), rhs (s,)."""
        s = len(rhs)
        M = [H[i][:] + [rhs[i]] for i in range(s)]
        for kk in range(s):
            inv = 1.0 / M[kk][kk]
            rowk = [M[kk][j] * inv for j in range(s + 1)]
            for i2 in range(s):
                if i2 == kk:
                    continue
                f = M[i2][kk]
                M[i2] = [M[i2][j] - f * rowk[j] for j in range(s + 1)]
            M[kk] = rowk
        return [M[i][s] for i in range(s)]

    # --- initialization (mirrors qp._pdip_solve, incl. the init branch) --
    if warm:
        x = [x0_ref[i, 0] for i in range(n)]
        ok = jnp.isfinite(x[0])
        for i in range(1, n):
            ok = ok & jnp.isfinite(x[i])
        x = [jnp.where(ok, x[i], 0.0) for i in range(n)]
        delta = 1e-2
    else:
        Preg = [[P[i][j] + (1e-8 if i == j else 0.0) for j in range(n)]
                for i in range(n)]
        x = gauss(Preg, [-qv[i] for i in range(n)])
        delta = 1.0
    slack = []
    for k in range(m):
        acc = d[k]
        for j in range(n):
            acc = acc - C[k][j] * x[j]
        slack.append(acc)
    min_slack = slack[0]
    for k in range(1, m):
        min_slack = jnp.minimum(min_slack, slack[k])
    shift = jnp.maximum(0.0, -min_slack) + delta
    s_list = [slack[k] + shift for k in range(m)]
    if warm:
        lam_list = [jnp.clip(jnp.where(jnp.isfinite(lam0_ref[k, 0]),
                                       lam0_ref[k, 0], 1.0), delta, 1e6)
                    for k in range(m)]
    else:
        lam_list = [jnp.zeros_like(d[0]) + 1.0 for _ in range(m)]

    x_arr = jnp.stack(x)                     # (n, 8, 128)
    s_arr = jnp.stack(s_list)                # (m, 8, 128)
    lam_arr = jnp.stack(lam_list)

    mu_floor = 3e-7
    w_cap = 1e10    # must match qp._pdip_solve (see accuracy note there)

    def body(_, carry):
        x_arr, s_arr, lam_arr, x_keep = carry
        x = [x_arr[i] for i in range(n)]
        s = [s_arr[k] for k in range(m)]
        lam = [lam_arr[k] for k in range(m)]

        mu = s[0] * lam[0]
        for k in range(1, m):
            mu = mu + s[k] * lam[k]
        mu = jnp.maximum(mu / m, mu_floor)

        s_safe = [jnp.maximum(s[k], 1e-7) for k in range(m)]
        w = [jnp.minimum(lam[k] / s_safe[k], w_cap) for k in range(m)]

        # Residuals.
        Cx = []
        for k in range(m):
            acc = C[k][0] * x[0]
            for j in range(1, n):
                acc = acc + C[k][j] * x[j]
            Cx.append(acc)
        r_p = [Cx[k] + s[k] - d[k] for k in range(m)]
        r_c = [lam[k] * s[k] - sigma * mu for k in range(m)]

        r_d = []
        for i in range(n):
            acc = qv[i]
            for j in range(n):
                acc = acc + P[i][j] * x[j]
            for k in range(m):
                acc = acc + C[k][i] * lam[k]
            r_d.append(acc)

        # H = P + C' diag(w) C + 1e-8 I ; rhs = -(r_d + C'(w r_p - r_c/s)).
        t_k = [w[k] * r_p[k] - r_c[k] / s_safe[k] for k in range(m)]
        H = [[None] * n for _ in range(n)]
        rhs = []
        for i in range(n):
            acc_r = r_d[i]
            for k in range(m):
                acc_r = acc_r + C[k][i] * t_k[k]
            rhs.append(-acc_r)
            for j in range(i, n):
                acc = P[i][j] + (1e-8 if i == j else 0.0)
                for k in range(m):
                    acc = acc + C[k][i] * w[k] * C[k][j]
                H[i][j] = acc
                H[j][i] = acc
        dx = gauss(H, rhs)

        Cdx = []
        for k in range(m):
            acc = C[k][0] * dx[0]
            for j in range(1, n):
                acc = acc + C[k][j] * dx[j]
            Cdx.append(acc)
        ds = [-r_p[k] - Cdx[k] for k in range(m)]
        dlam = [(-r_c[k] - lam[k] * ds[k]) / s_safe[k] for k in range(m)]

        # Fraction-to-boundary step (elementwise over the batch tile).
        alpha = jnp.zeros_like(mu) + 1.0
        for k in range(m):
            ratio_s = jnp.where(ds[k] < 0,
                                -s[k] / jnp.where(ds[k] < 0, ds[k], -1.0),
                                jnp.inf)
            ratio_l = jnp.where(dlam[k] < 0,
                                -lam[k] / jnp.where(dlam[k] < 0, dlam[k],
                                                    -1.0),
                                jnp.inf)
            alpha = jnp.minimum(alpha, 0.995 * jnp.minimum(ratio_s, ratio_l))

        x_new = jnp.stack([x[i] + alpha * dx[i] for i in range(n)])
        s_new = jnp.stack([s[k] + alpha * ds[k] for k in range(m)])
        lam_new = jnp.stack([lam[k] + alpha * dlam[k] for k in range(m)])

        # Per-lane last-finite-iterate tracking (mirrors qp._pdip_solve):
        # the iteration runs unguarded — transient infs usually recover —
        # but a lane whose iterate ends non-finite returns its last finite
        # (partially converged) point instead of NaN.
        ok = jnp.isfinite(x_new[0])
        for i in range(1, n):
            ok = ok & jnp.isfinite(x_new[i])
        x_keep = jnp.where(ok[None], x_new, x_keep)
        return x_new, s_new, lam_new, x_keep

    x_arr, s_arr, lam_arr, x_keep = jax.lax.fori_loop(
        0, iters, body, (x_arr, s_arr, lam_arr, x_arr))
    for i in range(n):
        x_out_ref[i, 0] = x_keep[i]
    if want_lam:
        # Same rescue sanitize as qp._pdip_solve: non-finite duals -> 0.0
        # (a downstream warm start clips them to its delta floor).
        for k in range(m):
            lam_k = lam_arr[k]
            lam_out_ref[k, 0] = jnp.where(jnp.isfinite(lam_k), lam_k, 0.0)


def solve_qp_batched(P: Array, q: Array, C: Array, d: Array,
                     iters: int = 30, sigma: float = 0.25,
                     init=None, want_lam: bool = False,
                     interpret: bool = False):
    """Solve B independent QPs min 1/2 x'Px + q'x s.t. Cx <= d.

    P (B,n,n), q (B,n), C (B,m,n), d (B,m) -> x (B,n).  Batch is padded to
    a multiple of 1024 internally.

    ``init=(x0 (B,n), lam0 (B,m))`` warm-starts every lane (the batched
    mirror of ``qp._pdip_solve(init=...)``); ``want_lam=True`` returns
    ``(x, lam)`` with the final duals (sanitized like the XLA path) so a
    dependent batch — e.g. Monte-Carlo samples around a solved nominal —
    can itself be warm-started.
    """
    B, n = q.shape
    m = d.shape[1]
    nb = -(-B // _BLOCK)
    Bp = nb * _BLOCK

    # Pad the batch remainder with trivially solvable problems (P=I, d=1).
    eyeB = jnp.broadcast_to(jnp.eye(n, dtype=P.dtype), (Bp - B, n, n))
    P_p = jnp.concatenate([P, eyeB], axis=0)
    q_p = jnp.concatenate([q, jnp.zeros((Bp - B, n), q.dtype)], axis=0)
    C_p = jnp.concatenate([C, jnp.zeros((Bp - B, m, n), C.dtype)], axis=0)
    d_p = jnp.concatenate([d, jnp.ones((Bp - B, m), d.dtype)], axis=0)

    def tl(a, *dims):
        perm = tuple(range(1, a.ndim)) + (0,)
        ap = jnp.transpose(a, perm)
        return ap.reshape(dims + (nb, _SUB, _LANE))

    warm = init is not None
    inputs = [tl(P_p, n, n), tl(q_p, n), tl(C_p, m, n), tl(d_p, m)]
    vec_spec = lambda k: pl.BlockSpec((k, 1, _SUB, _LANE),
                                      lambda i: (0, i, 0, 0),
                                      memory_space=pltpu.VMEM)
    mat_spec = lambda k, l: pl.BlockSpec((k, l, 1, _SUB, _LANE),
                                         lambda i: (0, 0, i, 0, 0),
                                         memory_space=pltpu.VMEM)
    in_specs = [mat_spec(n, n), vec_spec(n), mat_spec(m, n), vec_spec(m)]
    if warm:
        x0, lam0 = init
        x0_p = jnp.concatenate(
            [x0.astype(P.dtype), jnp.zeros((Bp - B, n), P.dtype)], axis=0)
        lam0_p = jnp.concatenate(
            [lam0.astype(P.dtype), jnp.ones((Bp - B, m), P.dtype)], axis=0)
        inputs += [tl(x0_p, n), tl(lam0_p, m)]
        in_specs += [vec_spec(n), vec_spec(m)]

    out_specs = [vec_spec(n)]
    out_shape = [jax.ShapeDtypeStruct((n, nb, _SUB, _LANE), jnp.float32)]
    if want_lam:
        out_specs.append(vec_spec(m))
        out_shape.append(jax.ShapeDtypeStruct((m, nb, _SUB, _LANE),
                                              jnp.float32))

    kernel = functools.partial(_kernel, n, m, iters, sigma, warm, want_lam)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(tuple(out_specs) if want_lam else out_specs[0]),
        out_shape=(tuple(out_shape) if want_lam else out_shape[0]),
        interpret=interpret,
    )(*inputs)

    def untile(a_t, k):
        # (k, nb, 8, 128) -> (B, k)
        return a_t.reshape(k, Bp).T[:B]

    if want_lam:
        return untile(out[0], n), untile(out[1], m)
    return untile(out, n)
