"""Pallas TPU kernel: the full Riccati backward pass in one VMEM-resident
kernel.

The sequential Riccati recursion is latency-bound: T tiny matrix ops that,
under plain XLA ``lax.scan``, each round-trip the carry through HBM and
schedule as separate fused ops.  The whole working set (T stage matrices at
n <= ~32) is a few hundred KB — far below the ~16 MB of VMEM — so this
kernel loads everything once, runs the T-step recursion entirely on-chip
(fori_loop, unrolled Gauss-Jordan solves), and writes only the gains back.

Used by ``riccati_backward(prob, backend="pallas")`` and the ADMM inner
loop; validated against the lax.scan implementation (tests/test_pallas.py).
Transposed copies of A/B/N are precomputed by the host wrapper so the
kernel needs no in-kernel transposes (Mosaic-friendlier).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lqr as lqr_ops

Array = jax.Array


def _gauss_solve_rows(H, RHS, m):
    """Solve H X = RHS with H (m, m), RHS (m, k); unrolled, no pivoting.

    Row updates use a static mask instead of scatter (.at[].set lowers to
    scatter, which Mosaic does not implement)."""
    M = jnp.concatenate([H, RHS], axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, M.shape, 0)
    for kk in range(m):
        piv = M[kk, kk]
        row_k = M[kk:kk + 1, :] / piv           # (1, m+k)
        factors = M[:, kk:kk + 1]
        eliminated = M - factors * row_k
        M = jnp.where(rows == kk, row_k, eliminated)
    return M[:, m:]


def _riccati_kernel(T: int, n: int, m: int,
                    A_ref, At_ref, B_ref, Bt_ref, c_ref,
                    Q_ref, R_ref, N_ref, Nt_ref, q_ref, r_ref,
                    Qf_ref, qf_ref,
                    K_ref, k_ref,
                    P_scr, p_scr):
    P_scr[:] = Qf_ref[:]
    p_scr[:] = qf_ref[:]

    def body(i, _):
        t = T - 1 - i
        A = A_ref[t]
        At = At_ref[t]
        B = B_ref[t]
        Bt = Bt_ref[t]
        c = c_ref[t]            # (n, 1)
        Q = Q_ref[t]
        R = R_ref[t]
        Nt = Nt_ref[t]          # (m, n)
        q = q_ref[t]            # (n, 1)
        r = r_ref[t]            # (m, 1)
        P = P_scr[:]
        p = p_scr[:]            # (n, 1)

        PB = jnp.dot(P, B, preferred_element_type=jnp.float32)
        H = R + jnp.dot(Bt, PB, preferred_element_type=jnp.float32)
        PA = jnp.dot(P, A, preferred_element_type=jnp.float32)
        G = Nt + jnp.dot(Bt, PA, preferred_element_type=jnp.float32)
        Pc_p = jnp.dot(P, c, preferred_element_type=jnp.float32) + p
        g = r + jnp.dot(Bt, Pc_p, preferred_element_type=jnp.float32)

        X = _gauss_solve_rows(H, jnp.concatenate([G, g], axis=1), m)
        K = X[:, :n]
        kvec = X[:, n:]

        K_ref[t] = K
        k_ref[t] = kvec

        AtPA = jnp.dot(At, PA, preferred_element_type=jnp.float32)
        P_new = Q + AtPA - jnp.dot(
            jnp.transpose(G), K, preferred_element_type=jnp.float32)
        P_new = 0.5 * (P_new + jnp.transpose(P_new))
        p_new = q + jnp.dot(At, Pc_p, preferred_element_type=jnp.float32) \
            - jnp.dot(jnp.transpose(G), kvec,
                      preferred_element_type=jnp.float32)
        P_scr[:] = P_new
        p_scr[:] = p_new
        return 0

    jax.lax.fori_loop(0, T, body, 0)


@functools.partial(jax.jit, static_argnames=())
def riccati_backward_pallas(prob: lqr_ops.LqrProblem) -> lqr_ops.LqrGains:
    """Pallas whole-recursion Riccati backward pass.

    Returns gains with value-function arrays omitted (P/p are internal to
    the kernel; use the scan backend when you need them)."""
    T, n, m = prob.B.shape
    f32 = jnp.float32

    inputs = (
        prob.A,
        jnp.swapaxes(prob.A, 1, 2),
        prob.B,
        jnp.swapaxes(prob.B, 1, 2),
        prob.c[..., None],
        prob.Q,
        prob.R,
        prob.N,
        jnp.swapaxes(prob.N, 1, 2),
        prob.q[..., None],
        prob.r[..., None],
        prob.Qf,
        prob.qf[..., None],
    )
    kernel = functools.partial(_riccati_kernel, T, n, m)
    K, k = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, m, n), f32),
            jax.ShapeDtypeStruct((T, m, 1), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((n, n), f32),
            pltpu.VMEM((n, 1), f32),
        ],
    )(*[x.astype(f32) for x in inputs])
    empty_P = jnp.zeros((T + 1, n, n), f32)
    empty_p = jnp.zeros((T + 1, n), f32)
    return lqr_ops.LqrGains(K=K, k=k[..., 0], P=empty_P, p=empty_p)
