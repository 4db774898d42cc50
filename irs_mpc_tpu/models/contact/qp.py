"""Differentiable dense convex QP layer (on-device, batched).

The workhorse of the contact engine: the quasistatic (and second-order)
contact step is one small convex QP per timestep.  The reference delegates
this to an external C++ project (``QuasistaticSimulatorCpp.step`` with
``requires_grad`` / ``grad_from_active_constraints``,
``/root/reference/irs_lqr/quasistatic_dynamics.py:146-188``); here it is a
primal-dual interior-point solve with a FIXED iteration count (jit/vmap-safe,
no data-dependent control flow) plus an implicit-function custom JVP — the
standard differentiable-QP sensitivity, which converges to the reference's
active-constraint gradient as the duality gap -> 0.

Problem:    min_x  1/2 x'Px + q'x   s.t.  C x <= d
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.linalg import solve_spd

Array = jax.Array

# Shared active-set scaling cap: the forward PDIP solve and the implicit JVP
# must agree on how stiff an "active" constraint can get, or the JVP's KKT
# matrix develops digits the forward solve never produced (f32 conditioning
# hazard on stiff systems).
W_CAP = 1e10


def _pdip_solve(P, q, C, d, iters: int, sigma: float = 0.25, init=None):
    """Primal-dual interior point with fixed iteration count.

    Returns (x, s, lam).  All inputs full-rank small dense; batched via vmap.

    ``init`` optionally warm-starts the solve from a previous solution
    ``(x_prev, lam_prev)`` — e.g. the neighbouring knot of a trajectory
    rollout, where the QP data changes slowly.  The primal starts at x_prev,
    slacks are re-derived from the new constraints (floored to stay strictly
    interior), and the duals keep the previous active-set memory (floored/
    capped).  This typically converges in ~1/3 the cold-start iterations —
    the serial contact-rollout phase is the framework's latency wall
    (reference hot loop: quasistatic_dynamics.py:242-266).
    """
    n = q.shape[0]
    m = d.shape[0]
    In = jnp.eye(n, dtype=P.dtype)

    if init is None:
        # Start strictly feasible in (s, lam); x from the regularized
        # unconstrained minimum.
        x0 = solve_spd(P + 1e-8 * In, -q)
        slack0 = d - C @ x0
        shift = jnp.maximum(0.0, -jnp.min(slack0)) + 1.0
        s0 = slack0 + shift
        # Derived from every input (not a fresh constant) so that under
        # shard_map the scan carry's varying-axis annotation matches the loop
        # body's output (the body mixes in axes from all of P, q, C, d).
        zero_all = (jnp.sum(P) + jnp.sum(q) + jnp.sum(C) + jnp.sum(d)) * 0.0
        lam0 = d * 0.0 + zero_all + 1.0
    else:
        x_prev, lam_prev = init
        delta = 1e-2
        x0 = jnp.where(jnp.all(jnp.isfinite(x_prev)), x_prev,
                       jnp.zeros_like(x_prev))
        slack0 = d - C @ x0
        # Same uniform feasibility shift as the cold start, but delta-sized:
        # a *per-row* floor (s = max(slack, delta)) leaves violated rows with
        # huge primal residual at tiny s, and the fraction-to-boundary rule
        # then collapses the step size (observed: box-pivoting contact onset
        # stalls at 5e-2 error regardless of iteration count).  The shift
        # keeps r_p uniform across rows — the geometry the solver's centering
        # handles well — while staying ~delta when x_prev is near-feasible.
        shift = jnp.maximum(0.0, -jnp.min(slack0)) + delta
        s0 = slack0 + shift
        # Keep the previous duals' active-set memory, floored to stay
        # strictly interior and capped so an inherited spike cannot poison
        # the first Newton system.
        lam_prev = jnp.where(jnp.isfinite(lam_prev), lam_prev, 1.0)
        lam0 = jnp.clip(lam_prev, delta, 1e6)

    # f32 safety: floor the barrier target and cap the scaling lam/s so H
    # stays solvable when the duality gap reaches float32 resolution
    # (otherwise extra iterations past convergence produce NaNs).
    # w_cap sets the achievable constraint enforcement: active slacks settle
    # at ~lam/w_cap, so a low cap leaks penetration on stiff systems
    # (Kp=5e4 box-pivoting needed dq accuracy 5e-2 -> 3e-6 when the cap was
    # raised 1e6 -> 1e10; H entries ~1e10 stay far below f32 overflow, and a
    # 360-state x 120-iteration sweep across all contact systems stays
    # finite).
    mu_floor = 3e-7
    w_cap = W_CAP

    def body(carry, _):
        x, s, lam, x_keep = carry
        mu = jnp.maximum(jnp.dot(s, lam) / m, mu_floor)
        r_d = P @ x + q + C.T @ lam
        r_p = C @ x + s - d
        r_c = lam * s - sigma * mu

        s_safe = jnp.maximum(s, 1e-7)
        w = jnp.minimum(lam / s_safe, w_cap)          # (m,)
        H = P + (C.T * w) @ C
        rhs = -(r_d + C.T @ (w * r_p - r_c / s_safe))
        dx = solve_spd(H + 1e-8 * In, rhs)
        ds = -r_p - C @ dx
        dlam = (-r_c - lam * ds) / s_safe

        # Fraction-to-boundary step.
        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0),
                              jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio))

        alpha = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        x_new = x + alpha * dx
        # Robustness: the unpivoted f32 elimination can fail (H entries near
        # ~W_CAP, a tiny pivot blows up) on ~1% of hard contact QPs.  The
        # iteration runs unguarded — transient infs usually recover — but we
        # track the last finite iterate so a problem that ENDS non-finite
        # returns its best partially-converged point instead of NaN.
        x_keep = jnp.where(jnp.all(jnp.isfinite(x_new)), x_new, x_keep)
        return (x_new, s + alpha * ds, lam + alpha * dlam, x_keep), None

    (_, s, lam, x_keep), _ = jax.lax.scan(body, (x0, s0, lam0, x0), None,
                                          length=int(iters))
    # Duals can be non-finite on rescued problems; sanitize for the JVP.
    s = jnp.where(jnp.isfinite(s), s, 1e-7)
    lam = jnp.where(jnp.isfinite(lam), lam, 0.0)
    return x_keep, s, lam


@partial(jax.custom_jvp, nondiff_argnums=(4,))
def solve_qp(P: Array, q: Array, C: Array, d: Array,
             iters: int = 30) -> Array:
    """Differentiable argmin of the inequality-constrained QP."""
    x, _, _ = _pdip_solve(P, q, C, d, iters)
    return x


@solve_qp.defjvp
def _solve_qp_jvp(iters, primals, tangents):
    P, q, C, d = primals
    dP, dq, dC, dd = tangents
    x, s, lam = _pdip_solve(P, q, C, d, iters)

    # Implicit differentiation of the (relaxed) KKT system with the duals'
    # sensitivity D = lam/s — the soft active set.  As the solve tightens,
    # D grows on active rows and -> 0 on inactive ones, recovering the
    # reference's grad_from_active_constraints semantics.  D is capped at the
    # same W_CAP as the forward solve: active slacks settle near lam/W_CAP,
    # so an uncapped D would reach ~W_CAP^2/lam and swamp P's digits in f32.
    eps = 1e-8
    D = jnp.minimum(lam / jnp.maximum(s, eps), W_CAP)
    n = q.shape[0]
    H = P + (C.T * D) @ C + 1e-10 * jnp.eye(n, dtype=P.dtype)
    rhs = -(dP @ x + dq + dC.T @ lam) + C.T @ (D * (dd - dC @ x))
    dx = solve_spd(H, rhs)
    return x, dx


def solve_qp_with_duals(P, q, C, d, iters: int = 30):
    """Non-differentiable variant returning (x, s, lam) for diagnostics."""
    return _pdip_solve(P, q, C, d, iters)


def solve_qp_warm(P, q, C, d, ws, iters: int = 10):
    """Warm-started solve for serial rollout chains (non-differentiable).

    ``ws = (x_prev, lam_prev)`` from the previous knot's solve.  Returns
    ``(x, (x, lam))`` — the solution plus the carry for the next knot.
    The duals are sanitized before being handed forward so one rescued
    (transiently non-finite) solve cannot poison the rest of the chain.
    """
    x, s, lam = _pdip_solve(P, q, C, d, iters, init=ws)
    lam = jnp.where(jnp.isfinite(lam), lam, 1.0)
    return x, (x, lam)
