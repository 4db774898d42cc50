"""Dynamical-system abstraction for the TPU-native iRS-MPC framework.

The reference (``/root/reference/irs_lqr/dynamical_system.py:12-66``) defines a
virtual class with four methods (``dynamics``, ``dynamics_batch``,
``jacobian_xu``, ``jacobian_xu_batch``) that every backend re-implements by
hand (numpy loops, Drake symbolic Jacobians, torch, C++ sims).

Here a system is a single pure JAX step function; batching and Jacobians are
*derived* via ``jax.vmap`` / ``jax.jacfwd``, so every system is automatically
batched, differentiable, shardable, and jittable.  This collapses the
reference's L1 layer plus its per-system symbolic/AutoDiff machinery
(e.g. ``examples/pendulum/pendulum_dynamics.py:20-26,110-117``) into ~50 lines.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
StepFn = Callable[[Array, Array], Array]
# Sample-projection operator: (x, dx, u, du) -> (x_proj, u_proj), used by
# systems with hard state constraints (reference:
# examples/three_cart/three_cart_dynamics.py:196-264).
ProjectionFn = Callable[[Array, Array, Array, Array], tuple[Array, Array]]


@dataclasses.dataclass(frozen=True)
class System:
    """A discrete-time dynamical system ``x_{t+1} = step(x_t, u_t)``.

    Mirrors the capability surface of the reference ``DynamicalSystem``
    (``irs_lqr/dynamical_system.py``): timestep ``h``, dims, dynamics, batched
    dynamics and fat Jacobian ``[df/dx | df/du]`` — but all derived from the
    single pure ``step``.
    """

    name: str
    dim_x: int
    dim_u: int
    h: float
    step: StepFn
    # Optional projection of samples onto a constraint manifold.
    projection: Optional[ProjectionFn] = None
    # Optional hand-optimized batched step (e.g. a Pallas kernel); falls
    # back to vmap(step).  Must be numerically equivalent to vmap(step).
    step_batch_fn: Optional[Callable[[Array, Array], Array]] = None
    # Optional warm-started step for serial rollout chains:
    # (x, u, carry) -> (x_next, carry).  A system whose step is itself an
    # iterative solve (contact QPs) can warm-start each knot from the
    # previous knot's solution — trajectories change slowly, so a warm
    # solve converges in ~1/3 the cold iterations.  Must agree with
    # ``step`` to solver tolerance.  ``ws_init_fn()`` builds the initial
    # carry (static shapes).  The warm path is NOT differentiable; it is
    # used for rollouts only — Jacobians always go through ``step``.
    step_ws_fn: Optional[Callable[[Array, Array, object],
                                  tuple[Array, object]]] = None
    ws_init_fn: Optional[Callable[[], object]] = None
    # Optional fused Monte-Carlo estimation sweep for solver-backed systems
    # (ops/estimators.py uses it for the zero-order modes):
    #   est_sweep_fn(x_nom (T,n), u_nom (T,m), dx (T,S,n)|None, du (T,S,m))
    #     -> (f_nom (T,n), fd (T,S,n))
    # computing the nominal steps at FULL solver accuracy plus the perturbed
    # sample steps in one batched pass.  ``dx=None`` declares that samples
    # share the nominal state (zero_order_B), letting a contact system
    # assemble constraints once per knot instead of once per sample.
    # f_nom must be at least as accurate as vmap(step) so callers may reuse
    # it for the affine drift c and decouple_AB's re-derivation.
    est_sweep_fn: Optional[Callable] = None
    # Optional whole-chain line-searched feedback rollout (a Pallas kernel
    # running every line-search lane x every knot x geometry + warm QP in
    # one VMEM program, models/contact/pallas_rollout.py).  Signature:
    # (x0, u_prev0, K, z_ref_x, z_ref_w|None, u_ref, lb, ub,
    #  rel_lb|None, rel_ub|None) -> (xs (A,T+1,n), us (A,T,m)).
    # Must match the solver's XLA scan rollout; the solver uses it only on
    # the Pallas backend.
    ls_rollout_fn: Optional[Callable] = None

    # ---- derived operators (all jit/vmap/shard compatible) -------------

    def step_batch(self, x: Array, u: Array) -> Array:
        """Batched dynamics: (B,n),(B,m) -> (B,n)."""
        if self.step_batch_fn is not None:
            return self.step_batch_fn(x, u)
        return jax.vmap(self.step)(x, u)

    def jacobian_xu(self, x: Array, u: Array) -> Array:
        """Fat Jacobian ``[df/dx | df/du]`` of shape (n, n+m)."""
        jx, ju = jax.jacfwd(self.step, argnums=(0, 1))(x, u)
        return jnp.concatenate([jx, ju], axis=1)

    def jacobian_xu_batch(self, x: Array, u: Array) -> Array:
        """Batched fat Jacobian: (B,n),(B,m) -> (B,n,n+m)."""
        return jax.vmap(self.jacobian_xu)(x, u)

    def rollout(self, x0: Array, u_trj: Array) -> Array:
        """Open-loop rollout; returns the (T+1, n) state trajectory.

        Replaces the reference's python rollout loop
        (``irs_lqr/irs_lqr.py:105-119``) with a ``lax.scan``.  Uses the
        warm-started step chain when the system provides one (the serial
        rollout is the latency wall for contact systems).
        """
        if self.step_ws_fn is not None:
            def body_ws(carry, u):
                x, ws = carry
                x_next, ws = self.step_ws_fn(x, u, ws)
                return (x_next, ws), x_next

            _, xs = jax.lax.scan(body_ws, (x0, self.ws_init_fn()), u_trj)
            return jnp.concatenate([x0[None], xs], axis=0)

        def body(x, u):
            x_next = self.step(x, u)
            return x_next, x_next

        _, xs = jax.lax.scan(body, x0, u_trj)
        return jnp.concatenate([x0[None], xs], axis=0)

    def rollout_batch(self, x0: Array, u_trj_b: Array) -> Array:
        """Population rollout: (n,), (B, T, m) -> (B, T+1, n).

        Routes through ``step_batch`` — the lane-batched Pallas kernel
        when the system carries one — so population workloads (CEM's 16k
        candidates) ride the batch-saturated kernel instead of a vmapped
        scalar chain.  Falls back to ``vmap(rollout)`` (per-candidate
        warm chains) when no hand-optimized batch step exists, so CPU
        behavior is unchanged.

        The population axis is padded to a multiple of 8 (repeated last
        row, sliced off after) — XLA:TPU runs fixed-iteration solver scans
        ~20x slower when the flat batch is not sublane-aligned (see
        ops/estimators.py module note); per-row results are unchanged."""
        B = u_trj_b.shape[0]
        pad = (-B) % 8
        if pad:
            u_trj_b = jnp.concatenate(
                [u_trj_b, jnp.broadcast_to(u_trj_b[-1:],
                                           (pad,) + u_trj_b.shape[1:])],
                axis=0)
        if self.step_batch_fn is None:
            out = jax.vmap(lambda u: self.rollout(x0, u))(u_trj_b)
            return out[:B] if pad else out
        x0b = jnp.broadcast_to(x0, (B + pad,) + x0.shape)

        def body(x, u_t):
            xn = self.step_batch_fn(x, u_t)
            return xn, xn

        _, xs = jax.lax.scan(body, x0b, jnp.swapaxes(u_trj_b, 0, 1))
        out = jnp.swapaxes(jnp.concatenate([x0b[None], xs], axis=0), 0, 1)
        return out[:B] if pad else out

    def __hash__(self):  # static closure key for jit caching
        return hash((self.name, self.dim_x, self.dim_u, self.h, id(self.step)))

    def __eq__(self, other):
        return self is other
