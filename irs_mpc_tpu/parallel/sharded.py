"""Multi-device SPMD estimation: mesh-sharded Monte-Carlo linearization.

Replaces the reference's entire L2 layer — the ZMQ PUSH/PULL ventilator /
worker / sink task farm over TCP with per-process simulator copies and a
manual startup barrier (``/root/reference/zmq_parallel_cmp/``,
``irs_lqr_quasistatic.py:117-129, 228-273``,
``examples/planar_hand/planar_hand_worker.py``) — with a single SPMD program
under ``shard_map`` on a ``jax.sharding.Mesh``:

* axis ``knot``   — the time dimension (the reference's only distribution
                    axis, via ``task_stride`` strided tasks);
* axis ``sample`` — the Monte-Carlo sample batch (the reference has no
                    distribution here at all).

Per-sample regression moments (G = S'S, M = S'D) are reduced with ``psum``
over the ``sample`` axis — on hardware this rides ICI, and across hosts DCN
only ever sees the tiny (p,p)/(p,n) moment tensors per knot (SURVEY §5.8).
No sockets, no pickling, no lost-worker deadlock: failure semantics are
XLA's, and determinism is by construction (keys are split per (knot, shard)).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.base import System
from ..ops.estimators import (SmoothingConfig, TvLinearization,
                              fit_from_moments)

Array = jax.Array


def make_mesh(n_sample: int = 1, n_knot: int = 1,
              devices=None) -> Mesh:
    """Build a (sample, knot) device mesh.  Total devices must equal
    n_sample * n_knot."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size == n_sample * n_knot, (
        f"need {n_sample * n_knot} devices, have {devices.size}")
    return Mesh(devices.reshape(n_sample, n_knot), axis_names=("sample",
                                                               "knot"))


def default_mesh(devices=None) -> Mesh:
    """Heuristic mesh over all devices: favor the sample axis (largest,
    embarrassingly parallel), square-ish split if possible."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_knot = 1
    for cand in (4, 2):
        if n % cand == 0 and n // cand >= 2:
            n_knot = cand
            break
    return make_mesh(n // n_knot, n_knot, devices)


def _pad_T(T: int, shards: int) -> int:
    return ((T + shards - 1) // shards) * shards


def sharded_estimate_tv_matrices(
        system: System,
        mode: str,
        x_trj: Array,          # (T+1, n) replicated
        u_trj: Array,          # (T, m) replicated
        key: Array,
        it: Array,
        cfg: SmoothingConfig,
        mesh: Mesh) -> TvLinearization:
    """Mesh-sharded version of ``estimate_tv_matrices``: knots split over the
    ``knot`` axis, samples over the ``sample`` axis, moments psum-reduced.

    Statistically identical to the single-device path (same estimator, same
    sample count) but NOT bitwise-identical to it (keys are split per shard).
    Deterministic for a fixed mesh shape + key.
    """
    T = int(u_trj.shape[0])
    n, m = system.dim_x, system.dim_u
    n_sample = mesh.shape["sample"]
    n_knot = mesh.shape["knot"]
    Tp = _pad_T(T, n_knot)
    S_local = max(1, cfg.num_samples // n_sample)

    # Pad the knot axis (padded knots compute garbage that is sliced off).
    x_pad = jnp.concatenate(
        [x_trj[:-1], jnp.broadcast_to(x_trj[-1], (Tp - T, n))], axis=0)
    u_pad = jnp.concatenate(
        [u_trj, jnp.zeros((Tp - T, m), u_trj.dtype)], axis=0)
    keys = jax.random.split(key, Tp)            # (Tp, 2) one key per knot
    sx, su = cfg.stds(it, n, m)

    def local_knot(x, u, knot_key):
        """Runs per knot on each device; sample axis cooperates via psum."""
        shard_id = jax.lax.axis_index("sample")
        k = jax.random.fold_in(knot_key, shard_id)
        kx, ku = jax.random.split(k)
        dx = sx * jax.random.normal(kx, (S_local, n))
        du = su * jax.random.normal(ku, (S_local, m))

        if mode == "exact":
            AB = system.jacobian_xu(x, u)
            return AB

        if mode == "first_order":
            if system.projection is not None:
                xp, up = system.projection(x, dx, u, du)
            else:
                xp, up = x[None] + dx, u[None] + du
            AB_part = jnp.sum(system.jacobian_xu_batch(xp, up), axis=0)
            AB = jax.lax.psum(AB_part, "sample") / (S_local * n_sample)
            return AB

        f0 = system.step(x, u)
        if mode == "zero_order":
            if system.projection is not None:
                xp, up = system.projection(x, dx, u, du)
                dx, du = xp - x[None], up - u[None]
            else:
                xp, up = x[None] + dx, u[None] + du
            fd = system.step_batch(xp, up)
            S = jnp.concatenate([dx, du], axis=1)
            G = jax.lax.psum(S.T @ S, "sample")
            M = jax.lax.psum(S.T @ (fd - f0[None]), "sample")
            return fit_from_moments(G, M)

        if mode == "zero_order_B":
            x_rep = jnp.broadcast_to(x, (S_local,) + x.shape)
            fd = system.step_batch(x_rep, u[None] + du)
            G = jax.lax.psum(du.T @ du, "sample")
            M = jax.lax.psum(du.T @ (fd - f0[None]), "sample")
            B_hat = fit_from_moments(G, M)
            if cfg.zero_order_B_A_source == "first_order":
                # MBP reference semantics (mbp_dynamics.py:387-389): A from
                # Jacobians averaged over the same u-samples.
                A_part = jnp.sum(
                    system.jacobian_xu_batch(x_rep, u[None] + du)[:, :, :n],
                    axis=0)
                A_hat = jax.lax.psum(A_part, "sample") / (S_local * n_sample)
            else:
                A_hat = system.jacobian_xu(x, u)[:, :n]
            return jnp.concatenate([A_hat, B_hat], axis=1)

        if mode == "zero_order_AB":
            fd = system.step_batch(x[None] + dx, u[None] + du)
            S = jnp.concatenate([dx, du], axis=1)
            G = jax.lax.psum(S.T @ S, "sample")
            M = jax.lax.psum(S.T @ (fd - f0[None]), "sample")
            return fit_from_moments(G, M, damp=cfg.damp)

        raise ValueError(f"unknown mode {mode!r}")

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("knot"), P("knot"), P("knot")),
             out_specs=P("knot"))
    def run(x_k, u_k, keys_k):
        return jax.vmap(lambda x, u, kk: local_knot(x, u, kk))(
            x_k, u_k, keys_k)

    AB = run(x_pad, u_pad, keys)[:T]
    A, B = AB[:, :, :n], AB[:, :, n:]
    f_nom = system.step_batch(x_trj[:-1], u_trj)
    c = f_nom - jnp.einsum("tij,tj->ti", A, x_trj[:-1]) \
        - jnp.einsum("tij,tj->ti", B, u_trj)
    return TvLinearization(A=A, B=B, c=c)
