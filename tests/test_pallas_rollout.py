"""The whole-chain line-searched contact rollout kernel
(models/contact/pallas_rollout.py) vs its XLA references.

Three levels: (1) the kernel-safe batched geometry assembly vs the
scatter-based reference geometry; (2) the dense-batched warm PDIP vs
qp._pdip_solve's warm branch; (3) the full iRS-MPC iteration with the
kernel rollout (interpreted) vs the scan backend.  Level 3 is tolerance-
based: active-row duals sit at the slack floor where their magnitude is
float-order sensitive, so warm chains agree to ~1e-2 in u (the warm
solve's own accuracy class vs a converged solve), not bitwise.
"""
import dataclasses
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from irs_mpc_tpu.models.contact import pallas_rollout as pr
from irs_mpc_tpu.models.contact.qp import _pdip_solve
from irs_mpc_tpu.models.contact.systems import make_planar_hand

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


def _states(model, B=8, scale=0.05, seed=0):
    return _perturbed_states(model, _nominal_q0("planar_hand", model),
                             B=B, scale=scale, seed=seed)


def _perturbed_states(model, q0, B=8, scale=0.05, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(np.tile(q0, (B, 1)) + rng.randn(B, model.nq) * scale,
                    jnp.float32)
    u = jnp.asarray(
        np.tile(q0[model.indices_u_into_x()], (B, 1))
        + rng.randn(B, model.dim_u) * scale, jnp.float32)
    return x, u


def _nominal_q0(name, model):
    import importlib
    if name == "planar_hand":
        return model.get_x_from_q_dict(
            {"sphere": np.array([0.0, 0.35, 0.0]),
             "arm_left": np.array([-np.pi / 4, -np.pi / 4]),
             "arm_right": np.array([np.pi / 4, np.pi / 4])})
    if name == "plate_pickup":
        return model.get_x_from_q_dict(
            {"plate": np.array([0.0, 0.04, 0.0]),
             "gripper": np.array([0.0, 0.30, 0.0, -0.16, -0.16])})
    if name == "box_pushing":
        return np.array([0., 0.5, 0., 0., -0.12], np.float32)
    return np.array([0.45, 0.5, 0., -0.15, 0.5], np.float32)  # pivoting


import pytest  # noqa: E402
from irs_mpc_tpu.models.contact import systems as contact_systems


@pytest.mark.parametrize("name", ["planar_hand", "box_pushing",
                                  "box_pivoting", "plate_pickup"])
def test_kernel_assembly_matches_geometry(name):
    """The scatter-free one-hot assembly must reproduce _constraint_rows /
    _hessian_and_bias on contact-rich states — all supported narrow phases:
    arm capsules, free circles/boxes, prismatic fingers, halfspaces."""
    model = getattr(contact_systems, f"make_{name}")()
    assert pr.supports_model(model)
    q0 = _nominal_q0(name, model)
    for seed in (0, 1):
        x, u = _perturbed_states(model, q0, scale=0.06, seed=seed)
        b, C, d = jax.jit(lambda x, u: pr.assemble_xla(model, x, u))(x, u)
        Cr, dr = jax.vmap(model._constraint_rows)(x)
        Pr, br = jax.vmap(model._hessian_and_bias)(x, u)
        np.testing.assert_allclose(C, Cr, atol=1e-5)
        np.testing.assert_allclose(d, dr, atol=1e-5)
        # Bias magnitudes scale with Kp (5e4 for pivoting): relative check.
        scale_b = float(jnp.max(jnp.abs(br))) + 1.0
        np.testing.assert_allclose(b / scale_b, br / scale_b, atol=1e-5)
        p_diag = pr._hessian_constants(model)[0]
        np.testing.assert_allclose(jax.vmap(jnp.diag)(Pr)[0], p_diag,
                                   atol=1e-6)


def test_open_loop_chain_matches_step_ws():
    """The kernel's warm chain (zero gains => pure open loop) vs the XLA
    step_ws scan on the stiff prismatic-finger system."""
    from irs_mpc_tpu.models.contact.systems import make_plate_pickup
    m = make_plate_pickup()
    T, nq, mu = 8, m.nq, m.dim_u
    q0 = _nominal_q0("plate_pickup", m)
    rng = np.random.RandomState(0)
    u_seq = jnp.asarray(
        np.tile(q0[m.indices_u_into_x()], (T, 1))
        + np.cumsum(rng.randn(T, mu) * 0.01, axis=0), jnp.float32)

    sys_ = m.system()

    def f(carry, u):
        x, ws = carry
        xn, ws = sys_.step_ws_fn(x, u, ws)
        return (xn, ws), xn

    (_, _), xs_ref = jax.lax.scan(
        f, (jnp.asarray(q0, jnp.float32), sys_.ws_init_fn()), u_seq)

    A = 2
    K = jnp.zeros((T, mu, nq + mu))
    with pltpu.force_tpu_interpret_mode():
        xs_k, us_k = pr.linesearch_rollout_pallas(
            m, jnp.asarray(q0, jnp.float32),
            q0[m.indices_u_into_x()].astype(np.float32), K,
            jnp.zeros((A, T, nq)), jnp.zeros((A, T, mu)),
            jnp.broadcast_to(u_seq[None], (A, T, mu)),
            jnp.full((T, mu), -1e9), jnp.full((T, mu), 1e9), None, None)
    np.testing.assert_allclose(us_k[0], u_seq, atol=1e-6)
    np.testing.assert_allclose(xs_k[0, 1:], xs_ref, atol=5e-3)


def test_dense_warm_pdip_matches_reference():
    """Primal agreement with qp._pdip_solve's warm branch (duals on active
    rows are float-order sensitive; the primal is the physics)."""
    model = make_planar_hand(h=0.1)
    x, u = _states(model, scale=0.05)
    b, C, d = pr.assemble_xla(model, x, u)
    P, _ = jax.vmap(model._hessian_and_bias)(x, u)
    rng = np.random.RandomState(3)
    B, mr = d.shape
    dq0 = jnp.asarray(rng.randn(B, model.nq) * 0.01, jnp.float32)
    lam0 = jnp.asarray(np.abs(rng.randn(B, mr)) + 0.5, jnp.float32)
    consts = pr.make_consts(model)
    xk, lamk = pr._pdip_warm_dense(consts, b, C, d, dq0, lam0, iters=10)
    assert bool(jnp.isfinite(xk).all()) and bool(jnp.isfinite(lamk).all())
    for i in range(B):
        xi, _, _ = _pdip_solve(P[i], b[i], C[i], d[i], 10,
                               init=(dq0[i], lam0[i]))
        np.testing.assert_allclose(xk[i], xi, atol=5e-4)


def test_kernel_rollout_iteration_matches_scan_backend():
    """Full iteration with the interpreted rollout kernel vs the SAME
    iteration with the kernel stripped (identical estimates and gains, only
    the forward-rollout path differs): the accepted TRAJECTORY must agree
    to the warm-chain tolerance (atol 0.05 — the kernel chain is a ~1e-2
    accuracy replica of the scan chain, see module docstring).

    The cost assertion is deliberately loose (8%): planar-hand terminal
    weights are ~1e3, so a legitimate 1.6e-2 state gap at the chosen alpha
    amplifies to several percent of total cost (measured r5: both paths
    chose alpha=0.3, scan 211.14 vs kernel 197.87 — the kernel lane the
    better one).  The tight lock on convergence QUALITY is the golden
    suite + bench accuracy assertions, not this chain-replica check."""
    from planar_hand import build_solver

    ref, _ = build_solver(num_samples=8, T=6, riccati_backend="pallas")
    ref.system = dataclasses.replace(ref.system, ls_rollout_fn=None)
    with pltpu.force_tpu_interpret_mode():
        x_r, u_r, _, cv_r = ref._iteration(
            ref.x_trj, ref.u_trj, ref.key, jnp.asarray(1.0, jnp.float32))

    pal, _ = build_solver(num_samples=8, T=6, riccati_backend="pallas")
    assert pal.system.ls_rollout_fn is not None
    with pltpu.force_tpu_interpret_mode():
        x_p, u_p, _, cv_p = pal._iteration(
            pal.x_trj, pal.u_trj, pal.key, jnp.asarray(1.0, jnp.float32))

    assert float(cv_p[0]) < float(pal.cost_lst[0]), "no descent"
    assert abs(float(cv_p[0]) - float(cv_r[0])) < 0.08 * float(cv_r[0])
    np.testing.assert_allclose(u_p, u_r, atol=0.05)
    np.testing.assert_allclose(x_p, x_r, atol=0.05)


def test_unsupported_models_fall_back():
    """Models outside the kernel scope must not attach the hook (they keep
    the XLA scan path): the LCP contact model and carrots (500 contact
    rows x 45 dofs — past the dense-batched kernel's VMEM/op-count gate).
    With the r5 dual-split canonicalization (canon_warm_duals, OPT-IN —
    box_pivoting's factory enables it) the chain quality gate now ADMITS
    the stiff-actuation system it excluded in r4 (box_pivoting, measured
    186.8 vs recorded 228.6); prismatic-finger grasping (plate_pickup)
    remains excluded — see pr.chain_gate for the measured trade-offs."""
    from irs_mpc_tpu.models.contact.systems import (make_box_pivoting,
                                                    make_box_pushing,
                                                    make_carrots,
                                                    make_plate_pickup)
    car = make_carrots()
    assert not pr.supports_model(car)
    assert car.system().ls_rollout_fn is None
    lcp = dataclasses.replace(make_planar_hand(), contact_model="lcp")
    assert not pr.supports_model(lcp)
    assert lcp.system().ls_rollout_fn is None
    for mk in (make_box_pivoting, make_planar_hand, make_box_pushing):
        m = mk()
        assert pr.supports_model(m) and pr.chain_gate(m)
        assert m.system().ls_rollout_fn is not None
    # Prismatic-finger grasping stays on the XLA scan (measured: the
    # kernel chain's ~1e-2 accuracy loses the grasp basin, 6.20 vs 3.39).
    mp = make_plate_pickup()
    assert pr.supports_model(mp) and not pr.chain_gate(mp)
    assert mp.system().ls_rollout_fn is None
    # Opting out of canonicalization re-applies the r4 stiffness exclusion.
    m = dataclasses.replace(make_box_pivoting(), canon_warm_duals=False)
    assert not pr.chain_gate(m)
    assert m.system().ls_rollout_fn is None


def test_wide_line_search_falls_back_to_scan():
    """More than 8 line-search alphas exceed the kernel's sublane batch;
    the solver must fall back to the vmapped scan, not crash at trace."""
    from planar_hand import build_solver
    alphas = (1.0, 0.8, 0.6, 0.4, 0.3, 0.2, 0.1, 0.03, 0.0)   # 9 > 8
    s, _ = build_solver(num_samples=8, T=4, riccati_backend="pallas",
                        line_search_alphas=alphas)
    with pltpu.force_tpu_interpret_mode():
        x, u, _, cv = s._iteration(s.x_trj, s.u_trj, s.key,
                                   jnp.asarray(1.0, jnp.float32))
    assert np.isfinite(float(cv[0]))
