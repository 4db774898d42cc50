"""Pallas Riccati kernel vs the lax.scan reference implementation.

On CPU CI the kernel runs under the Pallas TPU interpreter; on real TPU it
compiles through Mosaic (exercised by bench/examples with
riccati_backend="pallas")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from irs_mpc_tpu.ops import lqr
from irs_mpc_tpu.ops.pallas_riccati import riccati_backward_pallas


def _problem(T=12, n=5, m=3, seed=0):
    rng = np.random.RandomState(seed)
    A = jnp.asarray(rng.randn(T, n, n) * 0.3 + np.eye(n), jnp.float32)
    B = jnp.asarray(rng.randn(T, n, m) * 0.5, jnp.float32)
    c = jnp.asarray(rng.randn(T, n) * 0.1, jnp.float32)
    Q = jnp.asarray(np.diag(rng.rand(n) + 0.5), jnp.float32)
    R = jnp.asarray(np.diag(rng.rand(m) + 0.5), jnp.float32)
    x0 = jnp.asarray(rng.randn(n), jnp.float32)
    xd = jnp.asarray(rng.randn(T + 1, n) * 0.5, jnp.float32)
    return lqr.build_tracking_problem(A, B, c, Q, Q * 3, R, x0, xd)


def _run_pallas(prob):
    if jax.devices()[0].platform != "tpu":
        with pltpu.force_tpu_interpret_mode():
            return riccati_backward_pallas(prob)
    return riccati_backward_pallas(prob)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_riccati_matches_scan(seed):
    prob = _problem(seed=seed)
    g_ref = lqr.riccati_backward(prob)
    g_pal = _run_pallas(prob)
    np.testing.assert_allclose(g_pal.K, g_ref.K, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g_pal.k, g_ref.k, rtol=1e-2, atol=1e-2)


def test_pallas_riccati_delta_u_problem():
    """Cross-term (N != 0) path through the kernel."""
    rng = np.random.RandomState(3)
    T, n, m = 8, 4, 2
    A = jnp.asarray(rng.randn(T, n, n) * 0.3 + np.eye(n), jnp.float32)
    B = jnp.asarray(rng.randn(T, n, m) * 0.5, jnp.float32)
    c = jnp.asarray(rng.randn(T, n) * 0.1, jnp.float32)
    Q = jnp.asarray(np.diag(rng.rand(n) + 0.5), jnp.float32)
    R = jnp.asarray(np.diag(rng.rand(m) + 0.5), jnp.float32)
    x0 = jnp.asarray(rng.randn(n), jnp.float32)
    xd = jnp.asarray(rng.randn(T + 1, n) * 0.5, jnp.float32)
    prob = lqr.build_delta_u_problem(A, B, c, Q, Q * 3, R, x0, xd,
                                     jnp.array([0, 2], jnp.int32))
    g_ref = lqr.riccati_backward(prob)
    g_pal = _run_pallas(prob)
    np.testing.assert_allclose(g_pal.K, g_ref.K, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g_pal.k, g_ref.k, rtol=1e-2, atol=1e-2)


class TestBatchedQp:
    """Lane-batched PDIP kernel vs the vmapped reference solver."""

    def _instances(self, B=64, n=5, m=8, seed=0):
        rng = np.random.RandomState(seed)
        A = rng.randn(B, n, n)
        P = A @ A.transpose(0, 2, 1) + np.eye(n) * 2
        q = rng.randn(B, n)
        C = rng.randn(B, m, n)
        d = np.einsum("bmn,bn->bm", C, rng.randn(B, n) * 0.3) \
            + rng.rand(B, m) * 0.5
        return [jnp.asarray(a, jnp.float32) for a in (P, q, C, d)]

    def test_matches_vmapped_solver(self):
        from irs_mpc_tpu.models.contact.pallas_qp import solve_qp_batched
        from irs_mpc_tpu.models.contact.qp import solve_qp
        P, q, C, d = self._instances()
        interp = jax.devices()[0].platform != "tpu"
        x_pal = solve_qp_batched(P, q, C, d, iters=30, interpret=interp)
        x_ref = jax.vmap(lambda *a: solve_qp(*a, 30))(P, q, C, d)
        np.testing.assert_allclose(x_pal, x_ref, atol=2e-2)

    def test_contact_step_batch_equivalence(self):
        """QuasistaticModel.system(pallas_batch=True).step_batch must equal
        the vmapped step on contact states."""
        from irs_mpc_tpu.models.contact.systems import make_box_pushing
        from irs_mpc_tpu.models.contact import pallas_qp
        from jax.experimental.pallas import tpu as pltpu
        m = make_box_pushing()
        sys_ref = m.system()
        sys_pal = m.system(pallas_batch=True)
        assert sys_pal.step_batch_fn is not None
        rng = np.random.RandomState(1)
        B = 32
        x = jnp.asarray(
            np.tile([0., 0.5, 0., 0., -0.12], (B, 1))
            + rng.randn(B, 5) * 0.03, jnp.float32)
        u = x[:, 3:5] + jnp.asarray(rng.randn(B, 2) * 0.05, jnp.float32)
        ref = sys_ref.step_batch(x, u)
        if jax.devices()[0].platform == "tpu":
            pal = sys_pal.step_batch(x, u)
        else:
            with pltpu.force_tpu_interpret_mode():
                pal = sys_pal.step_batch(x, u)
        np.testing.assert_allclose(pal, ref, atol=5e-3)

    def test_warm_init_and_dual_output(self):
        """r5 kernel extensions: ``init=(x0, lam0)`` mirrors
        qp._pdip_solve's warm branch per lane, ``want_lam=True`` returns
        sanitized final duals suitable for downstream warm starts."""
        from irs_mpc_tpu.models.contact.pallas_qp import solve_qp_batched
        from irs_mpc_tpu.models.contact.qp import _pdip_solve
        P, q, C, d = self._instances(B=48, seed=3)
        interp = jax.devices()[0].platform != "tpu"
        x_cold, lam_cold = solve_qp_batched(P, q, C, d, iters=30,
                                            want_lam=True, interpret=interp)
        assert bool(jnp.isfinite(x_cold).all())
        assert bool(jnp.isfinite(lam_cold).all())
        assert float(jnp.min(lam_cold)) >= 0.0
        # Accuracy vs a CONVERGED reference, per-lane p90 (hard lanes
        # legitimately drift between the kernel and the vmapped path at
        # matched iteration counts — same criterion as bench.py).
        conv = jax.vmap(lambda *a: _pdip_solve(*a, 120)[0])(P, q, C, d)
        scale = float(jnp.max(jnp.abs(conv))) + 1e-9
        err = np.asarray(jnp.max(jnp.abs(x_cold - conv), axis=1)) / scale
        ref30 = jax.vmap(lambda *a: _pdip_solve(*a, 30)[0])(P, q, C, d)
        err_ref = np.asarray(jnp.max(jnp.abs(ref30 - conv), axis=1)) / scale
        assert np.percentile(err, 90) < max(
            2.5 * np.percentile(err_ref, 90), 5e-2)
        # Warm restart from the solution: few iterations stay converged.
        x_w = solve_qp_batched(P, q, C, d, iters=6,
                               init=(x_cold, lam_cold), interpret=interp)
        err_w = np.asarray(jnp.max(jnp.abs(x_w - conv), axis=1)) / scale
        assert np.percentile(err_w, 90) < max(
            2.5 * np.percentile(err, 90), 5e-2)


def test_pallas_whole_loop_admm_matches_xla():
    """The whole-ADMM-loop kernel (ops/pallas_admm.py) must reproduce the
    XLA sweep loop: same factorization, same over-relaxed consensus/dual
    updates.  Small sizes + few sweeps keep the interpreter tractable on
    CPU; on TPU this path is additionally exercised end-to-end by every
    contact driver (backend="pallas" + u-box dispatch) and checked against
    the f64 oracle at convergence in the bench."""
    from irs_mpc_tpu.ops import admm as admm_ops
    from irs_mpc_tpu.ops.pallas_admm import solve_boxed_tvlqr_ubox_pallas

    prob = _problem(T=4, n=3, m=2, seed=5)
    T, n, m = prob.B.shape
    bounds = admm_ops.BoxBounds(
        u=jnp.stack([jnp.full((T, m), -0.3), jnp.full((T, m), 0.3)]))
    ref = admm_ops.solve_boxed_tvlqr(prob, bounds, n_phys=n, rho=5.0,
                                     iters=3, over_relax=1.6)
    x0t, u0t, _ = lqr.lqr_solve(prob)
    z0 = jnp.clip(u0t, bounds.u[0], bounds.u[1])
    y0 = jnp.zeros_like(z0)

    def run():
        return solve_boxed_tvlqr_ubox_pallas(
            prob, bounds.u[0], bounds.u[1], z0, y0, rho=5.0, iters=3,
            over_relax=1.6)

    if jax.devices()[0].platform != "tpu":
        with pltpu.force_tpu_interpret_mode():
            x_p, u_p, K, k, z, zp = run()
    else:
        x_p, u_p, K, k, z, zp = run()
    np.testing.assert_allclose(u_p, ref.u_trj, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(x_p, ref.x_trj, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(K, ref.gains.K, rtol=1e-3, atol=1e-3)
    # Residual ingredients agree too (host computes r_primal/r_dual).
    np.testing.assert_allclose(jnp.max(jnp.abs(u_p - z)), ref.r_primal,
                               rtol=1e-2, atol=1e-3)


def test_admm_pallas_backend_dispatch():
    """solve_boxed_tvlqr(backend="pallas") with a u-box must route through
    the whole-loop kernel (init, residuals, gains wiring) and agree with the
    scan backend."""
    from irs_mpc_tpu.ops import admm as admm_ops

    prob = _problem(T=4, n=3, m=2, seed=7)
    T, n, m = prob.B.shape
    bounds = admm_ops.BoxBounds(
        u=jnp.stack([jnp.full((T, m), -0.3), jnp.full((T, m), 0.3)]))

    ref = admm_ops.solve_boxed_tvlqr(prob, bounds, n_phys=n, rho=5.0,
                                     iters=3, over_relax=1.6)
    if jax.devices()[0].platform != "tpu":
        with pltpu.force_tpu_interpret_mode():
            pal = admm_ops.solve_boxed_tvlqr(prob, bounds, n_phys=n, rho=5.0,
                                             iters=3, over_relax=1.6,
                                             backend="pallas")
    else:
        pal = admm_ops.solve_boxed_tvlqr(prob, bounds, n_phys=n, rho=5.0,
                                         iters=3, over_relax=1.6,
                                         backend="pallas")
    np.testing.assert_allclose(pal.u_trj, ref.u_trj, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(pal.x_trj, ref.x_trj, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(pal.gains.K, ref.gains.K, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(float(pal.r_primal), float(ref.r_primal),
                               rtol=1e-2, atol=1e-3)


def _delta_u_problem(T=5, n=4, m=2, seed=11):
    """A Δu-augmented problem (n_aug = n + m, w = x[n:]) for du-box tests."""
    rng = np.random.RandomState(seed)
    A = jnp.asarray(rng.randn(T, n, n) * 0.3 + np.eye(n), jnp.float32)
    B = jnp.asarray(rng.randn(T, n, m) * 0.5, jnp.float32)
    c = jnp.asarray(rng.randn(T, n) * 0.1, jnp.float32)
    Q = jnp.asarray(np.diag(rng.rand(n) + 0.5), jnp.float32)
    R = jnp.asarray(np.diag(rng.rand(m) + 0.5), jnp.float32)
    x0 = jnp.asarray(rng.randn(n), jnp.float32)
    xd = jnp.asarray(rng.randn(T + 1, n) * 0.5, jnp.float32)
    idx_u = jnp.asarray(np.arange(m), jnp.int32)
    prob = lqr.build_delta_u_problem(A, B, c, Q, Q * 3, R, x0, xd, idx_u)
    return prob, n


@pytest.mark.parametrize("kinds", [("x",), ("dx",), ("x", "u"),
                                   ("du",), ("u", "du")])
def test_pallas_admm_all_bound_kinds_match_xla(kinds):
    """The generalized whole-loop ADMM kernel must reproduce the XLA sweep
    loop for EVERY bound kind (x / u / dx / du and combinations) — the
    factorize-once argument holds because all quadratic penalties are
    sweep-invariant (even dx's D = A - I selector).  du runs on the
    Δu-augmented problem (w = x[n_phys:]), matching plate-pickup's
    u_bounds_rel path; x covers the bicycle-hard steering bound."""
    from irs_mpc_tpu.ops import admm as admm_ops

    if "du" in kinds:
        prob, n_phys = _delta_u_problem()
        idx_w = jnp.arange(n_phys, prob.B.shape[1])
    else:
        prob = _problem(T=5, n=4, m=2, seed=13)
        n_phys = prob.B.shape[1]
        idx_w = None
    T, n, m = prob.B.shape
    b = {}
    if "x" in kinds:
        b["x"] = jnp.stack([jnp.full((T + 1, n_phys), -1.0),
                            jnp.full((T + 1, n_phys), 1.0)])
    if "u" in kinds:
        b["u"] = jnp.stack([jnp.full((T, m), -0.3), jnp.full((T, m), 0.3)])
    if "dx" in kinds:
        b["dx"] = jnp.stack([jnp.full((T, n_phys), -0.5),
                             jnp.full((T, n_phys), 0.5)])
    if "du" in kinds:
        b["du"] = jnp.stack([jnp.full((T, m), -0.2), jnp.full((T, m), 0.2)])
    bounds = admm_ops.BoxBounds(**b)

    kw = dict(n_phys=n_phys, idx_w=idx_w, rho=5.0, iters=4, over_relax=1.6)
    ref = admm_ops.solve_boxed_tvlqr(prob, bounds, **kw)
    if jax.devices()[0].platform != "tpu":
        with pltpu.force_tpu_interpret_mode():
            pal = admm_ops.solve_boxed_tvlqr(prob, bounds, backend="pallas",
                                             **kw)
    else:
        pal = admm_ops.solve_boxed_tvlqr(prob, bounds, backend="pallas", **kw)
    np.testing.assert_allclose(pal.u_trj, ref.u_trj, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(pal.x_trj, ref.x_trj, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(pal.gains.K, ref.gains.K, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(float(pal.r_primal), float(ref.r_primal),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(float(pal.r_dual), float(ref.r_dual),
                               rtol=1e-2, atol=1e-3)


def test_pallas_admm_dispatch_probe_x_and_du(monkeypatch):
    """solve_boxed_tvlqr(backend="pallas") must actually route x-box and
    du-box problems through the whole-loop kernel (not silently fall back to
    the XLA path) — the bicycle-hard and plate-pickup configurations."""
    from irs_mpc_tpu.ops import admm as admm_ops
    from irs_mpc_tpu.ops import pallas_admm

    calls = []
    real = pallas_admm.solve_boxed_tvlqr_pallas

    def probe(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_admm, "solve_boxed_tvlqr_pallas", probe)

    prob, n_phys = _delta_u_problem(seed=17)
    T, n, m = prob.B.shape
    bounds = admm_ops.BoxBounds(
        x=jnp.stack([jnp.full((T + 1, n_phys), -1.0),
                     jnp.full((T + 1, n_phys), 1.0)]),
        du=jnp.stack([jnp.full((T, m), -0.2), jnp.full((T, m), 0.2)]))
    with pltpu.force_tpu_interpret_mode():
        sol = admm_ops.solve_boxed_tvlqr(
            prob, bounds, n_phys=n_phys, idx_w=jnp.arange(n_phys, n),
            rho=5.0, iters=3, backend="pallas")
    assert calls, "pallas backend fell back to the XLA path"
    assert bool(jnp.isfinite(sol.u_trj).all())
