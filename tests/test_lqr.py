"""TV-LQR backend tests: Riccati vs dense-KKT QP ground truth, sequential vs
associative scan equivalence, Δu-cost augmentation correctness.

This is the "Riccati-vs-QP equivalence" test the reference lacks (SURVEY §4);
its QP backend was Drake+OSQP (``irs_lqr/tv_lqr.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irs_mpc_tpu.ops import lqr


def _random_problem(T=8, n=3, m=2, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(T, n, n) * 0.4 + np.eye(n)
    B = rng.randn(T, n, m) * 0.5
    c = rng.randn(T, n) * 0.1
    Qh = rng.randn(n, n)
    Q = Qh @ Qh.T * 0.1 + np.eye(n)
    Rh = rng.randn(m, m)
    R = Rh @ Rh.T * 0.1 + np.eye(m)
    Qd = Q * 3.0
    x0 = rng.randn(n)
    xd = rng.randn(T + 1, n) * 0.5
    return (jnp.asarray(a, dtype=jnp.float32) for a in
            (A, B, c, Q, Qd, R, x0, xd))


def _dense_qp_solve(prob: lqr.LqrProblem):
    """Ground truth: solve the equality-constrained QP by dense KKT in f64.

    Variables w = [x_0..x_T, u_0..u_{T-1}]; minimize sum_t x'Qx + u'Ru +
    2x'Nu + 2q'x + 2r'u (+ final), s.t. x_0 = given, x_{t+1}=Ax+Bu+c.
    """
    A = np.asarray(prob.A, np.float64)
    B = np.asarray(prob.B, np.float64)
    c = np.asarray(prob.c, np.float64)
    T, n, m = B.shape
    nx = (T + 1) * n
    nv = nx + T * m

    def xi(t):
        return slice(t * n, (t + 1) * n)

    def ui(t):
        return slice(nx + t * m, nx + (t + 1) * m)

    H = np.zeros((nv, nv))
    f = np.zeros(nv)
    for t in range(T):
        H[xi(t), xi(t)] += np.asarray(prob.Q[t], np.float64)
        H[ui(t), ui(t)] += np.asarray(prob.R[t], np.float64)
        N = np.asarray(prob.N[t], np.float64)
        H[xi(t), ui(t)] += N
        H[ui(t), xi(t)] += N.T
        f[xi(t)] += np.asarray(prob.q[t], np.float64)
        f[ui(t)] += np.asarray(prob.r[t], np.float64)
    H[xi(T), xi(T)] += np.asarray(prob.Qf, np.float64)
    f[xi(T)] += np.asarray(prob.qf, np.float64)

    # Constraints: x_0 = x0; -x_{t+1} + A x_t + B u_t = -c_t.
    ne = (T + 1) * n
    E = np.zeros((ne, nv))
    d = np.zeros(ne)
    E[0:n, xi(0)] = np.eye(n)
    d[0:n] = np.asarray(prob.x0, np.float64)
    for t in range(T):
        r0 = (t + 1) * n
        E[r0:r0 + n, xi(t)] = A[t]
        E[r0:r0 + n, ui(t)] = B[t]
        E[r0:r0 + n, xi(t + 1)] = -np.eye(n)
        d[r0:r0 + n] = -c[t]

    KKT = np.block([[2 * H, E.T], [E, np.zeros((ne, ne))]])
    rhs = np.concatenate([-f * 2.0, d]) / 2.0 * 2.0  # keep explicit
    rhs = np.concatenate([-2.0 * f, d])
    sol = np.linalg.solve(KKT, rhs)
    w = sol[:nv]
    x_trj = w[:nx].reshape(T + 1, n)
    u_trj = w[nx:].reshape(T, m)
    return x_trj, u_trj


def test_riccati_matches_dense_qp():
    A, B, c, Q, Qd, R, x0, xd = _random_problem(seed=1)
    prob = lqr.build_tracking_problem(A, B, c, Q, Qd, R, x0, xd)
    x_trj, u_trj, _ = lqr.lqr_solve(prob)
    x_qp, u_qp = _dense_qp_solve(prob)
    np.testing.assert_allclose(x_trj, x_qp, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(u_trj, u_qp, rtol=2e-3, atol=2e-3)


def test_assoc_scan_matches_sequential():
    A, B, c, Q, Qd, R, x0, xd = _random_problem(T=16, n=4, m=2, seed=2)
    prob = lqr.build_tracking_problem(A, B, c, Q, Qd, R, x0, xd)
    g_seq = lqr.riccati_backward(prob)
    g_par = lqr.riccati_backward_assoc(prob)
    np.testing.assert_allclose(g_par.P, g_seq.P, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(g_par.K, g_seq.K, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(g_par.k, g_seq.k, rtol=5e-3, atol=5e-3)


def test_assoc_scan_with_cross_terms():
    """Δu-augmented problems exercise the N cross term in the parallel pass."""
    # The associative-scan compile intermittently segfaults inside XLA's
    # CPU backend when ~100 prior tests' compiled executables have
    # accumulated in the process (observed twice at this exact test in
    # full-suite runs; the test always passes in isolation).  Dropping the
    # jit caches before this compile avoids the crash state.
    jax.clear_caches()
    A, B, c, Q, Qd, R, x0, xd = _random_problem(T=10, n=3, m=2, seed=3)
    idx = jnp.array([0, 2], dtype=jnp.int32)
    prob = lqr.build_delta_u_problem(A, B, c, Q, Qd, R, x0, xd, idx)
    g_seq = lqr.riccati_backward(prob)
    g_par = lqr.riccati_backward_assoc(prob)
    np.testing.assert_allclose(g_par.K, g_seq.K, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(g_par.k, g_seq.k, rtol=1e-2, atol=1e-2)


def test_delta_u_problem_matches_dense_qp():
    """The augmented formulation must equal a brute-force QP with Δu cost."""
    A, B, c, Q, Qd, R, x0, xd = _random_problem(T=6, n=3, m=2, seed=4)
    idx = jnp.array([0, 2], dtype=jnp.int32)
    prob = lqr.build_delta_u_problem(A, B, c, Q, Qd, R, x0, xd, idx)
    x_aug, u_trj, _ = lqr.lqr_solve(prob)
    x_trj = lqr.split_augmented(x_aug, 3)
    x_qp_aug, u_qp = _dense_qp_solve(prob)
    np.testing.assert_allclose(u_trj, u_qp, rtol=3e-3, atol=3e-3)
    # Augmented state w-component must track the previous input.
    np.testing.assert_allclose(x_aug[1:, 3:], u_trj, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(x_aug[0, 3:], x0[np.asarray(idx)],
                               rtol=1e-5, atol=1e-5)


def test_riccati_factorize_linear_matches_backward():
    """riccati_factorize + riccati_linear must reproduce the joint backward
    pass exactly: the factorization is what lets boxed ADMM re-solve only
    the affine recursion per sweep (the quadratic penalties are
    sweep-invariant)."""
    for seed in range(3):
        A, B, c, Q, Qd, R, x0, xd = _random_problem(seed=seed)
        prob = lqr.build_tracking_problem(A, B, c, Q, Qd, R, x0, xd)
        g_full = lqr.riccati_backward(prob)
        fac = lqr.riccati_factorize(prob)
        g_lin = lqr.riccati_linear(prob, fac)
        for name in ("K", "k", "P", "p"):
            a, b = getattr(g_full, name), getattr(g_lin, name)
            scale = float(jnp.max(jnp.abs(a))) + 1e-9
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 1e-5, (seed, name, err)
