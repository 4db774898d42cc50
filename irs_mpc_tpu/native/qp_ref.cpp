// Native (C++) dense QP reference solver for irs_mpc_tpu.
//
// Role: the host-side numerical oracle the on-device (JAX/XLA) TV-LQR and
// contact solvers are validated against — the same role Drake's OSQP/Gurobi
// backends play for the reference implementation
// (/root/reference/irs_lqr/tv_lqr.py:11-27) and the C++ quasistatic
// simulator plays for its python sim (reference cross-checks the two,
// run_planar_hand.py:93-107).  Double precision, no external deps.
//
// Problem:  minimize   1/2 w'P w + f'w
//           subject to E w = d,   lb <= w <= ub
//
// Method: ADMM (OSQP-style splitting on the box constraint, equalities kept
// in the KKT system).  The KKT matrix is factorized once by partial-pivot LU
// and reused across iterations.
//
// C API (ctypes-friendly), all matrices row-major:
//   int qp_box_eq_solve(int nv, int ne,
//                       const double* P, const double* f,
//                       const double* E, const double* d,
//                       const double* lb, const double* ub,
//                       double rho, int iters, double tol,
//                       double* w_out)
//   returns 0 on success, 1 on factorization failure.

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Dense partial-pivot LU: A (n x n) row-major, factors in place, pivots out.
bool lu_factor(std::vector<double>& A, std::vector<int>& piv, int n) {
  piv.resize(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int k = 0; k < n; ++k) {
    int p = k;
    double amax = std::fabs(A[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(A[i * n + k]);
      if (v > amax) { amax = v; p = i; }
    }
    if (amax < 1e-300) return false;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[p * n + j]);
      std::swap(piv[k], piv[p]);
    }
    const double pivot = A[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const double m = A[i * n + k] / pivot;
      A[i * n + k] = m;
      if (m != 0.0) {
        for (int j = k + 1; j < n; ++j) A[i * n + j] -= m * A[k * n + j];
      }
    }
  }
  return true;
}

void lu_solve(const std::vector<double>& LU, const std::vector<int>& piv,
              int n, const double* b, double* x) {
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) y[i] = b[piv[i]];
  for (int i = 0; i < n; ++i) {           // forward substitution (unit lower)
    double s = y[i];
    for (int j = 0; j < i; ++j) s -= LU[i * n + j] * y[j];
    y[i] = s;
  }
  for (int i = n - 1; i >= 0; --i) {      // back substitution
    double s = y[i];
    for (int j = i + 1; j < n; ++j) s -= LU[i * n + j] * x[j];
    x[i] = s / LU[i * n + i];
  }
}

}  // namespace

extern "C" int qp_box_eq_solve(int nv, int ne,
                               const double* P, const double* f,
                               const double* E, const double* d,
                               const double* lb, const double* ub,
                               double rho, int iters, double tol,
                               double* w_out) {
  const int n = nv + ne;
  // KKT = [P + rho*I, E'; E, 0]
  std::vector<double> KKT(static_cast<size_t>(n) * n, 0.0);
  for (int i = 0; i < nv; ++i)
    for (int j = 0; j < nv; ++j)
      KKT[i * n + j] = P[i * nv + j] + (i == j ? rho : 0.0);
  for (int r = 0; r < ne; ++r)
    for (int j = 0; j < nv; ++j) {
      KKT[j * n + (nv + r)] = E[r * nv + j];
      KKT[(nv + r) * n + j] = E[r * nv + j];
    }
  std::vector<int> piv;
  if (!lu_factor(KKT, piv, n)) return 1;

  std::vector<double> w(nv, 0.0), z(nv, 0.0), y(nv, 0.0);
  std::vector<double> rhs(n), sol(n);
  for (int i = 0; i < nv; ++i) {
    double lo = lb[i], hi = ub[i];
    double v = 0.0;
    if (v < lo) v = lo;
    if (v > hi) v = hi;
    z[i] = v;
  }

  for (int it = 0; it < iters; ++it) {
    // w-update: solve KKT [w; nu] = [rho*(z - y) - f; d]
    for (int i = 0; i < nv; ++i) rhs[i] = rho * (z[i] - y[i]) - f[i];
    for (int r = 0; r < ne; ++r) rhs[nv + r] = d[r];
    lu_solve(KKT, piv, n, rhs.data(), sol.data());
    for (int i = 0; i < nv; ++i) w[i] = sol[i];
    // z-update: projection onto box (with over-relaxation alpha = 1.6).
    const double alpha = 1.6;
    double r_primal = 0.0, r_dual = 0.0;
    for (int i = 0; i < nv; ++i) {
      const double wh = alpha * w[i] + (1.0 - alpha) * z[i];
      double zn = wh + y[i];
      if (zn < lb[i]) zn = lb[i];
      if (zn > ub[i]) zn = ub[i];
      y[i] += wh - zn;
      r_primal = std::fmax(r_primal, std::fabs(w[i] - zn));
      r_dual = std::fmax(r_dual, rho * std::fabs(zn - z[i]));
      z[i] = zn;
    }
    if (r_primal < tol && r_dual < tol) break;
  }
  std::memcpy(w_out, z.data(), sizeof(double) * nv);
  return 0;
}
