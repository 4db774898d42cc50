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
#include <algorithm>
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

// ---------------------------------------------------------------------------
// Inequality QP with active-set-polished solution and ANALYTIC GRADIENT —
// the native oracle for the on-device differentiable contact QP layer
// (models/contact/qp.py).  This is precisely the role the reference's C++
// simulator plays with grad_from_active_constraints
// (/root/reference/irs_lqr/quasistatic_dynamics.py:158-162): solve
//     min_x 1/2 x'P x + q'x   s.t.  C x <= d
// find the active constraint set A, then differentiate the equality-
// constrained KKT system on A for a supplied tangent (dP, dq, dC, dd):
//     [P  C_A'] [dx    ]   [-(dP x + dq + dC_A' lam_A)]
//     [C_A  0 ] [dlam_A] = [ dd_A - dC_A x            ]
//
// Method: ADMM (via qp_box_eq_solve on w = [x; s], C x + s = d, s >= 0) to
// locate the active set, then KKT polish with add/drop refinement.
//
//   int qp_ineq_solve_grad(int n, int m,
//                          const double* P, const double* q,
//                          const double* C, const double* d,
//                          const double* dP, const double* dq,
//                          const double* dC, const double* dd,
//                          double rho, int iters, double tol,
//                          double act_tol,
//                          double* x_out, double* lam_out, double* dx_out)
//   returns 0 on success, 1 on factorization failure, 2 on no convergence.

namespace {

// Solve the KKT system on the given active rows; returns false on
// factorization failure.  x (n), lam_act (k) outputs.
bool kkt_solve(int n, const double* P, const double* C,
               const std::vector<int>& act,
               const double* rhs_x, const double* rhs_a,
               std::vector<double>& x, std::vector<double>& lam_act) {
  const int k = static_cast<int>(act.size());
  const int nn = n + k;
  std::vector<double> KKT(static_cast<size_t>(nn) * nn, 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) KKT[i * nn + j] = P[i * n + j];
  for (int r = 0; r < k; ++r) {
    const double* crow = C + static_cast<size_t>(act[r]) * n;
    for (int j = 0; j < n; ++j) {
      KKT[j * nn + (n + r)] = crow[j];
      KKT[(n + r) * nn + j] = crow[j];
    }
    // Tiny regularization keeps dependent active rows factorizable.
    KKT[(n + r) * nn + (n + r)] = -1e-12;
  }
  std::vector<int> piv;
  if (!lu_factor(KKT, piv, nn)) return false;
  std::vector<double> rhs(nn), sol(nn);
  for (int i = 0; i < n; ++i) rhs[i] = rhs_x[i];
  for (int r = 0; r < k; ++r) rhs[n + r] = rhs_a[r];
  lu_solve(KKT, piv, nn, rhs.data(), sol.data());
  x.assign(sol.begin(), sol.begin() + n);
  lam_act.assign(sol.begin() + n, sol.end());
  return true;
}

// Reduce `act` to a linearly independent subset of C's rows (the polish
// below is drop-only, so the iteration order among dependent rows is
// arbitrary; reverse order is kept for determinism).  Degenerate vertices
// (more active rows than variables) make the KKT system singular otherwise;
// the multipliers on a dependent subset are non-unique and any independent
// subset yields a valid KKT point and generalized derivative.
void filter_independent_rows(std::vector<int>& act, const double* C, int n) {
  std::vector<std::vector<double>> basis;
  std::vector<int> kept;
  for (auto it = act.rbegin(); it != act.rend(); ++it) {
    std::vector<double> v(C + static_cast<size_t>(*it) * n,
                          C + static_cast<size_t>(*it + 1) * n);
    double nrm0 = 0.0;
    for (double vi : v) nrm0 += vi * vi;
    nrm0 = std::sqrt(nrm0);
    if (nrm0 < 1e-14) continue;
    for (const auto& b : basis) {
      double dot = 0.0;
      for (int j = 0; j < n; ++j) dot += v[j] * b[j];
      for (int j = 0; j < n; ++j) v[j] -= dot * b[j];
    }
    double nrm = 0.0;
    for (double vi : v) nrm += vi * vi;
    nrm = std::sqrt(nrm);
    if (nrm > 1e-8 * nrm0) {
      for (int j = 0; j < n; ++j) v[j] /= nrm;
      basis.push_back(std::move(v));
      kept.push_back(*it);
    }
    if (static_cast<int>(basis.size()) == n) break;
  }
  std::sort(kept.begin(), kept.end());
  act = std::move(kept);
}

}  // namespace

extern "C" int qp_ineq_solve_grad(int n, int m,
                                  const double* P, const double* q,
                                  const double* C, const double* d,
                                  const double* dP, const double* dq,
                                  const double* dC, const double* dd,
                                  double rho, int iters, double tol,
                                  double act_tol,
                                  double* x_out, double* lam_out,
                                  double* dx_out) {
  // --- 1. ADMM solve on w = [x; s] to locate the active set. ------------
  const int nv = n + m;
  const double BIG = 1e30;
  std::vector<double> Pw(static_cast<size_t>(nv) * nv, 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) Pw[i * nv + j] = P[i * n + j];
  std::vector<double> fw(nv, 0.0);
  for (int i = 0; i < n; ++i) fw[i] = q[i];
  std::vector<double> E(static_cast<size_t>(m) * nv, 0.0);
  for (int r = 0; r < m; ++r) {
    for (int j = 0; j < n; ++j) E[r * nv + j] = C[static_cast<size_t>(r) * n + j];
    E[r * nv + (n + r)] = 1.0;
  }
  std::vector<double> lb(nv, -BIG), ub(nv, BIG);
  for (int i = 0; i < m; ++i) lb[n + i] = 0.0;
  std::vector<double> w(nv, 0.0);
  if (qp_box_eq_solve(nv, m, Pw.data(), fw.data(), E.data(), d,
                      lb.data(), ub.data(), rho, iters, tol, w.data()) != 0)
    return 1;

  // --- 2. Active-set polish. --------------------------------------------
  // The ADMM solve is already essentially exact (tol ~1e-11); its zero-slack
  // rows are a superset of the true active set.  Starting from that superset
  // a DROP-ONLY multiplier cleanup is monotone (no add/drop cycling, which a
  // textbook primal active-set loop exhibits on degenerate vertices).  If
  // the slack threshold was too tight and the polished x violates a missed
  // row, retry with a looser threshold.
  std::vector<double> x(n), lam_act;
  std::vector<double> neg_q(n), d_act;
  std::vector<int> act;
  bool ok = false;
  for (double s_tol = act_tol; s_tol < 1e-2 && !ok; s_tol *= 100.0) {
    act.clear();
    for (int i = 0; i < m; ++i)
      if (w[n + i] < s_tol) act.push_back(i);
    for (int pass = 0; pass <= m; ++pass) {
      filter_independent_rows(act, C, n);
      for (int i = 0; i < n; ++i) neg_q[i] = -q[i];
      d_act.resize(act.size());
      for (size_t r = 0; r < act.size(); ++r) d_act[r] = d[act[r]];
      if (!kkt_solve(n, P, C, act, neg_q.data(), d_act.data(), x, lam_act))
        return 1;
      int drop = -1;
      double most_neg = -1e-9;
      for (size_t r = 0; r < act.size(); ++r)
        if (lam_act[r] < most_neg) {
          most_neg = lam_act[r];
          drop = static_cast<int>(r);
        }
      if (drop < 0) break;
      act.erase(act.begin() + drop);
    }
    double most_viol = 0.0;
    for (int i = 0; i < m; ++i) {
      double ci = -d[i];
      for (int j = 0; j < n; ++j) ci += C[static_cast<size_t>(i) * n + j] * x[j];
      if (ci > most_viol) most_viol = ci;
    }
    ok = (most_viol <= 1e-6);
  }
  if (!ok) return 2;

  std::memcpy(x_out, x.data(), sizeof(double) * n);
  std::memset(lam_out, 0, sizeof(double) * m);
  for (size_t r = 0; r < act.size(); ++r) lam_out[act[r]] = lam_act[r];

  // --- 3. Tangent via the active-set KKT system. -------------------------
  // rhs_x = -(dP x + dq + dC_A' lam_A);  rhs_a = dd_A - dC_A x.
  std::vector<double> rhs_x(n, 0.0), rhs_a(act.size(), 0.0);
  for (int i = 0; i < n; ++i) {
    double v = dq[i];
    for (int j = 0; j < n; ++j) v += dP[static_cast<size_t>(i) * n + j] * x[j];
    rhs_x[i] = -v;
  }
  for (size_t r = 0; r < act.size(); ++r) {
    const int a = act[r];
    const double* dca = dC + static_cast<size_t>(a) * n;
    for (int i = 0; i < n; ++i) rhs_x[i] -= dca[i] * lam_act[r];
    double v = dd[a];
    for (int j = 0; j < n; ++j) v -= dca[j] * x[j];
    rhs_a[r] = v;
  }
  std::vector<double> dx(n), dlam;
  if (!kkt_solve(n, P, C, act, rhs_x.data(), rhs_a.data(), dx, dlam))
    return 1;
  std::memcpy(dx_out, dx.data(), sizeof(double) * n);
  return 0;
}
