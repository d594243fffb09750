// Block-tridiagonal KKT solver — independent C++ reference.
//
// Native-oracle counterpart of obca_tpu/solver/blocktri.py (the MUMPS
// role in the reference stack — SURVEY.md §2.2 C10): solves
//   [K_0 E_0            ] [x_0]   [r_0]
//   [E_0' K_1 E_1       ] [x_1] = [r_1]
//   [     ...           ] [...]   [...]
// by block elimination, with dense partial-pivoting LU for the stage
// blocks (unlike the TPU path, pivoting is cheap here, giving an
// independent, higher-stability reference for cross-validation).
//
// Build: make (produces liboracle.so, used from tests via ctypes).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Dense LU with partial pivoting; A is n x n row-major, overwritten.
// piv holds row swaps. Returns false on exact singularity.
bool lu_factor(double* A, int* piv, int n) {
  for (int k = 0; k < n; ++k) {
    int p = k;
    double best = std::fabs(A[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(A[i * n + k]);
      if (v > best) { best = v; p = i; }
    }
    if (best == 0.0) return false;
    piv[k] = p;
    if (p != k) {
      for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[p * n + j]);
    }
    const double d = A[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const double m = A[i * n + k] / d;
      A[i * n + k] = m;
      for (int j = k + 1; j < n; ++j) A[i * n + j] -= m * A[k * n + j];
    }
  }
  return true;
}

// Solve LU x = b for nrhs right-hand sides, B is n x nrhs row-major.
// NOTE: the stored multipliers are in *final* permuted row order (full
// rows are swapped during factorization), so ALL pivots must be applied
// to B before the triangular solves (LAPACK getrs order) — interleaving
// swaps with elimination silently corrupts heavily-pivoted systems.
void lu_solve(const double* LU, const int* piv, int n, double* B,
              int nrhs) {
  for (int k = 0; k < n; ++k) {
    if (piv[k] != k) {
      for (int j = 0; j < nrhs; ++j)
        std::swap(B[k * nrhs + j], B[piv[k] * nrhs + j]);
    }
  }
  for (int k = 0; k < n; ++k) {
    for (int i = k + 1; i < n; ++i) {
      const double m = LU[i * n + k];
      for (int j = 0; j < nrhs; ++j) B[i * nrhs + j] -= m * B[k * nrhs + j];
    }
  }
  for (int k = n - 1; k >= 0; --k) {
    const double d = LU[k * n + k];
    for (int j = 0; j < nrhs; ++j) {
      double v = B[k * nrhs + j];
      for (int i = k + 1; i < n; ++i) v -= LU[k * n + i] * B[i * nrhs + j];
      B[k * nrhs + j] = v / d;
    }
  }
}

// C := C - A^T * B   (A: n x m, B: n x p, C: m x p, row-major)
void gemm_tn_sub(const double* A, const double* B, double* C, int n,
                 int m, int p) {
  for (int k = 0; k < n; ++k)
    for (int i = 0; i < m; ++i) {
      const double a = A[k * m + i];
      if (a == 0.0) continue;
      for (int j = 0; j < p; ++j) C[i * p + j] -= a * B[k * p + j];
    }
}

}  // namespace

extern "C" {

// Solve the block-tridiagonal system.
//   S: number of stages; nz: block size
//   K: [S, nz, nz] diagonal blocks (row-major)
//   E: [S-1, nz, nz] upper off-diagonal blocks (T[k, k+1])
//   rhs: [S, nz]
//   x: [S, nz] output
// Returns 0 on success, k+1 if stage k's pivot failed.
int blocktri_solve(int S, int nz, const double* K, const double* E,
                   const double* rhs, double* x) {
  std::vector<double> Sfac((size_t)S * nz * nz);   // LU factors of S_k
  std::vector<int> piv((size_t)S * nz);
  std::vector<double> W((size_t)(S > 1 ? S - 1 : 0) * nz * nz);
  std::vector<double> y((size_t)S * nz);           // S_k^{-1} yhat_k

  // Forward elimination: S_k = K_k - E_{k-1}' S_{k-1}^{-1} E_{k-1}
  std::memcpy(Sfac.data(), K, sizeof(double) * nz * nz);
  if (!lu_factor(&Sfac[0], &piv[0], nz)) return 1;

  std::memcpy(&y[0], rhs, sizeof(double) * nz);
  lu_solve(&Sfac[0], &piv[0], nz, &y[0], 1);       // y_0

  for (int k = 1; k < S; ++k) {
    double* Wk = &W[(size_t)(k - 1) * nz * nz];
    const double* Ek = &E[(size_t)(k - 1) * nz * nz];
    std::memcpy(Wk, Ek, sizeof(double) * nz * nz);
    lu_solve(&Sfac[(size_t)(k - 1) * nz * nz], &piv[(size_t)(k - 1) * nz],
             nz, Wk, nz);                          // W_k = S_{k-1}^{-1} E
    double* Sk = &Sfac[(size_t)k * nz * nz];
    std::memcpy(Sk, &K[(size_t)k * nz * nz], sizeof(double) * nz * nz);
    gemm_tn_sub(Ek, Wk, Sk, nz, nz, nz);           // S_k -= E' W
    if (!lu_factor(Sk, &piv[(size_t)k * nz], nz)) return k + 1;

    // yhat_k = r_k - E' y_{k-1};  y_k = S_k^{-1} yhat_k
    double* yk = &y[(size_t)k * nz];
    std::memcpy(yk, &rhs[(size_t)k * nz], sizeof(double) * nz);
    gemm_tn_sub(Ek, &y[(size_t)(k - 1) * nz], yk, nz, nz, 1);
    lu_solve(Sk, &piv[(size_t)k * nz], nz, yk, 1);
  }

  // Back substitution: x_{S-1} = y_{S-1}; x_k = y_k - W_{k+1} x_{k+1}
  std::memcpy(&x[(size_t)(S - 1) * nz], &y[(size_t)(S - 1) * nz],
              sizeof(double) * nz);
  for (int k = S - 2; k >= 0; --k) {
    double* xk = &x[(size_t)k * nz];
    std::memcpy(xk, &y[(size_t)k * nz], sizeof(double) * nz);
    const double* Wn = &W[(size_t)k * nz * nz];
    const double* xn = &x[(size_t)(k + 1) * nz];
    for (int i = 0; i < nz; ++i) {
      double v = xk[i];
      for (int j = 0; j < nz; ++j) v -= Wn[i * nz + j] * xn[j];
      xk[i] = v;
    }
  }
  return 0;
}

}  // extern "C"
