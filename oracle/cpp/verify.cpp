// Golden-file certifier — independent C++ feasibility check.
//
// Recomputes, from scratch (no JAX, no duals, no AD), the physical
// feasibility of a solved parking trajectory:
//   * kinematic-bicycle dynamics defects (midpoint Euler, the
//     discretization of SURVEY.md §2.1),
//   * boundary conditions,
//   * control/state bounds,
//   * geometric ego-obstacle clearance via the separating-axis test
//     on exact polygons (the reference's collision_check.jl role).
//
// This certifies oracle goldens independently of the solver that
// produced them: a self-consistent-but-wrong solver/constraint pair
// cannot pass.
//
// Exposed via C ABI for ctypes (liboracle.so).

#include <algorithm>
#include <cmath>
#include <cstdio>

namespace {

struct V2 { double x, y; };

// Max separating-axis gap between convex polygons P (np pts) and Q
// (nq pts) using both polygons' edge normals; positive = separated.
double sat_gap(const V2* P, int np, const V2* Q, int nq) {
  double best = -1e300;
  auto scan = [&](const V2* U, int nu, const V2* A, int na,
                  const V2* B, int nb) {
    for (int i = 0; i < nu; ++i) {
      const V2 p = U[i], q = U[(i + 1) % nu];
      double ax = q.y - p.y, ay = p.x - q.x;  // edge normal
      const double nrm = std::sqrt(ax * ax + ay * ay);
      if (nrm < 1e-12) continue;
      ax /= nrm; ay /= nrm;
      double amin = 1e300, amax = -1e300, bmin = 1e300, bmax = -1e300;
      for (int j = 0; j < na; ++j) {
        const double v = ax * A[j].x + ay * A[j].y;
        amin = std::min(amin, v); amax = std::max(amax, v);
      }
      for (int j = 0; j < nb; ++j) {
        const double v = ax * B[j].x + ay * B[j].y;
        bmin = std::min(bmin, v); bmax = std::max(bmax, v);
      }
      best = std::max(best, std::max(bmin - amax, amin - bmax));
    }
  };
  scan(P, np, P, np, Q, nq);
  scan(Q, nq, P, np, Q, nq);
  return best;
}

}  // namespace

extern "C" {

// Verify a trajectory.  Arrays row-major:
//   X [N+1, 4], U [N, 2], obs_verts [M, V, 2], obs_nverts [M]
//   ego_g = (front, rear, half_w, half_w)
// Outputs (len-6 array `out`):
//   out[0] max |dynamics defect|
//   out[1] max boundary-condition error (x0 and xF)
//   out[2] max control-bound violation
//   out[3] max speed-bound violation
//   out[4] min geometric clearance over all (stage, obstacle)
//   out[5] max XY-bound violation
// Returns 0.
int verify_trajectory(
    int N, double Ts, double wheelbase, const double* ego_g,
    const double* X, const double* U,
    const double* x0, const double* xF,
    const double* u_lo, const double* u_hi, double v_lo, double v_hi,
    const double* xy_lo, const double* xy_hi,
    int M, int Vmax, const double* obs_verts, const int* obs_nverts,
    double* out) {
  double max_dyn = 0.0, max_bc = 0.0, max_ub = 0.0, max_vb = 0.0,
         max_xyb = 0.0;
  double min_clear = 1e300;

  // Dynamics defects (midpoint-velocity Euler; SURVEY.md §2.1).
  for (int k = 0; k < N; ++k) {
    const double* xk = &X[k * 4];
    const double* xn = &X[(k + 1) * 4];
    const double d = U[k * 2 + 0], a = U[k * 2 + 1];
    const double h = Ts;  // tau = 1 (fixed-time goldens)
    const double kap = std::tan(d) / wheelbase;
    const double vmid = xk[3] + 0.5 * h * a;
    const double psimid = xk[2] + 0.5 * h * xk[3] * kap;
    const double fx[4] = {
        xk[0] + h * vmid * std::cos(psimid),
        xk[1] + h * vmid * std::sin(psimid),
        xk[2] + h * vmid * kap,
        xk[3] + h * a,
    };
    for (int i = 0; i < 4; ++i)
      max_dyn = std::max(max_dyn, std::fabs(xn[i] - fx[i]));
  }

  for (int i = 0; i < 4; ++i) {
    max_bc = std::max(max_bc, std::fabs(X[i] - x0[i]));
    max_bc = std::max(max_bc, std::fabs(X[N * 4 + i] - xF[i]));
  }

  for (int k = 0; k < N; ++k)
    for (int i = 0; i < 2; ++i) {
      max_ub = std::max(max_ub, U[k * 2 + i] - u_hi[i]);
      max_ub = std::max(max_ub, u_lo[i] - U[k * 2 + i]);
    }
  for (int k = 0; k <= N; ++k) {
    max_vb = std::max(max_vb, X[k * 4 + 3] - v_hi);
    max_vb = std::max(max_vb, v_lo - X[k * 4 + 3]);
    for (int i = 0; i < 2; ++i) {
      max_xyb = std::max(max_xyb, X[k * 4 + i] - xy_hi[i]);
      max_xyb = std::max(max_xyb, xy_lo[i] - X[k * 4 + i]);
    }
  }

  const double front = ego_g[0], rear = ego_g[1], wl = ego_g[2],
               wr = ego_g[3];
  for (int k = 0; k <= N; ++k) {
    const double px = X[k * 4 + 0], py = X[k * 4 + 1],
                 psi = X[k * 4 + 2];
    const double c = std::cos(psi), s = std::sin(psi);
    const V2 body[4] = {
        {front, wl}, {front, -wr}, {-rear, -wr}, {-rear, wl}};
    V2 ego[4];
    for (int i = 0; i < 4; ++i) {
      ego[i].x = px + c * body[i].x - s * body[i].y;
      ego[i].y = py + s * body[i].x + c * body[i].y;
    }
    for (int m = 0; m < M; ++m) {
      const int nv = obs_nverts[m];
      if (nv < 3) continue;
      const V2* ov = reinterpret_cast<const V2*>(
          &obs_verts[(size_t)m * Vmax * 2]);
      min_clear = std::min(min_clear, sat_gap(ego, 4, ov, nv));
    }
  }

  out[0] = max_dyn;
  out[1] = max_bc;
  out[2] = std::max(0.0, max_ub);
  out[3] = std::max(0.0, max_vb);
  out[4] = min_clear;
  out[5] = std::max(0.0, max_xyb);
  return 0;
}

}  // extern "C"
