// Native geometry kernels for the per-cycle host hot path.
//
// TPU-native equivalent of the reference's C++ runtime geometry: the
// ros_tools Spline2D fit + closest-point search (consumed at
// contouring.cpp:28-48), the Douglas-Rachford collision projection
// (linearized_constraints.cpp:130-148), and the decomp_util-style
// free-space polytope construction (decomp_constraints.cpp:62-118).
// Exposed as a C ABI consumed through ctypes (mpc_planner_tpu/native).
//
// Everything operates on plain double arrays; no dependencies beyond the
// C++17 standard library.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Natural cubic spline through (t_i, y_i), i = 0..n-1.
// coeffs_out: (n-1) rows of (a, b, c, d) with
//   y(s) = a u^3 + b u^2 + c u + d, u = s - t_i.
// Returns 0 on success.
int fit_natural_cubic(const double* t, const double* y, int64_t n,
                      double* coeffs_out) {
  if (n < 2) return 1;
  if (n == 2) {
    double h = t[1] - t[0];
    if (h <= 0) return 2;
    coeffs_out[0] = 0.0;
    coeffs_out[1] = 0.0;
    coeffs_out[2] = (y[1] - y[0]) / h;
    coeffs_out[3] = y[0];
    return 0;
  }
  std::vector<double> h(n - 1);
  for (int64_t i = 0; i + 1 < n; ++i) {
    h[i] = t[i + 1] - t[i];
    if (h[i] <= 0) return 2;
  }
  // Tridiagonal solve for interior second derivatives (Thomas algorithm)
  int64_t m = n - 2;
  std::vector<double> diag(m), rhs(m), upper(m);
  for (int64_t i = 0; i < m; ++i) {
    diag[i] = 2.0 * (h[i] + h[i + 1]);
    rhs[i] = 6.0 * ((y[i + 2] - y[i + 1]) / h[i + 1] - (y[i + 1] - y[i]) / h[i]);
    upper[i] = h[i + 1];
  }
  for (int64_t i = 1; i < m; ++i) {
    double w = h[i] / diag[i - 1];
    diag[i] -= w * upper[i - 1];
    rhs[i] -= w * rhs[i - 1];
  }
  std::vector<double> M(n, 0.0);
  M[m] = rhs[m - 1] / diag[m - 1];
  for (int64_t i = m - 2; i >= 0; --i)
    M[i + 1] = (rhs[i] - upper[i] * M[i + 2]) / diag[i];

  for (int64_t i = 0; i + 1 < n; ++i) {
    double* c = coeffs_out + 4 * i;
    c[0] = (M[i + 1] - M[i]) / (6.0 * h[i]);
    c[1] = M[i] / 2.0;
    c[2] = (y[i + 1] - y[i]) / h[i] - h[i] * (2.0 * M[i] + M[i + 1]) / 6.0;
    c[3] = y[i];
  }
  return 0;
}

static inline int64_t find_segment(const double* knots, int64_t n_seg, double s) {
  // knots has n_seg + 1 entries; return segment index clamped.
  int64_t lo = 0, hi = n_seg;  // search in knots[0..n_seg]
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (knots[mid] <= s)
      lo = mid + 1;
    else
      hi = mid;
  }
  int64_t idx = lo - 1;
  if (idx < 0) idx = 0;
  if (idx >= n_seg) idx = n_seg - 1;
  return idx;
}

static inline void eval_spline(const double* coeffs, const double* knots,
                               int64_t n_seg, double s, double* v, double* dv,
                               double* ddv) {
  int64_t i = find_segment(knots, n_seg, s);
  const double* c = coeffs + 4 * i;
  double u = s - knots[i];
  *v = ((c[0] * u + c[1]) * u + c[2]) * u + c[3];
  *dv = (3.0 * c[0] * u + 2.0 * c[1]) * u + c[2];
  *ddv = 6.0 * c[0] * u + 2.0 * c[1];
}

// Closest point on a 2D path spline (coeffs_x/coeffs_y over shared knots).
// Coarse sampling over [lo, hi] followed by Newton refinement
// (ros_tools Spline2D::findClosestPoint equivalent).
double closest_point(const double* coeffs_x, const double* coeffs_y,
                     const double* knots, int64_t n_seg, double px, double py,
                     double lo, double hi, int64_t samples) {
  if (samples < 2) samples = 2;
  double best_s = lo, best_d = 1e300;
  for (int64_t i = 0; i < samples; ++i) {
    double s = lo + (hi - lo) * (double)i / (double)(samples - 1);
    double x, y, dx_, dy_, ddx_, ddy_;
    eval_spline(coeffs_x, knots, n_seg, s, &x, &dx_, &ddx_);
    eval_spline(coeffs_y, knots, n_seg, s, &y, &dy_, &ddy_);
    double d = (x - px) * (x - px) + (y - py) * (y - py);
    if (d < best_d) {
      best_d = d;
      best_s = s;
    }
  }
  double s = best_s;
  double s_min = knots[0], s_max = knots[n_seg];
  for (int it = 0; it < 10; ++it) {
    double x, y, dx, dy, ddx, ddy;
    eval_spline(coeffs_x, knots, n_seg, s, &x, &dx, &ddx);
    eval_spline(coeffs_y, knots, n_seg, s, &y, &dy, &ddy);
    double ex = x - px, ey = y - py;
    double g = 2.0 * (ex * dx + ey * dy);
    double hss = 2.0 * (dx * dx + dy * dy + ex * ddx + ey * ddy);
    if (std::fabs(hss) < 1e-12) break;
    double step = g / hss;
    s -= step;
    if (s < s_min) s = s_min;
    if (s > s_max) s = s_max;
    if (std::fabs(step) < 1e-10) break;
  }
  return s;
}

// Douglas-Rachford-style projection of trajectory points out of obstacle
// discs (linearized_constraints.cpp:130-148): for each of n_points
// (in-place), at most `iters` sweeps over all obstacles.
// points: [n_points, 2]; obstacles: [n_obs, 2] per point-step?  No —
// obstacle positions per point are passed as [n_points, n_obs, 2]
// (per-stage predictions), radii as [n_obs].
void dr_project(double* points, int64_t n_points, const double* obstacles,
                const double* radii, int64_t n_obs, int iters) {
  for (int64_t p = 0; p < n_points; ++p) {
    double* pt = points + 2 * p;
    const double* obs_p = obstacles + 2 * n_obs * p;
    for (int it = 0; it < iters; ++it) {
      bool any = false;
      for (int64_t o = 0; o < n_obs; ++o) {
        double ox = obs_p[2 * o], oy = obs_p[2 * o + 1];
        double dx = pt[0] - ox, dy = pt[1] - oy;
        double dist = std::sqrt(dx * dx + dy * dy);
        double r = radii[o];
        if (dist < r) {
          any = true;
          if (dist < 1e-9) {
            // Degenerate: push toward the first obstacle's anchor direction
            double ax = pt[0] - obs_p[0], ay = pt[1] - obs_p[1];
            double an = std::sqrt(ax * ax + ay * ay);
            if (an < 1e-9) {
              ax = 1.0;
              ay = 0.0;
              an = 1.0;
            }
            pt[0] = ox + ax / an * r;
            pt[1] = oy + ay / an * r;
          } else {
            pt[0] = ox + dx / dist * r;
            pt[1] = oy + dy / dist * r;
          }
        }
      }
      if (!any) break;
    }
  }
}

// Free-space polytope: iterative nearest-occupied-point cuts
// (decomp_constraints.cpp:62-118 capability). rows_out: [max_constraints, 3]
// rows (a1, a2, b) meaning a.x <= b; unused rows are inactive (x <= 1e6).
void free_polytope(double seed_x, double seed_y, const double* points,
                   int64_t n_points, int64_t max_constraints, double radius,
                   double* rows_out) {
  for (int64_t c = 0; c < max_constraints; ++c) {
    rows_out[3 * c] = 1.0;
    rows_out[3 * c + 1] = 0.0;
    rows_out[3 * c + 2] = 1e6;
  }
  std::vector<double> px(points, points + 2 * n_points);
  std::vector<char> alive(n_points, 1);
  int64_t remaining = n_points;
  for (int64_t c = 0; c < max_constraints && remaining > 0; ++c) {
    // nearest alive point
    int64_t best = -1;
    double best_d = 1e300;
    for (int64_t i = 0; i < n_points; ++i) {
      if (!alive[i]) continue;
      double dx = px[2 * i] - seed_x, dy = px[2 * i + 1] - seed_y;
      double d = dx * dx + dy * dy;
      if (d < best_d) {
        best_d = d;
        best = i;
      }
    }
    if (best < 0) break;
    double dx = px[2 * best] - seed_x, dy = px[2 * best + 1] - seed_y;
    double d = std::sqrt(best_d);
    if (d < 1e-9) d = 1e-9;  // matches the Python fallback semantics
    double a1 = dx / d, a2 = dy / d;
    double cutx = px[2 * best] - a1 * radius;
    double cuty = px[2 * best + 1] - a2 * radius;
    double b = a1 * cutx + a2 * cuty;
    if (a1 * seed_x + a2 * seed_y - b > 0) {
      // Seed itself infeasible for this cut: drop the point and leave the
      // row inactive (consumes the slot, matching the Python fallback).
      alive[best] = 0;
      --remaining;
      continue;
    }
    rows_out[3 * c] = a1;
    rows_out[3 * c + 1] = a2;
    rows_out[3 * c + 2] = b;
    // prune points excluded by the cut
    for (int64_t i = 0; i < n_points; ++i) {
      if (!alive[i]) continue;
      if (px[2 * i] * a1 + px[2 * i + 1] * a2 - b >= radius || i == best) {
        alive[i] = 0;
        --remaining;
      }
    }
  }
}

}  // extern "C"
