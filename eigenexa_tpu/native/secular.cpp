// Native batched rank-1 secular merge core (DLAED4-equivalent).
//
// The TPU-native framework's analogue of the reference's D&C scalar core:
// DLAED4 secular root finding + deflation + Gu-Eisenstat z recomputation
// (reference: FS_PDLAED2.F90:123 deflation, FS_PDLAED3.F90:281,700,795
// DLAED4 calls; ScaLAPACK-derived originals mx_pdlaed2/3.F).  The host
// orchestrated D&C path (solvers/dc_host.py) runs the O(m^2) secular math
// here in true IEEE double and ships only the O(m^3) eigenvector GEMM
// cascade to the device MXU -- the same scalar-core/GEMM split the
// reference makes between DLAED4 and DGEMM.
//
// Semantics mirror dc_host.merge_core_np exactly (the test suite asserts
// parity to f64 roundoff):  eigendecomposition of diag(d) + rho*z*z^T,
// rows of the returned basis C are scattered back to the pre-sort
// coordinate order (ready for the block-diagonal GEMM).
//
// Per-root "middle way" iteration (two adjacent poles exact, remaining
// sums collapsed to one matched pole each, quadratic solved) with
// bracket safeguards and early convergence exit -- the fixed-point
// structure of LAPACK dlaed4 without its branch forest.
//
// Build: g++ -O3 -fopenmp -shared -fPIC -std=c++17 secular.cpp -o libsecular.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double TINY = 1e-30;
constexpr double EPS = 2.2204460492503131e-16;

struct Work {
  std::vector<int> perm, leaders, aidx;
  std::vector<double> ds, zs, zr, uhat, da, za, shift, mu, zh, lam;
  std::vector<int> order;
  void resize(int m) {
    perm.resize(m); leaders.resize(m); aidx.resize(m);
    ds.resize(m); zs.resize(m); zr.resize(m); uhat.resize(m);
    da.resize(m); za.resize(m); shift.resize(m); mu.resize(m);
    zh.resize(m); lam.resize(m); order.resize(m);
  }
};

// ---- deflation: per-run Householder rotation concentrating each run's
// z-weight into its leader (dlaed2 close-eigenvalue deflation) ----------
void rotate_runs(const double* ds, const double* zs, int m, double tol,
                 double* z_new, double* u_hat, int* leaders) {
  int lead = 0;
  for (int j = 0; j < m; ++j) {
    if (j > 0 && (ds[j] - ds[j - 1]) > tol) lead = j;
    leaders[j] = lead;
  }
  // per-run norm and size
  for (int j = 0; j < m; ++j) { z_new[j] = zs[j]; u_hat[j] = 0.0; }
  int j = 0;
  while (j < m) {
    int k = j;
    while (k < m && leaders[k] == j) ++k;   // run = [j, k)
    int size = k - j;
    if (size > 1) {
      double n2 = 0.0;
      for (int t = j; t < k; ++t) n2 += zs[t] * zs[t];
      double norm = std::sqrt(n2);
      double sgn = (zs[j] >= 0.0) ? 1.0 : -1.0;
      // u = z + sgn*norm*e_leader, normalized
      double umax = 0.0;
      for (int t = j; t < k; ++t) {
        double u = zs[t] + ((t == j) ? sgn * norm : 0.0);
        u_hat[t] = u;
        umax = std::max(umax, std::fabs(u));
      }
      if (umax > 0.0) {
        double un2 = 0.0;
        for (int t = j; t < k; ++t) { u_hat[t] /= umax; un2 += u_hat[t] * u_hat[t]; }
        double inv = 1.0 / std::sqrt(un2 > 0.0 ? un2 : 1.0);
        for (int t = j; t < k; ++t) u_hat[t] *= inv;
      }
      for (int t = j; t < k; ++t) z_new[t] = 0.0;
      z_new[j] = -sgn * norm;
    }
    j = k;
  }
}

// ---- secular root i of 1 + rho*sum za^2/(da - lam) on compact set -----
// returns (shift, mu); da strictly increasing, all za != 0
void secular_root(const double* da, const double* z2, int k, double rho,
                  double sumz2, int i, int n_iter,
                  double* shift_out, double* mu_out) {
  double a = da[i];
  bool has_next = (i + 1) < k;
  double slack = std::max(rho * sumz2, TINY);
  double b = has_next ? da[i + 1] : da[k - 1] + rho * sumz2 + slack;

  // f at midpoint decides which pole to shift at
  double mid = 0.5 * (a + b);
  double f_mid = 1.0;
  for (int j = 0; j < k; ++j) {
    double delta = da[j] - mid;
    if (delta != 0.0) f_mid += rho * z2[j] / delta;
  }
  bool take_lo = (f_mid >= 0.0) || !has_next;
  double shift = take_lo ? a : b;
  double lo, hi;
  if (take_lo) {
    if (f_mid >= 0.0) { lo = 0.0; hi = mid - a; }
    else { lo = 0.0; hi = b - a; }   // forced take_lo (last root)
  } else { lo = mid - b; hi = 0.0; }

  double p1 = a - shift;
  double p2 = has_next ? da[i + 1] - shift : 2.0 * (b - shift);

  double mu = 0.5 * (lo + hi);
  for (int it = 0; it < n_iter; ++it) {
    // psi (poles j <= i), phi (poles j > i), and derivatives at mu
    double psi = 0.0, psip = 0.0, phi = 0.0, phip = 0.0;
    for (int j = 0; j < k; ++j) {
      double delta = (da[j] - shift) - mu;
      double inv = (std::fabs(delta) > TINY)
          ? 1.0 / delta : ((delta >= 0.0) ? 1.0 / TINY : -1.0 / TINY);
      double t = z2[j] * inv;
      double t2 = t * inv;
      if (j <= i) { psi += t; psip += t2; } else { phi += t; phip += t2; }
    }
    psi *= rho; psip *= rho; phi *= rho; phip *= rho;
    double f = 1.0 + psi + phi;
    double fp = psip + phip;
    bool root_above = (f < 0.0);
    if (root_above) lo = mu; else hi = mu;

    // converged?
    double scale_f = 1.0 + std::fabs(psi) + std::fabs(phi);
    if (std::fabs(f) <= 16.0 * EPS * k * scale_f) break;

    double g1 = p1 - mu, g2 = p2 - mu;
    double s_w = psip * g1 * g1;
    double c1 = psi - psip * g1;
    double s_u = has_next ? phip * g2 * g2 : 0.0;
    double c2 = phi - phip * g2;
    double c = 1.0 + c1 + c2;
    double bq = c * (p1 + p2) + s_w + s_u;
    double cq = c * p1 * p2 + s_w * p2 + s_u * p1;
    double disc = bq * bq - 4.0 * c * cq;
    double cand;
    bool ok = false;
    if (disc >= 0.0) {
      double sq = std::sqrt(disc);
      double sgn_b = (bq >= 0.0) ? 1.0 : -1.0;
      double denom = bq + sgn_b * sq;
      double r2 = (std::fabs(denom) > TINY) ? 2.0 * cq / denom : INFINITY;
      double r1 = (std::fabs(c) > TINY) ? denom / (2.0 * c) : INFINITY;
      if (std::isfinite(r2) && r2 > lo && r2 < hi) { cand = r2; ok = true; }
      else if (std::isfinite(r1) && r1 > lo && r1 < hi) { cand = r1; ok = true; }
    }
    if (!ok) {
      double newton = mu - f / (fp > 0.0 ? fp : 1.0);
      cand = newton;
      if (!std::isfinite(cand)) cand = 0.5 * (lo + hi);
    }
    if (cand <= lo) cand = 0.5 * (mu + lo);
    if (cand >= hi) cand = 0.5 * (mu + hi);
    double step = std::fabs(cand - mu);
    mu = cand;
    if (step <= 4.0 * EPS * (std::fabs(shift) + std::fabs(mu))) break;
  }
  *shift_out = shift;
  *mu_out = mu;
}

// ---- one merge problem -------------------------------------------------
void merge_one(const double* d, const double* z, double rho, int m,
               int n_iter, double* lam_out, double* c_out, Work& wk) {
  wk.resize(m);
  int* perm = wk.perm.data();
  std::iota(perm, perm + m, 0);
  std::stable_sort(perm, perm + m,
                   [&](int x, int y) { return d[x] < d[y]; });
  double* ds = wk.ds.data();
  double* zs = wk.zs.data();
  double dmax = 0.0, zmax = 0.0;
  for (int j = 0; j < m; ++j) {
    ds[j] = d[perm[j]];
    zs[j] = z[perm[j]];
    dmax = std::max(dmax, std::fabs(ds[j]));
    zmax = std::max(zmax, std::fabs(zs[j]));
  }
  double scale = std::max(std::max(dmax, rho * zmax * zmax), TINY);
  double tol = 8.0 * EPS * scale;

  // C starts as identity in sorted coords; work in row-major (m, m):
  // c_work[j*m + i] = entry (row=coord j, col=eigpair i)
  std::memset(c_out, 0, sizeof(double) * (size_t)m * m);

  if (rho * zmax <= tol) {
    // fully deflated: lam = sorted d, C = perm scatter
    for (int j = 0; j < m; ++j) {
      lam_out[j] = ds[j];
      c_out[(size_t)perm[j] * m + j] = 1.0;
    }
    return;
  }

  double* zr = wk.zr.data();
  double* uhat = wk.uhat.data();
  int* leaders = wk.leaders.data();
  rotate_runs(ds, zs, m, tol, zr, uhat, leaders);

  int* aidx = wk.aidx.data();
  int k = 0;
  for (int j = 0; j < m; ++j)
    if (rho * std::fabs(zr[j]) > tol) aidx[k++] = j;

  double* lam = wk.lam.data();
  for (int j = 0; j < m; ++j) lam[j] = ds[j];

  // temporary dense C in sorted coords (row j, col i)
  std::vector<double> cw((size_t)m * m, 0.0);
  for (int j = 0; j < m; ++j) cw[(size_t)j * m + j] = 1.0;

  if (k > 0) {
    double* da = wk.da.data();
    double* za = wk.za.data();
    double sumz2 = 0.0;
    for (int t = 0; t < k; ++t) {
      da[t] = ds[aidx[t]];
      za[t] = zr[aidx[t]];
      sumz2 += za[t] * za[t];
    }
    std::vector<double> z2(k);
    for (int t = 0; t < k; ++t) z2[t] = za[t] * za[t];

    double* shift = wk.shift.data();
    double* mu = wk.mu.data();
    // inner parallelism engages only when merge_one runs outside an
    // active OpenMP region (the bsz==1 top-of-tree merge — where all the
    // time goes); nested regions serialize automatically otherwise
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 16)
#endif
    for (int i = 0; i < k; ++i)
      secular_root(da, z2.data(), k, rho, sumz2, i, n_iter,
                   &shift[i], &mu[i]);

    // Gu-Eisenstat zhat: paired ratio product (O(k^2))
    double* zh = wk.zh.data();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int j = 0; j < k; ++j) {
      double prod = 1.0;
      for (int i = 0; i < k; ++i) {
        if (i == j) continue;
        // lam_i - d_j = (shift_i - d_j) + mu_i, cancellation-free
        prod *= ((shift[i] - da[j]) + mu[i]) / (da[i] - da[j]);
      }
      double diag_term = (shift[j] - da[j]) + mu[j];   // lam_j - d_j
      double z2h = diag_term * prod / std::max(rho, TINY);
      double val = std::sqrt(std::max(z2h, 0.0));
      zh[j] = (za[j] >= 0.0) ? val : -val;
    }

    // numerically-on-pole demotion (see ops/secular.rank1_merge_core):
    // mu below the 1/delta guard, or a dead zhat at the root's dominant
    // coordinate (self when the shift is at its own pole, next-active
    // when the root clings to the upper pole), means the secular column
    // formula loses its dominant entry and builds a garbage direction -
    // the correct vector is the unit column at that dominant pole.
    std::vector<char> onp(k, 0);
    std::vector<int> dom(k, 0);
    for (int i = 0; i < k; ++i) {
      int dm_i = (shift[i] == da[i]) ? i : std::min(i + 1, k - 1);
      dom[i] = dm_i;
      if (zh[dm_i] == 0.0 || std::fabs(mu[i]) <= TINY) onp[i] = 1;
    }

    // eigenvector columns on the active set — two row-major passes so
    // writes stay cache-friendly (pass 1: column norms; pass 2: fill)
    std::vector<double> nrm2(k, 0.0);
#ifdef _OPENMP
#pragma omp parallel
    {
      std::vector<double> local(k, 0.0);
#pragma omp for schedule(static) nowait
      for (int j = 0; j < k; ++j) {
        double zj = zh[j];
        for (int i = 0; i < k; ++i) {
          double delta = (da[j] - shift[i]) - mu[i];
          double inv = (std::fabs(delta) > TINY)
              ? 1.0 / delta : ((delta >= 0.0) ? 1.0 / TINY : -1.0 / TINY);
          double u = zj * inv;
          local[i] += u * u;
        }
      }
#pragma omp critical
      for (int i = 0; i < k; ++i) nrm2[i] += local[i];
    }
#else
    for (int j = 0; j < k; ++j) {
      double zj = zh[j];
      for (int i = 0; i < k; ++i) {
        double delta = (da[j] - shift[i]) - mu[i];
        double inv = (std::fabs(delta) > TINY)
            ? 1.0 / delta : ((delta >= 0.0) ? 1.0 / TINY : -1.0 / TINY);
        double u = zj * inv;
        nrm2[i] += u * u;
      }
    }
#endif
    std::vector<double> inv_n(k);
    for (int i = 0; i < k; ++i)
      inv_n[i] = 1.0 / std::sqrt(nrm2[i] > 0.0 ? nrm2[i] : 1.0);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int j = 0; j < k; ++j) {
      double zj = zh[j];
      double* row = &cw[(size_t)aidx[j] * m];
      for (int i = 0; i < k; ++i) {
        if (onp[i]) {
          row[aidx[i]] = (dom[i] == j) ? 1.0 : 0.0;
          continue;
        }
        double delta = (da[j] - shift[i]) - mu[i];
        double inv = (std::fabs(delta) > TINY)
            ? 1.0 / delta : ((delta >= 0.0) ? 1.0 / TINY : -1.0 / TINY);
        row[aidx[i]] = zj * inv * inv_n[i];
      }
    }
    for (int i = 0; i < k; ++i) lam[aidx[i]] = shift[i] + mu[i];
  }

  // undo the run rotation on the left: C <- G*C, G = I - 2*sum u_r u_r^T
  {
    int j = 0;
    while (j < m) {
      int e = j;
      while (e < m && leaders[e] == j) ++e;
      if (e - j > 1) {
        // s_row = sum_{t in run} uhat[t] * C[t, :]
        std::vector<double> s_row(m, 0.0);
        for (int t = j; t < e; ++t) {
          double u = uhat[t];
          if (u == 0.0) continue;
          const double* row = &cw[(size_t)t * m];
          for (int i = 0; i < m; ++i) s_row[i] += u * row[i];
        }
        for (int t = j; t < e; ++t) {
          double u = 2.0 * uhat[t];
          if (u == 0.0) continue;
          double* row = &cw[(size_t)t * m];
          for (int i = 0; i < m; ++i) row[i] -= u * s_row[i];
        }
      }
      j = e;
    }
  }

  // sort eigenvalues ascending (stable), permute columns, scatter rows
  int* order = wk.order.data();
  std::iota(order, order + m, 0);
  std::stable_sort(order, order + m,
                   [&](int x, int y) { return lam[x] < lam[y]; });
  for (int i = 0; i < m; ++i) lam_out[i] = lam[order[i]];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int j = 0; j < m; ++j) {
    const double* src = &cw[(size_t)j * m];
    double* dst = &c_out[(size_t)perm[j] * m];
    for (int i = 0; i < m; ++i) dst[i] = src[order[i]];
  }
}

}  // namespace

extern "C" {

// d, z: (bsz, m); rho: (bsz,); lam_out: (bsz, m); c_out: (bsz, m, m)
// rows of c_out are in PRE-SORT coordinate order (merge_batch_np contract)
void eigenexa_secular_merge_batch(const double* d, const double* z,
                                  const double* rho, int64_t bsz, int64_t m,
                                  int n_iter, double* lam_out,
                                  double* c_out) {
#ifdef _OPENMP
  if (bsz >= omp_get_max_threads()) {
#pragma omp parallel
    {
      Work wk;
#pragma omp for schedule(dynamic)
      for (int64_t b = 0; b < bsz; ++b)
        merge_one(d + b * m, z + b * m, rho[b], (int)m, n_iter,
                  lam_out + b * m, c_out + b * m * m, wk);
    }
    return;
  }
#endif
  // few large merges (top of the tree): run serially here so the O(k^2)
  // inner loops of merge_one parallelize instead
  Work wk;
  for (int64_t b = 0; b < bsz; ++b)
    merge_one(d + b * m, z + b * m, rho[b], (int)m, n_iter,
              lam_out + b * m, c_out + b * m * m, wk);
}

int eigenexa_native_version() { return 1; }

}  // extern "C"
