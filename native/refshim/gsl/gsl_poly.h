// Minimal GSL polynomial shim: complex root finding for real-coefficient
// polynomials. Own implementation (Durand-Kerner with Newton polishing;
// see ../README.md). API-compatible with <gsl/gsl_poly.h> for the subset
// the reference uses (aux.hpp:34-46: the degree-4 neutrino-mass quartic).
#ifndef NUSI_REFSHIM_GSL_POLY_H
#define NUSI_REFSHIM_GSL_POLY_H

#include <cmath>
#include <complex>
#include <cstddef>

typedef struct {
  size_t n;  // number of coefficients the workspace was sized for
} gsl_poly_complex_workspace;

inline gsl_poly_complex_workspace* gsl_poly_complex_workspace_alloc(size_t n) {
  return new gsl_poly_complex_workspace{n};
}

inline void gsl_poly_complex_workspace_free(gsl_poly_complex_workspace* w) {
  delete w;
}

namespace nusi_refshim {

// Roots of a[0] + a[1] x + ... + a[n-1] x^{n-1} (degree n-1), real a.
// Durand-Kerner simultaneous iteration, then per-root Newton polish.
inline void poly_roots(const double* a, size_t n, std::complex<double>* r) {
  using cd = std::complex<double>;
  const size_t deg = n - 1;
  // Monic coefficients c[k] = a[k] / a[deg].
  double lead = a[deg];
  // Cauchy bound for the root radius keeps the start circle enclosing.
  double bound = 0.0;
  for (size_t k = 0; k < deg; ++k)
    bound = std::fmax(bound, std::fabs(a[k] / lead));
  bound += 1.0;
  // Start points: non-real, non-symmetric circle (standard DK seed).
  const cd seed(0.4, 0.9);
  cd p = cd(1.0, 0.0);
  for (size_t k = 0; k < deg; ++k) {
    p *= seed;
    r[k] = bound * p / std::abs(p) * (0.5 + 0.5 * double(k + 1) / double(deg));
  }
  auto eval = [&](cd x) {
    cd v = a[deg];
    for (size_t k = deg; k-- > 0;) v = v * x + a[k];
    return v;
  };
  for (int it = 0; it < 400; ++it) {
    double moved = 0.0;
    for (size_t k = 0; k < deg; ++k) {
      cd denom = lead;
      for (size_t j = 0; j < deg; ++j)
        if (j != k) denom *= (r[k] - r[j]);
      cd delta = eval(r[k]) / denom;
      r[k] -= delta;
      moved = std::fmax(moved, std::abs(delta));
    }
    if (moved < 1e-15 * bound) break;
  }
  // Newton polish (helps clustered roots; no-op for well-separated ones).
  auto deriv = [&](cd x) {
    cd v = double(deg) * a[deg];
    for (size_t k = deg; k-- > 1;) v = v * x + double(k) * a[k];
    return v;
  };
  for (size_t k = 0; k < deg; ++k) {
    for (int it = 0; it < 3; ++it) {
      cd d = deriv(r[k]);
      if (std::abs(d) == 0.0) break;
      r[k] -= eval(r[k]) / d;
    }
    // Snap numerically-real roots onto the axis (the caller gates on
    // Im < 1e-7, aux.hpp:40).
    if (std::fabs(r[k].imag()) < 1e-12 * std::fmax(1.0, std::fabs(r[k].real())))
      r[k] = std::complex<double>(r[k].real(), 0.0);
    // Snap numerically-zero real roots to a tiny POSITIVE value: the caller
    // gates on ml >= 0 (aux.hpp:40), and at the massless-spectrum boundary
    // (test.py's mntot = sqrt(dm21) + sqrt(dm31)) the true root is 0 with
    // the recovered value a ~1e-18 round-off artifact of arbitrary sign.
    // GSL's companion-QR solver returned a tiny positive root there (the
    // engine divides by each mass, so an exact 0 NaNs the flux while any
    // mn < ~1e-8 leaves it flat to >10 digits — see
    // nusiprop_tpu/models/masses.py MN_FLOOR notes); mirror that behavior.
    if (r[k].imag() == 0.0 && std::fabs(r[k].real()) < 1e-11 * bound)
      r[k] = std::complex<double>(1e-18, 0.0);
  }
}

}  // namespace nusi_refshim

// z is packed (re, im) pairs, length 2*(n-1).
inline int gsl_poly_complex_solve(const double* a, size_t n,
                                  gsl_poly_complex_workspace* /*w*/,
                                  double* z) {
  std::complex<double> roots[16];
  nusi_refshim::poly_roots(a, n, roots);
  for (size_t k = 0; k + 1 < n; ++k) {
    z[2 * k] = roots[k].real();
    z[2 * k + 1] = roots[k].imag();
  }
  return 0;
}

#endif  // NUSI_REFSHIM_GSL_POLY_H
