// Minimal GSL special-function shim: real and complex dilogarithm.
// Own implementation (see ../README.md); API-compatible with
// <gsl/gsl_sf_dilog.h> for the subset the reference uses
// (nuSIprop.hpp:1098,1202,1375-1451, aux.hpp:92-165).
#ifndef NUSI_REFSHIM_GSL_SF_DILOG_H
#define NUSI_REFSHIM_GSL_SF_DILOG_H

#include <cmath>
#include <complex>

typedef struct {
  double val;
  double err;
} gsl_sf_result;

namespace nusi_refshim {

inline constexpr double kPi26 = 1.6449340668482264365;  // pi^2/6

// Bernoulli series for Li2(z) via w = -log1p(-z), valid for z in [-1, 0.5].
template <typename T>
inline T li2_bernoulli(T w) {
  static const double C[] = {
      0.02777777777777777778,    -0.0002777777777777777778,
      4.724111866969009826e-6,   -9.185773074661963551e-8,
      1.897886998897099907e-9,   -4.064761645144225527e-11,
      8.921691020456452555e-13,  -1.993929586072107569e-14,
      4.518980029619918192e-16,  -1.035651761218124701e-17,
      2.395218621026186746e-19,  -5.581785874325009336e-21,
      1.309150755418321286e-22,  -3.087419802426740293e-24,
      7.31597565270220342e-26,   -1.740845657234000741e-27,
      4.15763564461389972e-29,   -9.962148488284622103e-31,
      2.394034424896165301e-32,  -5.768347355367390084e-34};
  T w2 = w * w, s = T(0.0);
  for (int k = 19; k >= 0; --k) s = (s + C[k]) * w2;
  return w - w * w * 0.25 + s * w;
}

inline double li2_real(double x) {  // full real line; Re(Li2) for x > 1
  if (x < -1.0) {
    double lx = std::log(-x);
    return -kPi26 - 0.5 * lx * lx - li2_bernoulli(-std::log1p(-1.0 / x));
  }
  if (x <= 0.5) return li2_bernoulli(-std::log1p(-x));
  if (x <= 2.0) {
    if (x == 1.0) return kPi26;
    return kPi26 - std::log(x) * std::log(std::fabs(1.0 - x)) -
           li2_bernoulli(-std::log1p(-(1.0 - x)));
  }
  double lx = std::log(x);
  return 2.0 * kPi26 - 0.5 * lx * lx - li2_bernoulli(-std::log1p(-1.0 / x));
}

inline std::complex<double> li2_series_c(std::complex<double> z) {
  return li2_bernoulli(-std::log(1.0 - z));
}

// Complex Li2, GSL branch-cut convention: on the real axis above 1 the
// value is the limit from below, Im Li2(x - i0) = -pi ln x.
inline std::complex<double> li2_complex(std::complex<double> z) {
  using cd = std::complex<double>;
  double az = std::abs(z);
  if (az > 1.0) {
    cd zi = 1.0 / z;
    cd val = (zi.real() > 0.5)
                 ? kPi26 - std::log(zi) * std::log(1.0 - zi) -
                       li2_series_c(1.0 - zi)
                 : li2_series_c(zi);
    cd mz = (z.imag() == 0.0 && z.real() > 0.0)
                ? cd(-z.real(), 1e-300)  // cut: limit from below
                : -z;
    cd lnm = std::log(mz);
    return -kPi26 - 0.5 * lnm * lnm - val;
  }
  if (z.real() > 0.5)
    return kPi26 - std::log(z) * std::log(1.0 - z) - li2_series_c(1.0 - z);
  return li2_series_c(z);
}

}  // namespace nusi_refshim

inline double gsl_sf_dilog(const double x) {
  return nusi_refshim::li2_real(x);
}

inline int gsl_sf_dilog_e(const double x, gsl_sf_result* result) {
  result->val = nusi_refshim::li2_real(x);
  result->err = 1e-14 * std::fabs(result->val);
  return 0;
}

inline int gsl_sf_complex_dilog_xy_e(const double x, const double y,
                                     gsl_sf_result* result_re,
                                     gsl_sf_result* result_im) {
  std::complex<double> v =
      nusi_refshim::li2_complex(std::complex<double>(x, y));
  result_re->val = v.real();
  result_re->err = 1e-14 * std::fabs(v.real());
  result_im->val = v.imag();
  result_im->err = 1e-14 * std::fabs(v.imag());
  return 0;
}

#endif  // NUSI_REFSHIM_GSL_SF_DILOG_H
