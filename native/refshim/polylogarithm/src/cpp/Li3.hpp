// Shim for the reference's vendored `polylogarithm` submodule (empty in the
// snapshot): real trilogarithm, own implementation (see ../../../../README.md;
// same region decomposition as native/nusi_engine.hpp li3 / ops/specfun.li3,
// mpmath-oracled in tests/test_specfun.py). The reference calls
// polylogarithm::Li3 from its DSNB source model (nuSIprop.hpp:634-637)
// with arguments in (-inf, 0].
#ifndef NUSI_REFSHIM_POLYLOG_LI3_HPP
#define NUSI_REFSHIM_POLYLOG_LI3_HPP

#include <cmath>

namespace polylogarithm {
namespace detail {

inline constexpr double kPi26_3 = 1.6449340668482264365;   // pi^2/6
inline constexpr double kZeta3 = 1.2020569031595942854;    // zeta(3)

inline double li3_power(double x) {  // |x| <= 0.6
  double s = 0.0;
  for (int k = 80; k >= 1; --k) s = s * x + 1.0 / double(k * k * k);
  return s * x;
}

inline double li3_log_expansion(double x) {  // x in (0.4, 1]
  // Li3(e^w) = z3 + z2 w + w^2/2 (3/2 - ln(-w)) + sum zeta(3-k)/k! w^k
  static const double C[] = {
      -0.08333333333333333333, -0.003472222222222222222,
      0.0,                     1.157407407407407407e-5,
      0.0,                     -9.841899722852103804e-8,
      0.0,                     1.148221634332745444e-9,
      0.0,                     -1.581572499080916589e-11,
      0.0,                     2.419500979252515195e-13,
      0.0,                     -3.982897776989487748e-15,
      0.0,                     6.923366618305929058e-17,
      0.0,                     -1.255272230449977275e-18,
      0.0,                     2.353754002768465231e-20,
      0.0,                     -4.536398903458687018e-22,
      0.0,                     8.945169670392643167e-24};
  double w = std::log(x);
  if (w == 0.0) return kZeta3;
  double s = 0.0;
  for (int k = 23; k >= 0; --k) s = s * w + C[k];
  s = s * w * w * w;
  return kZeta3 + kPi26_3 * w + 0.5 * w * w * (1.5 - std::log(-w)) + s;
}

inline double li3_01(double x) {  // [0, 1]
  return (x > 0.6) ? li3_log_expansion(x) : li3_power(x);
}

}  // namespace detail

inline double Li3(double x) {  // real Li3, x <= 1
  using namespace detail;
  if (x < -1.0) {
    double lnx = std::log(-x);
    double core = 0.25 * li3_01(1.0 / (x * x)) - li3_01(-1.0 / x);
    return core - kPi26_3 * lnx - lnx * lnx * lnx / 6.0;
  }
  if (x >= 0.0) return li3_01(x);
  if (x >= -0.5) return li3_power(x);
  return 0.25 * li3_01(x * x) - li3_01(-x);
}

}  // namespace polylogarithm

#endif  // NUSI_REFSHIM_POLYLOG_LI3_HPP
