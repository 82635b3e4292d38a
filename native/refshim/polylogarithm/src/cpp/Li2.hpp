// Shim for the reference's vendored `polylogarithm` submodule (empty in the
// snapshot): real dilogarithm, own implementation (see ../../../../README.md).
// The reference calls polylogarithm::Li2 from its DSNB source model
// (nuSIprop.hpp:628-632) with arguments in (-inf, 0].
#ifndef NUSI_REFSHIM_POLYLOG_LI2_HPP
#define NUSI_REFSHIM_POLYLOG_LI2_HPP

#include "../../../gsl/gsl_sf_dilog.h"

namespace polylogarithm {

inline double Li2(double x) { return nusi_refshim::li2_real(x); }

}  // namespace polylogarithm

#endif  // NUSI_REFSHIM_POLYLOG_LI2_HPP
