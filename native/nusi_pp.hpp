// nusi_pp.hpp — phi-phi (double scalar production) channel for the native
// engine: closed-form Gamma (nuSIprop.hpp:880-907), table-interpolated
// alphaTilde/alpha with analytic Taylor tails (nuSIprop.hpp:1194-1213,
// 1476-1503). Transcribed from this repo's own JAX implementation
// (nusiprop_tpu/models/kernels_nr.py gamma_pp/alphatilde_pp/alpha_pp);
// the interpolator evaluates weight tensors PRECOMPUTED by
// nusiprop_tpu/ops/interp.py and marshalled through the C API, so the
// native and JAX lookups share one set of spline semantics by
// construction (regular grid, O(1) index with edge snapping, per-axis
// log reparametrization, clamped out-of-range queries).

#pragma once

#include <cmath>
#include <vector>

#include "nusi_nr.hpp"

namespace nusi {
namespace pp {

// Regular-grid local-cubic spline over precomputed per-axis weight
// tensors (ops/interp.py SplineND.eval, regular branch). nodes[] are
// already log-reparametrized where logax[] is set; W[] holds the
// (4, 4, n) weight tensor per axis in C order.
struct Spline {
  int ndim = 0;
  std::vector<double> nodes[3];
  std::vector<double> W[3];
  int logax[3] = {0, 0, 0};
  std::vector<double> values;
  long stride[3] = {0, 0, 0};

  void finalize() {
    long s = 1;
    for (int i = ndim - 1; i >= 0; --i) {
      stride[i] = s;
      s *= (long)nodes[i].size();
    }
  }

  double eval(const double* c_in) const {
    int base[3];
    int nn[3];
    double poly[3][4];
    for (int i = 0; i < ndim; ++i) {
      const std::vector<double>& x = nodes[i];
      int n = (int)x.size();
      nn[i] = n;
      double c = logax[i] ? std::log(std::max(c_in[i], 1e-300)) : c_in[i];
      c = std::min(std::max(c, x[0]), x[n - 1]);
      int k = (int)std::floor((c - x[0]) / (x[1] - x[0]));
      // edge snapping (interp.hpp:369-373 / ops/interp.py:146-149)
      if (c < x[1]) k = 0;
      if (c > x[n - 2]) k = n - 2;
      if (k < 0) k = 0;
      if (k > n - 2) k = n - 2;
      double t = (c - x[k]) / (x[k + 1] - x[k]);
      const double* w = W[i].data();
      for (int o = 0; o < 4; ++o)
        poly[i][o] = ((w[(o * 4 + 0) * n + k] * t + w[(o * 4 + 1) * n + k]) * t +
                      w[(o * 4 + 2) * n + k]) * t +
                     w[(o * 4 + 3) * n + k];
      base[i] = (k == 0) ? 0 : k - 1;
    }
    int total = 1;
    for (int i = 0; i < ndim; ++i) total *= 4;
    double res = 0.0;
    for (int flat = 0; flat < total; ++flat) {
      long idx = 0;
      double wgt = 1.0;
      int rem = flat;
      for (int i = 0; i < ndim; ++i) {
        int o = rem % 4;
        rem /= 4;
        int ii = base[i] + o;
        if (ii > nn[i] - 1) ii = nn[i] - 1;  // clamped node meets zero weight
        idx += stride[i] * ii;
        wgt *= poly[i][o];
      }
      res += wgt * values[idx];
    }
    return res;
  }
};

// nu nu -> phi phi absorption (nuSIprop.hpp:880-907; kernels_nr.gamma_pp):
// closed form with GL3 rescue when it cancels negative.
inline double gamma_pp(double sm, double sp, double g, bool majorana) {
  if (!(sp > 4.0)) return 0.0;
  double smc = std::max(sm, 4.0);
  double spc = std::max(sp, 4.0 + 1e-12);
  double pref = (g * g) / (128.0 * nr::NR_PI) * (g * g);
  struct P {
    double v, sum, dif, big, neg;
  };
  auto pieces = [](double s) {
    P p;
    double rt = nr::sqrt_s(s - 4.0);
    double rs = std::sqrt(std::max(s, 4.0));
    p.v = nr::sqrt_s((s - 4.0) / s);
    p.sum = rt + rs;
    p.dif = rt - rs;
    p.big = s - 2.0 + rt * rs;
    p.neg = 2.0 - s + rt * rs;
    return p;
  };
  P a = pieces(smc), b = pieces(spc);
  double closed = pref * (
      12.0 * a.v - 12.0 * b.v
      - 2.0 * nr::ln_s(a.dif * a.dif / 4.0) * nr::ln_s(a.big * a.big / 4.0)
      - (6.0 + smc * nr::ln_s((smc - 2.0) * smc)) *
            nr::ln_s(a.big * a.big / (a.neg * a.neg)) / smc
      - 24.0 * (a.v - b.v - nr::ln_s(a.sum) + nr::ln_s(b.sum))
      + 2.0 * nr::ln_s(b.dif * b.dif / 4.0) * nr::ln_s(b.big * b.big / 4.0)
      + (6.0 + spc * nr::ln_s((spc - 2.0) * spc)) *
            nr::ln_s(b.big * b.big / (b.neg * b.neg)) / spc
      + 8.0 * nr::dilogdiff(4.0 / (a.sum * a.sum), 4.0 / (b.sum * b.sum))
      + 2.0 * nr::dilogdiff(4.0 / (a.big * a.big), 4.0 / (b.big * b.big)));
  double val = closed;
  if (closed < 0.0) {
    auto f = [](double z) {
      z = std::max(z, 4.0 + 1e-12);
      double r = nr::sqrt_s(z * (z - 4.0));
      double den = r - z + 2.0;
      if (std::fabs(den) < nr::TINY) den = -nr::TINY;
      double ratio = (r + z - 2.0) / den;
      return (z * z - 4.0 * z + 6.0) / (z * z * (z - 2.0)) *
                 nr::ln_s(ratio * ratio) -
             6.0 * r / (z * z);
    };
    val = (g * g) / (64.0 * nr::NR_PI) * (g * g) * nr::gl3(f, smc, spc);
  }
  if (majorana) val *= 2.0;
  return val;
}

// Same-bin phi-phi regeneration (nuSIprop.hpp:1194-1213;
// kernels_nr.alphatilde_pp): 2-D spline for |tplus| in (4, 1e4),
// analytic tail above; tail-only when no tables are loaded (the same
// documented degradation as the JAX path).
inline double alphatilde_pp(double tm, double tp, double g, bool majorana,
                            const Spline* tbl) {
  if (!(-tp > 4.0)) return 0.0;
  double mtp = std::max(-tp, 4.0 + 1e-12);
  double mtm = std::max(-tm, nr::TINY);
  double ltm = nr::ln_s(mtm), ltp = nr::ln_s(mtp);
  double ldt = nr::ln_s(std::max(tm - tp, nr::TINY));
  double g4 = (g * g) * (g * g);
  double tail = g4 * (
      6.0 * tm * ltm - tp * ltm * ltm
      + 2.0 * (-8.0 * tm + 8.0 * tp + 4.0 * tp * ltm +
               ldt * (tm - tp - tp * nr::ln_s(tm / tp)))
      - 2.0 * (2.0 * tm + 5.0 * tp) * ltp + tp * ltp * ltp
      - 2.0 * tp * nr::li2_full(1.0 - tm / tp)) /
      (128.0 * nr::NR_PI * tp);
  double val = tail;
  if (tbl && -tp < 1e4) {
    double c[2] = {mtp, std::log10(tp / tm)};
    val = g4 * tbl->eval(c);
  }
  return (majorana ? 8.0 : 2.0) * val;
}

// Bin-to-bin phi-phi regeneration (nuSIprop.hpp:1476-1503;
// kernels_nr.alpha_pp): 3-D spline for sminus' in (4, 1e4), three
// analytic tail regimes in the target-bin limits above.
inline double alpha_pp(double tm, double tp, double smp, double spp, double g,
                       bool majorana, const Spline* tbl) {
  if (!(smp > 4.0)) return 0.0;
  double smps = std::max(smp, 4.0 + 1e-12);
  double spps = std::max(spp, smps * (1.0 + 1e-12));
  double lsm = nr::ln_s(smps), lsp = nr::ln_s(spps);
  double s2m = smps * smps, s2p = spps * spps;
  double mtm = std::max(-tm, nr::TINY), mtp = std::max(-tp, nr::TINY);
  double ltm = nr::ln_s(mtm), ltp = nr::ln_s(mtp);
  double lm1tm = nr::ln_s(std::max(-1.0 - tm, nr::TINY));
  double lm1tp = nr::ln_s(std::max(-1.0 - tp, nr::TINY));
  double g4 = (g * g) * (g * g);

  // Regime 1: tminus < -1 (nuSIprop.hpp:1489)
  double tail1 = (
      (spps - smps) * (
          (tm - tp) * (spps * (tm + tp - 2.0) +
                       smps * (-2.0 - 24.0 * spps + tm + tp))
          + 4.0 * (-(spps * (1.0 + tm)) +
                   smps * (-1.0 + 2.0 * spps + (spps - 1.0) * tm)) * lm1tm
          + 2.0 * (3.0 * spps + smps * (3.0 + 4.0 * spps)) * tm * ltm
          + 4.0 * (spps + spps * tp +
                   smps * (1.0 + tp - spps * (2.0 + tp))) * lm1tp
          - 2.0 * (3.0 * spps + smps * (3.0 + 4.0 * spps)) * tp * ltp)
      + 2.0 * s2m * lsp * (
          (3.0 + 2.0 * spps) * (tm - tp)
          + 2.0 * s2p * ((-1.0 - tm) * lm1tm + tm * ltm +
                         (1.0 + tp) * lm1tp - tp * ltp))
      + 2.0 * s2p * lsm * (
          (-3.0 - 2.0 * smps) * (tm - tp)
          + 2.0 * s2m * ((1.0 + tm) * lm1tm - tm * ltm -
                         (1.0 + tp) * lm1tp + tp * ltp))) /
      (256.0 * nr::NR_PI * s2m * s2p);

  // Regime 3 base: both limits above -1 (nuSIprop.hpp:1492)
  double base3 =
      -6.0 * smps + 6.0 * spps - 2.0 * (smps - 2.0) * spps * lsm +
      smps * spps * lsm * lsm + 2.0 * smps * (spps - 2.0) * lsp -
      smps * spps * lsp * lsp;
  double tail3 = (tp - tm) * base3 / (128.0 * nr::NR_PI * smps * spps);

  // Regime 2: tplus < -1 <= tminus (nuSIprop.hpp:1491)
  double tail2 = (
      (2.0 * s2m * lsp * ((1.0 + tp) * (-3.0 - 2.0 * spps +
                                        2.0 * s2p * lm1tp) -
                          2.0 * s2p * tp * ltp)
       + (smps - spps) * (
             (1.0 + tp) * (-3.0 * (smps + spps + 8.0 * smps * spps) +
                           (smps + spps) * tp)
             + 4.0 * (-(spps * (1.0 + tp)) +
                      smps * (-1.0 + 2.0 * spps + (spps - 1.0) * tp)) * lm1tp
             + 2.0 * (3.0 * spps + smps * (3.0 + 4.0 * spps)) * tp * ltp)
       + 2.0 * s2p * lsm * ((3.0 + 2.0 * smps) * (1.0 + tp) +
                            2.0 * s2m * (-((1.0 + tp) * lm1tp) +
                                         tp * ltp))) /
          (256.0 * nr::NR_PI * s2m * s2p)
      + (-1.0 - tm) * base3 / (128.0 * nr::NR_PI * smps * spps));

  double tail = (tm < -1.0) ? tail1 : ((tp < -1.0) ? tail2 : tail3);
  double val = g4 * tail;
  if (tbl && smps < 1e4) {
    double delta = spps / smps;
    double n_coord = nr::ln_s(smps / mtm) / nr::ln_s(delta) * 1.0001;
    double c[3] = {smps, n_coord, std::log10(delta)};
    val = g4 * std::fabs(tbl->eval(c));
  }
  return (majorana ? 8.0 : 2.0) * val;
}

}  // namespace pp
}  // namespace nusi
