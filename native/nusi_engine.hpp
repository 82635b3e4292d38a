// nusi_engine.hpp — native (CPU, single-thread) s-channel cascade engine.
//
// A from-scratch C++ twin of the JAX engine's s-channel-only configuration
// (the reference's benchmark/golden path, nuSIprop.hpp:257-315 with
// non_resonant=false): implicit redshift march, extended kernel tables,
// alpha_cum fast path, both source models (upstream power-law x SFR and
// the fork's DSNB Fermi-Dirac with Li2/Li3), NO/IO orderings,
// Majorana/Dirac. Used three ways:
//   1. the honest vs_baseline denominator for bench.py (the upstream
//      reference compiles against GSL, absent here);
//   2. an independent-implementation cross-check of the JAX engine
//      (tests/test_serial_baseline.py, ~1e-12 agreement);
//   3. a no-accelerator fallback engine via the C API (nusi_capi.cpp)
//      and the ctypes binding (nusiprop_tpu/native_binding.py).
//
// Algorithms mirror nusiprop_tpu (grids.py, masses.py, mixing.py,
// sources.py, kernels.py); constants from constants.py.

#pragma once

#include <cmath>
#include <complex>
#include <vector>

#include "nusi_nr.hpp"
#include "nusi_pp.hpp"

namespace nusi {

constexpr double PI = 3.141592653589793;
constexpr double PI2_6 = PI * PI / 6.0;
constexpr double PI4 = PI * PI * PI * PI;
constexpr double ZETA3 = 1.202056903159594285;

// --- constants (constants.py / nuSIprop.hpp:131-189, 549-589) ---
constexpr double DMQ21 = 7.42e-5, DMQ31_NO = 2.514e-3, DMQ32_IO = -2.497e-3;
constexpr double ND_COEFF = 4.3528e-13, H_COEFF = 1.5e-33;
constexpr double OMEGA_L = 0.692, OMEGA_M = 0.308;
constexpr double E0_PIVOT = 1e14;
constexpr int N_INTEG_Z = 100;
constexpr double D2R = PI / 180.0;
// DSNB source (nuSIprop.hpp:618-646)
constexpr double T_DSNB = 6e6;               // [eV]
constexpr double ETOT_DSNB = 3 * 6.24;       // [1e64 eV]
constexpr double M_SOLAR = 1.989 * 56.1;     // [1e64 eV]
constexpr double RSN_PER_MSUN = 0.01;

// 3-point Gauss-Legendre (aux.hpp:53-54)
inline const double GLX[3] = {-0.7745966692414834, 0.0, 0.7745966692414834};
inline const double GLW[3] = {5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0};

inline double get_H(double z) {
  return H_COEFF * std::sqrt(OMEGA_L + OMEGA_M * std::pow(1.0 + z, 3));
}
inline double get_nd(double z) { return ND_COEFF * std::pow(1.0 + z, 3); }
inline double get_SFR(double z) {  // Yuksel et al. (nuSIprop.hpp:591-605)
  double zp1 = 1.0 + z;
  return std::pow(std::pow(zp1, -34.0) + std::pow(zp1 / 5161.0, 3.0) +
                      std::pow(zp1 / 9.06, 35.0),
                  -0.1);
}

inline double atandiff(double x, double y) {  // aux.hpp:63-75
  if (std::fabs(x) < 1e2 || std::fabs(y) < 1e2 || x * y < 0)
    return std::atan(x) - std::atan(y);
  double ix = 1.0 / x, iy = 1.0 / y;
  return (-ix + ix * ix * ix / 3.0) - (-iy + iy * iy * iy / 3.0);
}

// --- real dilog / trilog (same region decomposition as ops/specfun.py,
//     needed by the DSNB source for arguments in [-1, 0)) ---

inline double li2_series(double z) {  // Bernoulli series, z in [-1, 0.5]
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
  double w = -std::log1p(-z);
  double w2 = w * w, s = 0.0;
  for (int k = 19; k >= 0; --k) s = (s + C[k]) * w2;
  return w - w * w * 0.25 + s * w;
}

inline double li2(double x) {  // real Li2, GSL convention for x > 1
  if (x < -1.0) {
    double lx = std::log(-x);
    return -PI2_6 - 0.5 * lx * lx - li2_series(1.0 / x);
  }
  if (x <= 0.5) return li2_series(x);
  if (x <= 2.0) {
    double lx = std::log(std::fabs(x));
    double l1mx = (x == 1.0) ? 0.0 : std::log(std::fabs(1.0 - x));
    return PI2_6 - lx * l1mx - li2_series(1.0 - x);
  }
  double lx = std::log(x);
  return 2.0 * PI2_6 - 0.5 * lx * lx - li2_series(1.0 / x);
}

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
  if (w == 0.0) return ZETA3;
  double s = 0.0;
  for (int k = 23; k >= 0; --k) s = s * w + C[k];
  s = s * w * w * w;
  return ZETA3 + PI2_6 * w + 0.5 * w * w * (1.5 - std::log(-w)) + s;
}

inline double li3_01(double x) {  // [0, 1]
  return (x > 0.6) ? li3_log_expansion(x) : li3_power(x);
}

inline double li3(double x) {  // real Li3, x <= 1
  if (x < -1.0) {
    double lnx = std::log(-x);
    double core = 0.25 * li3_01(1.0 / (x * x)) - li3_01(-1.0 / x);
    return core - PI2_6 * lnx - lnx * lnx * lnx / 6.0;
  }
  if (x >= 0.0) return li3_01(x);
  if (x >= -0.5) return li3_power(x);
  return 0.25 * li3_01(x * x) - li3_01(-x);
}

// ---------------------------------------------------------------------------

struct Engine {
  // configuration
  int NE = 300;
  double lEmin = 12.0, lEmax = 17.0, zmax = 5.0;
  double mphi = 0, g = 0, mntot = 0, si = 2.0, norm = 1.0;
  int flav = 2;
  bool majorana = true;
  bool normal_ordering = true;
  bool source_dsnb = true;  // true: fork's DSNB source; false: power-law
  bool non_resonant = false;  // add t/u/tu/st/su channels
  bool phiphi = false;        // add double-scalar production (needs tables
                              // for the interpolated region; analytic tails
                              // degrade gracefully without them)
  pp::Spline pp_at, pp_a;     // alphatilde (2-D) / alpha (3-D) tables
  bool has_pp_tables = false;

  // grids
  int NZ = 0, NEXT = 0;
  std::vector<double> Emin, Enu, Emax, zg, Emin_ext, Emax_ext;
  double dlogz = 0, zmax_eff = 0;

  // state
  double mn[3];
  double Wsq[3][3];  // |U[f][i]|^2
  std::vector<double> flux;      // [3][NE]
  std::vector<double> flux_fla;  // [3][NE]
  std::vector<double> tblG, tblAt, tblA;  // extended kernel tables

  void setup_grids() {  // grids.py / nuSIprop.hpp:102-128
    double span = lEmax - lEmin;
    Emin.resize(NE); Enu.resize(NE); Emax.resize(NE);
    for (int i = 0; i < NE; ++i) {
      Emin[i] = std::pow(10.0, lEmin + span * i / NE);
      Enu[i] = std::pow(10.0, lEmin + span * (i + 0.5) / NE);
      Emax[i] = std::pow(10.0, lEmin + span * (i + 1.0) / NE);
    }
    double ratio = std::pow(10.0, span / NE);
    NZ = (int)(std::log(1.0 + zmax) / std::log(ratio) + 2.0);
    zg.resize(NZ);
    for (int i = 0; i < NZ; ++i) zg[i] = std::pow(ratio, i) - 1.0;
    zmax_eff = zg[NZ - 1];
    dlogz = std::log(ratio);
    NEXT = NE + NZ - 2;
    Emin_ext.resize(NEXT); Emax_ext.resize(NEXT);
    for (int e = 0; e < NEXT; ++e) {
      double shift = (e < NE) ? 0.0 : (double)(e - (NE - 1));
      double s = std::pow(ratio, shift);
      int idx = (e < NE) ? e : NE - 1;
      Emin_ext[e] = Emin[idx] * s;
      Emax_ext[e] = Emax[idx] * s;
    }
  }

  void setup_masses_mixing() {
    // bisection on the monotone total-mass constraint (masses.py)
    double lo = 0.0, hi = mntot;
    for (int it = 0; it < 200; ++it) {
      double mid = 0.5 * (lo + hi);
      double tot = normal_ordering
          ? mid + std::sqrt(mid * mid + DMQ21) + std::sqrt(mid * mid + DMQ31_NO)
          : mid + std::sqrt(mid * mid - DMQ32_IO)
              + std::sqrt(mid * mid - DMQ32_IO - DMQ21);
      if (tot < mntot) lo = mid; else hi = mid;
    }
    double mL = 0.5 * (lo + hi);
    if (normal_ordering) {
      mn[0] = mL;
      mn[1] = std::sqrt(DMQ21 + mL * mL);
      mn[2] = std::sqrt(DMQ31_NO + mL * mL);
    } else {  // IO: m3 lightest (masses.py mass_spectrum)
      double m2 = std::sqrt(mL * mL - DMQ32_IO);
      mn[0] = std::sqrt(m2 * m2 - DMQ21);
      mn[1] = m2;
      mn[2] = mL;
    }
    for (int k = 0; k < 3; ++k) mn[k] = std::max(mn[k], 1e-12);

    // NuFIT 5.0 mixing (constants.py MIXING_NO / MIXING_IO)
    double t12, t13, t23, dcp;
    if (normal_ordering) {
      t12 = 33.44 * D2R; t13 = 8.57 * D2R; t23 = 49.0 * D2R; dcp = 195.0 * D2R;
    } else {
      t12 = 33.45 * D2R; t13 = 8.61 * D2R; t23 = 49.3 * D2R; dcp = 286.0 * D2R;
    }
    std::complex<double> del = std::exp(std::complex<double>(0.0, dcp));
    double s12 = std::sin(t12), c12 = std::cos(t12);
    double s13 = std::sin(t13), c13 = std::cos(t13);
    double s23 = std::sin(t23), c23 = std::cos(t23);
    std::complex<double> U[3][3];
    U[0][0] = c12 * c13; U[0][1] = s12 * c13;
    U[0][2] = s13 / del;
    U[1][0] = -s12 * c23 - c12 * s23 * s13 * del;
    U[1][1] = c12 * c23 - s12 * s23 * s13 * del;
    U[1][2] = s23 * c13;
    U[2][0] = s12 * s23 - c12 * c23 * s13 * del;
    U[2][1] = -c12 * s23 - s12 * c23 * s13 * del;
    U[2][2] = c23 * c13;
    for (int f = 0; f < 3; ++f)
      for (int i = 0; i < 3; ++i) Wsq[f][i] = std::norm(U[f][i]);
  }

  double scalar_width() const {  // nuSIprop.hpp:748-757
    return majorana ? g * g * mphi / (16.0 * PI) : g * g * mphi / (8.0 * PI);
  }

  // s-channel kernels, same closed forms as kernels.py:66-129
  double Gamma_s(double Em, double Ep, double Ga) const {
    double tot = 0;
    for (int j = 0; j < 3; ++j) {
      double sp = 2 * mn[j] * Ep / (mphi * mphi);
      double sm = 2 * mn[j] * Em / (mphi * mphi);
      double gr = Ga / mphi;
      double logterm =
          std::log1p(mphi * mphi / (mphi * mphi + Ga * Ga) * sp * (sp - 2)) -
          std::log1p(mphi * mphi / (mphi * mphi + Ga * Ga) * sm * (sm - 2));
      double core;
      if (sp < 1e-5) {
        double d = sp - sm;
        core = 2 * mphi *
               (gr * (1 + gr * gr + 2 * sm) / ((1 + gr * gr) * (1 + gr * gr)) * d +
                gr / ((1 + gr * gr) * (1 + gr * gr)) * d * d);
      } else {
        core = 2 * mphi * atandiff(mphi * (sp - 1) / Ga, mphi * (sm - 1) / Ga);
      }
      double G = (g * g) / (32.0 * PI * Ga) * (g * g) * (core + Ga * logterm);
      if (non_resonant) G += nr::gamma_nr(sm, sp, g, gr, majorana);
      if (non_resonant && phiphi) G += pp::gamma_pp(sm, sp, g, majorana);
      tot += Wsq[flav][j] / (2 * mn[j]) * G;
    }
    return tot;
  }

  double alphaTilde_s(double Em, double Ep, double Ga) const {
    double tot = 0;
    for (int k = 0; k < 3; ++k) {
      double tp = -2 * mn[k] * Ep / (mphi * mphi);
      double tm = -2 * mn[k] * Em / (mphi * mphi);
      if (std::fabs(tm + 1) < 1e-7) tm += tm * 1e-6;
      if (std::fabs(tp + 1) < 1e-7) tp += tp * 1e-6;
      double gr = Ga / mphi;
      double logterm =
          std::log1p(mphi * mphi / (mphi * mphi + Ga * Ga) * tp * (tp + 2)) -
          std::log1p(mphi * mphi / (mphi * mphi + Ga * Ga) * tm * (tm + 2));
      double core;
      if (std::fabs(tp) < 1e-5) {
        double d = tp - tm;
        core = 2 * mphi * (1 + tm) *
               (-(gr * (1 + gr * gr - 2 * tm) * d) /
                    ((1 + gr * gr) * (1 + gr * gr)) +
                gr * d * d / ((1 + gr * gr) * (1 + gr * gr)));
      } else {
        core = 2 * mphi * (1 + tm) *
               atandiff(mphi * (1 + tm) / Ga, mphi * (1 + tp) / Ga);
      }
      double A = (g * g) / (16.0 * PI * Ga) * (g * g) * (core + Ga * logterm);
      if (!majorana) A /= 2.0;
      if (non_resonant) A += nr::alphatilde_nr(tm, tp, g, gr, majorana);
      if (non_resonant && phiphi)
        A += pp::alphatilde_pp(tm, tp, g, majorana,
                               has_pp_tables ? &pp_at : nullptr);
      tot += Wsq[flav][k] / (2 * mn[k]) * A;
    }
    return tot;
  }

  double alpha_s(double Em, double Ep, double Emp, double Epp,
                 double Ga) const {
    double tot = 0;
    for (int k = 0; k < 3; ++k) {
      double tp = -2 * mn[k] * Ep / (mphi * mphi);
      double tm = -2 * mn[k] * Em / (mphi * mphi);
      if (std::fabs(tm + 1) < 1e-7) tm += tm * 1e-6;
      if (std::fabs(tp + 1) < 1e-7) tp += tp * 1e-6;
      double spp = 2 * mn[k] * Epp / (mphi * mphi);
      double smp = 2 * mn[k] * Emp / (mphi * mphi);
      double gr = Ga / mphi;
      double core;
      if (spp < 1e-5) {
        double d = spp - smp;
        core = gr * (1 + gr * gr + 2 * smp) / ((1 + gr * gr) * (1 + gr * gr)) * d +
               gr / ((1 + gr * gr) * (1 + gr * gr)) * d * d;
      } else {
        core = atandiff(mphi * (spp - 1) / Ga, mphi * (smp - 1) / Ga);
      }
      double A = (g * g) / (8.0 * PI * Ga) * (g * g) * mphi * (tm - tp) * core;
      if (!majorana) A /= 2.0;
      if (non_resonant) A += nr::alpha_nr(tm, tp, smp, spp, g, gr, majorana);
      if (non_resonant && phiphi)
        A += pp::alpha_pp(tm, tp, smp, spp, g, majorana,
                          has_pp_tables ? &pp_a : nullptr);
      tot += Wsq[flav][k] / (2 * mn[k]) * A;
    }
    return tot;
  }

  double flux_FS_E0() const {  // nuSIprop.hpp:666-692
    double tot = 0;
    double h = zmax_eff / N_INTEG_Z;
    for (int s = 0; s < N_INTEG_Z; ++s) {
      double a = s * h, b = a + h;
      for (int q = 0; q < 3; ++q) {
        double z = 0.5 * (b - a) * GLX[q] + 0.5 * (b + a);
        tot += 0.5 * (b - a) * GLW[q] * std::pow(1.0 + z, -si) * get_SFR(z) /
               get_H(z);
      }
    }
    return tot;
  }

  // DSNB Fermi-Dirac source (sources.py / nuSIprop.hpp:618-662)
  double lum_int_fd(double z, double E) const {
    double T = T_DSNB;
    double u = E * (1.0 + z) / T;
    double x = -std::exp(-u);
    // log(exp(-u) + 1) evaluated in plain doubles, NOT log1p: the golden
    // output's high-energy tail embeds that rounding (sources.py note)
    return (ETOT_DSNB * 120.0 / (42.0 * PI4 * T * T)) *
           (-E * E * (1.0 + z) * std::log(-x + 1.0) / T + 2.0 * E * li2(x) +
            2.0 * T * li3(x) / (1.0 + z));
  }

  double Lum(double z, int bin, double norm_total) const {
    double Em = Emin[bin], Ep = Emax[bin];
    if (source_dsnb) {
      double rsn = get_SFR(z) * RSN_PER_MSUN / M_SOLAR;
      return (lum_int_fd(z, Ep) - lum_int_fd(z, Em)) * rsn;
    }
    // power-law x SFR source (nuSIprop.hpp:648-657)
    return norm_total / 3.0 * get_SFR(z) *
           (Ep * std::pow(Ep / E0_PIVOT * (1.0 + z), -si) -
            Em * std::pow(Em / E0_PIVOT * (1.0 + z), -si)) /
           (1.0 - si);
  }

  void evolve() {
    setup_masses_mixing();
    double Ga = scalar_width();
    double norm_total = norm / flux_FS_E0();

    flux.assign(3 * NE, 0.0);
    flux_fla.assign(3 * NE, 0.0);

    // kernel tables on the extended axis (nuSIprop.hpp:218-253);
    // s-channel alpha is separable, but match the reference's structure
    // (full triangular table) for an honest cost comparison
    tblG.resize(NEXT); tblAt.resize(NEXT); tblA.assign(NEXT * NEXT, 0.0);
    for (int i = 0; i < NEXT; ++i) {
      tblG[i] = Gamma_s(Emin_ext[i], Emax_ext[i], Ga);
      tblAt[i] = alphaTilde_s(Emin_ext[i], Emax_ext[i], Ga);
      for (int m = i + 1; m < NEXT; ++m)
        tblA[i * NEXT + m] =
            alpha_s(Emin_ext[i], Emax_ext[i], Emin_ext[m], Emax_ext[m], Ga);
    }

    std::vector<double> dE(NE);
    for (int j = 0; j < NE; ++j) dE[j] = Emax[j] - Emin[j];

    // implicit redshift march (nuSIprop.hpp:257-315)
    for (int i = NZ - 1; i >= 1; --i) {
      double zim = zg[i - 1], zi = zg[i];
      double H = get_H(zim);
      double ndfac = get_nd(zim) / ((1.0 + zim) * (1.0 + zim));
      double pref = (1.0 + zim) * dlogz / H;

      // s-channel alpha is separable in the target bin, so the
      // regeneration sum collapses to a running accumulator exactly as
      // in the reference's fast path (nuSIprop.hpp:261-278)
      double alpha_cum[3] = {0, 0, 0};

      for (int j = NE; j >= 1; --j) {
        int jm = j - 1;
        double Gj = tblG[j + i - 2] * ndfac;
        double Atj = tblAt[j + i - 2] * ndfac;

        double regW;
        if (non_resonant) {
          // general kernel: full regeneration sum over source bins
          // (nuSIprop.hpp:285-291) — no rank-one shortcut
          regW = 0;
          const double* row = &tblA[(j + i - 2) * NEXT];
          for (int m = j + 1; m <= NE; ++m) {
            int mi = m - 1;
            double wf = 0;
            for (int l = 0; l < 3; ++l)
              wf += Wsq[flav][l] * flux[l * NE + mi];
            regW += wf * row[mi + i - 1] / dE[mi];
          }
          regW *= ndfac;
        } else {
          if (j != NE) {
            double a = tblA[(j + i - 2) * NEXT + (j + i - 1)] * ndfac /
                       (dE[j] * dE[jm]);
            for (int l = 0; l < 3; ++l) alpha_cum[l] += flux[l * NE + j] * a;
          }
          regW = 0;
          for (int l = 0; l < 3; ++l) regW += Wsq[flav][l] * alpha_cum[l];
          regW *= dE[jm];
        }

        double lum = Lum(zi, jm, norm_total);
        double Zdr[3], rhs[3];
        for (int k = 0; k < 3; ++k) {
          double Wk = Wsq[flav][k];
          Zdr[k] = 1.0 + pref * (Gj * Wk - Atj * Wk * Wk) / dE[jm];
          double src = pref * (lum + regW * Wk);
          rhs[k] = (flux[k * NE + jm] + src) / Zdr[k];
        }
        // 3x3 implicit system (nuSIprop.hpp:293-313)
        double M[3][3];
        double coup = Atj / dE[jm];
        for (int k = 0; k < 3; ++k)
          for (int l = 0; l < 3; ++l)
            M[k][l] = (k == l) ? 1.0
                               : coup * Wsq[flav][k] * Wsq[flav][l] / Zdr[k];
        // Gaussian elimination, 3x3 with partial pivoting
        double x[3];
        {
          double A[3][4];
          for (int r = 0; r < 3; ++r) {
            for (int c = 0; c < 3; ++c) A[r][c] = M[r][c];
            A[r][3] = rhs[r];
          }
          for (int c = 0; c < 3; ++c) {
            int p = c;
            for (int r = c + 1; r < 3; ++r)
              if (std::fabs(A[r][c]) > std::fabs(A[p][c])) p = r;
            if (p != c)
              for (int cc = 0; cc < 4; ++cc) std::swap(A[c][cc], A[p][cc]);
            for (int r = c + 1; r < 3; ++r) {
              double f = A[r][c] / A[c][c];
              for (int cc = c; cc < 4; ++cc) A[r][cc] -= f * A[c][cc];
            }
          }
          for (int r = 2; r >= 0; --r) {
            double s = A[r][3];
            for (int c = r + 1; c < 3; ++c) s -= A[r][c] * x[c];
            x[r] = s / A[r][r];
          }
        }
        for (int k = 0; k < 3; ++k) flux[k * NE + jm] = x[k];
      }
    }

    for (int k = 0; k < 3; ++k)
      for (int j = 0; j < NE; ++j) flux[k * NE + j] /= dE[j];
    for (int k = 0; k < 3; ++k)
      for (int j = 0; j < NE; ++j) {
        double s = 0;
        for (int m = 0; m < 3; ++m) s += Wsq[k][m] * flux[m * NE + j];
        flux_fla[k * NE + j] = s;
      }
  }
};

}  // namespace nusi
