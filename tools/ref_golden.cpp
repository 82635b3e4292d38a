// Driver that compiles the UNMODIFIED reference engine against the
// native/refshim GSL / polylogarithm shims and prints the evolved flux.
//
// Build (see tools/make_reference_golden.py):
//   g++ -O2 -std=gnu++17 -I native/refshim -I $REF tools/ref_golden.cpp
// where $REF is the read-only reference checkout holding nuSIprop.hpp.
// The reference's own `#include "polylogarithm/src/cpp/Li2.hpp"` resolves to
// the shim because the vendored submodule directory is empty in the snapshot.
//
// Constructor argument order follows nuSIprop.hpp:61-68.
//
// Usage:
//   ref_golden mphi g mntot si norm majorana non_resonant normal_ordering \
//              N_bins_E lEmin lEmax zmax flav phiphi [--golden-fmt]
//
// Default output: full-precision (%.17e). --golden-fmt reproduces the
// reference test drivers' "%.5e  %.4e  %.4e  %.4e" rows (test.py:37-42)
// so the output can be diffed against tests/data/data_massless.txt.

#include "nuSIprop.hpp"

#include <cstdio>
#include <cstdlib>
#include <cstring>

int main(int argc, char** argv) {
  if (argc < 15) {
    std::fprintf(stderr,
                 "usage: %s mphi g mntot si norm majorana non_resonant "
                 "normal_ordering N_bins_E lEmin lEmax zmax flav phiphi "
                 "[--golden-fmt]\n",
                 argv[0]);
    return 2;
  }
  const double mphi = std::atof(argv[1]);
  const double g = std::atof(argv[2]);
  const double mntot = std::atof(argv[3]);
  const double si = std::atof(argv[4]);
  const double norm = std::atof(argv[5]);
  const bool majorana = std::atoi(argv[6]) != 0;
  const bool non_resonant = std::atoi(argv[7]) != 0;
  const bool normal_ordering = std::atoi(argv[8]) != 0;
  const int N_bins_E = std::atoi(argv[9]);
  const double lEmin = std::atof(argv[10]);
  const double lEmax = std::atof(argv[11]);
  const double zmax = std::atof(argv[12]);
  const int flav = std::atoi(argv[13]);
  const bool phiphi = std::atoi(argv[14]) != 0;
  const bool golden_fmt =
      argc > 15 && std::strcmp(argv[15], "--golden-fmt") == 0;

  nuSIprop::calculate_flux ev(mphi, g, mntot, si, norm, majorana,
                              non_resonant, normal_ordering, N_bins_E, lEmin,
                              lEmax, zmax, flav, phiphi);
  ev.evolve();

  if (golden_fmt) {
    // test.py writes through np.savetxt with this header + row format.
    std::printf("# energy, flx_e, flx_mu, flx_ta \n");
    for (int i = 0; i < ev.get_N_bins_E(); ++i)
      std::printf("%.5e  %.4e  %.4e  %.4e\n", ev.get_energy(i),
                  ev.get_flux_fla(0, i), ev.get_flux_fla(1, i),
                  ev.get_flux_fla(2, i));
  } else {
    std::printf("# energy flx_e flx_mu flx_ta (reference engine via refshim; "
                "energy-conservation check %.6e)\n",
                ev.check_energy_conservation());
    for (int i = 0; i < ev.get_N_bins_E(); ++i)
      std::printf("%.17e %.17e %.17e %.17e\n", ev.get_energy(i),
                  ev.get_flux_fla(0, i), ev.get_flux_fla(1, i),
                  ev.get_flux_fla(2, i));
  }
  return 0;
}
