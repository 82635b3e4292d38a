// Serial C++ baseline CLI for the nusiprop_tpu benchmark.
//
// The upstream reference (quarkquartet/nuSIprop) publishes no performance
// numbers and does not compile in this environment (GSL and its bundled
// polylogarithm sources are absent), so this provides the missing
// denominator for bench.py's vs_baseline: a clean, -O3, single-threaded
// run of the same algorithm the reference executes for the benchmark
// configuration — s-channel-only kernels with the alpha_cum fast path,
// power-law source, implicit redshift march with the extended-
// kernel-table trick (cf. nuSIprop.hpp:218-315). The engine itself lives
// in nusi_engine.hpp (shared with the C API / ctypes binding).
//
// It is cross-validated against the JAX engine to ~1e-12 per bin
// (tests/test_serial_baseline.py) and timed by tools/measure_baseline.py,
// which writes BASELINE_MEASURED.json.
//
// Build:  make serial_baseline   (or g++ -O3 -march=native -std=c++17
//         -o serial_baseline serial_baseline.cpp)
// Run:    ./serial_baseline <N_bins> <lEmin> <lEmax> <zmax> <reps>
//                           [--dump] [--non-resonant]
// --non-resonant switches to the reference's default channel set
// (t/u/tu/st/su added, phiphi off; full O(NE^2)-per-step regeneration
// sum, nuSIprop.hpp:285-291) at the test.cpp-style parameter point.
//
// Physics-parameter overrides (applied after the presets above, so they
// compose with --non-resonant) let tests drive the twin at arbitrary
// configurations — e.g. the reference-binary fixture battery
// (tests/test_reference_binary.py):
//   --mphi X --g X --mntot X --si X --norm X --flav N
//   --dirac (majorana=false)  --io (inverted ordering)  --dsnb (DSNB source)

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "nusi_engine.hpp"

int main(int argc, char** argv) {
  nusi::Engine e;
  e.NE = argc > 1 ? std::atoi(argv[1]) : 500;
  e.lEmin = argc > 2 ? std::atof(argv[2]) : 4.0;
  e.lEmax = argc > 3 ? std::atof(argv[3]) : 9.0;
  e.zmax = argc > 4 ? std::atof(argv[4]) : 5.0;
  int reps = argc > 5 ? std::atoi(argv[5]) : 3;
  bool dump = false, nr = false;
  for (int a = 6; a < argc; ++a) {
    if (std::strcmp(argv[a], "--dump") == 0) dump = true;
    if (std::strcmp(argv[a], "--non-resonant") == 0) nr = true;
  }

  e.mphi = 5e6; e.g = 1e-6;
  e.mntot = std::sqrt(nusi::DMQ21) + std::sqrt(nusi::DMQ31_NO);
  e.si = 2.0; e.norm = 6.0;
  e.source_dsnb = false;  // power-law: the upstream benchmark source
  if (nr) {
    e.non_resonant = true;
    // the non-resonant bench point (bench.py BENCH_NON_RESONANT=1:
    // dsnb source, g = 1e-3, mphi from the scan — cost is
    // parameter-independent, one representative point suffices)
    e.g = 1e-3; e.mphi = 1e6; e.si = 2.0; e.norm = 6.0;
    e.source_dsnb = true;
  }
  for (int a = 6; a < argc; ++a) {
    auto val = [&](void) { return std::atof(argv[++a]); };
    if (std::strcmp(argv[a], "--mphi") == 0) e.mphi = val();
    else if (std::strcmp(argv[a], "--g") == 0) e.g = val();
    else if (std::strcmp(argv[a], "--mntot") == 0) e.mntot = val();
    else if (std::strcmp(argv[a], "--si") == 0) e.si = val();
    else if (std::strcmp(argv[a], "--norm") == 0) e.norm = val();
    else if (std::strcmp(argv[a], "--flav") == 0) e.flav = (int)val();
    else if (std::strcmp(argv[a], "--dirac") == 0) e.majorana = false;
    else if (std::strcmp(argv[a], "--io") == 0) e.normal_ordering = false;
    else if (std::strcmp(argv[a], "--dsnb") == 0) e.source_dsnb = true;
  }
  e.setup_grids();

  double best = 1e300;
  for (int r = 0; r < reps; ++r) {
    auto t0 = std::chrono::steady_clock::now();
    e.evolve();
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best) best = dt;
  }

  if (dump) {
    for (int j = 0; j < e.NE; ++j)
      std::printf("%.15e %.15e %.15e %.15e\n", e.Enu[j], e.flux_fla[j],
                  e.flux_fla[e.NE + j], e.flux_fla[2 * e.NE + j]);
    return 0;
  }
  std::printf(
      "{\"n_bins\": %d, \"n_steps_z\": %d, \"wall_sec_per_evolve\": %.6f, "
      "\"zsteps_per_sec\": %.3f, \"non_resonant\": %s}\n",
      e.NE, e.NZ, best, (e.NZ - 1) / best, nr ? "true" : "false");
  return 0;
}
