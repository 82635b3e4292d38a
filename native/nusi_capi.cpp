// C API for the native cascade engine (build: make libnusiprop_native.so).
// Consumed by nusiprop_tpu/native_binding.py via ctypes — the native
// twin of the reference's C++ public surface (nuSIprop.hpp:61-68,
// 173-174, 359-429) for machines without an accelerator.

#include "nusi_engine.hpp"

extern "C" {

void* nusi_create(int NE, double lEmin, double lEmax, double zmax, int flav,
                  int majorana, int normal_ordering, int source_dsnb) {
  auto* e = new nusi::Engine();
  e->NE = NE;
  e->lEmin = lEmin;
  e->lEmax = lEmax;
  e->zmax = zmax;
  e->flav = flav;
  e->majorana = majorana != 0;
  e->normal_ordering = normal_ordering != 0;
  e->source_dsnb = source_dsnb != 0;
  e->setup_grids();
  return e;
}

void nusi_set_non_resonant(void* h, int enable) {
  static_cast<nusi::Engine*>(h)->non_resonant = enable != 0;
}

void nusi_set_params(void* h, double mphi, double g, double mntot, double si,
                     double norm) {
  auto* e = static_cast<nusi::Engine*>(h);
  e->mphi = mphi;
  e->g = g;
  e->mntot = mntot;
  e->si = si;
  e->norm = norm;
}

void nusi_evolve(void* h) { static_cast<nusi::Engine*>(h)->evolve(); }

int nusi_n_bins(void* h) { return static_cast<nusi::Engine*>(h)->NE; }

int nusi_n_steps_z(void* h) { return static_cast<nusi::Engine*>(h)->NZ; }

void nusi_get_energies(void* h, double* out) {
  auto* e = static_cast<nusi::Engine*>(h);
  for (int i = 0; i < e->NE; ++i) out[i] = e->Enu[i];
}

void nusi_get_flux(void* h, double* out) {  // (3, NE) mass basis
  auto* e = static_cast<nusi::Engine*>(h);
  for (int i = 0; i < 3 * e->NE; ++i) out[i] = e->flux[i];
}

void nusi_get_flux_fla(void* h, double* out) {  // (3, NE) flavor basis
  auto* e = static_cast<nusi::Engine*>(h);
  for (int i = 0; i < 3 * e->NE; ++i) out[i] = e->flux_fla[i];
}

void nusi_destroy(void* h) { delete static_cast<nusi::Engine*>(h); }

}  // extern "C"
