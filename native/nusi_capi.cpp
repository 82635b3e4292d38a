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

void nusi_set_phiphi(void* h, int enable) {
  static_cast<nusi::Engine*>(h)->phiphi = enable != 0;
}

// Load one phi-phi interpolation table (which: 0 = alphatilde 2-D,
// 1 = alpha 3-D). nodes_cat / weights_cat are the per-axis node arrays
// (already log-reparametrized where log_axes set) and (4, 4, n) weight
// tensors from ops/interp.py, concatenated axis by axis; values is the
// full C-order value array.
void nusi_set_pp_table(void* h, int which, int ndim, const int* ns,
                       const int* log_axes, const double* nodes_cat,
                       const double* weights_cat, const double* values) {
  auto* e = static_cast<nusi::Engine*>(h);
  nusi::pp::Spline& s = which == 0 ? e->pp_at : e->pp_a;
  s.ndim = ndim;
  long nv = 1;
  const double* np_ = nodes_cat;
  const double* wp = weights_cat;
  for (int i = 0; i < ndim; ++i) {
    int n = ns[i];
    s.nodes[i].assign(np_, np_ + n);
    np_ += n;
    s.W[i].assign(wp, wp + 16L * n);
    wp += 16L * n;
    s.logax[i] = log_axes[i];
    nv *= n;
  }
  s.values.assign(values, values + nv);
  s.finalize();
  e->has_pp_tables = e->pp_at.ndim == 2 && e->pp_a.ndim == 3;
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
