// Minimal GSL linear-algebra shim: dense matrix/vector/permutation types
// and LU decompose/solve with partial pivoting. Own implementation (see
// ../README.md); API-compatible with <gsl/gsl_linalg.h> for the subset the
// reference uses (nuSIprop.hpp:262-327: the per-bin 3x3 implicit system).
#ifndef NUSI_REFSHIM_GSL_LINALG_H
#define NUSI_REFSHIM_GSL_LINALG_H

#include <cmath>
#include <cstddef>

typedef struct {
  size_t size1;
  size_t size2;
  double* data;
} gsl_matrix;

typedef struct {
  size_t size;
  double* data;
} gsl_vector;

typedef struct {
  size_t size;
  size_t* data;
} gsl_permutation;

inline gsl_matrix* gsl_matrix_alloc(size_t n1, size_t n2) {
  return new gsl_matrix{n1, n2, new double[n1 * n2]()};
}
inline void gsl_matrix_free(gsl_matrix* m) {
  delete[] m->data;
  delete m;
}
inline void gsl_matrix_set(gsl_matrix* m, size_t i, size_t j, double x) {
  m->data[i * m->size2 + j] = x;
}
inline double gsl_matrix_get(const gsl_matrix* m, size_t i, size_t j) {
  return m->data[i * m->size2 + j];
}

inline gsl_vector* gsl_vector_alloc(size_t n) {
  return new gsl_vector{n, new double[n]()};
}
inline void gsl_vector_free(gsl_vector* v) {
  delete[] v->data;
  delete v;
}
inline void gsl_vector_set(gsl_vector* v, size_t i, double x) {
  v->data[i] = x;
}
inline double gsl_vector_get(const gsl_vector* v, size_t i) {
  return v->data[i];
}

inline gsl_permutation* gsl_permutation_alloc(size_t n) {
  gsl_permutation* p = new gsl_permutation{n, new size_t[n]};
  for (size_t i = 0; i < n; ++i) p->data[i] = i;
  return p;
}
inline void gsl_permutation_free(gsl_permutation* p) {
  delete[] p->data;
  delete p;
}

// In-place LU with partial pivoting: A -> L (unit diagonal, below) + U.
inline int gsl_linalg_LU_decomp(gsl_matrix* A, gsl_permutation* p,
                                int* signum) {
  const size_t n = A->size1;
  double* a = A->data;
  for (size_t i = 0; i < n; ++i) p->data[i] = i;
  *signum = 1;
  for (size_t col = 0; col < n; ++col) {
    size_t piv = col;
    double amax = std::fabs(a[col * n + col]);
    for (size_t r = col + 1; r < n; ++r) {
      double v = std::fabs(a[r * n + col]);
      if (v > amax) {
        amax = v;
        piv = r;
      }
    }
    if (piv != col) {
      for (size_t j = 0; j < n; ++j) {
        double t = a[col * n + j];
        a[col * n + j] = a[piv * n + j];
        a[piv * n + j] = t;
      }
      size_t t = p->data[col];
      p->data[col] = p->data[piv];
      p->data[piv] = t;
      *signum = -*signum;
    }
    double d = a[col * n + col];
    if (d != 0.0) {
      for (size_t r = col + 1; r < n; ++r) {
        double f = a[r * n + col] / d;
        a[r * n + col] = f;
        for (size_t j = col + 1; j < n; ++j) a[r * n + j] -= f * a[col * n + j];
      }
    }
  }
  return 0;
}

inline int gsl_linalg_LU_solve(const gsl_matrix* LU, const gsl_permutation* p,
                               const gsl_vector* b, gsl_vector* x) {
  const size_t n = LU->size1;
  const double* a = LU->data;
  // Apply permutation, forward substitution (L has unit diagonal).
  for (size_t i = 0; i < n; ++i) x->data[i] = b->data[p->data[i]];
  for (size_t i = 0; i < n; ++i)
    for (size_t j = 0; j < i; ++j) x->data[i] -= a[i * n + j] * x->data[j];
  // Back substitution with U.
  for (size_t i = n; i-- > 0;) {
    for (size_t j = i + 1; j < n; ++j) x->data[i] -= a[i * n + j] * x->data[j];
    x->data[i] /= a[i * n + i];
  }
  return 0;
}

#endif  // NUSI_REFSHIM_GSL_LINALG_H
