// Hand-written 2-D FV Rusanov reference kernel (independent implementation).
//
// Plays the role of the reference harness's `old_time_step`
// (`Unit test/correctness_test.cpp:118-174`): a direct, readably-indexed
// implementation of the same patch update the DSL specifies, written against
// multi-dimensional index helpers instead of generated stride arithmetic, so
// that agreement with the generated kernel is meaningful.
//
// Implements the GOLDEN bounds semantics (the reference's Unit-test kernel):
// directional evaluations trim the swept axis; temp arrays are
// zero-initialized, so the edge reads the generated kernel performs against
// never-written flux entries see zeros on both sides.
//
// Configuration is fixed to the reference test setup: dim=2, patch 4,
// halo 1, n_real=5, n_aux=5, n_patches given at runtime.

#include <cstring>

#include "euler.h"

namespace {

constexpr int kPatch = 4;
constexpr int kHalo = 1;
constexpr int kExtent = kPatch + 2 * kHalo;
constexpr int kReal = 5;
constexpr int kVars = 10;  // n_real + n_aux

// AoS enumerators (the role of the reference's AoSLexicographicEnumerator).
inline int idxQ(int p, int i, int j, int v) {
  return ((p * kExtent + i) * kExtent + j) * kVars + v;
}
inline int idxF(int p, int i, int j, int v) {
  return ((p * kExtent + i) * kExtent + j) * kReal + v;
}
inline int idxE(int p, int i, int j) {
  return (p * kExtent + i) * kExtent + j;
}

}  // namespace

extern "C" void reference_time_step(double* Q, double dt, int n_patches) {
  const int nq = n_patches * kExtent * kExtent * kVars;
  const int nf = n_patches * kExtent * kExtent * kReal;
  const int ne = n_patches * kExtent * kExtent;

  double* copy = new double[nq]();
  double* flux_x = new double[nf]();
  double* flux_y = new double[nf]();
  double* eig_x = new double[ne]();
  double* eig_y = new double[ne]();

  std::memcpy(copy, Q, nq * sizeof(double));

  for (int p = 0; p < n_patches; ++p) {
    // Directional flux + wave-speed evaluation (swept axis trimmed: golden).
    for (int i = kHalo; i < kPatch + kHalo; ++i) {
      for (int j = 0; j < kExtent; ++j) {
        Flux(&copy[idxQ(p, i, j, 0)], 0.0, &flux_x[idxF(p, i, j, 0)]);
        eig_x[idxE(p, i, j)] = maxEigenvalue(&copy[idxQ(p, i, j, 0)], 0.0);
      }
    }
    for (int i = 0; i < kExtent; ++i) {
      for (int j = kHalo; j < kPatch + kHalo; ++j) {
        Flux(&copy[idxQ(p, i, j, 0)], 1.0, &flux_y[idxF(p, i, j, 0)]);
        eig_y[idxE(p, i, j)] = maxEigenvalue(&copy[idxQ(p, i, j, 0)], 1.0);
      }
    }
    // Flux-difference update.
    for (int i = kHalo; i < kPatch + kHalo; ++i) {
      for (int j = 0; j < kExtent; ++j) {
        for (int v = 0; v < kReal; ++v) {
          copy[idxQ(p, i, j, v)] +=
              0.5 * (flux_x[idxF(p, i - 1, j, v)] - flux_x[idxF(p, i + 1, j, v)]);
        }
      }
    }
    for (int i = 0; i < kExtent; ++i) {
      for (int j = kHalo; j < kPatch + kHalo; ++j) {
        for (int v = 0; v < kReal; ++v) {
          copy[idxQ(p, i, j, v)] +=
              0.5 * (flux_y[idxF(p, i, j - 1, v)] - flux_y[idxF(p, i, j + 1, v)]);
        }
      }
    }
    // Rusanov dissipation (reference semantics: density slot only, var<1).
    for (int i = kHalo; i < kPatch + kHalo; ++i) {
      for (int j = 0; j < kExtent; ++j) {
        const double s_lo = max(&eig_x[idxE(p, i - 1, j)], &eig_x[idxE(p, i, j)]);
        const double s_hi = max(&eig_x[idxE(p, i + 1, j)], &eig_x[idxE(p, i, j)]);
        const double left = -s_lo * (Q[idxQ(p, i, j, 0)] - Q[idxQ(p, i - 1, j, 0)]);
        const double right = -s_hi * (Q[idxQ(p, i, j, 0)] - Q[idxQ(p, i + 1, j, 0)]);
        copy[idxQ(p, i, j, 0)] += 0.5 * dt * (left - right);
      }
    }
    for (int i = 0; i < kExtent; ++i) {
      for (int j = kHalo; j < kPatch + kHalo; ++j) {
        const double s_lo = max(&eig_y[idxE(p, i, j - 1)], &eig_y[idxE(p, i, j)]);
        const double s_hi = max(&eig_y[idxE(p, i, j + 1)], &eig_y[idxE(p, i, j)]);
        const double left = -s_lo * (Q[idxQ(p, i, j, 0)] - Q[idxQ(p, i, j - 1, 0)]);
        const double right = -s_hi * (Q[idxQ(p, i, j, 0)] - Q[idxQ(p, i, j + 1, 0)]);
        copy[idxQ(p, i, j, 0)] += 0.5 * dt * (left - right);
      }
    }
    // Interior write-back.
    for (int i = kHalo; i < kPatch + kHalo; ++i) {
      for (int j = kHalo; j < kPatch + kHalo; ++j) {
        for (int v = 0; v < kVars; ++v) {
          Q[idxQ(p, i, j, v)] = copy[idxQ(p, i, j, v)];
        }
      }
    }
  }

  delete[] copy;
  delete[] flux_x;
  delete[] flux_y;
  delete[] eig_x;
  delete[] eig_y;
}
