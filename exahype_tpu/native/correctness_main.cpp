// Native differential correctness harness (standalone).
//
// Rebuild of the reference's `Unit test/correctness_test.cpp:176-221`
// pattern: sine-initialize two identical state arrays, run the GENERATED
// kernel on one and the hand-written reference kernel on the other, count
// element differences, print the verdict ("no differences! :)" on success)
// and dump both states for inspection.
//
// Build (see tests/test_native_harness.py):
//   g++ -O2 -ffp-contract=off correctness_main.cpp reference_kernel.cpp \
//       euler.cpp generated_kernel.cpp -o correctness_test
// where generated_kernel.cpp comes from CPPPrinter(kernel, policy="golden").

#include <cmath>
#include <cstdio>

#include "euler.h"

extern "C" void time_step(double* Q, double dt);  // generated kernel
extern "C" void reference_time_step(double* Q, double dt, int n_patches);

namespace {

constexpr int kNPatches = 1;
constexpr int kExtent = 6;   // patch 4 + 2*halo
constexpr int kVars = 10;    // n_real + n_aux
constexpr int kSize = kNPatches * kExtent * kExtent * kVars;

void init_sine(double* Q) {
  for (int i = 0; i < kSize; ++i) {
    Q[i] = std::sin(3.141 * i / kSize);
  }
}

void show_state(const char* label, const double* Q) {
  std::printf("%s[0:8] =", label);
  for (int i = 0; i < 8; ++i) {
    std::printf(" %.12f", Q[i]);
  }
  std::printf("\n");
}

}  // namespace

int main() {
  double generated[kSize];
  double reference[kSize];
  init_sine(generated);
  init_sine(reference);

  const double dt = 1.0;
  time_step(generated, dt);
  reference_time_step(reference, dt, kNPatches);

  int differences = 0;
  double max_abs = 0.0;
  for (int i = 0; i < kSize; ++i) {
    const double diff = std::fabs(generated[i] - reference[i]);
    if (diff > max_abs) max_abs = diff;
    if (diff > 1e-12) {
      ++differences;
    }
  }

  if (differences == 0) {
    std::printf("no differences! :)\n");
  } else {
    std::printf("%d differences (max |diff| = %g) :(\n", differences, max_abs);
    show_state("generated", generated);
    show_state("reference", reference);
  }
  return differences == 0 ? 0 : 1;
}
