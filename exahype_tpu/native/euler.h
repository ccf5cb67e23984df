// Declarations for the native Euler physics (see euler.cpp).
#pragma once

int Flux(const double* Q, double normal, double* F);
double maxEigenvalue(const double* Q, double normal);
double max(const double* a, const double* b);
