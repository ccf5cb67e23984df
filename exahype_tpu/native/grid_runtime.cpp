// Native grid runtime: periodic halo exchange + time loop around the
// generated kernel, entirely in C++.
//
// The reference delegates this layer to the downstream Peano/ExaHyPE2
// framework (SURVEY.md section 0: "no scheduler, no distributed runtime ...
// those live in the downstream ExaHyPE2/Peano C++ framework", visible only
// through the includes the printer emits, exahype/printers/CPPPrinter.py:
// 321-354).  This file supplies the part the generated kernel actually
// needs to run standalone on a patch grid: the inter-patch halo exchange
// (the semantics of parallel/grid.py::PatchGrid.halo_fill, axis-by-axis so
// corner ghosts propagate) and the chunked step loop, OpenMP-parallel over
// patches.  The Python driver calls exa_run_grid once per chunk instead of
// once per step, so the loop runs at native speed with no FFI round trips.
//
// Layout: AoS grid state [g0, g1(, g2), extent^dim, n_vars] in C order --
// patch (c0, c1, c2) is a contiguous [extent^dim, n_vars] block at linear
// patch index ((c0*g1)+c1)*g2+c2.  Matches PatchGrid.state_shape exactly.

#include <cstddef>

extern "C" void time_step(double *Q, double dt);

namespace {

inline long patch_index2(int c0, int c1, const int *g) {
  return (long)c0 * g[1] + c1;
}

inline long patch_index3(int c0, int c1, int c2, const int *g) {
  return ((long)c0 * g[1] + c1) * g[2] + c2;
}

// Copy one axis-d halo slab of patch `dst` from patch `src`:
// dst cells with s[d] in [dst_lo, dst_lo+h) get src cells at s[d]+shift,
// full extent on every other axis (so halos written by earlier axes are
// re-exported -- the corner-propagation order of PatchGrid.halo_fill).
void copy_slab2(double *Q, long dst, long src, int d, int dst_lo, int shift,
                int e, int h, int V) {
  const long pe = (long)e * e * V;
  double *qd = Q + dst * pe;
  const double *qs = Q + src * pe;
  int lo[2] = {0, 0}, hi[2] = {e, e};
  lo[d] = dst_lo;
  hi[d] = dst_lo + h;
  for (int s0 = lo[0]; s0 < hi[0]; ++s0)
    for (int s1 = lo[1]; s1 < hi[1]; ++s1) {
      int t0 = s0 + (d == 0 ? shift : 0);
      int t1 = s1 + (d == 1 ? shift : 0);
      long od = ((long)s0 * e + s1) * V;
      long os = ((long)t0 * e + t1) * V;
      for (int v = 0; v < V; ++v) qd[od + v] = qs[os + v];
    }
}

void copy_slab3(double *Q, long dst, long src, int d, int dst_lo, int shift,
                int e, int h, int V) {
  const long pe = (long)e * e * e * V;
  double *qd = Q + dst * pe;
  const double *qs = Q + src * pe;
  int lo[3] = {0, 0, 0}, hi[3] = {e, e, e};
  lo[d] = dst_lo;
  hi[d] = dst_lo + h;
  for (int s0 = lo[0]; s0 < hi[0]; ++s0)
    for (int s1 = lo[1]; s1 < hi[1]; ++s1)
      for (int s2 = lo[2]; s2 < hi[2]; ++s2) {
        int t0 = s0 + (d == 0 ? shift : 0);
        int t1 = s1 + (d == 1 ? shift : 0);
        int t2 = s2 + (d == 2 ? shift : 0);
        long od = (((long)s0 * e + s1) * e + s2) * V;
        long os = (((long)t0 * e + t1) * e + t2) * V;
        for (int v = 0; v < V; ++v) qd[od + v] = qs[os + v];
      }
}

}  // namespace

namespace {

// Mirror one wall slab of a boundary patch: ghost layer k (of h) along
// axis d takes the interior layer (flip) times the per-variable sign --
// the PatchGrid._reflect + reflect_fn semantics with a sign-table hook
// (signs[d*V + v]; the Euler hook is -1 on the normal momentum slot).
void mirror_slab2(double *Q, long p, int d, int side, int e, int P, int h,
                  int V, const double *signs) {
  double *q = Q + p * (long)e * e * V;
  for (int k = 0; k < h; ++k) {
    int dst = side == 0 ? k : P + h + k;
    // flip: ghost layer k mirrors interior layer (h-1-k) offset from the
    // wall: low wall ghosts [0,h) <- interiors [h,2h) flipped; high wall
    // ghosts [P+h,P+2h) <- interiors [P,P+h) flipped.
    int src = side == 0 ? 2 * h - 1 - k : P + h - 1 - k;
    int lo[2] = {0, 0}, hi[2] = {e, e};
    lo[d] = dst;
    hi[d] = dst + 1;
    for (int s0 = lo[0]; s0 < hi[0]; ++s0)
      for (int s1 = lo[1]; s1 < hi[1]; ++s1) {
        int t0 = d == 0 ? src : s0;
        int t1 = d == 1 ? src : s1;
        long od = ((long)s0 * e + s1) * V;
        long os = ((long)t0 * e + t1) * V;
        for (int v = 0; v < V; ++v)
          q[od + v] = signs[d * V + v] * q[os + v];
      }
  }
}

void mirror_slab3(double *Q, long p, int d, int side, int e, int P, int h,
                  int V, const double *signs) {
  double *q = Q + p * (long)e * e * e * V;
  for (int k = 0; k < h; ++k) {
    int dst = side == 0 ? k : P + h + k;
    int src = side == 0 ? 2 * h - 1 - k : P + h - 1 - k;
    int lo[3] = {0, 0, 0}, hi[3] = {e, e, e};
    lo[d] = dst;
    hi[d] = dst + 1;
    for (int s0 = lo[0]; s0 < hi[0]; ++s0)
      for (int s1 = lo[1]; s1 < hi[1]; ++s1)
        for (int s2 = lo[2]; s2 < hi[2]; ++s2) {
          int t0 = d == 0 ? src : s0;
          int t1 = d == 1 ? src : s1;
          int t2 = d == 2 ? src : s2;
          long od = (((long)s0 * e + s1) * e + s2) * V;
          long os = (((long)t0 * e + t1) * e + t2) * V;
          for (int v = 0; v < V; ++v)
            q[od + v] = signs[d * V + v] * q[os + v];
        }
  }
}

}  // namespace

// Halo fill over the patch grid (PatchGrid.halo_fill semantics).
// `reflective` != 0 overwrites the domain-face halos with the wall mirror
// (per-axis/per-variable `signs`) after each axis's exchange, exactly the
// PatchGrid ordering.  Writes touch only halo layers; reads touch only
// interior layers of the same axis, so the per-axis patch loop is
// race-free under OpenMP.
extern "C" void exa_halo_fill_bc(double *Q, const int *g, int dim, int P,
                                 int h, int V, int reflective,
                                 const double *signs) {
  if (h == 0) return;
  const int e = P + 2 * h;
  if (dim == 2) {
    for (int d = 0; d < 2; ++d) {
#pragma omp parallel for collapse(2) schedule(static)
      for (int c0 = 0; c0 < g[0]; ++c0)
        for (int c1 = 0; c1 < g[1]; ++c1) {
          int nb_lo[2] = {c0, c1}, nb_hi[2] = {c0, c1};
          nb_lo[d] = (nb_lo[d] - 1 + g[d]) % g[d];
          nb_hi[d] = (nb_hi[d] + 1) % g[d];
          long p = patch_index2(c0, c1, g);
          // Low halo [0,h) <- low neighbour's interior high slab [P,P+h).
          copy_slab2(Q, p, patch_index2(nb_lo[0], nb_lo[1], g), d, 0, P, e, h, V);
          // High halo [P+h,e) <- high neighbour's interior low slab [h,2h).
          copy_slab2(Q, p, patch_index2(nb_hi[0], nb_hi[1], g), d, P + h, -P,
                     e, h, V);
          if (reflective) {
            int c[2] = {c0, c1};
            if (c[d] == 0) mirror_slab2(Q, p, d, 0, e, P, h, V, signs);
            if (c[d] == g[d] - 1) mirror_slab2(Q, p, d, 1, e, P, h, V, signs);
          }
        }
    }
  } else {
    for (int d = 0; d < 3; ++d) {
#pragma omp parallel for collapse(3) schedule(static)
      for (int c0 = 0; c0 < g[0]; ++c0)
        for (int c1 = 0; c1 < g[1]; ++c1)
          for (int c2 = 0; c2 < g[2]; ++c2) {
            int nb_lo[3] = {c0, c1, c2}, nb_hi[3] = {c0, c1, c2};
            nb_lo[d] = (nb_lo[d] - 1 + g[d]) % g[d];
            nb_hi[d] = (nb_hi[d] + 1) % g[d];
            long p = patch_index3(c0, c1, c2, g);
            copy_slab3(Q, p, patch_index3(nb_lo[0], nb_lo[1], nb_lo[2], g), d,
                       0, P, e, h, V);
            copy_slab3(Q, p, patch_index3(nb_hi[0], nb_hi[1], nb_hi[2], g), d,
                       P + h, -P, e, h, V);
            if (reflective) {
              int c[3] = {c0, c1, c2};
              if (c[d] == 0) mirror_slab3(Q, p, d, 0, e, P, h, V, signs);
              if (c[d] == g[d] - 1)
                mirror_slab3(Q, p, d, 1, e, P, h, V, signs);
            }
          }
    }
  }
}

// Backwards-compatible periodic entry point.
extern "C" void exa_halo_fill(double *Q, const int *g, int dim, int P, int h,
                              int V) {
  exa_halo_fill_bc(Q, g, dim, P, h, V, 0, nullptr);
}

// Chunked native time loop: n_steps x (halo exchange + generated kernel).
// `kdt` is whatever scalar the kernel expects (lambda = dt/dx for the
// corrected FV spec; physical dt for the canonical reference spec) -- the
// Python wrapper converts, exactly like GridSolver.step.
extern "C" void exa_run_grid_bc(double *Q, double kdt, int n_steps,
                                const int *g, int dim, int P, int h, int V,
                                int reflective, const double *signs) {
  for (int s = 0; s < n_steps; ++s) {
    exa_halo_fill_bc(Q, g, dim, P, h, V, reflective, signs);
    time_step(Q, kdt);
  }
}

extern "C" void exa_run_grid(double *Q, double kdt, int n_steps, const int *g,
                             int dim, int P, int h, int V) {
  exa_run_grid_bc(Q, kdt, n_steps, g, dim, P, h, V, 0, nullptr);
}
