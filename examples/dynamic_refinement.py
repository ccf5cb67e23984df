"""Criteria-driven re-gridding: adaptive refinement over scan chunks.

The two-level hierarchy (:class:`NestedRefinement`) is static per
compilation — every shape is fixed so the coupled step jits.  Adaptivity
happens BETWEEN chunks, the standard recipe for AMR under XLA: integrate a
chunk, inspect a refinement criterion on the host (here: patch-wise max
gradient), move the refined region to track the feature, rebuild the
hierarchy (prolonging the new region from the running coarse solution), and
continue.  Compiled steps are cached per region shape, so re-gridding costs
one trace the first time each shape appears.

Run: python examples/dynamic_refinement.py [--cpu]
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from exahype_tpu.models import hyperbolic
from exahype_tpu.models.fv import build_fv_rusanov_kernel
from exahype_tpu.parallel import GridSolver, PatchGrid
from exahype_tpu.parallel.refine import NestedRefinement
from exahype_tpu.utils.config import KernelConfig
from exahype_tpu.utils.output import assemble_global, disassemble_global

GX = GY = 6
PATCH = 4
VELOCITY = (1.0, 0.0)

cfg = KernelConfig(
    dim=2, patch_size=PATCH, halo_size=1, n_real=1, n_aux=0, n_patches=GX * GY
)
grid = PatchGrid(config=cfg, grid_shape=(GX, GY))
flux, eig = hyperbolic.advection(VELOCITY)
kb = build_fv_rusanov_kernel(
    dim=2, patch_size=PATCH, halo_size=1, n_real=1, n_aux=0,
    n_patches=GX * GY, flux_impl=flux, eigenvalue_impl=eig,
)
solver = GridSolver(grid, kb, dx=1.0 / (GX * PATCH), kernel_dt="lambda")

# Gaussian bump near the left edge, advecting right.
n = GX * PATCH
x = (np.arange(n) + 0.5) / n
X, Y = np.meshgrid(x, x, indexing="ij")
u0 = np.exp(-(((X - 0.2) ** 2 + (Y - 0.5) ** 2) / 0.08**2))
coarse_Q = disassemble_global(grid, jnp.zeros(grid.state_shape), jnp.asarray(u0[..., None]))


def pick_region(coarse_Q, half_width=1):
    """Patch box around the patch with the largest gradient magnitude."""
    g = np.asarray(assemble_global(grid, coarse_Q))[..., 0]
    gx, gy = np.gradient(g)
    mag = np.hypot(gx, gy)
    patchwise = mag.reshape(GX, PATCH, GY, PATCH).max(axis=(1, 3))
    a, b = np.unravel_index(np.argmax(patchwise), patchwise.shape)
    lo = (max(a - half_width, 0), max(b - half_width, 0))
    hi = (min(a + half_width + 1, GX), min(b + half_width + 1, GY))
    return lo, hi


dt = 2.5e-3
chunk = 8
n_chunks = 10
regions = []
fine_Q = None
nested = None

for c in range(n_chunks):
    lo, hi = pick_region(coarse_Q)
    if nested is None or (lo, hi) != (nested.region_lo, nested.region_hi):
        nested = NestedRefinement(solver, region_lo=lo, region_hi=hi, factor=3)
        fine_Q = nested.prolong_initial(coarse_Q)  # re-grid: new fine level
    regions.append((lo, hi))
    coarse_Q, fine_Q = jax.jit(
        lambda cq, fq: nested.run(cq, fq, chunk, dt)
    )(coarse_Q, fine_Q)

g = np.asarray(assemble_global(grid, coarse_Q))[..., 0]
print("chunks:", n_chunks, "| refined regions visited:", sorted(set(regions)))
print(f"final max={g.max():.3f} at x={x[np.unravel_index(g.argmax(), g.shape)[0]]:.3f} "
      f"(bump started at 0.2, advected {dt * chunk * n_chunks:.3f})")
assert len(set(regions)) > 1, "region should track the moving bump"
print("refined region tracked the feature ✓")
