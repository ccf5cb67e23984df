"""The PRODUCTION limited configuration, exactly as benched (bench.py's
second official metric): 3-D compressible-Euler ADER-DG p3 with

- the fused boundary-faces-only Pallas predictor supplying the candidate
  AND the per-row face fluxes (its flux contract composes since round 3),
- a-posteriori MOOD detection (relaxed DMP + Euler admissibility),
- the ROW-GATHERED subcell FV fallback (`troubled_capacity` counts
  last-axis rows; each gather moves contiguous lane tiles — the TPU-fast
  shape), and
- DG/FV interface matching, so the composite conserves to rounding.

On a v5e chip this runs at 1.30 GDOF-updates/s with a 3.9 %-troubled
planar shock (the unlimited step: 3.62) — see docs/PERFORMANCE.md.

Run: python examples/limited_shock_production.py [--cpu]
(CPU uses interpret-mode Pallas on a smaller grid.)
"""

import sys

import jax

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics
from exahype_tpu.models.aderdg_pallas import PallasADERDG
from exahype_tpu.models.limiter import LimitedADERDG, euler_admissible

grid_shape = (32, 4, 32) if CPU else (256, 8, 128)
capacity_rows = 32 if CPU else 256  # last-axis rows, not cells

flux, eig = euler_physics(dim=3, n_real=5)
solver = ADERDGSolver(
    dim=3, order=3, n_vars=5, grid_shape=grid_shape,
    flux_fn=flux, max_eigenvalue_fn=eig, dx=1.0 / grid_shape[0],
)
accel = PallasADERDG(
    solver, tile0=2 if CPU else 4, boundary_faces_only=True,
    interpret=CPU, vmem_limit_bytes=126 * 1024 * 1024,
)
limited = LimitedADERDG(
    solver,
    admissible=euler_admissible(dim=3, gamma=1.4),
    troubled_capacity=capacity_rows,
    troubled_granularity="row",
    accelerator=accel,
)

# Planar Sod-like shock along axis 0.
x = np.arange(grid_shape[0]).reshape(-1, 1, 1) / grid_shape[0]
left = np.broadcast_to(x < 0.5, grid_shape)
no_var = (
    solver.state_shape[: solver.var_axis]
    + solver.state_shape[solver.var_axis + 1 :]
)
rho = np.broadcast_to(np.where(left, 1.0, 0.125), no_var).astype(np.float32)
p = np.broadcast_to(np.where(left, 1.0, 0.1), no_var).astype(np.float32)
z = np.zeros(no_var, np.float32)
Q = jnp.asarray(np.stack([rho, z, z, z, p / 0.4], axis=solver.var_axis))
dt = jnp.asarray(0.04 / grid_shape[0], np.float32)


def main():
    m0 = np.asarray(solver.total_mass(Q))
    n_steps = 3 if CPU else 20
    out = jax.jit(lambda q: limited.run(q, n_steps, dt))(Q)
    m1 = np.asarray(solver.total_mass(out))
    ok = euler_admissible(dim=3, gamma=1.4)(out, solver.var_axis)
    print(f"steps: {n_steps}, grid: {grid_shape}, capacity: {capacity_rows} rows")
    print(f"mass drift:  {m1[0] - m0[0]:+.3e}")
    print(f"energy drift:{m1[4] - m0[4]:+.3e}")
    print(f"admissible everywhere: {bool(np.asarray(ok).all())}")
    assert bool(np.asarray(jnp.isfinite(out)).all())


if __name__ == "__main__":
    main()
