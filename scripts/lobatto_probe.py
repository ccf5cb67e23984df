"""Lobatto-vs-Legendre fused ADER-DG probe on the real chip.

Same config as the official bench (p3 3-D Euler, 256k cells, bfo fused
predictor); one JSON line per basis.  Honest chained timing (see
docs/PERFORMANCE.md calibration caveat).  The two bases share the kernel
STRUCTURE — only the embedded operator constants differ — so any timing
gap is data-dependent scheduling, expected ~none; the point is a measured
number instead of an assumption (Lobatto's phi0/phi1 are unit vectors, so
its face extrapolation multiplies by 0/1 constants Mosaic can fold).
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics
from exahype_tpu.models.aderdg_pallas import PallasADERDG


def main():
    grid = (256, 8, 128)
    dtype = np.float32
    for basis in ("legendre", "lobatto"):
        flux, eig = euler_physics(dim=3, n_real=5)
        solver = ADERDGSolver(
            dim=3, order=3, n_vars=5, grid_shape=grid,
            flux_fn=flux, max_eigenvalue_fn=eig, dx=1.0 / grid[0],
            basis=basis,
        )
        fused = PallasADERDG(
            solver, tile0=4, boundary_faces_only=True,
            vmem_limit_bytes=126 * 1024 * 1024,
        )
        rng = np.random.default_rng(0)
        no_var = (
            solver.state_shape[: solver.var_axis]
            + solver.state_shape[solver.var_axis + 1 :]
        )
        rho = (1.0 + 0.2 * rng.random(no_var)).astype(dtype)
        comps = [rho, rho, 0.5 * rho, 0.25 * rho, 5.0 + 0.5 * rho * 1.3125]
        Q = jnp.asarray(np.stack(comps, axis=solver.var_axis))
        dt = jnp.asarray(1e-4, dtype)

        run = jax.jit(
            lambda q: jax.lax.scan(
                lambda c, _: (fused.step(c, dt), None), q, None, length=5
            )[0]
        )
        q = run(Q)
        _ = np.asarray(q[(0,) * (q.ndim - 1)])  # hard sync
        t0 = time.perf_counter()
        for _ in range(6):
            q = run(q)
        _ = np.asarray(q[(0,) * (q.ndim - 1)])
        dt_step = (time.perf_counter() - t0) / 30
        print(
            json.dumps(
                {
                    "basis": basis,
                    "ms_per_step": dt_step * 1e3,
                    "gdof_s": solver.dofs() / dt_step / 1e9,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
