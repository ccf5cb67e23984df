"""Linear-kernel (Cauchy–Kovalewski) probe: CK vs Picard on the chip.

The reference family's generator emits LINEAR aderdg kernels for seismic
PDEs because the Picard iteration is pure overhead there: the CK
recursion needs N spatial-operator applications on the SPATIAL array
where Picard does (N+1) sweeps over an (N+1)×-larger space-time array —
an ~(N+1)²/N arithmetic advantage that grows with order, on top of the
(N+1)× predictor working-set shrink (the HBM lever on TPU).

This probe times one full ADER-DG step (predictor + Riemann + corrector)
of 3-D elasticity (9 vars, the ExaSeis dimensionality) at p3 and p5 with
both predictors on identical grids, and asserts step parity at the
scheme-order level on smooth data.  Honest timing: chained steps + final
host fetch (the axon tunnel's block_until_ready does not sync; see
docs/PERFORMANCE.md calibration caveat).

Usage: python scripts/ck_probe.py [--cpu]   (one JSON line per config)
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from exahype_tpu.models.aderdg import ADERDGSolver, wrap_var_last
from exahype_tpu.models.elastic import elastic3d, plane_p_wave_3d


def chained_time(step, Q, dt, n_steps=20):
    run = jax.jit(
        lambda q: jax.lax.scan(
            lambda c, _: (step(c, dt), None), q, None, length=5
        )[0]
    )
    q = run(Q)
    _ = np.asarray(q[(0,) * (q.ndim - 1)])  # hard sync
    t0 = time.perf_counter()
    for _ in range(n_steps // 5):
        q = run(q)
    _ = np.asarray(q[(0,) * (q.ndim - 1)])
    return (time.perf_counter() - t0) / n_steps


def main():
    on_cpu = jax.default_backend() == "cpu"
    configs = ((3, (8, 4, 8)),) if on_cpu else ((3, (64, 4, 32)),
                                                (5, (32, 4, 32)))
    for order, grid in configs:
        flux, eig = elastic3d()
        outs = {}
        times = {}
        for mode in ("picard", "ck"):
            solver = ADERDGSolver(
                dim=3, order=order, n_vars=9, grid_shape=grid,
                flux_fn=wrap_var_last(flux),
                max_eigenvalue_fn=wrap_var_last(eig),
                dx=1.0 / grid[0], predictor_mode=mode,
            )
            coords = solver.nodes_meshgrid()
            no_var = tuple(
                s for e, s in enumerate(solver.state_shape)
                if e != solver.var_axis
            )
            X = np.broadcast_to(
                np.squeeze(np.asarray(coords[0]), solver.var_axis), no_var
            )
            dtype = np.float64 if on_cpu else np.float32
            Q = jnp.asarray(
                np.moveaxis(plane_p_wave_3d(X, 0.0), -1, solver.var_axis),
                dtype,
            )
            dt = jnp.asarray(2e-4, Q.dtype)
            outs[mode] = np.asarray(solver.step(Q, dt), np.float64)
            times[mode] = chained_time(solver.step, Q, dt) * 1e3
        # Same scheme order: the predictors are different degree-N
        # polynomials, so steps agree to O(dt^{N+2}) — far below the
        # field scale on smooth data.  In f32 the scheme-order gap sits
        # below roundoff, so the bound is the accumulation of ~N
        # operator applications in single precision (same 2e-5 scale as
        # the Z4 SoA/einsum f32 parity, docs/PERFORMANCE.md).
        err = float(np.max(np.abs(outs["ck"] - outs["picard"])))
        tol = 1e-6 if dtype == np.float64 else 2e-5
        assert err < tol, err
        dofs = int(np.prod(grid)) * (order + 1) ** 3 * 9
        print(
            json.dumps(
                {
                    "order": order,
                    "grid": list(grid),
                    "dofs": dofs,
                    "picard_ms": round(times["picard"], 2),
                    "ck_ms": round(times["ck"], 2),
                    "ck_speedup": round(times["picard"] / times["ck"], 2),
                    "ck_gdof_s": round(dofs / times["ck"] / 1e6, 3),
                    "step_parity": err,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
