"""p5/p7 MXU probe (VERDICT r2 item 6): measure, don't assert.

PERFORMANCE.md's plateau argument claims the MXU cannot help at p3 (K=4
contractions) and that breaking the plateau "would require basis sizes
>=8/128".  n_nodes=8 IS order 7 — expressible with the existing
order-generic operators.  This probe times, on the real chip:

- the pure-XLA ADER-DG step at p3/p5/p7 (its ``_apply`` is a tensordot →
  ``dot_general`` → MXU-eligible on TPU), and
- the fused Pallas step (unrolled VPU scalar contractions) at the same
  orders,

on identical grids, and greps the XLA path's HLO for MXU ``dot``
fusions.  Honest timing: chained steps + final host fetch (the axon
tunnel's ``block_until_ready`` does not sync, and identical repeated
dispatches are served from a cache — see docs/PERFORMANCE.md round-2
calibration caveat).

Usage: python scripts/mxu_probe.py [--orders 3,5,7]
  (writes one JSON line per config; --orders filters the order sweep —
  e.g. ``--orders 7`` for the long-compile p7 validation run alone)
"""

from __future__ import annotations

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics


def euler_state(solver, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    no_var = (
        solver.state_shape[: solver.var_axis]
        + solver.state_shape[solver.var_axis + 1 :]
    )
    rho = (1.0 + 0.2 * rng.random(no_var)).astype(dtype)
    comps = [rho, rho, 0.5 * rho, 0.25 * rho, 5.0 + 0.66 * rho]
    return jnp.asarray(np.stack(comps, axis=solver.var_axis))


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", default="3,5,7")
    sel = {int(o) for o in ap.parse_args().orders.split(",")}
    # Small tail so the p7 fused block fits VMEM (p7 nodal bytes/cell are
    # (8/4)^3 = 8x the p3 ones).
    for order, grid in ((3, (64, 4, 32)), (5, (32, 4, 32)), (7, (16, 4, 32))):
        if order not in sel:
            continue
        flux, eig = euler_physics(dim=3, n_real=5)
        solver = ADERDGSolver(
            dim=3, order=order, n_vars=5, grid_shape=grid,
            flux_fn=flux, max_eigenvalue_fn=eig, dx=1.0 / grid[0],
        )
        Q = euler_state(solver)
        dt = jnp.asarray(2e-5, jnp.float32)
        dofs = solver.dofs()

        # XLA path: tensordot contractions -> dot_general (MXU-eligible).
        t_xla = chained_time(solver.step, Q, dt)
        hlo = (
            jax.jit(solver.step).lower(Q, dt).compile().as_text()
        )
        n_dots = hlo.count(" dot(") + hlo.count(" dot.")
        has_convert_dot = "dot" in hlo

        # Fused Pallas path: unrolled VPU scalar contractions.
        from exahype_tpu.models.aderdg_pallas import PallasADERDG

        try:
            fused = PallasADERDG(
                solver, tile0=1, vmem_limit_bytes=126 * 1024 * 1024
            )
            t_pallas = chained_time(fused.step, Q, dt)
        except Exception:  # VMEM infeasibility is a result, not a crash
            import traceback

            traceback.print_exc()
            t_pallas = None
        print(
            json.dumps(
                {
                    "order": order,
                    "n_nodes": order + 1,
                    "grid": list(grid),
                    "dofs": dofs,
                    "xla_ms_per_step": t_xla * 1e3,
                    "xla_gdof_s": dofs / t_xla / 1e9,
                    "xla_hlo_dot_count": n_dots,
                    "xla_hlo_mentions_dot": has_convert_dot,
                    "pallas_ms_per_step": None if t_pallas is None else t_pallas * 1e3,
                    "pallas_gdof_s": None if t_pallas is None else dofs / t_pallas / 1e9,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
