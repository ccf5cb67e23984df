"""Benchmark: DOF-updates/sec/chip on the flagship 3-D Euler patch update.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): 1e9 DOF-updates/sec/chip.

Runs on the default platform (the real TPU chip under axon).  The measured
program is the full solver step — halo exchange + FV Rusanov patch update —
scanned CHUNK steps per dispatch, input donated so XLA updates in place.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_DOF_PER_SEC = 1.0e9


def main():
    from exahype_tpu.models import euler
    from exahype_tpu.models.rusanov import build_rusanov_kernel
    from exahype_tpu.parallel import GridSolver, PatchGrid
    from exahype_tpu.utils.config import KernelConfig

    dim = 3
    patch_size = 6  # extent 8: lane-tiled Pallas working set fits VMEM
    grid_shape = (16, 16, 8)  # 2048 patches
    n_real, n_aux = 5, 0
    chunk = 10  # steps fused into one dispatch via scan
    dtype = np.float32

    cfg = KernelConfig(
        dim=dim,
        patch_size=patch_size,
        halo_size=1,
        n_real=n_real,
        n_aux=n_aux,
        n_patches=int(np.prod(grid_shape)),
    )
    grid = PatchGrid(config=cfg, grid_shape=grid_shape)
    kb = build_rusanov_kernel(
        dim=dim,
        patch_size=patch_size,
        halo_size=1,
        n_real=n_real,
        n_aux=n_aux,
        n_patches=cfg.n_patches,
    )
    solver = GridSolver(grid, kb, dx=0.1)

    rng = np.random.default_rng(0)
    Q = rng.uniform(0.1, 1.0, size=grid.state_shape).astype(dtype)
    Q[..., 0] += 1.0
    Q[..., dim + 1] += 5.0
    Q = jnp.asarray(Q)

    dt = jnp.asarray(1e-4, dtype)

    @jax.jit
    def run_chunk(q):
        def body(carry, _):
            return solver.step(carry, dt), None

        out, _ = jax.lax.scan(body, q, None, length=chunk)
        return out

    # Warmup / compile.
    Q = run_chunk(Q)
    Q.block_until_ready()

    # Timed.
    n_rounds = 5
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        Q = run_chunk(Q)
    Q.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps = n_rounds * chunk
    dof = cfg.dofs()  # interior real-variable DOFs per update
    dof_per_sec = dof * steps / elapsed

    print(
        json.dumps(
            {
                "metric": "fv_rusanov_euler3d_dof_updates_per_sec_per_chip",
                "value": dof_per_sec,
                "unit": "DOF-updates/s",
                "vs_baseline": dof_per_sec / BASELINE_DOF_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
