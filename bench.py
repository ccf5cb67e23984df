"""Benchmark: DOF-updates/sec/chip on the flagship 3-D Euler patch update.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): 1e9 DOF-updates/sec/chip.

Runs on the default platform (the real TPU chip under axon).  The measured
program is the full solver step — halo exchange + the fused Pallas FV
Rusanov patch-update kernel (SoA-P layout, VMEM-resident temps) — scanned
CHUNK steps per dispatch with the state donated.
"""

from __future__ import annotations

import json
import time

import jax

# Persistent compilation cache: repeat bench runs skip the multi-minute
# first compile through the axon tunnel.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_DOF_PER_SEC = 1.0e9


def main():
    from exahype_tpu.models.rusanov import build_rusanov_kernel
    from exahype_tpu.parallel import GridSolver, TpuPatchGrid
    from exahype_tpu.utils.config import KernelConfig

    dim = 3
    patch_size = 4  # extent 6
    # Grid tail chosen for perfect VMEM tiling of the SoA-P state: the
    # trailing axes (8, 128) are exactly one (sublane, lane) tile, so the
    # fused kernel and the halo exchange run with zero lane padding and no
    # per-step relayouts.
    grid_shape = (8, 8, 128)  # 8192 patches
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
    grid = TpuPatchGrid(config=cfg, grid_shape=grid_shape)
    kb = build_rusanov_kernel(
        dim=dim,
        patch_size=patch_size,
        halo_size=1,
        n_real=n_real,
        n_aux=n_aux,
        n_patches=cfg.n_patches,
    )
    # One (8,128)-tailed block of 2048 patches per grid step; the working set
    # needs the raised scoped-VMEM ceiling (the v5e accepts >=100MB).
    solver = GridSolver(
        grid,
        kb,
        dx=0.1,
        backend="pallas",
        tile_patches=2048,
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    rng = np.random.default_rng(0)
    aos = rng.uniform(0.1, 1.0, size=(cfg.n_patches,) + (cfg.extent,) * dim + (cfg.n_vars,))
    aos[..., 0] += 1.0
    aos[..., dim + 1] += 5.0
    Q = grid.from_aos(jnp.asarray(aos.astype(dtype)))

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
    n_rounds = 10
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
