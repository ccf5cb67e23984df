"""FV tree-pool economics probe: pool vs uniformly-fine grid on the chip.

Round-3 found the ADER-DG pool wins from ~9 % refined at 48² but the FV
pool (the spec-DSL kernel path) lost at entry sizes — 0.61× at 24²/8.3 %,
0.87× at 48²/2.8 % — because the AoS JAX fine path carries fixed costs
the SoA ADER-DG pool does not (docs/PERFORMANCE.md "Tree-AMR economics").
Round 4 routes the pool's fine kernel through the fused Pallas VMEM
kernel (``PatchPoolRefinement(fine_backend="pallas")``, the same kernel
`parallel/shard.py` ships per shard) and this probe measures whether
that flips the entry-size verdict.

Timed unit: one COARSE step (pool: coarse advance + r fine substeps +
restriction + reflux; uniform: r substeps of the full fine grid).  The
uniform comparator is reported on BOTH backends — the honest speedup is
against the faster one.  Chained timing + final host fetch (the axon
tunnel's block_until_ready does not sync; PERFORMANCE.md calibration
caveat).

Usage: python scripts/pool_probe.py [--small] [--cpu]
  (one JSON line per config; --cpu = interpret-mode smoke run)
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from exahype_tpu.models.fv import build_fv_rusanov_kernel
from exahype_tpu.parallel import GridSolver, PatchGrid, TpuPatchGrid
from exahype_tpu.parallel.pool import PatchPoolRefinement
from exahype_tpu.utils.config import KernelConfig

PATCH = 4
FACTOR = 2
DT = 2e-4
N_INNER = 25  # coarse steps scanned INSIDE one jit dispatch: the
# per-dispatch tunnel round-trip is ~0.5-1 ms — the same magnitude as
# one coarse step — so per-step dispatch timing swings 0.7x-1.6x
# between runs.  One dispatch per 25 device steps puts device time
# >10x above the dispatch floor.
N_OUTER = 8  # timed dispatches (200 coarse steps total per config)


def euler_blob_state(grid, seed=0):
    """Positive-density/pressure Euler state with a central density blob
    (AoS [n_patches, (p+2h)^2, n_real])."""
    cfg = grid.config
    n = grid.grid_shape[0] * cfg.patch_size
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    rho = 1.0 + 0.5 * np.exp(
        -(((X - 0.5) ** 2 + (Y - 0.5) ** 2) / 0.02)
    )
    p = 1.0 + 0.5 * np.exp(-(((X - 0.5) ** 2 + (Y - 0.5) ** 2) / 0.02))
    E = p / 0.4 + 0.5 * rho * 0.01
    comp = np.stack(
        [rho, 0.1 * rho, -0.05 * rho, np.zeros_like(rho), E], axis=-1
    )
    from exahype_tpu.utils.output import disassemble_global

    return disassemble_global(
        grid, jnp.zeros(grid.state_shape, jnp.float32),
        jnp.asarray(comp, jnp.float32),
    )


INTERPRET = False  # --cpu smoke mode


def make_fv_solver(gx, backend="jax", **kw):
    if backend == "pallas" and INTERPRET:
        kw.setdefault("interpret", True)
    cfg = KernelConfig(
        dim=2, patch_size=PATCH, halo_size=1, n_real=5, n_aux=0,
        n_patches=gx * gx,
    )
    grid_cls = TpuPatchGrid if backend == "pallas" else PatchGrid
    grid = grid_cls(config=cfg, grid_shape=(gx, gx))
    kb = build_fv_rusanov_kernel(
        dim=2, patch_size=PATCH, halo_size=1, n_real=5, n_aux=0,
        n_patches=gx * gx,
    )
    return GridSolver(
        grid, kb, dx=1.0 / (gx * PATCH), kernel_dt="lambda",
        backend=backend, **kw,
    )


def time_uniform(gx_fine, backend):
    solver = make_fv_solver(gx_fine, backend=backend)
    Q = euler_blob_state(
        solver.grid if backend != "pallas" else PatchGrid(
            config=solver.grid.config, grid_shape=solver.grid.grid_shape
        )
    )
    if backend == "pallas":
        Q = solver.grid.from_aos(
            PatchGrid(
                config=solver.grid.config,
                grid_shape=solver.grid.grid_shape,
            ).to_batched(Q)
        )
    dtf = DT / FACTOR
    run = jax.jit(
        lambda q: jax.lax.scan(
            lambda c, _: (solver.step(c, dtf), None), q, None,
            length=FACTOR * N_INNER,
        )[0]
    )
    q = run(Q)
    _ = np.asarray(jax.tree.leaves(q)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(N_OUTER):
        q = run(q)
    _ = np.asarray(jax.tree.leaves(q)[0]).ravel()[0]
    return (time.perf_counter() - t0) / (N_OUTER * N_INNER)


def time_pool(gx, frac, fine_backend):
    solver = make_fv_solver(gx, backend="jax")
    n_ref = max(1, round(frac * gx * gx))
    kw = {}
    if fine_backend == "pallas":
        kw = dict(fine_backend="pallas")
        if INTERPRET:
            kw["fine_backend_kwargs"] = dict(interpret=True)
    # Refine a compact blob around the centre (the production shape).
    mask = np.zeros((gx, gx), bool)
    order = np.argsort(
        (np.indices((gx, gx))[0] - gx / 2 + 0.5) ** 2
        + (np.indices((gx, gx))[1] - gx / 2 + 0.5) ** 2,
        axis=None,
    )
    mask.flat[order[:n_ref]] = True
    pool = PatchPoolRefinement(
        solver, capacity=n_ref, factor=FACTOR, **kw
    )
    tables = pool.build_tables(mask)
    Qc = euler_blob_state(solver.grid)
    Qf = pool.init_pool(Qc, tables)
    run = jax.jit(
        lambda c, f: jax.lax.scan(
            lambda cf, _: (pool.step(cf[0], cf[1], tables, DT), None),
            (c, f), None, length=N_INNER,
        )[0]
    )
    c, f = run(Qc, Qf)
    _ = np.asarray(c).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(N_OUTER):
        c, f = run(c, f)
    _ = np.asarray(c).ravel()[0]
    assert np.isfinite(np.asarray(c)).all()
    return (time.perf_counter() - t0) / (N_OUTER * N_INNER), n_ref / (gx * gx)


def main():
    global INTERPRET
    small = "--small" in sys.argv
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        INTERPRET = True
    # (coarse patch-grid side, refined patch fraction); coarse cell side
    # = 4*gx, matching the round-3 table's 24/48/96 labels.
    configs = [(6, 3 / 36), (12, 4 / 144), (24, 12 / 576)]
    if small:
        configs = configs[:1]
    if "--big" in sys.argv:
        # Round-5 crossover hunt: at the entry sizes the pool's ~4-6
        # sequential kernels are dispatch-bound; these are the sizes
        # where the 1/r² cell saving should start paying.
        configs = [(48, 24 / 2304), (96, 96 / 9216)]
    for gx, frac in configs:
        row = {"coarse_cells": f"{4*gx}x{4*gx}"}
        uj = time_uniform(gx * FACTOR, "jax")
        row["uniform_jax_ms"] = round(uj * 1e3, 2)
        up = time_uniform(gx * FACTOR, "pallas")
        row["uniform_pallas_ms"] = round(up * 1e3, 2)
        best_u = min(uj, up)
        pj, f_real = time_pool(gx, frac, "jax")
        row["refined_frac"] = round(f_real, 4)
        row["pool_jax_ms"] = round(pj * 1e3, 2)
        pp, _ = time_pool(gx, frac, "pallas")
        row["pool_pallas_ms"] = round(pp * 1e3, 2)
        row["speedup_jax_fine"] = round(best_u / pj, 2)
        row["speedup_pallas_fine"] = round(best_u / pp, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
