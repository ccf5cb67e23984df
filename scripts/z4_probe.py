"""Z4 RHS-layout probe: einsum vs component-unrolled (SoA) on the chip.

docs/PERFORMANCE.md "Dynamic GR" finding 2 says the Z4 cost is layout,
not redundancy: the `[..., 3, 3]` einsum operands put length-3 tensor
indices on the TPU's (8, 128) register tiles.  `models/z4.py` now
carries a component-unrolled twin (`z4_rhs_soa`) that keeps the grid
axis on the lanes.  This probe times the full p2 3-D ADER-DG step on
the same 8x4x128 grid used for the round-3 table, for:

- the default per-axis einsum NCP path,
- the fused einsum ``rhs_all_fn`` hook (the measured 0.80x non-win),
- the fused SoA hook (``fused_rhs="soa"``),
- SoA routed through the per-axis ncp/source callbacks (``impl="soa"``).

Honest timing: chained steps + final host fetch (the axon tunnel's
``block_until_ready`` does not sync; identical repeated dispatches are
served from a cache — docs/PERFORMANCE.md round-2 calibration caveat).

Usage: python scripts/z4_probe.py [--shift] [--matter] [--large] [--pallas]
  (one JSON line per config)

--shift   53-var Gamma-driver system (einsum vs SoA)
--matter  43-var coupled Z4+GRHD (models/z4_matter.py): einsum vs SoA,
          perturbed-FLRW state (con2prim in every flux/source call)
--large   16x16x128 grid, SoA configs only (the HBM-bound regime)
--pallas  additionally time PallasADERDG on the SoA solver — documents
          the compile-size limit (docs/PERFORMANCE.md "Dynamic GR")
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import sys

from exahype_tpu.models.z4 import (
    make_z4_solver,
    make_z4_shift_solver,
    gauge_wave_state,
    moving_gauge_wave_state,
)


GRID = (8, 4, 128)
DX = 1.0 / 128
ORDER = 2
DT = 1e-4
N_STEPS = 20


def chained_time(step, Q, dt, n_steps=N_STEPS):
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
    shifted = "--shift" in sys.argv
    matter = "--matter" in sys.argv
    grid = GRID
    large = "--large" in sys.argv
    if large:
        # Production-scale grid for the headline number.
        grid = (16, 16, 128)
    if matter:
        # 43-var coupled Z4+GRHD: every flux/eig/source/NCP call runs the
        # bracketed-Newton con2prim on top of the Z4 tensor algebra.
        configs = {
            "matter_einsum_per_axis": dict(),
            "matter_soa_per_axis": dict(impl="soa"),
        }
        n_vars = 43
        if large or "--pallas" in sys.argv:
            configs = {"matter_soa_per_axis": dict(impl="soa")}
        from exahype_tpu.models.z4_matter import (
            flrw_state,
            make_z4_matter_solver,
        )

        ref = None
        for name, kw in configs.items():
            solver = make_z4_matter_solver(
                dim=3, order=ORDER, grid_shape=grid, dx=DX,
                slicing="harmonic", f=0.0, **kw
            )
            rho0 = 0.02
            Q = flrw_state(
                solver, 1.0, float(np.sqrt(8 * np.pi * rho0 / 3)),
                rho0=rho0,
            )
            # Smooth density perturbation so the run is not trivially
            # homogeneous (con2prim sees spatially varying inputs).
            q = jnp.moveaxis(Q, solver.var_axis, -1)
            coords = np.indices(q.shape[-4:-1], dtype=np.float32)
            pert = 1.0 + 0.05 * np.sin(
                2 * np.pi * coords[2] / q.shape[-2]
            )
            pert = jnp.asarray(
                np.broadcast_to(pert, q.shape[:-1])
            )
            q = q.at[..., 38].mul(pert)
            q = q.at[..., 42].mul(pert)
            Q = jnp.moveaxis(q, -1, solver.var_axis).astype(jnp.float32)
            out = np.asarray(solver.step(Q, DT), dtype=np.float64)
            if ref is None:
                ref = out
            else:
                err = float(np.max(np.abs(out - ref)))
                assert err < 1e-4, (name, err)
            ms = chained_time(solver.step, Q, DT) * 1e3
            n_dof = int(np.prod(grid)) * (ORDER + 1) ** 3 * n_vars
            print(
                json.dumps(
                    {
                        "config": name,
                        "ms_per_step": round(ms, 1),
                        "gdof_per_s": round(n_dof / ms / 1e6, 4),
                    }
                ),
                flush=True,
            )
            if "--pallas" in sys.argv:
                # Coupled fused-RHS path: the 43-var algebra (incl. the
                # scalar con2prim core) VMEM-resident per evaluation.
                from exahype_tpu.models.rhs_pallas import with_pallas_rhs

                fsolver = make_z4_matter_solver(
                    dim=3, order=ORDER, grid_shape=grid, dx=DX,
                    slicing="harmonic", f=0.0, impl="soa",
                    fused_rhs="soa",
                )
                fused = with_pallas_rhs(fsolver)
                pout = np.asarray(fused.step(Q, DT), dtype=np.float64)
                perr = float(np.max(np.abs(pout - out)))
                assert perr < 1e-4, (name, "pallas_rhs", perr)
                pms = chained_time(fused.step, Q, DT) * 1e3
                print(
                    json.dumps(
                        {
                            "config": name + "+pallas_rhs",
                            "ms_per_step": round(pms, 1),
                            "gdof_per_s": round(n_dof / pms / 1e6, 4),
                        }
                    ),
                    flush=True,
                )
        return
    if shifted:
        # 53-var Gamma-driver gauge (the full-gauge-freedom config).
        configs = {
            "shift_einsum_per_axis": dict(),
            "shift_soa_per_axis": dict(impl="soa"),
        }
        n_vars = 53
    else:
        configs = {
            "einsum_per_axis": dict(),
            "einsum_fused_hook": dict(fused_rhs=True),
            "soa_fused_hook": dict(fused_rhs="soa"),
            "soa_per_axis": dict(impl="soa"),
        }
        n_vars = 38
    if large or "--pallas" in sys.argv:
        # SoA production configs only (einsum at 32k cells is ~3.4 s/step
        # and its 8x-grid number extrapolates linearly from the base run).
        configs = {
            k: v for k, v in configs.items() if "soa_per_axis" in k
        }
    ref = None
    for name, kw in configs.items():
        if shifted:
            solver = make_z4_shift_solver(
                dim=3, order=ORDER, grid_shape=grid, dx=DX,
                shift="gamma_driver", **kw
            )
            Q = moving_gauge_wave_state(
                solver, v=0.2, amplitude=0.1
            ).astype(jnp.float32)
        else:
            solver = make_z4_solver(
                dim=3, order=ORDER, grid_shape=grid, dx=DX, **kw
            )
            Q = gauge_wave_state(solver, amplitude=0.1).astype(
                jnp.float32
            )
        # parity first (vs the default path's one-step result)
        out = np.asarray(solver.step(Q, DT), dtype=np.float64)
        if ref is None:
            ref = out
        else:
            # f32 on chip; the unrolled evaluation associates the ~30
            # contractions differently, so agreement is f32-rounding
            # level, not exact (the f64 CPU parity test is 1e-13).
            err = float(np.max(np.abs(out - ref)))
            assert err < 1e-4, (name, err)
        if "--pallas" in sys.argv:
            # Round 5: the production fused path is the fused-RHS Pallas
            # kernel (models/rhs_pallas.py) — the whole ~4k-op Z4 algebra
            # VMEM-resident in its var-FIRST layout, called from the XLA
            # Picard loop.  (The all-in-one streamed PallasADERDG
            # predictor — picard_loop+slice_loop, any tile0 — SIGKILLs
            # the remote Mosaic compile helper after 20-40 min even at
            # one-slice granularity; measured round 5, see
            # docs/PERFORMANCE.md "Dynamic GR".)
            from exahype_tpu.models.rhs_pallas import with_pallas_rhs

            fsolver = make_z4_solver(
                dim=3, order=ORDER, grid_shape=grid, dx=DX,
                impl="soa", fused_rhs="soa",
            )
            fused = with_pallas_rhs(fsolver)
            pout = np.asarray(fused.step(Q, DT), dtype=np.float64)
            perr = float(np.max(np.abs(pout - out)))
            assert perr < 1e-4, (name, "pallas", perr)
            pms = chained_time(fused.step, Q, DT) * 1e3
            pdof = int(np.prod(grid)) * (ORDER + 1) ** 3 * n_vars
            print(
                json.dumps(
                    {
                        "config": name + "+pallas_rhs",
                        "ms_per_step": round(pms, 1),
                        "gdof_per_s": round(pdof / pms / 1e6, 4),
                    }
                ),
                flush=True,
            )
        ms = chained_time(solver.step, Q, DT) * 1e3
        n_dof = int(np.prod(grid)) * (ORDER + 1) ** 3 * n_vars
        print(
            json.dumps(
                {
                    "config": name,
                    "ms_per_step": round(ms, 1),
                    "gdof_per_s": round(n_dof / ms / 1e6, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
