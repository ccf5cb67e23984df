"""Decompose the limited-bench step cost on chip (round-5 task 1).

BENCH_r03 measured the limited metric at 2.29 GDOF/s (36.7 ms/step);
BENCH_r04 at 1.45 GDOF/s (58.0 ms/step).  The bench harness's timed window
is unchanged between the rounds, so the regression lives in the round-4
limiter changes — prime suspect the new post-step admissibility guard
(``LimitedADERDG._admissibility_scale``).  This probe reproduces the exact
bench configuration (planar Sod blast, 256k cells, capacity 128 rows,
fused boundary-faces-only Pallas predictor) and times named variants so
the cost of each round-4 addition — and the capacity re-tuning options
against the now-measured 304-row demand — is a chip measurement, not a
guess.

Per variant it records: ms/step, final rows demand, relative mass drift
over the 30 timed steps, full-state admissibility + rho_min.  Prints one
JSON line per variant (and a summary file if --out is given).

Usage: python scripts/limited_probe.py [--variants a,b,...] [--out FILE]
                                       [--cpu]
  (--cpu runs the SAME f32 configuration on the CPU backend — the
  chip-vs-CPU f32 drift split that separates "TPU approximate
  div/sqrt" from "f32 rounding of the algorithm"; expect minutes/step.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics
from exahype_tpu.models.aderdg_pallas import PallasADERDG
from exahype_tpu.models.limiter import LimitedADERDG, euler_admissible

GRID = (256, 8, 128)
DIM, ORDER, NV = 3, 3, 5
DTYPE = np.float32
CHUNK = 5
N_ROUNDS = 6

# name -> kwargs overrides on the bench LimitedADERDG config
VARIANTS = {
    # The shipped round-4 bench config (expect ~58 ms/step).
    "r4_full": {},
    # Round-4 config minus the post-step guard: the guard's full cost.
    "noguard": {"post_step_guard": False},
    # Guard on, overflow path disabled (candidate policy): the means
    # overflow-degrade cost (known-unstable long-run; fine for 35 steps).
    "cand_overflow": {"overflow_fallback": "candidate"},
    # Capacity re-tuning against the measured 304-row demand.
    "cap192": {"troubled_capacity": 192},
    "cap256": {"troubled_capacity": 256},
    "cap320": {"troubled_capacity": 320},
    # Demand-side: a mildly larger DMP floor to stop flagging the
    # parasitic Gibbs band (front violations are ~9.6e-3, far-band
    # <=2.6e-4 — see docs/PERFORMANCE.md).
    "dmp3e4": {"dmp_delta0": 3e-4},
    "dmp1e3": {"dmp_delta0": 1e-3},
    "dmp3e4_cap192": {"dmp_delta0": 3e-4, "troubled_capacity": 192},
    "dmp5e4": {"dmp_delta0": 5e-4},
    "dmp5e4_noguard": {"dmp_delta0": 5e-4, "post_step_guard": False},
    # Drift decomposition at the no-overflow configuration: swap the
    # Pallas subcell sweeps and/or the fused Pallas candidate for their
    # XLA twins — if the residual drift is the round-3 AMR mechanism
    # (TPU f32 div/sqrt approximations differing between fusion
    # contexts of the SAME face flux), homogenizing the contexts moves
    # it.
    "dmp5e4_xla_subcell": {"dmp_delta0": 5e-4, "subcell_pallas": False},
    "dmp5e4_xla_cand": {
        "dmp_delta0": 5e-4, "accelerator": None, "subcell_pallas": False,
    },
    "dmp1e3_noguard": {"dmp_delta0": 1e-3, "post_step_guard": False},
    # The unlimited fused solver on the same blast: its drift is the
    # f32 conservation floor of the scheme+measurement (the limited
    # paths cannot beat it).
    "unlimited": {"__unlimited__": True},
}


def build(overrides):
    flux, eig = euler_physics(dim=DIM, n_real=NV)
    solver = ADERDGSolver(
        dim=DIM, order=ORDER, n_vars=NV, grid_shape=GRID,
        flux_fn=flux, max_eigenvalue_fn=eig, dx=1.0 / GRID[0],
    )
    accel = None if CPU else PallasADERDG(
        solver, tile0=4, boundary_faces_only=True,
        vmem_limit_bytes=126 * 1024 * 1024,
    )
    kwargs = dict(
        admissible=euler_admissible(dim=DIM, gamma=1.4),
        troubled_capacity=128,
        troubled_granularity="row",
        accelerator=accel,
        subcell_pallas=not CPU,
    )
    kwargs.update(overrides)
    limited = LimitedADERDG(solver, **kwargs)
    return solver, accel, limited


def initial_state(solver):
    x = np.arange(GRID[0]).reshape(-1, 1, 1) / GRID[0]
    left = np.broadcast_to(x < 0.5, GRID)
    no_var = (
        solver.state_shape[: solver.var_axis]
        + solver.state_shape[solver.var_axis + 1 :]
    )
    rho = np.broadcast_to(np.where(left, 1.0, 0.125), no_var).astype(DTYPE)
    p = np.broadcast_to(np.where(left, 1.0, 0.1), no_var).astype(DTYPE)
    zeros = np.zeros(no_var, DTYPE)
    return jnp.asarray(
        np.stack([rho, zeros, zeros, zeros, p / 0.4], axis=solver.var_axis)
    )


def run_variant(name, overrides):
    unlimited = overrides.pop("__unlimited__", False)
    solver, accel, limited = build(overrides)
    Q = initial_state(solver)
    dt = jnp.asarray(1.5e-4, DTYPE)
    adm_fn = euler_admissible(dim=DIM, gamma=1.4)
    stepper = accel if unlimited else limited

    @jax.jit
    def run_chunk(q):
        def body(carry, _):
            return stepper.step(carry, dt), None

        out, _ = jax.lax.scan(body, q, None, length=CHUNK)
        return out

    @jax.jit
    def probe_state(q):
        cand = (solver if accel is None else accel).step(q, dt)
        t = limited.troubled_mask(q, cand)
        finite = jnp.isfinite(q).all()
        adm = adm_fn(q, solver.var_axis).all()
        rho_min = jnp.min(jnp.take(q, 0, solver.var_axis))
        # ACCURATE conserved mass: reduce on device down to one value per
        # grid-axis-0 row (f32 pairwise over ~1M elements each), f64-sum
        # the 256-vector on the host — so the drift measures the SCHEME,
        # not the 80M-element f32 reduction.
        rho = jnp.take(q, 0, solver.var_axis)
        red_axes = tuple(a for a in range(rho.ndim) if a != solver.dim)
        mass_rows = jnp.sum(rho, axis=red_axes)
        return t.any(axis=-1).sum(), finite, adm, rho_min, mass_rows

    t_c0 = time.perf_counter()
    Q = run_chunk(Q)  # warmup 5 steps (matches bench)
    np.asarray(jax.device_get(Q[0, 0, 0, 0, 0]))
    compile_s = time.perf_counter() - t_c0
    _, _, _, _, rows0 = (np.asarray(v) for v in jax.device_get(probe_state(Q)))
    mass0 = float(rows0.astype(np.float64).sum())

    t0 = time.perf_counter()
    for _ in range(N_ROUNDS):
        Q = run_chunk(Q)
    tail = np.asarray(jax.device_get(Q[0, 0, 0, 0, :4]))
    elapsed = time.perf_counter() - t0
    steps = N_ROUNDS * CHUNK
    rows, finite, adm, rho_min, rows1 = (
        np.asarray(v) for v in jax.device_get(probe_state(Q))
    )
    mass1 = float(rows1.astype(np.float64).sum())
    rec = {
        "variant": name,
        "ms_per_step": 1e3 * elapsed / steps,
        "gdof_per_s": solver.dofs() * steps / elapsed / 1e9,
        "rows_demand_final": int(rows),
        "mass_drift_rel": abs(float(mass1) - float(mass0)) / abs(float(mass0)),
        "finite": bool(finite),
        "admissible": bool(adm),
        "rho_min": float(rho_min),
        "tail_finite": bool(np.isfinite(tail).all()),
        "compile_plus_warmup_s": compile_s,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    recs = []
    for name in args.variants.split(","):
        recs.append(run_variant(name, VARIANTS[name]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(recs, f, indent=1)


if __name__ == "__main__":
    main()
