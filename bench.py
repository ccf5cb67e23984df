"""Benchmark: the BASELINE.md north-star metric — 3-D compressible Euler
ADER-DG order 3, DOF-updates/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 1e9 DOF-updates/sec/chip (BASELINE.json; the reference itself
publishes no numbers).

Runs on the default platform (the real TPU chip under axon).  The measured
program is the full ADER-DG step — space-time Picard predictor, volume
integral, Rusanov face Riemann solve, corrector — in the SoA-P layout
(cell grid in the lane dims), scanned CHUNK steps per dispatch with the
state donated.  The companion FV Rusanov solver benches at ~4.4 GDOF/s on
the same chip (see README).
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
    from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics

    dim, order = 3, 3
    # Lane-tiled cell grid: trailing (8, 128) axes are exactly one
    # (sublane, lane) VMEM tile.  With the interior-axis Riemann solves
    # fused into the predictor kernel the throughput keeps growing with
    # cell count (3.02 at 64k, 3.20 at 128k, 3.36 at 256k, plateau at
    # 512k).
    grid_shape = (256, 8, 128)
    chunk = 5
    dtype = np.float32

    flux, eig = euler_physics(dim=dim, n_real=5)
    solver = ADERDGSolver(
        dim=dim,
        order=order,
        n_vars=5,
        grid_shape=grid_shape,
        flux_fn=flux,
        max_eigenvalue_fn=eig,
        dx=1.0 / grid_shape[0],
    )

    from exahype_tpu.models.aderdg_pallas import PallasADERDG

    # boundary_faces_only solves the intra-tile axis-0 faces inside the
    # kernel; the 4x-smaller face arrays flip the old tile0=4 verdict:
    # with the 126 MiB scoped-VMEM limit the wider tile now wins
    # (3.41 plain -> 3.49 tile0=2+bfo -> 3.63 tile0=4+bfo measured).
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

    @jax.jit
    def run_chunk(q):
        def body(carry, _):
            return fused.step(carry, dt), None

        out, _ = jax.lax.scan(body, q, None, length=chunk)
        return out

    # Warmup / compile.
    Q = run_chunk(Q)
    Q.block_until_ready()

    n_rounds = 10
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        Q = run_chunk(Q)
    Q.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps = n_rounds * chunk
    dof = solver.dofs()
    dof_per_sec = dof * steps / elapsed
    step_seconds = elapsed / steps

    # Roofline accounting (utils/profiling.py): analytic flops (XLA's
    # cost_analysis cannot see inside the pallas_call custom call — it
    # under-counts the fused step ~300x), XLA's byte count when available
    # (it reflects actual fusion of the epilogue).
    from exahype_tpu.utils.profiling import V5E_PEAKS, aderdg_step_cost

    cost = aderdg_step_cost(solver, fused=True)
    bytes_per_step = cost.bytes_total
    try:
        ca = run_chunk.lower(Q).compile().cost_analysis() or {}
        if ca.get("bytes accessed"):
            bytes_per_step = float(ca["bytes accessed"]) / chunk
    except Exception:
        pass
    achieved_flops = cost.flops / step_seconds
    achieved_bw = bytes_per_step / step_seconds
    vpu = V5E_PEAKS["vpu_f32_fma_flops"]
    hbm = V5E_PEAKS["hbm_bytes_per_s"]
    # Lower-bound step time: compute on the VPU (no matmuls in this
    # kernel) overlapped with HBM streaming.
    roofline_s = max(cost.flops / vpu, bytes_per_step / hbm)

    limited = bench_limited(solver, dtype)
    ck = bench_ck(dtype)

    print(
        json.dumps(
            {
                "metric": "aderdg_p3_euler3d_dof_updates_per_sec_per_chip",
                "value": dof_per_sec,
                "unit": "DOF-updates/s",
                "vs_baseline": dof_per_sec / BASELINE_DOF_PER_SEC,
                "roofline": {
                    "step_seconds": step_seconds,
                    "model_flops_per_step": cost.flops,
                    "hbm_bytes_per_step": bytes_per_step,
                    "achieved_tflops": achieved_flops / 1e12,
                    "pct_of_vpu_fma_peak": 100.0 * achieved_flops / vpu,
                    "pct_of_hbm_bw": 100.0 * achieved_bw / hbm,
                    "pct_of_roofline": 100.0 * roofline_s / step_seconds,
                },
                "limited": limited,
                "ck": ck,
            }
        )
    )


def bench_ck(dtype):
    """Third official metric (round 5): the LINEAR kernel class — p3 3-D
    HETEROGENEOUS elasticity (12 vars: velocity–stress + frozen per-cell
    ρ, λ, μ — the production ExaSeis layered-medium shape) on the
    Cauchy–Kovalewski predictor, full step (CK predictor + Riemann +
    corrector).  Driver-captured so the linear-kernel north-star claim
    (PERFORMANCE.md "Linear kernels") is regression-watched like the
    Euler pair.  Integrity: full-state finiteness, the material slots
    BITWISE frozen over the whole run, and the seismic energy
    non-increasing (Rusanov dissipates; growth = instability)."""
    from exahype_tpu.models.aderdg import ADERDGSolver, wrap_var_last
    from exahype_tpu.models.elastic import (
        elastic3d_heterogeneous,
        plane_p_wave_3d,
    )

    order = 3
    grid = (64, 4, 32)  # lane-tiled; the scripts/ck_probe.py chip config
    flux, eig = elastic3d_heterogeneous()
    solver = ADERDGSolver(
        dim=3, order=order, n_vars=12, grid_shape=grid,
        flux_fn=wrap_var_last(flux), max_eigenvalue_fn=wrap_var_last(eig),
        dx=1.0 / grid[0], predictor_mode="ck", ck_material_slots=(9, 10, 11),
        dissipation_mask=(1,) * 9 + (0, 0, 0),
    )
    coords = solver.nodes_meshgrid()
    no_var = (
        solver.state_shape[: solver.var_axis]
        + solver.state_shape[solver.var_axis + 1 :]
    )
    X = np.broadcast_to(
        np.squeeze(np.asarray(coords[0]), solver.var_axis), no_var
    )
    Z = np.broadcast_to(
        np.squeeze(np.asarray(coords[2]), solver.var_axis), no_var
    )
    # Layered medium: the lower half-space is stiffer (faster), the
    # canonical two-layer seismic benchmark material.
    wave = np.moveaxis(plane_p_wave_3d(X, 0.0), -1, solver.var_axis)
    wave = wave[
        tuple(
            slice(0, 9) if e == solver.var_axis else slice(None)
            for e in range(wave.ndim)
        )
    ]
    lower = Z < 0.5 * grid[2] / grid[0]
    rho_m = np.where(lower, 1.2, 1.0)
    lam_m = np.where(lower, 3.0, 2.0)
    mu_m = np.where(lower, 1.5, 1.0)
    mat = np.stack([rho_m, lam_m, mu_m], axis=solver.var_axis)
    Q = jnp.asarray(
        np.concatenate([wave, mat], axis=solver.var_axis), dtype
    )
    dt = jnp.asarray(2e-4, dtype)
    chunk = 5

    @jax.jit
    def run_chunk(q):
        def body(carry, _):
            return solver.step(carry, dt), None

        out, _ = jax.lax.scan(body, q, None, length=chunk)
        return out

    def vslice(q, lo, hi):
        return q[
            tuple(
                slice(lo, hi) if e == solver.var_axis else slice(None)
                for e in range(q.ndim)
            )
        ]

    @jax.jit
    def integrity(q):
        finite = jnp.isfinite(q).all()
        mats_frozen = (vslice(q, 9, 12) == jnp.asarray(mat, dtype)).all()
        # TRUE seismic energy (×2): ρv² + σ:S:σ with the isotropic
        # compliance S — for per-cell (λ, μ):
        #   σ:S:σ = [σ:σ − λ/(3λ+2μ)·(tr σ)²] / (2μ),
        # σ:σ = Σσ_ii² + 2Σσ_{i<j}² (slots 3-5 diagonal, 6-8 off-diag).
        # A plain Σσ² proxy is NOT an energy in a layered medium and can
        # grow by component exchange; the physical energy must not under
        # Rusanov dissipation.
        v2 = jnp.sum(
            jnp.asarray(np.expand_dims(rho_m, solver.var_axis), dtype)
            * vslice(q, 0, 3) ** 2,
            axis=solver.var_axis,
        )
        diag = vslice(q, 3, 6)
        off = vslice(q, 6, 9)
        s_dd = jnp.sum(diag**2, axis=solver.var_axis) + 2.0 * jnp.sum(
            off**2, axis=solver.var_axis
        )
        trs = jnp.sum(diag, axis=solver.var_axis)
        lam_a = jnp.asarray(lam_m, dtype)
        mu_a = jnp.asarray(mu_m, dtype)
        strain2 = (s_dd - lam_a / (3 * lam_a + 2 * mu_a) * trs**2) / (
            2.0 * mu_a
        )
        return finite, mats_frozen, jnp.sum(v2 + strain2)

    Q = run_chunk(Q)
    _, _, e0 = (np.asarray(v) for v in jax.device_get(integrity(Q)))

    n_rounds = 8
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        Q = run_chunk(Q)
    tail = np.asarray(jax.device_get(Q[0, 0, 0, 0, :4]))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(tail).all(), "ck bench state went non-finite"
    steps = n_rounds * chunk
    # DOF accounting: the 9 EVOLVED wave variables (frozen material slots
    # are storage, not updates).
    dof = int(np.prod(grid)) * solver.n_nodes**3 * 9
    dof_per_sec = dof * steps / elapsed

    finite, mats_frozen, e1 = (
        np.asarray(v) for v in jax.device_get(integrity(Q))
    )
    assert bool(finite), "ck bench: non-finite value in final state"
    assert bool(mats_frozen), "ck bench: material slots drifted"
    energy_ratio = float(e1) / float(e0)
    # Bounded growth, not strict non-increase: Rusanov dissipates in the
    # constant-coefficient symmetrizer norm, so at the layer interface
    # (impedance mismatch) the physical energy can grow at the
    # interface-jump level — measured ~2e-3 over the 40-step window,
    # stable.  Instability is exponential; 2% over the window is the
    # regression tripwire.
    assert energy_ratio < 1.02, (
        f"ck bench: seismic energy grew ({energy_ratio})"
    )
    return {
        "metric": "ck_p3_elastic3d_het_dof_updates_per_sec_per_chip",
        "value": dof_per_sec,
        "unit": "DOF-updates/s",
        "vs_baseline": dof_per_sec / BASELINE_DOF_PER_SEC,
        "step_seconds": elapsed / steps,
        "integrity": {
            "full_state_finite": bool(finite),
            "materials_bitwise_frozen": bool(mats_frozen),
            "energy_ratio_30_steps": energy_ratio,
        },
    }


def bench_limited(solver, dtype):
    """Second official metric: the PRODUCTION configuration — limited
    ADER-DG (a-posteriori DMP + admissibility detection, gathered subcell
    FV fallback at static capacity, DG/FV interface matching) on the same
    256k-cell grid, with a real planar shock supplying a realistic (~1-3 %)
    troubled fraction.  The candidate + per-row face fluxes come from the
    same fused boundary-faces-only Pallas predictor as the headline
    metric (its flux contract composes since round 3)."""
    from exahype_tpu.models.aderdg_pallas import PallasADERDG
    from exahype_tpu.models.limiter import LimitedADERDG, euler_admissible

    grid_shape = solver.grid_shape
    n_cells = int(np.prod(grid_shape))
    # Row-granular gathering: capacity counts LAST-AXIS ROWS (128 cells
    # each).  The real limiting demand (the shock/contact front) needs
    # ~30-90 rows; the DMP's default delta0=1e-4 additionally trips on
    # parasitic Gibbs waves radiating from the front at the DG
    # group-velocity bound — measured far-band violations <=2.6e-4 vs
    # 9.6e-3 at the front (docs/PERFORMANCE.md) — which ran demand to 304
    # rows by step 35 in round 4 and engaged the means overflow policy at
    # a measured 5.0e-3/30-step conservation cost.  Round 5 sets
    # dmp_delta0=5e-4: BETWEEN the two measured amplitudes, so the front
    # stays fully flagged (rho_min pinned at the correct post-shock
    # 0.125, full state admissible) while the noise flags drop out —
    # demand 64 rows < capacity 128, overflow never engages, drift
    # 1.3e-3 (the measured chip-f32 floor of the limited path; the
    # capacity sweep 128->320 shows MORE gathered rows only increase
    # drift, scripts/limited_probe.py).  The post-step admissibility
    # guard stays ON (3.6 ms measured; removing it NaNs walled blasts).
    capacity = 128
    accel = PallasADERDG(
        solver, tile0=4, boundary_faces_only=True,
        vmem_limit_bytes=126 * 1024 * 1024,
    )
    limited = LimitedADERDG(
        solver,
        admissible=euler_admissible(dim=solver.dim, gamma=1.4),
        troubled_capacity=capacity,
        troubled_granularity="row",
        accelerator=accel,
        subcell_pallas=True,
        dmp_delta0=5e-4,
    )

    # Planar Sod-like shock along axis 0: the front is a ~1k-cell surface.
    x = np.arange(grid_shape[0]).reshape(-1, 1, 1) / grid_shape[0]
    left = np.broadcast_to(x < 0.5, grid_shape)
    no_var = (
        solver.state_shape[: solver.var_axis]
        + solver.state_shape[solver.var_axis + 1 :]
    )
    rho = np.broadcast_to(
        np.where(left, 1.0, 0.125), no_var
    ).astype(dtype)
    p = np.broadcast_to(np.where(left, 1.0, 0.1), no_var).astype(dtype)
    zeros = np.zeros(no_var, dtype)
    Q = jnp.asarray(
        np.stack([rho, zeros, zeros, zeros, p / 0.4], axis=solver.var_axis)
    )
    dt = jnp.asarray(1.5e-4, dtype)
    chunk = 5

    @jax.jit
    def run_chunk(q):
        def body(carry, _):
            return limited.step(carry, dt), None

        out, _ = jax.lax.scan(body, q, None, length=chunk)
        return out

    @jax.jit
    def troubled_count(q):
        cand = accel.step(q, dt)
        t = limited.troubled_mask(q, cand)
        return t.sum(), t.any(axis=-1).sum()

    adm_fn = euler_admissible(dim=solver.dim, gamma=1.4)

    @jax.jit
    def integrity(q):
        """FULL-state integrity, reduced on device (round 4: the official
        metric asserts the whole 80M-element state, not a corner sample —
        a NaN or an inadmissible cell ANYWHERE fails the bench)."""
        finite = jnp.isfinite(q).all()
        adm = adm_fn(q, solver.var_axis).all()
        rho_min = jnp.min(jnp.take(q, 0, solver.var_axis))
        mass = jnp.sum(jnp.take(q, 0, solver.var_axis).astype(jnp.float64)
                       if jax.config.jax_enable_x64
                       else jnp.take(q, 0, solver.var_axis))
        return finite, adm, rho_min, mass

    Q = run_chunk(Q)
    n_troubled, n_rows = troubled_count(Q)
    frac = float(n_troubled) / n_cells  # fetch = hard sync
    _, _, _, mass0 = (np.asarray(v) for v in jax.device_get(integrity(Q)))

    n_rounds = 6
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        Q = run_chunk(Q)
    # Hard sync via a host fetch: block_until_ready through the axon
    # tunnel does not reliably await completion.
    tail = np.asarray(jax.device_get(Q[0, 0, 0, 0, :4]))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(tail).all(), "limited bench state went non-finite"
    steps = n_rounds * chunk
    dof_per_sec = solver.dofs() * steps / elapsed

    # Post-timing integrity + capacity accounting (outside the timed
    # window; scalar fetches only).
    finite, adm, rho_min, mass1 = (
        np.asarray(v) for v in jax.device_get(integrity(Q))
    )
    assert bool(finite), "limited bench: non-finite value in final state"
    assert bool(adm), (
        f"limited bench: final state inadmissible (rho_min={float(rho_min)})"
    )
    n_troubled1, n_rows1 = troubled_count(Q)
    rows_demand = int(n_rows1)
    mass_drift = abs(float(mass1) - float(mass0)) / abs(float(mass0))
    return {
        "metric": "limited_aderdg_p3_euler3d_dof_updates_per_sec_per_chip",
        "value": dof_per_sec,
        "unit": "DOF-updates/s",
        "vs_baseline": dof_per_sec / BASELINE_DOF_PER_SEC,
        "step_seconds": elapsed / steps,
        "troubled_fraction": frac,
        "troubled_rows": int(n_rows),
        "troubled_capacity_rows": capacity,
        "integrity": {
            "full_state_finite": bool(finite),
            "full_state_admissible": bool(adm),
            "rho_min": float(rho_min),
        },
        "capacity_usage": {
            "rows_demand_final": rows_demand,
            "rows_capacity": capacity,
            "overflow_engaged": rows_demand > capacity,
            # Relative conserved-mass drift over the 30 timed steps: the
            # f32-rounding floor plus the means-policy cost at overflowed
            # rows (docs/PERFORMANCE.md, conservation accounting).
            "mass_drift_rel": mass_drift,
        },
    }


if __name__ == "__main__":
    main()
