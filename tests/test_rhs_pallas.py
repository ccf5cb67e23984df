"""Fused-RHS Pallas accelerator (`models/rhs_pallas.py`).

The kernel must be numerically IDENTICAL to the wrapped ``rhs_all_fn``:
it evaluates the same algebra on a relayouted (var-first, spatially
flattened) view, so interpret-mode parity against the plain SoA solver
is required at f64 rounding level.  The on-chip compile/perf story
lives in docs/PERFORMANCE.md ("Dynamic GR", round 5).

Ref: the accelerator-offload hook convention the module implements,
/root/reference/Unit test/correctness_test.cpp:53-61.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from exahype_tpu.models.rhs_pallas import PallasRHS, with_pallas_rhs
from exahype_tpu.models.z4 import (
    gauge_wave_state,
    make_z4_solver,
    make_z4_shift_solver,
    moving_gauge_wave_state,
)
from exahype_tpu.utils.errors import LoweringError


def test_step_parity_vacuum():
    base = make_z4_solver(
        dim=3, order=2, grid_shape=(4, 4, 8), dx=0.125,
        impl="soa", fused_rhs="soa",
    )
    acc = with_pallas_rhs(base, interpret=True)
    Q = gauge_wave_state(base, amplitude=0.1)
    o1 = np.asarray(base.step(Q, 1e-4))
    o2 = np.asarray(acc.step(Q, 1e-4))
    assert np.max(np.abs(o1 - o2)) < 1e-15


def test_step_parity_gamma_driver_shift():
    base = make_z4_shift_solver(
        dim=3, order=2, grid_shape=(4, 4, 8), dx=0.125,
        impl="soa", fused_rhs="soa", shift="gamma_driver",
    )
    acc = with_pallas_rhs(base, interpret=True)
    Q = moving_gauge_wave_state(base, v=0.2, amplitude=0.05)
    o1 = np.asarray(base.step(Q, 1e-4))
    o2 = np.asarray(acc.step(Q, 1e-4))
    assert np.max(np.abs(o1 - o2)) < 1e-15


def test_wrap_padding_path():
    """A spatial size NOT divisible by 1024 exercises the wrap-pad (the
    pad rows carry real states, and are dropped on return)."""
    base = make_z4_solver(
        dim=3, order=1, grid_shape=(3, 3, 3), dx=1.0 / 3,
        impl="soa", fused_rhs="soa",
    )
    # order 1 -> 8 nodes/cell; 27 cells * 8 = 216 per var: pad = 808.
    acc = with_pallas_rhs(base, interpret=True)
    Q = gauge_wave_state(base, amplitude=0.1)
    o1 = np.asarray(base.step(Q, 1e-4))
    o2 = np.asarray(acc.step(Q, 1e-4))
    assert np.max(np.abs(o1 - o2)) < 1e-15


def test_epilogue_affine_split_respected():
    """The corrector's NCP volume trick calls rhs_all twice with
    DIFFERENT explicit gradients (real vs zeros); the kernel must honor
    the passed gradients, not recompute them — checked implicitly by the
    step-parity tests, and explicitly here."""
    base = make_z4_solver(
        dim=3, order=2, grid_shape=(4, 4, 8), dx=0.125,
        impl="soa", fused_rhs="soa",
    )
    acc = with_pallas_rhs(base, interpret=True)
    Q = gauge_wave_state(base, amplitude=0.1)
    va = base.var_axis
    zeros = tuple(jnp.zeros_like(Q) for _ in range(3))
    ones = tuple(jnp.ones_like(Q) * 1e-3 for _ in range(3))
    a0 = np.asarray(acc.rhs_all_fn(Q, zeros, va))
    a1 = np.asarray(acc.rhs_all_fn(Q, ones, va))
    b0 = np.asarray(base.rhs_all_fn(Q, zeros, va))
    b1 = np.asarray(base.rhs_all_fn(Q, ones, va))
    assert np.max(np.abs(a0 - b0)) < 1e-15
    assert np.max(np.abs(a1 - b1)) < 1e-15
    assert np.max(np.abs(a1 - a0)) > 0  # gradients actually matter


def test_requires_rhs_all_fn():
    base = make_z4_solver(
        dim=3, order=1, grid_shape=(3, 3, 3), dx=1.0 / 3, impl="soa",
    )
    assert base.rhs_all_fn is None
    with pytest.raises(LoweringError):
        with_pallas_rhs(base)


def test_shape_cache_reused():
    base = make_z4_solver(
        dim=3, order=1, grid_shape=(4, 4, 8), dx=0.125,
        impl="soa", fused_rhs="soa",
    )
    acc = with_pallas_rhs(base, interpret=True)
    Q = gauge_wave_state(base, amplitude=0.1)
    acc.step(Q, 1e-4)
    wrapped = acc.rhs_all_fn
    assert isinstance(wrapped, PallasRHS)
    n = len(wrapped._cache)
    acc.step(Q, 2e-4)  # same shapes -> no new kernels
    assert len(wrapped._cache) == n


def test_step_parity_coupled_matter():
    """43-var Z4+GRHD: the var-first twin runs the SCALAR con2prim core
    (srhd.con2prim_smag) so nothing stacks onto a trailing axis."""
    from exahype_tpu.models.z4_matter import flrw_state, make_z4_matter_solver

    base = make_z4_matter_solver(
        dim=3, order=1, grid_shape=(4, 4, 8), dx=0.125,
        impl="soa", fused_rhs="soa", slicing="harmonic", f=0.0,
    )
    acc = with_pallas_rhs(base, interpret=True)
    rho0 = 0.02
    Q = flrw_state(base, 1.0, float(np.sqrt(8 * np.pi * rho0 / 3)),
                   rho0=rho0)
    q = jnp.moveaxis(Q, base.var_axis, -1)
    pert = 1.0 + 0.05 * np.sin(
        2 * np.pi * np.arange(q.shape[-2]) / q.shape[-2]
    )
    q = q.at[..., 38].mul(jnp.asarray(pert))
    Q = jnp.moveaxis(q, -1, base.var_axis)
    o1 = np.asarray(base.step(Q, 1e-4))
    o2 = np.asarray(acc.step(Q, 1e-4))
    assert np.max(np.abs(o1 - o2)) < 1e-13


def test_step_parity_coupled_grmhd():
    """47-var magnetized: var-first runs rmhd.con2prim_scalar (the
    field-aligned scalar core)."""
    from exahype_tpu.models.z4_grmhd import (
        N_Z4,
        make_z4_grmhd_solver,
        pack_matter_mhd,
    )

    base = make_z4_grmhd_solver(
        dim=3, order=1, grid_shape=(4, 4, 8), dx=0.125,
        impl="soa", fused_rhs="soa", slicing="harmonic",
    )
    acc = with_pallas_rhs(base, interpret=True)
    coords = base.nodes_meshgrid()
    no_var = tuple(
        s for e, s in enumerate(base.state_shape) if e != base.var_axis
    )
    x = np.broadcast_to(
        np.squeeze(np.asarray(coords[0]), base.var_axis), no_var
    )
    z4 = np.zeros(x.shape + (N_Z4,))
    z4[..., 0] = 1.0
    z4[..., 1] = 1.0 + 0.05 * np.sin(2 * np.pi * x)
    z4[..., 4] = z4[..., 6] = 1.0
    rho = 1.0 + 0.1 * np.sin(2 * np.pi * x)
    p = 1.0 + 0.05 * np.cos(2 * np.pi * x)
    v = np.zeros(x.shape + (3,))
    v[..., 1] = 0.1 * np.sin(2 * np.pi * x)
    B = np.zeros(x.shape + (3,))
    B[..., 0] = 0.05
    Q = jnp.moveaxis(
        jnp.asarray(pack_matter_mhd(z4, rho, v, p, B, gamma=5.0 / 3.0)),
        -1, base.var_axis,
    )
    o1 = np.asarray(base.step(Q, 1e-4))
    o2 = np.asarray(acc.step(Q, 1e-4))
    assert np.max(np.abs(o1 - o2)) < 1e-13


def test_sharded_xla_step_with_pallas_rhs_matches_single_device():
    """Multi-chip composition: the Z4-class path (XLA predictor + fused-
    RHS Pallas kernel) sharded over a 2-device mesh via
    make_sharded_xla_aderdg_step (shard_map + ppermute edge exchange —
    GSPMD cannot partition pallas_call) equals the single-device step to
    rounding."""
    from exahype_tpu.parallel import make_mesh
    from exahype_tpu.parallel.shard import make_sharded_xla_aderdg_step

    base = make_z4_solver(
        dim=3, order=2, grid_shape=(8, 4, 8), dx=0.125,
        impl="soa", fused_rhs="soa",
    )
    acc = with_pallas_rhs(base, interpret=True)
    Q = gauge_wave_state(base, amplitude=0.1)
    want = np.asarray(acc.step(Q, 1e-4))

    mesh = make_mesh(2)
    step, sharding = make_sharded_xla_aderdg_step(acc, mesh)
    Qs = jax.device_put(Q, sharding)
    got = np.asarray(jax.jit(step)(Qs, 1e-4))
    np.testing.assert_allclose(got, want, atol=5e-12)
