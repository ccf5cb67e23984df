"""Fused Pallas sweeps for the gathered row-granular subcell fallback.

The production limited configuration (``LimitedADERDG(troubled_capacity=K,
troubled_granularity="row")``) runs the (2N+1)^d Rusanov FV fallback on a
compact gathered batch ``[sub.., V, K, L]``.  Measured on a v5e (256k-cell
p3 bench, K=128 rows): the gathered stage costs 20.8 ms of the 46.1 ms
limited step, and its analytic HBM need is ~0.7 ms — the gap is the XLA
formulation materializing ~10 batch-sized intermediates per directional
sweep (u±, F, F±, E±, fhat±; the (2N+1)^3 representation is a 5.4x blowup
over the nodal state, so each is ~112 MB).

Here each directional sweep runs as ONE ``pallas_call``: the batch is read
and written exactly once per direction and every intermediate lives in
VMEM.  Ghost-layer construction (slot-table gathers, DG edge projections,
wall mirrors, the in-row roll) stays XLA — the ghosts are thin (one
subcell layer) and inherently cross-slot.  The kernel body calls
:meth:`LimitedADERDG._row_sweep_math` — the very function the XLA path
runs — so the two paths share one set of numerics by construction.

Blocking (measured, v5e): the batch's natural minor dims are ``(K, L)`` —
both ≥128 on the production shape — so the kernel grids over the
TRANSVERSE subcell positions (the sub-axes other than the sweep direction
``d``), giving every vector op a full ``(K, L)`` tile and only
``n_sub x V`` leading positions per block.  The first cut tiled ``K`` into
the sublane dim instead, leaving ``(tile, L)`` tiles under ``n_sub^d x V``
leading positions — Mosaic's per-position loop overhead made it 10x
SLOWER than the XLA path (489 ms/step vs 46).  The transverse-mean
cell-boundary fluxes are accumulated across grid steps into a
revisited output block (constant index map), initialised on the first
step.

Capability parity: the reference family's production solver is the
a-posteriori limited ADER-DG scheme (MOOD); the reference repo itself has
no such kernel (its scope ends at code generation,
``/root/reference/exahype/printers/CPPPrinter.py``) — this module is part
of the capability the rebuild adds to reach production shape on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def row_sweep_call(limiter, d: int, s, ghost_lo, ghost_hi, dt):
    """Run direction ``d``'s gathered-row sweep as a fused Pallas kernel.

    ``s``: ``[sub.., V, K, L]`` gathered subcell batch; ``ghost_lo/hi``:
    same with the ``d`` sub-axis collapsed to 1.  Returns
    ``(s_new, g_lo, g_hi)`` exactly like
    :meth:`LimitedADERDG._row_sweep_math`.
    """
    sol = limiter.solver
    D = sol.dim
    n_sub = limiter.n_sub
    K_ax = D + 1
    K = s.shape[K_ax]
    L = s.shape[-1]
    other = tuple(a for a in range(D) if a != d)
    grid = tuple(n_sub for _ in other)
    n_other = 1
    for g in grid:
        n_other *= g

    def blk(shape, d_size):
        out = list(shape)
        for a in other:
            out[a] = 1
        out[d] = d_size
        return tuple(out)

    vol_block = blk(s.shape[:K_ax], n_sub) + (K, L)
    ghost_block = blk(s.shape[:K_ax], 1) + (K, L)
    g_block = (sol.n_vars, K, L)

    def vol_map(*idx):
        # idx = grid indices (one per transverse sub-axis) + smem refs.
        ids = idx[: len(other)]
        pos = [0] * (K_ax + 2)
        for a, i in zip(other, ids):
            pos[a] = i
        return tuple(pos)

    def g_map(*idx):
        return (0, 0, 0)

    inv = 1.0 / float(n_other)

    def body(dt_ref, s_ref, glo_ref, ghi_ref, out_ref, glo_out, ghi_out):
        s_new, g_lo, g_hi = limiter._row_sweep_math(
            s_ref[...], glo_ref[...], ghi_ref[...], d, dt_ref[0]
        )
        out_ref[...] = s_new
        if not other:
            glo_out[...] = g_lo
            ghi_out[...] = g_hi
            return
        # `_row_sweep_math`'s transverse mean over the block's size-1
        # other-sub axes is the per-position edge flux; the cross-position
        # mean accumulates over the (sequential) grid into the revisited
        # output block.
        first = sum(pl.program_id(a) for a in range(len(other))) == 0

        @pl.when(first)
        def _init():
            glo_out[...] = inv * g_lo
            ghi_out[...] = inv * g_hi

        @pl.when(jnp.logical_not(first))
        def _acc():
            glo_out[...] += inv * g_lo
            ghi_out[...] += inv * g_hi

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid if grid else (1,),
        in_specs=[
            pl.BlockSpec(vol_block, vol_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(ghost_block, vol_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(ghost_block, vol_map, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(vol_block, vol_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(g_block, g_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(g_block, g_map, memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct(s.shape, s.dtype),
        jax.ShapeDtypeStruct((sol.n_vars, K, L), s.dtype),
        jax.ShapeDtypeStruct((sol.n_vars, K, L), s.dtype),
    )
    kwargs = {}
    if not limiter.subcell_interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=limiter.subcell_vmem_limit_bytes
        )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=limiter.subcell_interpret,
        **kwargs,
    )(jnp.asarray(dt, s.dtype).reshape(1), s, ghost_lo, ghost_hi)
