"""Fused-RHS Pallas accelerator: the big-NCP compile-size fix.

Large NCP systems (38-var Z4, 43-var Z4+GRHD, 47-var Z4+GRMHD) evaluate a
~4000-op algebraic right-hand side ``rhs_all_fn(Q, grads) -> rhs`` at every
Picard node of every iteration.  Two formulations were measured before this
module existed (docs/PERFORMANCE.md "Dynamic GR"):

- the pure-XLA ``impl="soa"`` path compiles fine but goes HBM-bandwidth
  bound at production grids (0.256 -> 0.144 GDOF/s from 4k to 32k cells:
  XLA materializes the wide elementwise sweeps through HBM), and
- the all-in-one-kernel fused predictor (``PallasADERDG``) keeps everything
  VMEM-resident but its Mosaic compile is KILLED at any streaming setting
  (round 5 measured: picard_loop+slice_loop+tile0=1 all SIGKILL the
  remote compile helper after 20-40 min; so does a naive RHS-only kernel
  whose blocks keep the node axes — ~4.3k algebra ops times ~27 register
  tiles per value is still ~10^5 straight-line vector instructions).

This module takes the road that wins on all three axes (HBM, compile
size, reuse).  The key observation: given the gradients as INPUTS, the
RHS algebra is POINTWISE in space — node axes, cell axes, and any
leading time axes are all batch.  So the kernel flattens every spatial
axis into perfectly-tiled ``(8, 128)`` rows and puts the VARIABLE axis
first: ``[V, R, 8, 128]``, blocked ``[V, rows_per_block, 8, 128]``.
Every per-variable intermediate is then ``rows_per_block`` vector
registers — at ``rows_per_block=1`` the whole 38-var Z4 algebra
compiles to ~4k vector instructions, two orders of magnitude below the
node-axis-blocked form, while all ~4k intermediates stay in VMEM (the
HBM lever); the default of 4 measured fastest on a v5e (79.8 vs 82.1
ms/step on the 32k-cell Z4 config) and still compiles in ~30 s.  The kernel is invoked from the solver's ordinary
XLA predictor loop, compiled ONCE, and reused across every Picard node,
iteration, and the corrector epilogue.  Derivative contractions stay in
XLA as MXU-eligible tensordots; the kernel consumes ``(Q, grads)``
exactly like the callable it replaces, so the affine NCP epilogue trick
``rhs(q, dq) − rhs(q, 0)`` keeps working.

Reference anchor: the accelerator-offload convention for the hardest
physics callbacks (`/root/reference/Unit test/correctness_test.cpp:53-61`,
``exahype2::Solver::Offloadable``); here the offloaded unit is the fused
RHS algebra.

Usage::

    solver = make_z4_solver(..., impl="soa", fused_rhs="soa")
    solver = with_pallas_rhs(solver)           # dataclasses.replace
    solver.step(Q, dt)                         # predictor now calls the kernel
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exahype_tpu.utils.errors import LoweringError

_TILE = 8 * 128  # one (sublane, lane) register tile of f32


class PallasRHS:
    """Wrap an ``rhs_all_fn(Q, grads, var_axis) -> rhs`` in a Pallas TPU
    kernel over the flattened-spatial ``[V, R, 8, 128]`` layout.

    The wrapped callable accepts the same ``(Q, grads, var_axis)``
    contract as the original — including space-time arrays with leading
    batch axes (the Picard loop passes ``[n_nodes, nodes^dim, V, *grid]``)
    — and is cached per input shape/dtype, so one instance serves the
    predictor nodes, the corrector's qbar call, and sharded per-device
    shapes alike.

    Requirements on the wrapped function: pointwise in space (true by
    the ``rhs_all_fn`` contract — spatial coupling enters only through
    the gradient arguments) and indifferent to the position of the
    variable axis (it receives ``var_axis=0`` here).  Spatial sizes not
    divisible by 1024 are wrap-padded (with real state values, so
    partial-pivot algebra like con2prim stays well-defined) and the pad
    is dropped on return.
    """

    def __init__(
        self,
        rhs_all_fn: Callable,
        dim: int,
        n_vars: int,
        rows_per_block: int = 4,
        vmem_limit_bytes: int = 64 * 1024 * 1024,
        interpret: bool = False,
    ):
        self.inner = rhs_all_fn
        self.dim = dim
        self.n_vars = n_vars
        self.rows_per_block = int(rows_per_block)
        self.vmem_limit_bytes = vmem_limit_bytes
        self.interpret = interpret
        self._cache = {}

    # ------------------------------------------------------------- build

    def _build(self, shape, dtype, va):
        nv = self.n_vars
        if shape[va] != nv:
            raise LoweringError(
                f"var axis {va} of input shape {shape} is not n_vars={nv}"
            )
        spatial = math.prod(shape) // nv
        rows = -(-spatial // _TILE)  # ceil
        rt = self.rows_per_block
        while rows % rt != 0:
            rt -= 1
        pad = rows * _TILE - spatial
        canon = (nv, rows, 8, 128)
        block = (nv, rt, 8, 128)

        def index_map(i):
            return (0, i, 0, 0)

        spec = pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
        inner = self.inner
        # The var-FIRST twin slices variables on the LEADING block axis
        # (free in Mosaic).  Falling back to the generic (Q, grads, va)
        # contract at va=0 works numerically but routes the algebra
        # through a var-last moveaxis — a [rt,8,128,V]-major transpose
        # that puts the variable axis on the lanes and (measured, round
        # 5) kills the remote Mosaic compile; hence the hard preference.
        inner_vf = getattr(inner, "var_first", None)

        def body(q_ref, *rest):
            grad_refs, out_ref = rest[:-1], rest[-1]
            q = q_ref[...]
            grads = tuple(g[...] for g in grad_refs)
            if inner_vf is not None:
                out_ref[...] = inner_vf(q, grads)
            else:
                out_ref[...] = inner(q, grads, 0)

        kwargs = {}
        if not self.interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=self.vmem_limit_bytes
            )
        call = pl.pallas_call(
            body,
            grid=(rows // rt,),
            in_specs=[spec] * (1 + self.dim),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(canon, dtype),
            interpret=self.interpret,
            **kwargs,
        )

        def to_canon(x):
            flat = jnp.moveaxis(x, va, 0).reshape(nv, spatial)
            if pad:
                # Wrap-pad with REAL state values so divisions/roots in
                # the algebra stay well-defined on the pad rows (tile as
                # often as needed — the pad can exceed the spatial size
                # on small test grids).
                reps = -(-(spatial + pad) // spatial)
                flat = jnp.tile(flat, (1, reps))[:, : spatial + pad]
            return flat.reshape(canon)

        def from_canon(y):
            flat = y.reshape(nv, rows * _TILE)
            if pad:
                flat = flat[:, :spatial]
            mid = flat.reshape((nv,) + shape[:va] + shape[va + 1:])
            return jnp.moveaxis(mid, 0, va)

        def apply(q, grads):
            qc = to_canon(q)
            gc = [to_canon(g) for g in grads]
            return from_canon(call(qc, *gc))

        return apply

    # -------------------------------------------------------------- call

    def __call__(self, q, grads, var_axis):
        grads = tuple(grads)
        if len(grads) != self.dim:
            raise LoweringError(
                f"expected {self.dim} gradient arrays, got {len(grads)}"
            )
        va = var_axis % q.ndim
        key = (q.shape, q.dtype, va)
        if key not in self._cache:
            self._cache[key] = self._build(q.shape, q.dtype, va)
        return self._cache[key](q, grads)


def with_pallas_rhs(solver, **kwargs):
    """Return a copy of ``solver`` whose ``rhs_all_fn`` runs as a fused
    Pallas kernel (:class:`PallasRHS`).  The solver must have been built
    with a fused RHS hook (``rhs_all_fn`` set, e.g. Z4-family
    ``fused_rhs="soa"``)."""
    if solver.rhs_all_fn is None:
        raise LoweringError(
            "with_pallas_rhs requires a solver with rhs_all_fn set "
            "(e.g. make_z4_solver(..., fused_rhs='soa'))"
        )
    wrapped = PallasRHS(
        solver.rhs_all_fn,
        dim=solver.dim,
        n_vars=solver.n_vars,
        **kwargs,
    )
    return dataclasses.replace(solver, rhs_all_fn=wrapped)
