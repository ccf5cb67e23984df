"""Pallas backend: one fused VMEM-resident patch-update kernel.

The performance path.  The JAX backend materializes every temp array
(``Q_copy``, per-direction fluxes, eigenvalues) in HBM — ~12 passes over
patch-sized arrays per step.  This backend compiles the SAME statement list
(same bounds module, same policy) into a single ``pl.pallas_call``:

- **Layout**: patches batch into the trailing (lane) dimensions —
  ``[x, y(, z), n_vars, *patch_tail]`` ("SoA-P").  With the patch tail's last
  axis a multiple of 128 the lanes are fully utilized, every statement is
  elementwise across patches on the VPU, and stencil shifts land on leading
  axes where they are just different rows.  The patch tail may be the flat
  patch count or the patch-grid axes themselves (``patch_grid_shape=``) — the
  latter lets the solver keep ONE layout for both halo exchange and the
  kernel, with no per-step relayouts.
- **Grid**: 1-D over tiles of the first patch-tail axis; each grid step
  loads one block into VMEM, runs the whole statement sequence on refs
  (temps never touch HBM), and writes the block back — 2 HBM passes per
  step instead of ~12.
- **Physics**: external functions use the ``tpu_impl`` contract — the
  variable axis sits at position ``dim`` (counted from the front, after the
  spatial region axes), patch axes trail.  See the ``*_tpu`` Euler variants.

Statement semantics (regions, var collapse, pointer args) are identical to
the JAX backend; differential tests assert equality against it.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import sympy
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sympy.core.function import AppliedUndef

from exahype_tpu.backends.base import CodePrinter
from exahype_tpu.backends.jax_backend import _reject_pointer_call_in_var_loop
from exahype_tpu.frontend.bounds import DEFAULT_POLICY, Policy, statement_ranges
from exahype_tpu.frontend.dataflow import validate_dataflow
from exahype_tpu.frontend.kernel_builder import KernelBuilder
from exahype_tpu.frontend.statements import Statement, StatementKind
from exahype_tpu.utils.errors import LoweringError

_SCALAR, _FIELD, _VFIELD = "scalar", "field", "vfield"


def to_tpu_layout(Q):
    """[patch, *spatial, var] → [*spatial, var, patch]."""
    nd = Q.ndim
    return jnp.transpose(Q, tuple(range(1, nd)) + (0,))


def from_tpu_layout(Q):
    """[*spatial, var, patch] → [patch, *spatial, var]."""
    nd = Q.ndim
    return jnp.transpose(Q, (nd - 1,) + tuple(range(nd - 1)))


class PallasPrinter(CodePrinter):
    """Lower a kernel spec to a fused Pallas TPU kernel.

    ``build()`` returns ``fn(Q_tpu, *scalars) -> Q_tpu`` over SoA-P layout
    ``[*extent, n_vars, *patch_tail]``.  ``build_aos()`` wraps it with layout
    transposes so it is drop-in for the JAX backend's AoS convention.
    """

    def __init__(
        self,
        kernel: KernelBuilder,
        function_name: str = "time_step",
        policy: Policy = DEFAULT_POLICY,
        tile_patches: Optional[int] = None,
        interpret: bool = False,
        vmem_limit_bytes: Optional[int] = None,
        patch_grid_shape: Optional[Sequence[int]] = None,
        dtype=None,
    ):
        super().__init__(kernel, function_name=function_name)
        self.policy = policy
        self.interpret = interpret
        #: Mosaic scoped-VMEM ceiling (bytes).  ``None`` resolves to an
        #: explicit 64 MiB passed to CompilerParams (the ~16 MiB compiler
        #: default under-serves the register-allocator intermediates —
        #: see the measurement note below; 64 MiB assumes ≥128 MiB-VMEM
        #: parts, i.e. v4/v5e+).  This attribute records the requested
        #: value; the resolved one is ``_vmem_limit_effective``.
        self.vmem_limit_bytes = vmem_limit_bytes
        #: State dtype assumed by the VMEM tile-size estimate (the kernel
        #: itself is dtype-polymorphic).  Default f32; pass f64 when running
        #: interpret-mode tests with x64 state so auto-tiling doesn't
        #: overcommit the budget on real hardware shapes.
        self._itemsize = int(np.dtype(dtype or np.float32).itemsize)
        cfg = kernel.config
        if patch_grid_shape is not None:
            self.patch_tail = tuple(patch_grid_shape)
            if math.prod(self.patch_tail) != cfg.n_patches:
                raise LoweringError(
                    f"patch_grid_shape {self.patch_tail} does not cover "
                    f"n_patches={cfg.n_patches}"
                )
        else:
            self.patch_tail = (cfg.n_patches,)
        self._tail_rest = math.prod(self.patch_tail[1:]) if len(self.patch_tail) > 1 else 1

        # The dominant scoped-VMEM consumer is NOT the blocks+scratch this
        # estimate counts but Mosaic's register-allocator intermediates
        # (~3x the modeled bytes, measured on the 2-D FV kernel at a
        # 48x48 lattice: 18.6-20.4 MB scoped vs a 6-12 MB model, against
        # the 16 MB default scoped limit).  So (a) raise the compiled
        # kernel's VMEM limit to 64 MiB by default (v5e has 128 MiB;
        # blocks here are small) and (b) spend at most a quarter of it on
        # the modeled working set, leaving the allocator 3x headroom.
        self._vmem_limit_effective = vmem_limit_bytes or 64 * 1024 * 1024
        budget = self._vmem_limit_effective // 4
        if tile_patches is None:
            tile_patches = self._default_tile(vmem_budget=budget)
        if tile_patches % self._tail_rest != 0 or (
            self.patch_tail[0] % (tile_patches // self._tail_rest) != 0
        ):
            raise LoweringError(
                f"tile_patches ({tile_patches}) must be a multiple of the "
                f"trailing patch-tail size ({self._tail_rest}) and divide the "
                f"leading tail axis ({self.patch_tail[0]})"
            )
        self.tile_patches = tile_patches
        #: Tile length along the FIRST patch-tail axis.
        self.tile0 = tile_patches // self._tail_rest
        self._fn: Optional[Callable] = None

    # ----------------------------------------------------------- tile sizing

    def _vmem_bytes_per_patch(self, itemsize: Optional[int] = None) -> int:
        """Peak VMEM estimate per patch lane: in+out blocks of the primary
        (double-buffered by the pipeline) plus every temp array.

        The second-to-last dim is padded to the sublane width (8 for f32) by
        the (8, 128) VMEM tiling; count the padded size.
        """
        kb = self._kernel
        cfg = kb.config
        if itemsize is None:
            itemsize = self._itemsize
        cells = cfg.extent**cfg.dim
        sublane = 8

        def item_bytes(name):
            struct = kb.item_struct[name]
            vars_ = {0: None, 1: cfg.n_real, 2: cfg.n_vars}[struct]
            if len(self.patch_tail) > 1:
                # Patch tail supplies both sublane and lane dims; the var
                # axis is an outer dim — no var padding.
                return cells * (vars_ or 1) * itemsize
            if vars_ is None:
                return cells * itemsize
            padded = -(-vars_ // sublane) * sublane
            return cells * padded * itemsize

        total = 4 * item_bytes(kb.inputs[0])  # 2x in + 2x out (double buffer)
        for name in kb.temp_items():
            total += item_bytes(name)
        return total

    def _default_tile(self, vmem_budget: int = 12 * 1024 * 1024) -> int:
        """Largest legal patch tile whose working set fits VMEM."""
        cfg = self._kernel.config
        per_patch = self._vmem_bytes_per_patch()
        if len(self.patch_tail) > 1:
            # Lane alignment comes from the trailing tail axes; the leading
            # axis tiles freely.
            g0 = self.patch_tail[0]
            for t0 in range(g0, 0, -1):
                if g0 % t0 == 0 and t0 * self._tail_rest * per_patch <= vmem_budget:
                    return t0 * self._tail_rest
            raise LoweringError(
                f"no tile of leading grid axis {g0} fits VMEM "
                f"(~{per_patch} bytes/patch × trailing {self._tail_rest})"
            )
        candidates = [t for t in (1024, 512, 384, 256, 128) if cfg.n_patches % t == 0]
        for t in candidates:
            if t * per_patch <= vmem_budget:
                return t
        if cfg.n_patches <= 128 or cfg.n_patches * per_patch <= vmem_budget:
            return cfg.n_patches  # full-array lane dim is always legal
        raise LoweringError(
            f"no lane-aligned patch tile fits VMEM: ~{per_patch} bytes/patch, "
            f"n_patches={cfg.n_patches}. Use a patch count divisible by 128, "
            "a smaller patch_size, or pass tile_patches explicitly."
        )

    # ----------------------------------------------------------------- build

    @property
    def state_shape(self) -> tuple[int, ...]:
        cfg = self._kernel.config
        return (cfg.extent,) * cfg.dim + (cfg.n_vars,) + self.patch_tail

    def build(self) -> Callable:
        if self._fn is not None:
            return self._fn
        kb = self._kernel
        cfg = kb.config
        validate_dataflow(kb, policy=self.policy)
        primary = kb.inputs[0]
        scalar_inputs = kb.inputs[1:]
        tail = self.patch_tail
        n_tail = len(tail)
        block_shape = (
            (cfg.extent,) * cfg.dim + (cfg.n_vars, self.tile0) + tail[1:]
        )
        n_tiles = tail[0] // self.tile0
        lead_zeros = (0,) * (cfg.dim + 1)
        tail_zeros = (0,) * (n_tail - 1)
        temp_names = kb.temp_items()

        def index_map(i, *_):
            return lead_zeros + (i,) + tail_zeros

        def body(*refs):
            scalar_refs = refs[: len(scalar_inputs)]
            q_ref = refs[len(scalar_inputs)]
            out_ref = refs[len(scalar_inputs) + 1]
            temp_refs = refs[len(scalar_inputs) + 2 :]
            # The output block is the working buffer: statements read and
            # mutate it in place through ref stores — the same in-place
            # semantics the native kernel has, VMEM-resident throughout.
            out_ref[...] = q_ref[...]
            env: dict[str, Any] = {primary: out_ref}
            for name, tref in zip(temp_names, temp_refs):
                tref[...] = jnp.zeros(tref.shape, tref.dtype)
                env[name] = tref
            for name, sref in zip(scalar_inputs, scalar_refs):
                env[name] = sref[0]
            env.update(kb.literal_values)
            last_lhs = kb.LHS[-1] if kb.LHS else None
            for stmt in kb.statements:
                if stmt.kind is StatementKind.CONST_ASSIGN:
                    env[str(stmt.lhs)] = float(stmt.rhs)
                else:
                    self._apply_statement(env, stmt, last_lhs)

        state_shape = self.state_shape

        def fn(Q, *scalars):
            if len(scalars) != len(scalar_inputs):
                raise TypeError(
                    f"{self._function_name} expects {len(scalar_inputs)} "
                    f"scalar argument(s) {scalar_inputs}"
                )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=len(scalar_inputs),
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(block_shape, index_map, memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    block_shape, index_map, memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM(self._item_block_shape(name), Q.dtype)
                    for name in temp_names
                ],
            )
            scalar_args = [
                jnp.asarray(s, dtype=Q.dtype).reshape(1) for s in scalars
            ]
            kwargs = {}
            if not self.interpret:
                kwargs["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=self._vmem_limit_effective
                )
            return pl.pallas_call(
                body,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(state_shape, Q.dtype),
                interpret=self.interpret,
                input_output_aliases={len(scalar_inputs): 0},
                **kwargs,
            )(*scalar_args, Q)

        fn.__name__ = self._function_name
        self._fn = fn
        return fn

    def build_aos(self) -> Callable:
        """AoS-convention wrapper: same signature as the JAX backend."""
        inner = self.build()
        state_shape = self.state_shape

        def fn(Q, *scalars):
            Qt = to_tpu_layout(jnp.asarray(Q)).reshape(state_shape)
            out = inner(Qt, *scalars)
            flat = out.reshape(out.shape[: self._kernel.config.dim + 1] + (-1,))
            return from_tpu_layout(flat)

        return fn

    def _item_block_shape(self, name: str) -> tuple[int, ...]:
        cfg = self._kernel.config
        struct = self._kernel.item_struct[name]
        base = (cfg.extent,) * cfg.dim
        tail = (self.tile0,) + self.patch_tail[1:]
        if struct == 0:
            return base + tail
        if struct == 1:
            return base + (cfg.n_real,) + tail
        return base + (cfg.n_vars,) + tail

    # ------------------------------------------------------------ statements

    def _apply_statement(self, env, stmt: Statement, last_lhs) -> None:
        kb = self._kernel
        cfg = kb.config
        ranges = statement_ranges(
            cfg,
            stmt,
            kb.item_struct,
            policy=self.policy,
            is_last_lhs=(last_lhs is not None and stmt.lhs == last_lhs),
        )
        spatial = ranges[1 : 1 + cfg.dim]
        vb = ranges[-1][1]
        var_axis = cfg.dim  # var sits after the spatial region axes

        if isinstance(stmt.lhs, AppliedUndef):
            typed = kb.functions.get(type(stmt.lhs).__name__)
            if typed is None or typed.out_param is None:
                raise LoweringError(f"bare call {stmt.lhs} needs out_param")
            out_arg = stmt.lhs.args[typed.out_param]
            in_args = [
                a for i, a in enumerate(stmt.lhs.args) if i != typed.out_param
            ]
            kind, value = self._eval_call(env, typed, in_args, spatial)
            name, slices, has_var = self._access_slices(out_arg, spatial, vb=None)
            if has_var:
                nvar = value.shape[var_axis]
                slices = (
                    slices[:var_axis] + (slice(0, nvar),) + slices[var_axis + 1 :]
                )
            _store(env[name], slices, value)
            return

        if stmt.self_referencing_stencil(cfg.spatial_index_names):
            raise LoweringError(
                f"statement '{stmt.lhs} = {stmt.rhs}' reads its own target "
                "array at a shifted index (see jax_backend note)"
            )
        _reject_pointer_call_in_var_loop(kb, stmt, vb)
        # Plain assignment statement.
        kind, value = self._eval(env, stmt.rhs, spatial, vb)
        name, slices, has_var = self._access_slices(stmt.lhs, spatial, vb)
        if has_var and kind == _FIELD:
            value = jnp.expand_dims(value, var_axis)
        if not has_var and kind == _VFIELD:
            value = jnp.take(value, 0, axis=var_axis)
        _store(env[name], slices, value)

    # ------------------------------------------------------------ expression

    def _eval(self, env, expr, spatial, vb):
        var_axis = self._kernel.config.dim
        if expr is None:
            raise LoweringError("missing RHS")
        if expr.is_Number:
            return _SCALAR, float(expr)
        if isinstance(expr, sympy.Symbol):
            name = str(expr)
            if name not in env:
                raise LoweringError(f"unbound symbol {name!r}")
            return _SCALAR, env[name]
        if isinstance(expr, sympy.Indexed):
            return self._read(env, expr, spatial, vb)
        if isinstance(expr, AppliedUndef):
            typed = self._kernel.functions.get(type(expr).__name__)
            if typed is None:
                raise LoweringError(f"unknown function {type(expr).__name__}")
            return self._eval_call(env, typed, list(expr.args), spatial)
        if isinstance(expr, sympy.Add):
            vals = [self._eval(env, a, spatial, vb) for a in expr.as_ordered_terms()]
            return _combine(vals, lambda x, y: x + y, var_axis)
        if isinstance(expr, sympy.Mul):
            vals = [self._eval(env, a, spatial, vb) for a in expr.as_ordered_factors()]
            return _combine(vals, lambda x, y: x * y, var_axis)
        if isinstance(expr, sympy.Pow):
            bk, bv = self._eval(env, expr.base, spatial, vb)
            if expr.exp == sympy.Integer(-1):
                return bk, 1.0 / bv
            if expr.exp == sympy.Integer(2):
                return bk, bv * bv
            if expr.exp == sympy.Rational(1, 2):
                return bk, jnp.sqrt(bv)
            ek, ev = self._eval(env, expr.exp, spatial, vb)
            if ek != _SCALAR:
                raise LoweringError("array-valued exponents unsupported")
            return bk, bv**ev
        if isinstance(expr, (sympy.Max, sympy.Min)):
            op = jnp.maximum if isinstance(expr, sympy.Max) else jnp.minimum
            vals = [self._eval(env, a, spatial, vb) for a in expr.args]
            return _combine(vals, op, var_axis)
        if isinstance(expr, sympy.Abs):
            k, v = self._eval(env, expr.args[0], spatial, vb)
            return k, jnp.abs(v)
        raise LoweringError(f"cannot lower {type(expr).__name__}: {expr}")

    def _eval_call(self, env, typed, args, spatial):
        impl = typed.tpu_impl
        if impl is None:
            raise LoweringError(
                f"function {typed.name!r} has no tpu_impl; supply one via "
                "kernel.function(..., tpu_impl=...) for the Pallas backend"
            )
        evaluated = []
        for a in args:
            if isinstance(a, sympy.Indexed):
                evaluated.append(self._read(env, a, spatial, vb=None))
            else:
                k, v = self._eval(env, a, spatial, vb=1)
                if k != _SCALAR:
                    raise LoweringError(f"argument {a} must be scalar")
                evaluated.append((_SCALAR, v))
        result = impl(*[v for _, v in evaluated])
        cfg = self._kernel.config
        n_tail = len(self.patch_tail)
        if result.ndim == cfg.dim + n_tail:
            return _FIELD, result
        if result.ndim == cfg.dim + 1 + n_tail:
            return _VFIELD, result
        raise LoweringError(
            f"{typed.name} returned rank-{result.ndim}; expected a per-region "
            "field or vfield in SoA-P layout"
        )

    def _read(self, env, access, spatial, vb):
        name, slices, has_var = self._access_slices(access, spatial, vb)
        return (_VFIELD if has_var else _FIELD), env[name][slices]

    def _access_slices(self, access: sympy.Indexed, spatial, vb):
        """Index layout: [*spatial, (var,) *patch_tail]; tail always full."""
        kb = self._kernel
        cfg = kb.config
        name = str(access.base.label)
        if name not in kb.item_struct:
            raise LoweringError(f"unknown item {name!r}")
        struct = kb.item_struct[name]
        indices = access.indices  # [patch, i, j(, k)(, var)]
        slices: list[slice] = []
        for level in range(1, cfg.dim + 1):
            idx = indices[level]
            offset = _offset_of(idx)
            lo, hi = spatial[level - 1]
            lo, hi = lo + offset, hi + offset
            if lo < 0 or hi > cfg.extent:
                raise LoweringError(
                    f"access {access} leaves the halo-padded patch; "
                    "increase halo_size"
                )
            slices.append(slice(lo, hi))
        has_var = struct != 0
        if has_var:
            size = cfg.n_real if struct == 1 else cfg.n_vars
            take = size if vb is None else min(vb, size)
            slices.append(slice(0, take))
        slices.extend([slice(None)] * len(self.patch_tail))
        return name, tuple(slices), has_var


def _store(ref, slices, value):
    """Region store into a VMEM ref (static slices → Mosaic vector stores)."""
    shape = tuple(
        (s.stop if s.stop is not None else dim) - (s.start or 0)
        for s, dim in zip(slices, ref.shape)
    )
    value = jnp.broadcast_to(value, shape).astype(ref.dtype)
    ref[slices] = value


def _offset_of(idx_expr) -> int:
    if isinstance(idx_expr, (sympy.Symbol, sympy.Idx)):
        return 0
    syms = list(idx_expr.free_symbols)
    if len(syms) != 1:
        raise LoweringError(f"unsupported index expression {idx_expr}")
    off = sympy.simplify(idx_expr - syms[0])
    if not off.is_Integer:
        raise LoweringError(f"non-integer offset in {idx_expr}")
    return int(off)


def _combine(vals, op, var_axis: int):
    has_vfield = any(k == _VFIELD for k, _ in vals)
    has_field = any(k == _FIELD for k, _ in vals)
    norm = []
    for k, v in vals:
        if has_vfield and k == _FIELD:
            v = jnp.expand_dims(v, var_axis)
        norm.append(v)
    out = norm[0]
    for v in norm[1:]:
        out = op(out, v)
    kind = _VFIELD if has_vfield else (_FIELD if has_field else _SCALAR)
    return kind, out
