"""Explicit multi-chip stepping for the Pallas backend: shard_map + ppermute.

GSPMD auto-partitioning covers the JAX backend (plain array ops), but a
``pallas_call`` cannot be split by the compiler — the fused kernel must run
per shard under ``shard_map`` with the cross-chip halo exchange written
explicitly.  This module supplies exactly the design SURVEY.md §2 calls for:
patch sets sharded over a 1-D mesh along grid axis 0, edge slabs exchanged
with ``lax.ppermute`` over ICI, everything else local.

The per-shard kernel is a separate :class:`PallasPrinter` instance built for
the local patch count (``KernelBuilder.with_n_patches``).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from exahype_tpu.parallel.grid import TpuPatchGrid, _axis_slice
from exahype_tpu.parallel.mesh import PATCH_AXIS
from exahype_tpu.utils.errors import SemanticError


def _ppermute_wire(slab, axis_name, perm, wire_dtype):
    """``ppermute`` with an optional reduced-precision WIRE format: the
    payload is cast to ``wire_dtype`` (e.g. bf16 — halving the ICI/DCN
    bytes of every halo exchange) and restored to the compute dtype on
    receipt.  Only the cross-chip edge slabs are quantized; intra-shard
    halo data never loses precision."""
    if wire_dtype is None:
        return jax.lax.ppermute(slab, axis_name, perm)
    out = jax.lax.ppermute(slab.astype(wire_dtype), axis_name, perm)
    return out.astype(slab.dtype)


def sharded_tpu_halo_fill(
    local_grid: TpuPatchGrid,
    Q,
    axis_name: str = PATCH_AXIS,
    wire_dtype=None,
):
    """Halo fill for a grid whose axis 0 is sharded (call under shard_map).

    Inner grid axes use the local exchange (periodic roll, plus the grid's
    wall mirror when ``boundary="reflective"`` — those axes are whole within
    the shard); the sharded axis rolls locally and then repairs the
    shard-boundary rows with ``ppermute``d edge slabs.  With reflective
    boundaries the domain-face mirror on the sharded axis is applied only by
    the shards owning the global first/last grid row (full precision — the
    mirror is local, so ``wire_dtype`` never touches it).

    ``wire_dtype`` (e.g. ``jnp.bfloat16``) quantizes the cross-chip payload
    only — see :func:`_ppermute_wire`.
    """
    cfg = local_grid.config
    h, P = cfg.halo_size, cfg.patch_size
    if h == 0:
        return Q
    nd = Q.ndim
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    reflective = local_grid.boundary == "reflective"

    for d in range(cfg.dim):
        spat_ax = d
        grid_ax = cfg.dim + 1 + d
        lo_src = Q[_axis_slice(nd, spat_ax, P, P + h)]  # interior high slab
        hi_src = Q[_axis_slice(nd, spat_ax, h, 2 * h)]  # interior low slab
        lo_halo = jnp.roll(lo_src, shift=1, axis=grid_ax)
        hi_halo = jnp.roll(hi_src, shift=-1, axis=grid_ax)
        if d == 0:
            # Shard boundaries: my first local row's low halo comes from the
            # LEFT shard's last row; my last local row's high halo from the
            # RIGHT shard's first row.
            send_last = jax.lax.index_in_dim(lo_src, -1, grid_ax, keepdims=True)
            from_left = _ppermute_wire(send_last, axis_name, fwd, wire_dtype)
            send_first = jax.lax.index_in_dim(hi_src, 0, grid_ax, keepdims=True)
            from_right = _ppermute_wire(send_first, axis_name, bwd, wire_dtype)
            if reflective:
                # Domain walls live on the first/last shard only: their
                # outer-face halo is the mirror of their own interior edge,
                # not the (wrapped) ppermute payload.
                mirror_lo = local_grid._mirror_slab(
                    jax.lax.index_in_dim(hi_src, 0, grid_ax, keepdims=True),
                    d,
                    spat_ax,
                )
                mirror_hi = local_grid._mirror_slab(
                    jax.lax.index_in_dim(lo_src, -1, grid_ax, keepdims=True),
                    d,
                    spat_ax,
                )
                from_left = jnp.where(idx == 0, mirror_lo, from_left)
                from_right = jnp.where(idx == n_dev - 1, mirror_hi, from_right)
            g0 = lo_halo.shape[grid_ax]
            lo_halo = jax.lax.dynamic_update_slice_in_dim(
                lo_halo, from_left, 0, grid_ax
            )
            hi_halo = jax.lax.dynamic_update_slice_in_dim(
                hi_halo, from_right, g0 - 1, grid_ax
            )
        Q = Q.at[_axis_slice(nd, spat_ax, 0, h)].set(lo_halo)
        Q = Q.at[_axis_slice(nd, spat_ax, P + h, P + 2 * h)].set(hi_halo)
        if reflective and d != 0:
            Q = local_grid._reflect(Q, d)
    return Q


def make_sharded_pallas_step(
    kernel,
    grid: TpuPatchGrid,
    mesh: Mesh,
    axis_name: str = PATCH_AXIS,
    wire_dtype=None,
    **pallas_kwargs,
):
    """Jitted multi-chip solver step for the fused Pallas kernel.

    Returns ``(step_fn, sharding)``: ``step_fn(Q_sharded, dt)`` runs
    halo-exchange (ppermute over ICI on the sharded grid axis) + the
    per-shard fused kernel under ``shard_map``.  ``wire_dtype`` selects a
    reduced-precision wire format for the cross-chip edge slabs
    (:func:`_ppermute_wire`).
    """
    from exahype_tpu.backends.pallas_backend import PallasPrinter

    n_dev = mesh.shape[axis_name]
    g0 = grid.grid_shape[0]
    if g0 % n_dev != 0:
        raise SemanticError(
            f"grid axis 0 ({g0}) must be divisible by the mesh size ({n_dev})"
        )
    local_shape = (g0 // n_dev,) + grid.grid_shape[1:]
    local_patches = int(jnp.prod(jnp.asarray(local_shape)))
    local_grid = dataclasses.replace(
        grid,
        config=dataclasses.replace(grid.config, n_patches=local_patches),
        grid_shape=local_shape,
    )
    local_kernel = kernel.with_n_patches(local_patches)
    pallas_kwargs.setdefault("patch_grid_shape", local_shape)
    local_fn = PallasPrinter(local_kernel, **pallas_kwargs).build()

    ndim = len(grid.state_shape)
    spec_list = [None] * ndim
    spec_list[grid.config.dim + 1] = axis_name  # grid axis 0
    spec = PartitionSpec(*spec_list)
    sharding = NamedSharding(mesh, spec)

    def local_step(Q_local, dt):
        Q_local = sharded_tpu_halo_fill(
            local_grid, Q_local, axis_name, wire_dtype=wire_dtype
        )
        return local_fn(Q_local, dt)

    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, PartitionSpec()),
        out_specs=spec,
        # pallas_call outputs carry no varying-mesh-axes metadata; the spec
        # above states the partitioning explicitly.
        check_vma=False,
    )
    return jax.jit(mapped), sharding


def _ring_sends(Q, local_grid, d, axis_name, n_dev, wire_dtype=None):
    """Issue the two edge ppermutes of grid axis ``d`` (both directions).

    Returns ``(from_left, from_right)`` one-row slabs.  Pure sends — no
    halo writes — so several axes' exchanges can be issued back-to-back and
    the async collective scheduler overlaps them (the hierarchical
    ICI-ring/DCN schedule issues the slow DCN axis first)."""
    cfg = local_grid.config
    h, P = cfg.halo_size, cfg.patch_size
    nd = Q.ndim
    spat_ax = d
    grid_ax = cfg.dim + 1 + d
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    lo_src = Q[_axis_slice(nd, spat_ax, P, P + h)]
    hi_src = Q[_axis_slice(nd, spat_ax, h, 2 * h)]
    send_last = jax.lax.index_in_dim(lo_src, -1, grid_ax, keepdims=True)
    from_left = _ppermute_wire(send_last, axis_name, fwd, wire_dtype)
    send_first = jax.lax.index_in_dim(hi_src, 0, grid_ax, keepdims=True)
    from_right = _ppermute_wire(send_first, axis_name, bwd, wire_dtype)
    return from_left, from_right


def _apply_axis_halo(Q, local_grid, d, from_left, from_right):
    """Write grid axis ``d``'s halos: local roll for intra-shard neighbour
    rows, the received edge slabs for the shard-boundary rows."""
    cfg = local_grid.config
    h, P = cfg.halo_size, cfg.patch_size
    nd = Q.ndim
    spat_ax = d
    grid_ax = cfg.dim + 1 + d
    lo_halo = jnp.roll(Q[_axis_slice(nd, spat_ax, P, P + h)], 1, axis=grid_ax)
    hi_halo = jnp.roll(Q[_axis_slice(nd, spat_ax, h, 2 * h)], -1, axis=grid_ax)
    g = lo_halo.shape[grid_ax]
    lo_halo = jax.lax.dynamic_update_slice_in_dim(lo_halo, from_left, 0, grid_ax)
    hi_halo = jax.lax.dynamic_update_slice_in_dim(hi_halo, from_right, g - 1, grid_ax)
    Q = Q.at[_axis_slice(nd, spat_ax, 0, h)].set(lo_halo)
    Q = Q.at[_axis_slice(nd, spat_ax, P + h, P + 2 * h)].set(hi_halo)
    return Q


def sharded_tpu_halo_fill_2axis(
    local_grid: TpuPatchGrid,
    Q,
    axis_names: tuple[str, str] = ("ici", "dcn"),
    wire_dtype=None,
):
    """Hierarchical halo fill for a grid with axes 0 AND 1 sharded over a
    2-D device mesh (grid axis 0 over ``axis_names[0]`` — the fast ICI
    ring; grid axis 1 over ``axis_names[1]`` — the slow DCN axis).

    Schedule (the scaling-book overlap recipe made explicit):

    1. **Bulk round, both axes concurrently**: the one-row interior edge
       slabs of BOTH sharded axes are ppermuted back-to-back before any
       halo is written, so the async collective scheduler moves the DCN
       bytes (issued first) underneath the ICI exchange and the local
       roll/write work.
    2. Axis-0 halos are written (roll + received edges).
    3. Axis-1 halos are written.  The bulk-round axis-1 slabs were sent
       before axis-0 halos existed, so their corner strips (the axis-0
       halo range of the edge rows) are stale.
    4. **Corner round**: only those ``h``-wide strips — O(h²) bytes vs the
       bulk's O(h·extent) — are re-exchanged along the DCN axis and
       spliced in, completing the diagonal-neighbour propagation.
    5. Remaining (unsharded) grid axes fill locally as usual.

    Periodic boundaries only (wall grids shard on one axis via
    :func:`sharded_tpu_halo_fill`).
    """
    cfg = local_grid.config
    h, P = cfg.halo_size, cfg.patch_size
    if h == 0:
        return Q
    if local_grid.boundary != "periodic":
        raise SemanticError(
            "2-axis sharded halo exchange supports periodic boundaries"
        )
    nd = Q.ndim
    ici, dcn = axis_names
    n_ici = jax.lax.axis_size(ici)
    n_dcn = jax.lax.axis_size(dcn)

    # 1. Bulk round: DCN first, then ICI — both in flight together.
    dcn_left, dcn_right = _ring_sends(Q, local_grid, 1, dcn, n_dcn, wire_dtype)
    ici_left, ici_right = _ring_sends(Q, local_grid, 0, ici, n_ici, wire_dtype)

    # 2./3. Halo writes (axis 0 first so axis 1's local roll carries its
    # halos into the corners of intra-shard rows).
    Q = _apply_axis_halo(Q, local_grid, 0, ici_left, ici_right)
    Q = _apply_axis_halo(Q, local_grid, 1, dcn_left, dcn_right)

    # 4. Corner round along DCN: re-send only the axis-0-halo strips of the
    # axis-1 edge rows (now that axis-0 halos are final).
    grid_ax1 = cfg.dim + 2

    def strips(x):
        lo = x[_axis_slice(nd, 0, 0, h)]
        hi = x[_axis_slice(nd, 0, P + h, P + 2 * h)]
        return jnp.concatenate([lo, hi], axis=0)

    fwd = [(i, (i + 1) % n_dcn) for i in range(n_dcn)]
    bwd = [(i, (i - 1) % n_dcn) for i in range(n_dcn)]
    lo_src = Q[_axis_slice(nd, 1, P, P + h)]
    hi_src = Q[_axis_slice(nd, 1, h, 2 * h)]
    send_last = strips(jax.lax.index_in_dim(lo_src, -1, grid_ax1, keepdims=True))
    corner_left = _ppermute_wire(send_last, dcn, fwd, wire_dtype)
    send_first = strips(jax.lax.index_in_dim(hi_src, 0, grid_ax1, keepdims=True))
    corner_right = _ppermute_wire(send_first, dcn, bwd, wire_dtype)

    def splice(Q, spat1_lo, spat1_hi, grid_row, corner):
        """Overwrite the two spat-0 strips of one axis-1 halo's edge row."""
        for k, (s0_lo, s0_hi) in enumerate(((0, h), (P + h, P + 2 * h))):
            piece = corner[_axis_slice(corner.ndim, 0, k * h, (k + 1) * h)]
            sl = [slice(None)] * nd
            sl[0] = slice(s0_lo, s0_hi)
            sl[1] = slice(spat1_lo, spat1_hi)
            sl[grid_ax1] = slice(grid_row, grid_row + 1)
            Q = Q.at[tuple(sl)].set(piece)
        return Q

    g1 = local_grid.grid_shape[1]
    Q = splice(Q, 0, h, 0, corner_left)
    Q = splice(Q, P + h, P + 2 * h, g1 - 1, corner_right)

    # 5. Unsharded trailing grid axes.
    for d in range(2, cfg.dim):
        spat_ax = d
        grid_ax = cfg.dim + 1 + d
        lo_halo = jnp.roll(Q[_axis_slice(nd, spat_ax, P, P + h)], 1, axis=grid_ax)
        hi_halo = jnp.roll(Q[_axis_slice(nd, spat_ax, h, 2 * h)], -1, axis=grid_ax)
        Q = Q.at[_axis_slice(nd, spat_ax, 0, h)].set(lo_halo)
        Q = Q.at[_axis_slice(nd, spat_ax, P + h, P + 2 * h)].set(hi_halo)
    return Q


def make_sharded_pallas_step_2axis(
    kernel,
    grid: TpuPatchGrid,
    mesh: Mesh,
    axis_names: tuple[str, str] = ("ici", "dcn"),
    wire_dtype=None,
    **pallas_kwargs,
):
    """Multi-slice solver step: grid axes 0/1 sharded over a 2-D mesh
    (ICI × DCN), hierarchical halo exchange + per-shard fused kernel.

    Returns ``(step_fn, sharding)`` like :func:`make_sharded_pallas_step`.
    """
    from exahype_tpu.backends.pallas_backend import PallasPrinter

    n0 = mesh.shape[axis_names[0]]
    n1 = mesh.shape[axis_names[1]]
    g0, g1 = grid.grid_shape[0], grid.grid_shape[1]
    if g0 % n0 != 0 or g1 % n1 != 0:
        raise SemanticError(
            f"grid axes ({g0},{g1}) must divide the mesh ({n0},{n1})"
        )
    local_shape = (g0 // n0, g1 // n1) + grid.grid_shape[2:]
    local_patches = int(jnp.prod(jnp.asarray(local_shape)))
    local_grid = dataclasses.replace(
        grid,
        config=dataclasses.replace(grid.config, n_patches=local_patches),
        grid_shape=local_shape,
    )
    local_kernel = kernel.with_n_patches(local_patches)
    pallas_kwargs.setdefault("patch_grid_shape", local_shape)
    local_fn = PallasPrinter(local_kernel, **pallas_kwargs).build()

    ndim = len(grid.state_shape)
    spec_list = [None] * ndim
    spec_list[grid.config.dim + 1] = axis_names[0]
    spec_list[grid.config.dim + 2] = axis_names[1]
    spec = PartitionSpec(*spec_list)
    sharding = NamedSharding(mesh, spec)

    def local_step(Q_local, dt):
        Q_local = sharded_tpu_halo_fill_2axis(
            local_grid, Q_local, axis_names, wire_dtype=wire_dtype
        )
        return local_fn(Q_local, dt)

    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, PartitionSpec()),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(mapped), sharding


def _localize_dirichlet(solver, shard_info):
    """Wrap ``solver.dirichlet_fn`` so each shard reads ITS window of the
    globally-prescribed wall rows (round-5: closes the sharded-dirichlet
    hole).  ``shard_info`` maps a sharded GRID axis to
    ``(mesh_axis_name, local_extent)``; the wrapper dynamic-slices the
    global row along every sharded transverse grid axis at
    ``axis_index * local_extent`` (the wall axis itself is the singleton
    row dimension and broadcast rows are shard-invariant).  Must be
    called inside ``shard_map`` (it reads ``jax.lax.axis_index``)."""
    base = solver.dirichlet_fn
    if base is None:
        return None
    dim = solver.dim

    def fn(axis, side):
        row = jnp.asarray(base(axis, side))
        for gax, (name, local) in shard_info.items():
            pos = dim + gax  # grid axis position in the face-row layout
            if gax == axis or pos >= row.ndim or row.shape[pos] <= 1:
                continue
            idx = jax.lax.axis_index(name)
            row = jax.lax.dynamic_slice_in_dim(
                row, idx * local, local, axis=pos
            )
        return row

    fn.basis = getattr(base, "basis", None)
    return fn


def _edge_shift(x, sh, axis, axis_name, n_shards, wire_dtype=None):
    """Periodic shift by one along a GRID axis that is sharded over
    ``axis_name``: local roll + ``ppermute`` of the one-row edge the
    neighbour shard owns (the roll wraps locally; the edge exchange fixes
    the shard boundary)."""
    n = x.shape[axis]
    rolled = jnp.roll(x, sh, axis=axis)
    if sh == -1:
        edge = jax.lax.slice_in_dim(x, 0, 1, axis=axis)  # my first row
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        recv = _ppermute_wire(edge, axis_name, perm, wire_dtype)
        return jax.lax.dynamic_update_slice_in_dim(rolled, recv, n - 1, axis)
    if sh == 1:
        edge = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)  # my last row
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        recv = _ppermute_wire(edge, axis_name, perm, wire_dtype)
        return jax.lax.dynamic_update_slice_in_dim(rolled, recv, 0, axis)
    raise SemanticError(f"edge shift supports +-1, got {sh}")


def make_sharded_aderdg_step(
    solver,
    mesh: Mesh,
    axis_name: str = PATCH_AXIS,
    interpret: bool = False,
    return_face_fluxes: bool = False,
    wire_dtype=None,
    **pallas_kwargs,
):
    """Multi-chip fused-Pallas ADER-DG step: the cell grid's axis 0 is
    sharded over ``axis_name``; each shard runs the VMEM predictor kernel
    (cell-local, including the interior-axis Riemann solves when fused),
    and the Riemann epilogue runs through the boundary-aware
    ``ADERDGSolver.face_update``: the sharded axis 0 exchanges its one-face
    edge with neighbour shards via explicit ``lax.ppermute`` over ICI and
    gates wall ghosts to the shards owning a domain wall; interior epilogue
    axes (present with walls or ``fuse_interior_riemann=False``) are whole
    within each shard and use the plain local roll.

    Returns ``(step_fn, sharding)``: jit ``step_fn(Q, dt)`` with ``Q``
    placed on ``sharding``.  GSPMD cannot partition ``pallas_call``, hence
    the ``shard_map`` construction (same pattern as
    :func:`make_sharded_pallas_step` for the FV path).

    ``return_face_fluxes=True`` makes ``step_fn`` return
    ``(new, [fhat_0..fhat_{d-1}])`` like ``ADERDGSolver.step`` — fused
    interior axes emit theirs from inside the kernel, the sharded axis from
    the edge-exchanged face stage.  This is how the LIMITER composes with
    the multi-chip fused predictor: wrap with
    :class:`ShardedPallasADERDG` and pass it as
    ``LimitedADERDG(accelerator=...)`` — the limiter's own detection /
    fallback / matching stay plain XLA and GSPMD-partition around the
    ``shard_map`` region.
    """
    from exahype_tpu.models.aderdg_pallas import PallasADERDG

    n_shards = mesh.shape[axis_name]
    if solver.grid_shape[0] % n_shards != 0:
        raise SemanticError(
            f"grid axis 0 ({solver.grid_shape[0]}) must be divisible by the "
            f"mesh size ({n_shards})"
        )
    local_grid = (solver.grid_shape[0] // n_shards,) + tuple(
        solver.grid_shape[1:]
    )
    # Dirichlet rows are prescribed for the GLOBAL grid; each shard slices
    # its own window along the sharded transverse axis (round 5).
    local_dirichlet = _localize_dirichlet(
        solver, {0: (axis_name, local_grid[0])}
    )
    local_solver = dataclasses.replace(
        solver, grid_shape=local_grid, dirichlet_fn=local_dirichlet
    )
    fused = PallasADERDG(local_solver, interpret=interpret, **pallas_kwargs)
    fused.build()
    predictor_call = fused._predictor_call_fn
    epilogue_axes = fused._epilogue_axes
    visc_wall_axes = fused._visc_wall_axes
    fused_axes = tuple(
        d for d in range(solver.dim) if d not in epilogue_axes
    )
    n_face_out = 4 * len(epilogue_axes)

    shard_axis = solver.grid_axis(0)  # tensor axis of grid axis 0
    ndim = len(solver.state_shape)
    spec_list = [None] * ndim
    spec_list[shard_axis] = axis_name
    state_spec = PartitionSpec(*spec_list)
    sharding = NamedSharding(mesh, state_spec)
    # Face arrays drop node axis d, so grid axis 0 sits one slot earlier.
    face_spec = PartitionSpec(*(spec_list[:shard_axis - 1] + spec_list[shard_axis:]))

    def shift(x, sh, ax):
        return _edge_shift(x, sh, ax, axis_name, n_shards, wire_dtype)

    def local_step(Q_local, dt):
        outs = predictor_call(
            Q_local, dt, emit_fused_fhat=return_face_fluxes
        )
        new = outs[0]
        faces = outs[1 : 1 + n_face_out]
        k0 = 1 + n_face_out
        n_extra = len(fused_axes) if return_face_fluxes else 0
        fused_fhats = list(outs[k0 : k0 + n_extra])
        visc_faces = outs[k0 + n_extra :]
        fv_by_dir = {
            d: {"fv_lo": visc_faces[2 * k], "fv_hi": visc_faces[2 * k + 1]}
            for k, d in enumerate(visc_wall_axes)
        }
        dtv = jnp.asarray(dt, Q_local.dtype)
        idx = jax.lax.axis_index(axis_name)
        fhat_by_dir = {}
        for i, d in enumerate(epilogue_axes):
            q_lo, q_hi, f_lo, f_hi = faces[4 * i : 4 * i + 4]
            if d == 0:
                # Sharded axis: ppermute edge exchange; wall ghosts only on
                # the first/last shard.
                new, fhat_d = local_solver.face_update(
                    new,
                    q_lo,
                    q_hi,
                    f_lo,
                    f_hi,
                    d,
                    dtv,
                    shift=shift,
                    holds_lo_wall=idx == 0,
                    holds_hi_wall=idx == n_shards - 1,
                    **fv_by_dir.get(d, {}),
                )
            else:
                # Interior grid axes are whole within the shard: the plain
                # (boundary-aware) local face stage is exactly right.
                new, fhat_d = local_solver.face_update(
                    new, q_lo, q_hi, f_lo, f_hi, d, dtv,
                    **fv_by_dir.get(d, {}),
                )
            fhat_by_dir[d] = fhat_d
        if not return_face_fluxes:
            return new
        for j, d in enumerate(fused_axes):
            fhat_by_dir[d] = fused_fhats[j]
        return new, [fhat_by_dir[d] for d in range(solver.dim)]

    out_specs = (
        (state_spec, [face_spec] * solver.dim)
        if return_face_fluxes
        else state_spec
    )
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, PartitionSpec()),
        out_specs=out_specs,
        check_vma=False,
    )
    return step, sharding


def make_sharded_xla_aderdg_step(
    solver,
    mesh: Mesh,
    axis_name: str = PATCH_AXIS,
    wire_dtype=None,
):
    """Multi-chip ADER-DG step for solvers whose predictor runs in XLA —
    the Z4-class path, where the per-shard hot loop is the XLA Picard
    predictor calling the fused-RHS Pallas kernel
    (:func:`~exahype_tpu.models.rhs_pallas.with_pallas_rhs`).  GSPMD
    cannot partition ``pallas_call``, so the whole step runs per shard
    under ``shard_map``: every stage of :meth:`ADERDGSolver.step` is
    cell-local except the axis-0 neighbour access in the face stage,
    which goes through the same one-row ``ppermute`` edge exchange as
    the fused-Pallas wrapper (:func:`make_sharded_aderdg_step`), with
    wall ghosts gated to the shards owning a domain wall and Dirichlet
    rows localized to each shard's window.

    Returns ``(step_fn, sharding)``: jit ``step_fn(Q, dt)`` with ``Q``
    placed on ``sharding``.
    """
    n_shards = mesh.shape[axis_name]
    if solver.grid_shape[0] % n_shards != 0:
        raise SemanticError(
            f"grid axis 0 ({solver.grid_shape[0]}) must be divisible by "
            f"the mesh size ({n_shards})"
        )
    local_grid = (solver.grid_shape[0] // n_shards,) + tuple(
        solver.grid_shape[1:]
    )
    local_dirichlet = _localize_dirichlet(
        solver, {0: (axis_name, local_grid[0])}
    )
    local_solver = dataclasses.replace(
        solver, grid_shape=local_grid, dirichlet_fn=local_dirichlet
    )

    shard_axis = solver.grid_axis(0)
    ndim = len(solver.state_shape)
    spec_list = [None] * ndim
    spec_list[shard_axis] = axis_name
    state_spec = PartitionSpec(*spec_list)
    sharding = NamedSharding(mesh, state_spec)

    def shift(x, sh, ax):
        return _edge_shift(x, sh, ax, axis_name, n_shards, wire_dtype)

    def local_step(Q_local, dt):
        idx = jax.lax.axis_index(axis_name)
        return local_solver.step(
            Q_local,
            jnp.asarray(dt, Q_local.dtype),
            axis0_shift=shift,
            axis0_wall_gates=(idx == 0, idx == n_shards - 1),
        )

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, PartitionSpec()),
        out_specs=state_spec,
        check_vma=False,
    )
    return step, sharding


def make_sharded_aderdg_step_2axis(
    solver,
    mesh: Mesh,
    axis_names: tuple[str, str] = ("ici", "dcn"),
    interpret: bool = False,
    return_face_fluxes: bool = False,
    wire_dtype=None,
    **pallas_kwargs,
):
    """Multi-slice fused-Pallas ADER-DG: grid axes 0 AND 1 sharded over a
    2-D mesh (axis 0 on ``axis_names[0]`` — the fast ICI ring; axis 1 on
    ``axis_names[1]`` — the slow DCN axis), mirroring the FV path's
    hierarchical schedule (:func:`make_sharded_pallas_step_2axis`).

    The predictor kernel stays cell-local per shard with the fused interior
    Riemann solve restricted to the remaining WHOLE axes
    (``PallasADERDG(epilogue_axes=(0, 1))``); axes 0 and 1 run the
    boundary-aware face stage with an explicit one-face ``ppermute`` edge
    exchange on their respective mesh axes.  The DCN axis's face stage is
    issued first so its (slower) edge bytes travel underneath the ICI
    exchange and the axis-0 compute.  ``wire_dtype=jnp.bfloat16`` halves
    both axes' cross-chip edge bytes.

    Wall domains compose (round 4): each sharded axis gates its wall
    ghosts to the shards owning a domain wall (``axis_index == 0`` /
    ``== n-1`` on that mesh axis), exactly like the 1-axis path — so the
    capstone production shape, a LIMITED run in a walled box on an
    ICI × DCN mesh, is supported via :class:`ShardedPallasADERDG2Axis`.
    Round 5 closes the last two wall holes: DIRICHLET rows (prescribed
    for the global grid) are dynamic-sliced to each shard's window along
    both sharded transverse axes (:func:`_localize_dirichlet`), and
    VISCOUS walls ride the fused kernel's new viscous-only face outputs
    (``fv_lo``/``fv_hi``) through the advective/viscous wall split of
    ``ADERDGSolver.face_update``.

    Returns ``(step_fn, sharding)``; ``return_face_fluxes`` follows the
    :func:`make_sharded_aderdg_step` contract.
    """
    from exahype_tpu.models.aderdg_pallas import PallasADERDG

    n0 = mesh.shape[axis_names[0]]
    n1 = mesh.shape[axis_names[1]]
    g0, g1 = solver.grid_shape[0], solver.grid_shape[1]
    if g0 % n0 != 0 or g1 % n1 != 0:
        raise SemanticError(
            f"grid axes ({g0},{g1}) must divide the mesh ({n0},{n1})"
        )
    local_grid = (g0 // n0, g1 // n1) + tuple(solver.grid_shape[2:])
    # Dirichlet rows slice per shard along BOTH sharded transverse axes
    # (round 5 — closes the 2-axis dirichlet hole).
    local_dirichlet = _localize_dirichlet(
        solver,
        {0: (axis_names[0], local_grid[0]),
         1: (axis_names[1], local_grid[1])},
    )
    local_solver = dataclasses.replace(
        solver, grid_shape=local_grid, dirichlet_fn=local_dirichlet
    )
    fused = PallasADERDG(
        local_solver, interpret=interpret, epilogue_axes=(0, 1),
        **pallas_kwargs,
    )
    fused.build()
    predictor_call = fused._predictor_call_fn
    epilogue_axes = fused._epilogue_axes
    visc_wall_axes = fused._visc_wall_axes
    fused_axes = tuple(d for d in range(solver.dim) if d not in epilogue_axes)
    n_face_out = 4 * len(epilogue_axes)
    n_mesh = {0: n0, 1: n1}

    shard_axis0 = solver.grid_axis(0)
    shard_axis1 = solver.grid_axis(1)
    ndim = len(solver.state_shape)
    spec_list = [None] * ndim
    spec_list[shard_axis0] = axis_names[0]
    spec_list[shard_axis1] = axis_names[1]
    state_spec = PartitionSpec(*spec_list)
    sharding = NamedSharding(mesh, state_spec)
    # Face arrays drop one node axis: every grid axis sits one slot earlier.
    face_spec = PartitionSpec(
        *(spec_list[: shard_axis0 - 1] + spec_list[shard_axis0:])
    )

    def local_step(Q_local, dt):
        outs = predictor_call(Q_local, dt, emit_fused_fhat=return_face_fluxes)
        new = outs[0]
        faces = outs[1 : 1 + n_face_out]
        k0 = 1 + n_face_out
        n_extra = len(fused_axes) if return_face_fluxes else 0
        fused_fhats = list(outs[k0 : k0 + n_extra])
        visc_faces = outs[k0 + n_extra :]
        fv_by_dir = {
            d: {"fv_lo": visc_faces[2 * k], "fv_hi": visc_faces[2 * k + 1]}
            for k, d in enumerate(visc_wall_axes)
        }
        dtv = jnp.asarray(dt, Q_local.dtype)
        fhat_by_dir = {}
        # DCN axis (1) first: its edge ppermutes are issued before axis 0's,
        # letting the async collective scheduler overlap the slow bytes.
        for d in sorted(epilogue_axes, reverse=True):
            i = epilogue_axes.index(d)
            q_lo, q_hi, f_lo, f_hi = faces[4 * i : 4 * i + 4]
            if d in (0, 1):
                # Sharded axis: ppermute edge exchange on its own mesh
                # axis; wall ghosts gated to the wall-owning shards.
                name, n_sh = axis_names[d], n_mesh[d]

                def shift(x, sh, ax, _name=name, _n=n_sh):
                    return _edge_shift(x, sh, ax, _name, _n, wire_dtype)

                idx = jax.lax.axis_index(name)
                new, fhat_d = local_solver.face_update(
                    new, q_lo, q_hi, f_lo, f_hi, d, dtv, shift=shift,
                    holds_lo_wall=idx == 0,
                    holds_hi_wall=idx == n_sh - 1,
                    **fv_by_dir.get(d, {}),
                )
            else:
                # Interior epilogue axes are whole within the shard.
                new, fhat_d = local_solver.face_update(
                    new, q_lo, q_hi, f_lo, f_hi, d, dtv,
                    **fv_by_dir.get(d, {}),
                )
            fhat_by_dir[d] = fhat_d
        if not return_face_fluxes:
            return new
        for j, d in enumerate(fused_axes):
            fhat_by_dir[d] = fused_fhats[j]
        return new, [fhat_by_dir[d] for d in range(solver.dim)]

    out_specs = (
        (state_spec, [face_spec] * solver.dim)
        if return_face_fluxes
        else state_spec
    )
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, PartitionSpec()),
        out_specs=out_specs,
        check_vma=False,
    )
    return step, sharding


class ShardedPallasADERDG:
    """Accelerator adapter: the multi-chip fused ADER-DG step with the
    ``PallasADERDG``-compatible interface (``.solver``, ``.step(u, dt,
    return_face_fluxes)``), for ``LimitedADERDG(accelerator=...)``.

    The candidate step + face fluxes run per shard under ``shard_map``
    (ppermute edge exchange on grid axis 0); everything else in the limiter
    is plain XLA over globally-shaped arrays and GSPMD-partitions around
    this region under the enclosing ``jit``.
    """

    def __init__(self, solver, mesh: Mesh, axis_name: str = PATCH_AXIS,
                 interpret: bool = False, **pallas_kwargs):
        self.solver = solver
        self._plain, self.sharding = make_sharded_aderdg_step(
            solver, mesh, axis_name, interpret=interpret, **pallas_kwargs
        )
        self._fluxed, _ = make_sharded_aderdg_step(
            solver, mesh, axis_name, interpret=interpret,
            return_face_fluxes=True, **pallas_kwargs
        )

    def step(self, u, dt, return_face_fluxes: bool = False):
        if return_face_fluxes:
            return self._fluxed(u, dt)
        return self._plain(u, dt)


class ShardedPallasADERDG2Axis:
    """Multi-slice flavour of :class:`ShardedPallasADERDG`: the candidate
    + face fluxes run per shard over an ICI × DCN 2-D mesh
    (:func:`make_sharded_aderdg_step_2axis`), so the LIMITER composes on
    multi-slice deployments too — its detection / gathered fallback /
    matching stay plain XLA and GSPMD-partition around the shard_map
    region."""

    def __init__(self, solver, mesh: Mesh,
                 axis_names: tuple[str, str] = ("ici", "dcn"),
                 interpret: bool = False, wire_dtype=None, **pallas_kwargs):
        self.solver = solver
        self._plain, self.sharding = make_sharded_aderdg_step_2axis(
            solver, mesh, axis_names, interpret=interpret,
            wire_dtype=wire_dtype, **pallas_kwargs
        )
        self._fluxed, _ = make_sharded_aderdg_step_2axis(
            solver, mesh, axis_names, interpret=interpret,
            wire_dtype=wire_dtype, return_face_fluxes=True, **pallas_kwargs
        )

    def step(self, u, dt, return_face_fluxes: bool = False):
        if return_face_fluxes:
            return self._fluxed(u, dt)
        return self._plain(u, dt)
