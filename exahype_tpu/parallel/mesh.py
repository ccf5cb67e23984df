"""Device meshes and shardings for patch sets.

TPU equivalent of the reference's (absent, Peano-delegated) distributed
layer (SURVEY.md §5): patches are data-parallel over a GSPMD mesh — the
leading grid axis of a :class:`~exahype_tpu.parallel.grid.PatchGrid` state is
sharded across devices, halo-exchange rolls become ``collective_permute``
over ICI, and scalar reductions (CFL dt) become all-reduces.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from exahype_tpu.parallel.grid import TpuPatchGrid
from exahype_tpu.utils.errors import SemanticError

PATCH_AXIS = "patches"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = PATCH_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D mesh over the patch-grid's leading axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise SemanticError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def state_sharding(mesh: Mesh, grid, axis_name: str = PATCH_AXIS) -> NamedSharding:
    """Shard the grid state over devices along grid axis 0.

    - :class:`PatchGrid` (AoS): grid axes lead → shard tensor axis 0.
    - :class:`TpuPatchGrid` (SoA-P): grid axes trail the spatial/var axes →
      shard tensor axis ``dim + 1`` (the first grid axis).
    """
    n_dev = mesh.shape[axis_name]
    if grid.grid_shape[0] % n_dev != 0:
        raise SemanticError(
            f"grid axis 0 ({grid.grid_shape[0]}) must be divisible by the "
            f"mesh size ({n_dev})"
        )
    ndim = len(grid.state_shape)
    if isinstance(grid, TpuPatchGrid):
        lead = grid.config.dim + 1
        spec = PartitionSpec(
            *([None] * lead), axis_name, *([None] * (ndim - lead - 1))
        )
    else:
        spec = PartitionSpec(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_state(Q, mesh: Mesh, grid, axis_name: str = PATCH_AXIS):
    return jax.device_put(Q, state_sharding(mesh, grid, axis_name))
