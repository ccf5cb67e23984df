from exahype_tpu.parallel.grid import PatchGrid, TpuPatchGrid
from exahype_tpu.parallel.mesh import (
    PATCH_AXIS,
    make_mesh,
    replicated,
    shard_state,
    state_sharding,
)
from exahype_tpu.parallel.pool import (
    DynamicPoolRefinement,
    PatchPoolRefinement,
    PoolInner,
    PoolTables,
)
from exahype_tpu.parallel.shard import make_sharded_pallas_step, sharded_tpu_halo_fill
from exahype_tpu.parallel.solver import GridSolver

__all__ = [
    "PatchGrid",
    "TpuPatchGrid",
    "make_sharded_pallas_step",
    "sharded_tpu_halo_fill",
    "GridSolver",
    "make_mesh",
    "state_sharding",
    "shard_state",
    "replicated",
    "PATCH_AXIS",
    "PatchPoolRefinement",
    "DynamicPoolRefinement",
    "PoolTables",
    "PoolInner",
]
