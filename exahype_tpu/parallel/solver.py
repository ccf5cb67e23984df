"""Grid solver: the time-integration driver over a patch grid.

Combines the pieces the reference leaves to the downstream ExaHyPE2/Peano
framework (time stepping, halo exchange, adaptive dt — visible only through
the headers the CPPPrinter emits, ``exahype/printers/CPPPrinter.py:321-347``)
into a jittable step:

    halo_fill (neighbour exchange, collectives under sharding)
      → patch-update kernel (vectorized over the flattened patch axis)
      → optional CFL dt from the global max wave speed (all-reduce)

Two kernel backends: ``"jax"`` (AoS layout, :class:`PatchGrid`) and
``"pallas"`` (fused VMEM kernel, SoA-P layout, :class:`TpuPatchGrid`).
``run`` integrates with ``lax.scan`` so the whole time loop is one XLA
program (no per-step host round trips).
"""

from __future__ import annotations

from typing import Callable, Literal, Optional, Union

import jax
import jax.numpy as jnp

from exahype_tpu.frontend.kernel_builder import KernelBuilder
from exahype_tpu.parallel.grid import PatchGrid, TpuPatchGrid
from exahype_tpu.utils.errors import SemanticError


class GridSolver:
    """Drives a patch-update kernel over a patch grid.

    ``eigenvalue_fn(interior) -> wave speeds`` (same layout as the grid
    state) enables CFL-controlled adaptive dt; omit it for fixed-dt stepping.
    """

    def __init__(
        self,
        grid: Union[PatchGrid, TpuPatchGrid],
        kernel: KernelBuilder,
        dx: float = 1.0,
        cfl: float = 0.45,
        eigenvalue_fn: Optional[Callable] = None,
        backend: Literal["jax", "pallas"] = "jax",
        kernel_dt: Literal["physical", "lambda"] = "physical",
        **backend_kwargs,
    ):
        self.grid = grid
        self.kernel = kernel
        self.dx = dx
        self.cfl = cfl
        self.eigenvalue_fn = eigenvalue_fn
        self.backend = backend
        #: What the kernel's scalar argument means: the physical dt (the
        #: canonical reference spec) or λ = dt/dx (the corrected scaled
        #: spec, models/fv.py) — the solver converts accordingly.
        self.kernel_dt = kernel_dt
        if backend == "pallas":
            if not isinstance(grid, TpuPatchGrid):
                raise SemanticError("backend='pallas' requires a TpuPatchGrid")
            from exahype_tpu.backends.pallas_backend import PallasPrinter

            # The fused kernel consumes the grid-shaped SoA-P state directly
            # (patch tail = grid axes): no per-step reshape/relayout.
            backend_kwargs.setdefault("patch_grid_shape", grid.grid_shape)
            printer = PallasPrinter(kernel, **backend_kwargs)
            self._grid_native = printer.patch_tail == tuple(grid.grid_shape)
            self._kernel_fn = printer.build()
        else:
            if not isinstance(grid, PatchGrid):
                raise SemanticError("backend='jax' requires a PatchGrid")
            from exahype_tpu.backends.jax_backend import JAXPrinter

            self._kernel_fn = JAXPrinter(kernel, **backend_kwargs).build()

    # ------------------------------------------------------------------ step

    def step(self, Q, dt):
        """One halo-exchange + patch-update step on grid-shaped state."""
        kdt = dt / self.dx if self.kernel_dt == "lambda" else dt
        dt = kdt
        Q = self.grid.halo_fill(Q)
        if getattr(self, "_grid_native", False):
            return self._kernel_fn(Q, dt)
        Qb = self.grid.to_batched(Q)
        Qb = self._kernel_fn(Qb, dt)
        return self.grid.from_batched(Qb)

    def _interior(self, Q):
        cfg = self.grid.config
        h = cfg.halo_size
        spatial_base = 0 if isinstance(self.grid, TpuPatchGrid) else cfg.dim
        out = Q
        for d in range(cfg.dim):
            ax = spatial_base + d
            sl = [slice(None)] * Q.ndim
            sl[ax] = slice(h, h + cfg.patch_size)
            out = out[tuple(sl)]
        return out

    def compute_dt(self, Q):
        """CFL time step from the global maximum wave speed (all-reduce
        under sharding)."""
        if self.eigenvalue_fn is None:
            raise ValueError("GridSolver needs eigenvalue_fn for adaptive dt")
        lam = jnp.max(self.eigenvalue_fn(self._interior(Q)))
        return self.cfl * self.dx / lam

    def run(self, Q, n_steps: int, dt=None):
        """Integrate ``n_steps`` with ``lax.scan``; returns (state, t).

        Fixed ``dt`` if given, else adaptive CFL dt each step.
        """

        def body(carry, _):
            Q, t = carry
            step_dt = self.compute_dt(Q) if dt is None else dt
            Qn = self.step(Q, step_dt)
            return (Qn, t + step_dt), None

        (Qf, tf), _ = jax.lax.scan(
            body, (Q, jnp.asarray(0.0, Q.dtype)), None, length=n_steps
        )
        return Qf, tf
