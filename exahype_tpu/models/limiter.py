"""A-posteriori FV limiter fallback for ADER-DG.

High-order DG produces oscillations (and non-physical states) at shocks.
The ExaHyPE approach is MOOD-style a-posteriori limiting: run the
unlimited ADER-DG candidate step, detect troubled cells, and redo those
cells with a robust finite-volume scheme (BASELINE.json's "FV limiter
fallback" config).  This implementation is fully data-parallel — detection
and fallback are masked array ops over the cell grid, no data-dependent
control flow — so it jits and shards exactly like the base solver.

Detection (per cell, on the candidate):
- physical admissibility via a user hook (e.g. positive density/pressure,
  finiteness), evaluated over all nodes;
- relaxed discrete maximum principle (DMP) on cell means: the new mean must
  lie within the min/max of the old means over the 2·dim+1 neighbourhood,
  widened by ``δ = max(dmp_delta0, dmp_eps · (local max − local min))``.

Fallback (default "subcell"): one Rusanov FV step on the Dumbser
(2N+1)^d-subcell grid — subcell-resolved, conservative per cell, and stable
at the DG time step (the DG CFL factor 1/(2N+1) is exactly the subcell CFL).
Projection/reconstruction operators are exact on the polynomial space with a
cell-mean conservation fix.  A first-order cell-mean fallback ("means") is
kept for comparison.  Mixed DG/FV faces are made single-valued by the
interface-matching pass
(untroubled neighbours adopt the troubled side's transverse-mean face flux),
so the full limited step conserves to machine precision.

Reflective walls (solver ``boundary="reflective"``) are fully supported:
detection clamps the DMP neighbourhood at domain faces, both fallbacks use
mirror ghosts through ``solver.reflect_fn``, and wall faces are excluded
from interface matching (they have a single owner).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from exahype_tpu.models.aderdg import ADERDGSolver, _apply, _project
from exahype_tpu.utils.errors import SemanticError


def euler_admissible(dim: int, gamma: float = 1.4):
    """Admissibility hook for Euler: finite, ρ>0, p>0 (var axis explicit)."""

    def ok(Q, var_axis):
        def v(k):
            return jnp.take(Q, k, axis=var_axis)

        rho = v(0)
        kinetic = sum(v(k) * v(k) for k in range(1, dim + 1))
        p = (gamma - 1.0) * (v(dim + 1) - 0.5 * kinetic / rho)
        fine = jnp.isfinite(Q).all(axis=var_axis)
        return fine & (rho > 0.0) & (p > 0.0)

    return ok


@dataclasses.dataclass
class LimitedADERDG:
    """ADER-DG with masked first-order FV fallback.

    ``admissible(Q, var_axis) -> bool mask`` over the node axes (reduced with
    ``all`` per cell); omit to use only the DMP criterion.
    """

    solver: ADERDGSolver
    admissible: Optional[Callable] = None
    dmp_delta0: float = 1e-4
    dmp_eps: float = 1e-3
    #: Fallback scheme for troubled cells: "subcell" (Dumbser-style
    #: (2N+1)-subcell FV — subcell-resolved, the production choice) or
    #: "means" (first-order cell-mean FV).
    fallback: str = "subcell"
    #: Accuracy of the subcell fallback: 1 = piecewise-constant Rusanov
    #: (dimensionally split, forward Euler); 2 = MUSCL reconstruction on the
    #: subcell grid (unsplit) with Heun (SSP-RK2) time stepping — the
    #: path-conservative fluctuation form gains the in-cell reconstruction
    #: term ``B(u)·σ``, lifting NCP problems to second order under forced
    #: limiting.
    fallback_order: int = 1
    #: Slope limiter for ``fallback_order=2``: "minmod" (TVD, the robust
    #: default), "mc" (monotonized central) or "central" (unlimited; for
    #: smooth-convergence studies only).
    fallback_slope: str = "minmod"
    #: Optional fused-Pallas accelerator
    #: (:class:`~exahype_tpu.models.aderdg_pallas.PallasADERDG` built over
    #: the SAME base solver): the candidate step + face fluxes run through
    #: the VMEM predictor kernel; detection and the FV fallback stay XLA.
    accelerator: Optional[object] = None
    #: Static capacity of the GATHERED subcell fallback: when set, the
    #: (2N+1)^d FV step runs only on the troubled cells — top-``capacity``
    #: troubled cells gathered into a compact ``[..., K]`` batch (slot axis
    #: in the TPU lanes), stepped with slot-table ghost exchange (gathered
    #: neighbours exchange subcell edge layers; untroubled neighbours
    #: contribute their projected DG state), and scattered back — instead
    #: of over the whole grid.  This is the production configuration: at a
    #: realistic 1–5 % troubled fraction the fallback cost drops from
    #: O(grid·(2N+1)^d) to O(K·(2N+1)^d).  Troubled cells beyond the
    #: capacity degrade per ``overflow_fallback`` (the selection is
    #: deterministic — lowest flat cell index first).  Requires the
    #: ``"subcell"`` fallback at ``fallback_order=1``.
    troubled_capacity: Optional[int] = None
    #: Gathering granularity of the capacity path: ``"cell"`` gathers
    #: individual troubled cells (fine-grained, but TPU gathers pay ~1 µs
    #: PER INDEX regardless of row size — measured 100+ ms at K=16k on a
    #: 256k grid), ``"row"`` gathers whole LAST-grid-axis rows containing
    #: any troubled cell (each index moves a contiguous
    #: ``[nodes, V, row_len]`` lane tile — the fast TPU gather shape; the
    #: last grid axis must then be whole, i.e. unsharded).  With ``"row"``,
    #: ``troubled_capacity`` counts ROWS.  Numerics: identical contract —
    #: the per-cell troubled mask still decides which cells take the
    #: fallback; untroubled cells of a gathered row keep their DG
    #: candidate, and in-row neighbours exchange REAL FV states (closer to
    #: the whole-grid fallback than the cell path, which freezes them).
    troubled_granularity: str = "cell"
    #: Run the gathered ROW fallback's directional sweeps as fused Pallas
    #: kernels (one ``pallas_call`` per direction; ghost construction and
    #: the projection/reconstruction chains stay XLA).  Each sweep's bulk
    #: ``(2N+1)^d`` flux/eigenvalue/update math — ~10 batch-sized HBM
    #: round trips per direction in the XLA formulation — runs
    #: VMEM-resident instead, reading and writing the gathered batch
    #: exactly once per direction (blocks grid over the transverse subcell
    #: positions so every vector op gets a full ``(K, L)`` tile — see
    #: ``models/subcell_pallas.py``).  The kernel body calls the SAME
    #: :meth:`_row_sweep_math` as the XLA path, so the numerics cannot
    #: drift.  Requires ``troubled_granularity="row"``.
    subcell_pallas: bool = False
    subcell_vmem_limit_bytes: int = 100 * 1024 * 1024
    #: Interpret-mode for the subcell sweep kernels (CPU tests).
    subcell_interpret: bool = False
    #: Degradation of troubled units beyond the gathered capacity:
    #: ``"means"`` (default) gives them the first-order cell-mean FV
    #: update — unconditionally stable, so sustained overflow degrades
    #: accuracy (first order there, approximate flux accounting at their
    #: faces) instead of detonating; ``"candidate"`` keeps the (failed)
    #: DG candidate — exactly conservative and flux-consistent, for runs
    #: whose :meth:`capacity_usage` shows real margin.  Measured on the
    #: 256k-cell bench blast (v5e, capacity 128): the candidate policy
    #: lets un-limited troubled cells avalanche (248 flagged rows at step
    #: 22 → 928 by step 30 → NaN by ~35), the means policy keeps the run
    #: admissible.  Only meaningful with ``troubled_capacity``.
    overflow_fallback: str = "means"
    #: Post-step conservative admissibility guard
    #: (:meth:`_admissibility_scale`): contract any cell the
    #: interface-matching/overflow passes pushed out of the admissible set
    #: toward its own (preserved) cell mean.  On by default whenever
    #: ``admissible`` is set — disabling it removes the safety net that
    #: keeps strong walled interactions from detonating
    #: (tests/test_limiter_walls.py) and is only meant for cost
    #: decomposition probes (scripts/limited_probe.py).
    post_step_guard: bool = True

    def __post_init__(self):
        from exahype_tpu.models.dg import (
            subcell_projection,
            subcell_reconstruction,
        )

        self.n_sub = 2 * self.solver.order + 1
        basis = getattr(self.solver, "basis", "legendre")
        self._P = subcell_projection(self.solver.order, self.n_sub, basis)
        self._R = subcell_reconstruction(self.solver.order, self.n_sub, basis)
        # Wall-boundary support (round 4): every wall type of the base
        # solver composes — reflective/outflow/farfield route their ghosts
        # through ``solver.reflect_fn`` (the solver ctor installs it for
        # outflow/farfield), dirichlet walls precompute subcell-projected
        # and cell-mean ghost rows from ``dirichlet_fn``.  ``wall_axes``
        # flows through ``solver.is_wall(d)`` everywhere.
        self._dirichlet_sub = {}
        self._dirichlet_mean = {}
        if self.solver.boundary == "dirichlet":
            self._build_dirichlet_rows()
            if self.troubled_capacity is not None:
                raise SemanticError(
                    "the gathered (troubled_capacity) fallback does not "
                    "support dirichlet walls yet — use the whole-grid "
                    "subcell fallback"
                )
            if self.solver.visc_flux_fn is not None:
                raise SemanticError(
                    "limited viscous solvers with dirichlet walls are not "
                    "supported (ghost gradients at prescribed-state walls "
                    "are unspecified)"
                )
        if getattr(self.solver, "visc_flux_fn", None) is not None:
            # Viscous solvers are supported on the whole-grid paths
            # (first-order subcell, order-2 MUSCL, and means fallbacks all
            # add central-difference diffusive face fluxes), so DG/FV
            # interface fluxes stay matched and conservation exact.  Not
            # yet ported: the gathered (troubled_capacity) paths and the
            # Pallas sweeps.
            if self.troubled_capacity is not None:
                raise SemanticError(
                    "viscous solvers are not supported on the gathered "
                    "(troubled_capacity) fallback paths yet"
                )
            if getattr(self, "subcell_pallas", False):
                raise SemanticError(
                    "viscous solvers are not supported by the Pallas "
                    "subcell sweeps yet"
                )
        if self.fallback not in ("subcell", "means"):
            raise ValueError(f"unknown fallback {self.fallback!r}")
        if self.fallback_order not in (1, 2):
            raise ValueError(f"fallback_order must be 1 or 2, got {self.fallback_order}")
        if self.fallback_slope not in ("minmod", "mc", "central"):
            raise ValueError(f"unknown fallback_slope {self.fallback_slope!r}")
        if self.accelerator is not None and self.accelerator.solver is not self.solver:
            raise ValueError(
                "accelerator must wrap the limiter's own base solver"
            )
        if self.troubled_granularity not in ("cell", "row"):
            raise ValueError(
                f"unknown troubled_granularity {self.troubled_granularity!r}"
            )
        if self.overflow_fallback not in ("means", "candidate"):
            raise ValueError(
                f"unknown overflow_fallback {self.overflow_fallback!r}"
            )
        if self.troubled_capacity is not None:
            if self.fallback != "subcell" or self.fallback_order != 1:
                raise ValueError(
                    "troubled_capacity requires fallback='subcell' with "
                    "fallback_order=1 (the gathered ghost exchange carries "
                    "one subcell layer)"
                )
            n_units = int(np.prod(self.solver.grid_shape))
            if self.troubled_granularity == "row":
                n_units = int(np.prod(self.solver.grid_shape[:-1]))
            self.troubled_capacity = min(int(self.troubled_capacity), n_units)
        if self.subcell_pallas:
            if (
                self.troubled_capacity is None
                or self.troubled_granularity != "row"
            ):
                raise ValueError(
                    "subcell_pallas accelerates the gathered ROW fallback: "
                    "set troubled_capacity with troubled_granularity='row'"
                )

    # ------------------------------------------------------- boundary helpers

    @property
    def _wall(self) -> bool:
        """Whether ANY grid axis carries a domain wall."""
        return any(
            self.solver.is_wall(d) for d in range(self.solver.dim)
        )

    def _wall_on(self, d: int) -> bool:
        """Whether grid axis ``d`` carries a domain wall (any type)."""
        return self.solver.is_wall(d)

    def _build_dirichlet_rows(self):
        """Precompute the dirichlet wall ghosts in the two layouts the
        limiter needs: subcell means (``_dirichlet_sub[(d, side)]`` —
        transverse node axes P-projected, singleton at axis ``d``) and
        cell means (``_dirichlet_mean[(d, side)]`` — transverse node axes
        weight-projected, shape ``[V, grid with d -> 1]``)."""
        sol = self.solver
        nn = sol.n_nodes
        w = np.asarray(sol.ops.weights)
        P = np.asarray(self._P)
        for d in range(sol.dim):
            if not sol.is_wall(d):
                continue
            for side in (0, 1):
                face_shape = (
                    (nn,) * (sol.dim - 1)
                    + (sol.n_vars,)
                    + tuple(
                        1 if e == d else sol.grid_shape[e]
                        for e in range(sol.dim)
                    )
                )
                row = np.broadcast_to(
                    np.asarray(sol.dirichlet_fn(d, side)), face_shape
                )
                sub = row
                mean = row
                for t in range(sol.dim - 1):
                    sub = np.moveaxis(
                        np.tensordot(P, sub, axes=([1], [t])), 0, t
                    )
                    mean = np.tensordot(w, mean, axes=([0], [0]))
                self._dirichlet_sub[(d, side)] = np.expand_dims(sub, d)
                self._dirichlet_mean[(d, side)] = mean

    @staticmethod
    def _set_row(x, row, pos, ax):
        n = x.shape[ax]
        return jax.lax.dynamic_update_slice_in_dim(
            x, row, pos % n, ax
        )

    @staticmethod
    def _row(x, pos, ax):
        return jax.lax.index_in_dim(x, pos, ax, keepdims=True)

    def _ghost_sub(self, row, d, side, va):
        """Ghost SUBCELL layer at the ``(axis d, side)`` wall given the
        wall-adjacent layer ``row``: the reflect hook (reflective walls
        mirror, outflow copies, farfield broadcasts the prescribed state)
        or the precomputed dirichlet subcell row."""
        if self.solver.boundary == "dirichlet":
            g = jnp.asarray(self._dirichlet_sub[(d, side)], row.dtype)
            return jnp.broadcast_to(g, row.shape)
        return self.solver.reflect_fn(row, d, va)

    def _ghost_mean(self, row, d, side):
        """Ghost CELL-MEAN row (``[V, grid with d -> 1]`` layout, var axis
        0) at the ``(axis d, side)`` wall."""
        if self.solver.boundary == "dirichlet":
            g = jnp.asarray(self._dirichlet_mean[(d, side)], row.dtype)
            return jnp.broadcast_to(g, row.shape)
        return self.solver.reflect_fn(row, d, 0)

    def _shift_clamp(self, x, sh, ax, d):
        """Neighbour values along grid axis ``ax`` (direction ``d``) for
        the DMP neighbourhood; at reflective/outflow walls the missing
        neighbour is the cell's own value (the neighbourhood shrinks), at
        farfield/dirichlet walls it is the prescribed ghost mean (the
        window admits the inflow state, so held boundary data never
        false-flags)."""
        out = jnp.roll(x, sh, axis=ax)
        if self._wall_on(d):
            pos = -1 if sh == -1 else 0
            if self.solver.boundary in ("farfield", "dirichlet"):
                side = 1 if sh == -1 else 0
                row = self._ghost_mean(self._row(x, pos, ax), d, side)
            else:
                row = self._row(x, pos, ax)
            out = self._set_row(out, row, pos, ax)
        return out

    def _shift_reflect(self, x, sh, ax, d, var_axis,
                       negate_ghost=False, grad_field=False):
        """Neighbour STATE along grid axis ``ax`` for direction ``d``; at
        walls the ghost comes from the boundary hook (mirror / copy /
        farfield state / dirichlet mean — ``x`` here is a cell-MEANS
        array, var axis 0).  ``grad_field=True`` marks gradient arrays:
        prescribed-state walls (farfield/dirichlet) give a ZERO ghost
        gradient (their ghost is a constant — ``reflect_fn`` would wrongly
        broadcast the prescribed STATE into a gradient slot); reflective /
        outflow walls mirror/copy, with ``negate_ghost`` flipping the
        wall-normal component (mirroring flips that direction)."""
        out = jnp.roll(x, sh, axis=ax)
        if self._wall_on(d):
            pos = -1 if sh == -1 else 0
            side = 1 if sh == -1 else 0
            row = self._row(x, pos, ax)
            if grad_field:
                if self.solver.boundary in ("farfield", "dirichlet"):
                    ghost = jnp.zeros_like(row)
                else:
                    ghost = self.solver.reflect_fn(row, d, var_axis)
                    if negate_ghost:
                        ghost = -ghost
            elif self.solver.boundary == "dirichlet":
                ghost = self._ghost_mean(row, d, side)
            else:
                ghost = self.solver.reflect_fn(row, d, var_axis)
            out = self._set_row(out, ghost, pos, ax)
        return out



    # ------------------------------------------------------- diagnostics

    def capacity_usage(self, u, dt):
        """(units_demanded, capacity) for one step from ``u`` — the
        overflow monitor for gathered production runs (jittable; fetch and
        compare on the host between chunks).  Units are CELLS for
        ``troubled_granularity="cell"`` and last-axis ROWS for ``"row"``.
        Demand above capacity degrades per ``overflow_fallback``: the
        default ``"means"`` policy stays admissible but drops the
        overflowed cells to first order, the ``"candidate"`` policy keeps
        exact conservation but can avalanche under SUSTAINED overflow —
        either way, size the capacity ABOVE the worst step's demand
        (transients flag far more than steady fronts; see
        docs/PERFORMANCE.md)."""
        if self.troubled_capacity is None:
            raise ValueError("capacity_usage requires troubled_capacity")
        stepper = self.accelerator if self.accelerator is not None else self.solver
        candidate = stepper.step(u, dt)
        t = self.troubled_mask(u, candidate)
        if self.troubled_granularity == "row":
            demand = t.any(axis=-1).sum()
        else:
            demand = t.sum()
        return demand, self.troubled_capacity

    def driver_observables(self, dt, conserved_vars=(0,)):
        """Global observables (``DriverConfig.observables``) surfacing the
        gathered path's conservation/overflow trade PER CHUNK in the
        production driver metrics — the measurable decomposition of a
        run's conserved-quantity drift into the overflow policy's cost vs
        the hardware floor:

        - ``total_q{i}``: quadrature integral of conserved variable ``i``
          (per-chunk drift of these IS the conservation error);
        - ``capacity_demand`` / ``capacity_overflow``: troubled units
          demanded at the chunk boundary, and the excess over capacity.
          Chunks with ``capacity_overflow == 0`` bound the rounding floor;
          chunks where it engages attribute their EXTRA drift to the
          ``overflow_fallback="means"`` policy's approximate flux
          accounting (docs/PERFORMANCE.md, conservation accounting).

        ``dt`` is the run's step size — demand is evaluated from a probe
        candidate step at the chunk boundary (one extra step per chunk;
        ~1/chunk_steps overhead).  All observables jit into the driver's
        single bundled dispatch and lower to collectives on a mesh.
        """
        obs = {}
        for i in conserved_vars:
            obs[f"total_q{i}"] = (
                lambda Q, _i=i: self.solver.total_mass(Q)[_i]
            )
        if self.troubled_capacity is not None:
            def _demand(Q):
                d, _ = self.capacity_usage(Q, dt)
                return d

            def _overflow(Q):
                d, cap = self.capacity_usage(Q, dt)
                return jnp.maximum(d - cap, 0)

            obs["capacity_demand"] = _demand
            obs["capacity_overflow"] = _overflow
        return obs

    # ------------------------------------------------------------- means

    def cell_means(self, u):
        """Quadrature average per cell: [n_vars, *grid]."""
        w = self.solver.ops.weights
        out = u
        for d in reversed(range(self.solver.dim)):
            out = _project(jnp.asarray(w, u.dtype), out, self.solver.node_axis(d))
        return out

    def _broadcast_means(self, means, like):
        """[n_vars, *grid] -> full nodal state (constant per cell)."""
        shape = (1,) * self.solver.dim + means.shape
        return jnp.broadcast_to(means.reshape(shape), like.shape)

    # --------------------------------------------------------- detection

    def troubled_mask(self, u_old, candidate):
        """Boolean [*grid] mask of cells needing the fallback."""
        sol = self.solver
        node_axes = tuple(range(sol.dim))
        # Per-cell NODAL extremes of the old solution: [V, *grid].
        cell_lo = jnp.min(u_old, axis=node_axes)
        cell_hi = jnp.max(u_old, axis=node_axes)
        new_lo = jnp.min(candidate, axis=node_axes)
        new_hi = jnp.max(candidate, axis=node_axes)

        # Neighbourhood extremes over faces in each direction (walls clamp:
        # the neighbourhood simply shrinks at a domain face).
        lo, hi = cell_lo, cell_hi
        for d in range(sol.dim):
            ax = 1 + d  # grid axis within the [V, *grid] arrays
            for shift in (-1, 1):
                lo = jnp.minimum(lo, self._shift_clamp(cell_lo, shift, ax, d))
                hi = jnp.maximum(hi, self._shift_clamp(cell_hi, shift, ax, d))
        # Relaxation widened relative to the variable magnitude, so smooth
        # extrema of large-valued variables (e.g. total energy) don't
        # false-positive at tight absolute tolerances.
        delta = jnp.maximum(
            self.dmp_delta0 * (1.0 + jnp.abs(hi)),
            self.dmp_eps * (hi - lo),
        )
        dmp_ok = ((new_lo >= lo - delta) & (new_hi <= hi + delta)).all(axis=0)

        ok = dmp_ok & jnp.isfinite(candidate).all(
            axis=tuple(range(sol.dim)) + (sol.var_axis,)
        )
        if self.admissible is not None:
            adm = self.admissible(candidate, sol.var_axis)
            ok = ok & adm.all(axis=tuple(range(sol.dim)))
        return ~ok

    # ---------------------------------------------------------- fallback

    def _masked_jump(self, dq, va):
        """Apply the solver's dissipation_mask to a Rusanov jump term."""
        m = self.solver.dissipation_mask
        if m is None:
            return dq
        mshape = [1] * dq.ndim
        mshape[va] = len(m)
        return dq * jnp.asarray(m, dq.dtype).reshape(mshape)

    def fv_fallback(self, u, dt):
        """First-order Rusanov update of the cell means, nodal-broadcast."""
        sol = self.solver
        means = self.cell_means(u)  # [V, *grid]; var axis 0
        new = means
        if sol.visc_flux_fn is not None:
            # Direction-independent central-difference gradients of the
            # cell means, computed once.
            G = [
                (self._shift_reflect(means, -1, 1 + e, e, 0)
                 - self._shift_reflect(means, 1, 1 + e, e, 0))
                / (2.0 * sol._dxs[e])
                for e in range(sol.dim)
            ]
        for d in range(sol.dim):
            lam = dt / sol._dxs[d]
            ax = 1 + d
            up = self._shift_reflect(means, -1, ax, d, 0)  # +d neighbour
            dn = self._shift_reflect(means, 1, ax, d, 0)  # -d neighbour

            def flux(Q):
                return sol.flux_fn(Q, d, 0)

            def eig(Q):
                return sol.max_eigenvalue_fn(Q, d, 0)

            s_hi = jnp.maximum(eig(means), eig(up))[None]
            s_lo = jnp.maximum(eig(dn), eig(means))[None]
            fhat_hi = 0.5 * (flux(means) + flux(up)) - 0.5 * s_hi * self._masked_jump(up - means, 0)
            fhat_lo = 0.5 * (flux(dn) + flux(means)) - 0.5 * s_lo * self._masked_jump(means - dn, 0)
            if sol.visc_flux_fn is not None:
                # Central-difference diffusive face fluxes on the cell
                # means (same construction as the subcell path, h = dx).
                G_up = [
                    self._shift_reflect(G[e], -1, ax, d, 0,
                                        negate_ghost=(e == d),
                                        grad_field=True)
                    for e in range(sol.dim)
                ]
                G_dn = [
                    self._shift_reflect(G[e], 1, ax, d, 0,
                                        negate_ghost=(e == d),
                                        grad_field=True)
                    for e in range(sol.dim)
                ]
                grads_hi = tuple(
                    (up - means) / sol._dxs[d] if e == d
                    else 0.5 * (G[e] + G_up[e])
                    for e in range(sol.dim)
                )
                grads_lo = tuple(
                    (means - dn) / sol._dxs[d] if e == d
                    else 0.5 * (G_dn[e] + G[e])
                    for e in range(sol.dim)
                )
                fhat_hi = fhat_hi + sol.visc_flux_fn(
                    0.5 * (means + up), grads_hi, d, 0
                )
                fhat_lo = fhat_lo + sol.visc_flux_fn(
                    0.5 * (dn + means), grads_lo, d, 0
                )
            new = new - lam * (fhat_hi - fhat_lo)
            if sol.ncp_fn is not None:
                # First-order path-conservative fluctuations: the volume
                # term vanishes (piecewise-constant cells); each cell gets
                # the central half from both faces (dissipation is in fhat).
                half_hi = 0.5 * sol.ncp_fn(0.5 * (means + up), up - means, d, 0)
                half_lo = 0.5 * sol.ncp_fn(0.5 * (dn + means), means - dn, d, 0)
                new = new - lam * (half_hi + half_lo)
        if sol.source_fn is not None:
            new = new + dt * sol.source_fn(means, 0)
        return self._broadcast_means(new, u)

    # ------------------------------------------------------------- subcell

    def project_subcells(self, u):
        """Nodal state -> subcell means: node axes become n_sub-sized."""
        from exahype_tpu.models.aderdg import _apply

        out = u
        for d in range(self.solver.dim):
            out = _apply(self._P, out, self.solver.node_axis(d))
        return out

    def reconstruct_subcells(self, s):
        """Subcell means -> nodal, with an exact cell-mean correction."""
        from exahype_tpu.models.aderdg import _apply, _project

        sol = self.solver
        out = s
        for d in range(sol.dim):
            out = _apply(self._R, out, sol.node_axis(d))
        # Conservation fix: shift so the quadrature mean equals the subcell
        # mean exactly (pinv reconstruction is only exact on polynomials).
        sub_axes = tuple(range(sol.dim))
        mean_sub = jnp.mean(s, axis=sub_axes)
        mean_rec = out
        for d in reversed(range(sol.dim)):
            mean_rec = _project(
                jnp.asarray(sol.ops.weights, out.dtype), mean_rec, sol.node_axis(d)
            )
        shift = (mean_sub - mean_rec).reshape((1,) * sol.dim + mean_sub.shape)
        return out + shift

    def subcell_fv_step(self, u, dt, return_face_fluxes: bool = False):
        """One Rusanov FV step on the (2N+1)^d subcell grid of every cell
        (periodic across cells), returned as reconstructed nodal state.

        ``return_face_fluxes=True`` additionally returns, per direction, the
        transverse-averaged flux through each cell's HIGH face — exactly
        what the troubled cells exchanged with their neighbours (captured
        from the dimensional-splitting sweep), for interface matching.
        """
        sol = self.solver
        n_sub = self.n_sub
        va = sol.var_axis
        s = self.project_subcells(u)
        face_fluxes = []

        if self.fallback_order == 2:
            # MUSCL + Heun (SSP-RK2): second order in space and time; the
            # effective cell-boundary flux is the stage average.
            s1, fl1 = self._muscl_sweep(s, dt, return_face_fluxes)
            s2, fl2 = self._muscl_sweep(s1, dt, return_face_fluxes)
            s_new = 0.5 * (s + s2)
            recon = self.reconstruct_subcells(s_new)
            if return_face_fluxes:
                return recon, [0.5 * (a + b) for a, b in zip(fl1, fl2)]
            return recon

        for d in range(sol.dim):
            lam = dt / (sol._dxs[d] / n_sub)
            sub_ax = sol.node_axis(d)
            grid_ax = sol.grid_axis(d)

            def take(rng):
                sl = [slice(None)] * s.ndim
                sl[sub_ax] = rng
                return s[tuple(sl)]

            first = take(slice(0, 1))
            last = take(slice(n_sub - 1, n_sub))
            from_right = jnp.roll(first, shift=-1, axis=grid_ax)
            from_left = jnp.roll(last, shift=1, axis=grid_ax)
            if self._wall_on(d):
                # Ghost subcells at walls from the boundary hook, fed the
                # wall-adjacent subcell of the SAME cell (the nearest
                # interior subcell); dirichlet walls use prescribed rows.
                ghost_hi = self._ghost_sub(
                    self._row(last, -1, grid_ax), d, 1, va
                )
                from_right = self._set_row(from_right, ghost_hi, -1, grid_ax)
                ghost_lo = self._ghost_sub(
                    self._row(first, 0, grid_ax), d, 0, va
                )
                from_left = self._set_row(from_left, ghost_lo, 0, grid_ax)
            u_plus = jnp.concatenate([take(slice(1, None)), from_right], axis=sub_ax)
            u_minus = jnp.concatenate([from_left, take(slice(0, n_sub - 1))], axis=sub_ax)

            F = sol.flux_fn(s, d, va)
            F_plus = sol.flux_fn(u_plus, d, va)
            F_minus = sol.flux_fn(u_minus, d, va)
            s_hi = jnp.expand_dims(
                jnp.maximum(
                    sol.max_eigenvalue_fn(s, d, va),
                    sol.max_eigenvalue_fn(u_plus, d, va),
                ),
                va,
            )
            s_lo = jnp.expand_dims(
                jnp.maximum(
                    sol.max_eigenvalue_fn(u_minus, d, va),
                    sol.max_eigenvalue_fn(s, d, va),
                ),
                va,
            )
            fhat_hi = 0.5 * (F + F_plus) - 0.5 * s_hi * self._masked_jump(u_plus - s, va)
            fhat_lo = 0.5 * (F_minus + F) - 0.5 * s_lo * self._masked_jump(s - u_minus, va)
            if sol.visc_flux_fn is not None:
                # Central-difference diffusive face fluxes on the subcell
                # grid: exact two-point normal derivative, cell-centered
                # central differences averaged to the face for the
                # transverse components.  fhat_hi(i) == fhat_lo(i+1) by
                # construction, so conservation telescopes exactly.
                hs = [sol._dxs[e] / n_sub for e in range(sol.dim)]
                G = [
                    (self._sub_shift(s, -1, e, va)
                     - self._sub_shift(s, 1, e, va)) / (2.0 * hs[e])
                    for e in range(sol.dim)
                ]
                G_plus = [
                    self._sub_shift(G[e], -1, d, va,
                                    negate_ghost=(e == d), grad_field=True)
                    for e in range(sol.dim)
                ]
                G_minus = [
                    self._sub_shift(G[e], 1, d, va,
                                    negate_ghost=(e == d), grad_field=True)
                    for e in range(sol.dim)
                ]
                grads_hi = tuple(
                    (u_plus - s) / hs[d] if e == d
                    else 0.5 * (G[e] + G_plus[e])
                    for e in range(sol.dim)
                )
                grads_lo = tuple(
                    (s - u_minus) / hs[d] if e == d
                    else 0.5 * (G_minus[e] + G[e])
                    for e in range(sol.dim)
                )
                fhat_hi = fhat_hi + sol.visc_flux_fn(
                    0.5 * (s + u_plus), grads_hi, d, va
                )
                fhat_lo = fhat_lo + sol.visc_flux_fn(
                    0.5 * (u_minus + s), grads_lo, d, va
                )
            if sol.ncp_fn is not None:
                half_hi = 0.5 * sol.ncp_fn(0.5 * (s + u_plus), u_plus - s, d, va)
                half_lo = 0.5 * sol.ncp_fn(0.5 * (u_minus + s), s - u_minus, d, va)
                ncp_fluct = half_hi + half_lo
            else:
                ncp_fluct = None
            if return_face_fluxes:
                # Cell-boundary flux: last subcell's hi-face flux, averaged
                # over the transverse subcell axes (equal areas).
                boundary = jax.lax.index_in_dim(
                    fhat_hi, n_sub - 1, sub_ax, keepdims=False
                )
                # Transverse subcell axes, repositioned after the removal.
                other_sub_axes = tuple(
                    a if a < d else a - 1 for a in range(sol.dim) if a != d
                )
                face_fluxes.append(jnp.mean(boundary, axis=other_sub_axes))
            s = s - lam * (fhat_hi - fhat_lo)
            if ncp_fluct is not None:
                s = s - lam * ncp_fluct
        if sol.source_fn is not None:
            # Forward-Euler source on the subcell means (first order in
            # time, matching the FV fallback's accuracy; the DG path keeps
            # the high-order space-time source).
            s = s + dt * sol.source_fn(s, va)
        recon = self.reconstruct_subcells(s)
        if return_face_fluxes:
            return recon, face_fluxes
        return recon

    # ------------------------------------------------- gathered subcell path

    def _gather_tables(self, troubled):
        """Slot tables for the gathered fallback, built IN-JIT from the
        troubled mask: per-slot flat cell index, activity, the slot index
        of each face neighbour (or -1 where the neighbour is untroubled /
        overflowed), the neighbour's flat CELL index (for DG ghost
        gathers), and wall flags.  Selection is a cumsum compaction over
        the 0/1 mask — deterministic (lowest flat index first),
        shape-static, and O(n) (measured ~4x faster than ``top_k`` over
        256k cells on a v5e chip), so re-detection never retraces."""
        sol = self.solver
        K = self.troubled_capacity
        grid = sol.grid_shape
        flat = troubled.reshape(-1)
        n_cells = flat.shape[0]
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
        slot_target = jnp.where(flat & (pos < K), pos, K)
        cell = jnp.full((K,), n_cells, jnp.int32).at[slot_target].set(
            jnp.arange(n_cells, dtype=jnp.int32), mode="drop"
        )
        active = cell < n_cells
        cell_safe = jnp.minimum(cell, n_cells - 1)
        slot_of = jnp.full((n_cells,), -1, jnp.int32).at[cell].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop"
        )
        coords = jnp.unravel_index(cell_safe, grid)
        strides = np.array(
            [int(np.prod(grid[d + 1 :])) for d in range(sol.dim)], np.int32
        )
        nb_slot, nb_cell, wall = [], [], []
        for d in range(sol.dim):
            per_side_nb, per_side_cell, per_side_wall = [], [], []
            for sh in (-1, 1):
                moved = coords[d] + sh
                on_wall = (
                    ((moved < 0) | (moved >= grid[d]))
                    if self._wall_on(d)
                    else jnp.zeros_like(active)
                )
                flat_nb = cell_safe + sh * strides[d]
                # Periodic wrap along axis d in flat space.
                wrapped_lo = moved < 0
                wrapped_hi = moved >= grid[d]
                span = grid[d] * strides[d]
                flat_nb = jnp.where(wrapped_lo, flat_nb + span, flat_nb)
                flat_nb = jnp.where(wrapped_hi, flat_nb - span, flat_nb)
                slot = slot_of[flat_nb]
                per_side_nb.append(jnp.where(on_wall, -1, slot))
                per_side_cell.append(flat_nb)
                per_side_wall.append(on_wall)
            nb_slot.append(jnp.stack(per_side_nb, axis=-1))
            nb_cell.append(jnp.stack(per_side_cell, axis=-1))
            wall.append(jnp.stack(per_side_wall, axis=-1))
        gathered = (
            jnp.zeros((n_cells,), bool)
            .at[cell]
            .set(True, mode="drop")
            .reshape(grid)
        )
        return {
            "coords": coords,
            "cell": cell,  # flat index, sentinel n_cells when inactive
            "cell_safe": cell_safe,
            "active": active,
            "nb_slot": jnp.stack(nb_slot, axis=1),  # [K, dim, 2]
            "nb_cell": jnp.stack(nb_cell, axis=1),  # [K, dim, 2]
            "wall": jnp.stack(wall, axis=1),  # [K, dim, 2]
            "mask": gathered,
        }

    def _gather_cells(self, u, flat_idx):
        """[node axes..., V, *grid] -> [node axes..., V, K] (slot lanes):
        one single-axis gather on the flattened cell grid — multi-axis
        advanced indexing lowers to a scalarised gather on TPU (measured
        ~5x slower)."""
        sol = self.solver
        lead = u.shape[: sol.dim + 1]
        return jnp.take(u.reshape(lead + (-1,)), flat_idx, axis=-1)

    def _gathered_subcell_step(self, u, dt, tables):
        """The (2N+1)^d Rusanov FV step of :meth:`subcell_fv_step`, run on
        the gathered ``[..., K]`` slot batch only.  Ghost subcell layers:
        the neighbour slot's current edge layer where the neighbour is
        gathered (so shared faces see identical left/right states on both
        sides — fluxes match exactly), the projected DG state where it is
        not, the mirror at walls.  Returns the reconstructed nodal blocks
        and the per-direction (lo, hi) transverse-mean cell-boundary
        fluxes ``[V, K]``."""
        sol = self.solver
        n_sub = self.n_sub
        va = sol.var_axis
        U = self._gather_cells(u, tables["cell_safe"])
        s = U
        for d in range(sol.dim):
            s = _apply(self._P, s, d)

        # DG ghost layers per (direction, side): the untroubled neighbour's
        # subcell edge layer, projected from its (unchanged) nodal state —
        # axis d first so only the one-layer SLICE pays the transverse
        # projections (≈n_sub× less work than projecting the full block).
        dg_ghost = []
        P_mat = self._P
        for d in range(sol.dim):
            per_side = []
            for side in (0, 1):
                Un = self._gather_cells(u, tables["nb_cell"][:, d, side])
                edge = n_sub - 1 if side == 0 else 0  # layer facing ME
                edge_row = [float(v) for v in np.asarray(P_mat)[edge]]
                Sn = sum(
                    edge_row[j]
                    * jax.lax.index_in_dim(Un, j, d, keepdims=True)
                    for j in range(sol.n_nodes)
                )
                for e in range(sol.dim):
                    if e != d:
                        Sn = _apply(P_mat, Sn, e)
                per_side.append(Sn)
            dg_ghost.append(per_side)

        def bmask(m, like_ndim):
            return m.reshape((1,) * (like_ndim - 1) + (-1,))

        g_fluxes = []
        for d in range(sol.dim):
            lam = dt / (sol._dxs[d] / n_sub)
            sub_ax = d

            def take(rng):
                sl = [slice(None)] * s.ndim
                sl[sub_ax] = rng
                return s[tuple(sl)]

            first = take(slice(0, 1))
            last = take(slice(n_sub - 1, n_sub))
            nb_hi = tables["nb_slot"][:, d, 1]
            nb_lo = tables["nb_slot"][:, d, 0]
            # Clipped indices: keep -1 slots out of the gather's
            # out-of-bounds fill path (see the row path's note).
            ghost_hi = jnp.where(
                bmask(nb_hi >= 0, s.ndim),
                jnp.take(first, jnp.maximum(nb_hi, 0), axis=-1),
                dg_ghost[d][1],
            )
            ghost_lo = jnp.where(
                bmask(nb_lo >= 0, s.ndim),
                jnp.take(last, jnp.maximum(nb_lo, 0), axis=-1),
                dg_ghost[d][0],
            )
            if self._wall_on(d):
                ghost_hi = jnp.where(
                    bmask(tables["wall"][:, d, 1], s.ndim),
                    sol.reflect_fn(last, d, va),
                    ghost_hi,
                )
                ghost_lo = jnp.where(
                    bmask(tables["wall"][:, d, 0], s.ndim),
                    sol.reflect_fn(first, d, va),
                    ghost_lo,
                )
            # Materialized ghosts: see the row path's TPU-miscompile note.
            ghost_hi, ghost_lo = jax.lax.optimization_barrier(
                (ghost_hi, ghost_lo)
            )
            u_plus = jnp.concatenate([take(slice(1, None)), ghost_hi], axis=sub_ax)
            u_minus = jnp.concatenate(
                [ghost_lo, take(slice(0, n_sub - 1))], axis=sub_ax
            )

            F = sol.flux_fn(s, d, va)
            F_plus = sol.flux_fn(u_plus, d, va)
            F_minus = sol.flux_fn(u_minus, d, va)
            s_hi = jnp.expand_dims(
                jnp.maximum(
                    sol.max_eigenvalue_fn(s, d, va),
                    sol.max_eigenvalue_fn(u_plus, d, va),
                ),
                va,
            )
            s_lo = jnp.expand_dims(
                jnp.maximum(
                    sol.max_eigenvalue_fn(u_minus, d, va),
                    sol.max_eigenvalue_fn(s, d, va),
                ),
                va,
            )
            fhat_hi = 0.5 * (F + F_plus) - 0.5 * s_hi * self._masked_jump(
                u_plus - s, va
            )
            fhat_lo = 0.5 * (F_minus + F) - 0.5 * s_lo * self._masked_jump(
                s - u_minus, va
            )
            if sol.ncp_fn is not None:
                half_hi = 0.5 * sol.ncp_fn(0.5 * (s + u_plus), u_plus - s, d, va)
                half_lo = 0.5 * sol.ncp_fn(0.5 * (u_minus + s), s - u_minus, d, va)
                ncp_fluct = half_hi + half_lo
            else:
                ncp_fluct = None
            other_sub_axes = tuple(a for a in range(sol.dim) if a != d)
            g_hi = jnp.mean(
                jax.lax.index_in_dim(fhat_hi, n_sub - 1, sub_ax, keepdims=False),
                axis=tuple(a if a < d else a - 1 for a in other_sub_axes),
            )
            g_lo = jnp.mean(
                jax.lax.index_in_dim(fhat_lo, 0, sub_ax, keepdims=False),
                axis=tuple(a if a < d else a - 1 for a in other_sub_axes),
            )
            g_fluxes.append((g_lo, g_hi))
            s = s - lam * (fhat_hi - fhat_lo)
            if ncp_fluct is not None:
                s = s - lam * ncp_fluct
        if sol.source_fn is not None:
            s = s + dt * sol.source_fn(s, va)
        return self._reconstruct_gathered(s), g_fluxes

    def _reconstruct_gathered(self, s):
        """Subcell means -> nodal on the slot batch, with the cell-mean
        conservation fix (mirrors :meth:`reconstruct_subcells` with the
        grid axes replaced by the slot axis)."""
        sol = self.solver
        out = s
        for d in range(sol.dim):
            out = _apply(self._R, out, d)
        sub_axes = tuple(range(sol.dim))
        mean_sub = jnp.mean(s, axis=sub_axes)
        mean_rec = out
        for d in reversed(range(sol.dim)):
            mean_rec = _project(
                jnp.asarray(sol.ops.weights, out.dtype), mean_rec, d
            )
        shift = (mean_sub - mean_rec).reshape((1,) * sol.dim + mean_sub.shape)
        return out + shift

    def _scatter_fallback(self, candidate, R, tables):
        """Write the gathered blocks back at their cells: one single-axis
        scatter on the flattened grid (inactive slots carry the n_cells
        sentinel and drop)."""
        sol = self.solver
        lead = candidate.shape[: sol.dim + 1]
        flat = candidate.reshape(lead + (-1,))
        out = flat.at[..., tables["cell"]].set(R, mode="drop")
        return out.reshape(candidate.shape)

    def _scatter_face_fluxes(self, g_fluxes, tables, dtype):
        """Assemble the global per-direction high-face flux arrays
        ``[V, *grid]`` from the gathered (lo, hi) fluxes: every slot owns
        its hi face, and also writes its LO-face flux to the -d neighbour's
        hi-face slot (so mixed faces whose troubled side is the HIGH cell
        are covered; where both sides are gathered the two writes carry the
        identical exchanged flux).  Flat single-axis scatters throughout."""
        sol = self.solver
        grid = sol.grid_shape
        n_cells = int(np.prod(grid))
        active = tables["active"]
        out = []
        for d in range(sol.dim):
            g_lo, g_hi = g_fluxes[d]
            G = jnp.zeros((sol.n_vars, n_cells), dtype)
            G = G.at[:, tables["cell"]].set(g_hi, mode="drop")
            # My low face = (-d neighbour)'s high face; skip at a wall (the
            # wall face has a single owner and no matching partner).
            drop_lo = ~active | tables["wall"][:, d, 0]
            tgt = jnp.where(drop_lo, n_cells, tables["nb_cell"][:, d, 0])
            G = G.at[:, tgt].set(g_lo, mode="drop")
            out.append(G.reshape((sol.n_vars,) + grid))
        return out

    # --------------------------------------------- row-granular gathered path

    def _gather_tables_row(self, troubled):
        """Row tables: one slot per LAST-axis row containing any troubled
        cell.  Indices live over the flattened leading grid axes (R_n =
        prod(grid[:-1]) entries — e.g. 2048 on the 256k bench grid), so
        every table op is tiny; each data gather moves a contiguous
        ``[.., row_len]`` lane tile."""
        sol = self.solver
        K = self.troubled_capacity
        grid = sol.grid_shape
        L = grid[-1]
        lead_grid = grid[:-1]
        R_n = int(np.prod(lead_grid))
        cell_rows = troubled.reshape(R_n, L)
        flat = cell_rows.any(axis=-1)
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
        slot_target = jnp.where(flat & (pos < K), pos, K)
        row = jnp.full((K,), R_n, jnp.int32).at[slot_target].set(
            jnp.arange(R_n, dtype=jnp.int32), mode="drop"
        )
        active = row < R_n
        row_safe = jnp.minimum(row, R_n - 1)
        slot_of = jnp.full((R_n,), -1, jnp.int32).at[row].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop"
        )
        coords = jnp.unravel_index(row_safe, lead_grid)
        strides = np.array(
            [int(np.prod(lead_grid[d + 1 :])) for d in range(sol.dim - 1)],
            np.int32,
        )
        nb_slot, nb_row, wall = [], [], []
        for d in range(sol.dim - 1):
            per_nb, per_row, per_wall = [], [], []
            for sh in (-1, 1):
                moved = coords[d] + sh
                on_wall = (
                    ((moved < 0) | (moved >= lead_grid[d]))
                    if self._wall_on(d)
                    else jnp.zeros_like(active)
                )
                flat_nb = row_safe + sh * strides[d]
                span = lead_grid[d] * strides[d]
                flat_nb = jnp.where(moved < 0, flat_nb + span, flat_nb)
                flat_nb = jnp.where(moved >= lead_grid[d], flat_nb - span, flat_nb)
                per_nb.append(jnp.where(on_wall, -1, slot_of[flat_nb]))
                per_row.append(flat_nb)
                per_wall.append(on_wall)
            nb_slot.append(jnp.stack(per_nb, axis=-1))
            nb_row.append(jnp.stack(per_row, axis=-1))
            wall.append(jnp.stack(per_wall, axis=-1))
        row_gathered = (
            jnp.zeros((R_n,), bool).at[row].set(True, mode="drop")
        )
        # Effective per-cell mask: troubled AND its row was gathered.
        mask = (cell_rows & row_gathered[:, None]).reshape(grid)
        return {
            "row": row,  # sentinel R_n when inactive
            "row_safe": row_safe,
            "active": active,
            "nb_slot": jnp.stack(nb_slot, axis=1) if nb_slot else None,
            "nb_row": jnp.stack(nb_row, axis=1) if nb_row else None,
            "wall": jnp.stack(wall, axis=1) if wall else None,
            "mask": mask,
        }

    def _gather_rows(self, u, row_idx):
        """[node.., V, *grid] -> [node.., V, K, L]: one gather along the
        flattened leading grid axes; every index moves a contiguous
        ``[nodes·V·L]`` tile."""
        sol = self.solver
        lead = u.shape[: sol.dim + 1]
        L = u.shape[-1]
        return jnp.take(u.reshape(lead + (-1, L)), row_idx, axis=-2)

    def _gathered_subcell_step_row(self, u, dt, tables):
        """The (2N+1)^d Rusanov FV step on the gathered ROW batch
        ``[.., K, L]``.  The last grid direction's ghost exchange is an
        in-row roll (rows span the whole axis, so it is exact — gathered
        cells exchange REAL FV states along the row); the other directions
        use the row slot tables (gathered neighbour rows exchange subcell
        edge layers, ungathered ones contribute their projected DG state,
        walls mirror).  Flux/eigenvalue evaluations are computed once per
        subcell and SHIFTED to the neighbour positions (elementwise
        physics commutes with permutations — bitwise identical, ~3x fewer
        physics sweeps).  Returns the reconstructed nodal rows and the
        per-direction (lo, hi) transverse-mean cell-boundary fluxes
        ``[V, K, L]``."""
        sol = self.solver
        n_sub = self.n_sub
        va = sol.var_axis
        D = sol.dim
        K_ax = D + 1  # slot axis of gathered arrays
        L_ax = D + 2
        s = self._gather_rows(u, tables["row_safe"])
        for d in range(D):
            s = _apply(self._P, s, d)

        # DG ghost layers for the table directions (d < D-1): the
        # ungathered neighbour row's subcell edge layer.
        dg_ghost = []
        P_np = np.asarray(self._P)
        for d in range(D - 1):
            per_side = []
            for side in (0, 1):
                Un = self._gather_rows(u, tables["nb_row"][:, d, side])
                edge = n_sub - 1 if side == 0 else 0
                edge_row = [float(v) for v in P_np[edge]]
                Sn = sum(
                    edge_row[j]
                    * jax.lax.index_in_dim(Un, j, d, keepdims=True)
                    for j in range(sol.n_nodes)
                )
                for e in range(D):
                    if e != d:
                        Sn = _apply(self._P, Sn, e)
                per_side.append(Sn)
            dg_ghost.append(per_side)

        def kmask(m, ndim):
            return m.reshape((1,) * (ndim - 2) + (-1, 1))

        g_fluxes = []
        for d in range(D):
            sub_ax = d

            def take(x, rng, _ax=sub_ax):
                sl = [slice(None)] * x.ndim
                sl[_ax] = rng
                return x[tuple(sl)]

            first = take(s, slice(0, 1))
            last = take(s, slice(n_sub - 1, n_sub))
            if d < D - 1:
                nb_hi = tables["nb_slot"][:, d, 1]
                nb_lo = tables["nb_slot"][:, d, 0]
                # Clipped indices: a -1 (ungathered) slot must not go
                # through the gather's out-of-bounds FILL path (NaN fill
                # lanes have miscompiled on TPU even under a masking
                # where); the where still selects the DG ghost for them.
                ghost_hi = jnp.where(
                    kmask(nb_hi >= 0, s.ndim),
                    jnp.take(first, jnp.maximum(nb_hi, 0), axis=K_ax),
                    dg_ghost[d][1],
                )
                ghost_lo = jnp.where(
                    kmask(nb_lo >= 0, s.ndim),
                    jnp.take(last, jnp.maximum(nb_lo, 0), axis=K_ax),
                    dg_ghost[d][0],
                )
                if self._wall_on(d):
                    ghost_hi = jnp.where(
                        kmask(tables["wall"][:, d, 1], s.ndim),
                        sol.reflect_fn(last, d, va),
                        ghost_hi,
                    )
                    ghost_lo = jnp.where(
                        kmask(tables["wall"][:, d, 0], s.ndim),
                        sol.reflect_fn(first, d, va),
                        ghost_lo,
                    )
            else:
                # In-row exchange along the last grid direction.
                ghost_hi = jnp.roll(first, -1, axis=L_ax)
                ghost_lo = jnp.roll(last, 1, axis=L_ax)
                if self._wall_on(d):
                    mirror_hi = sol.reflect_fn(
                        self._row(last, -1, L_ax), d, va
                    )
                    mirror_lo = sol.reflect_fn(
                        self._row(first, 0, L_ax), d, va
                    )
                    ghost_hi = self._set_row(ghost_hi, mirror_hi, -1, L_ax)
                    ghost_lo = self._set_row(ghost_lo, mirror_lo, 0, L_ax)
            # Materialize the ghost layers: fusing the where/take/roll
            # ghost construction into the downstream concat+flux graph
            # MISCOMPILES on TPU (non-finite values at arbitrary slots;
            # CPU is correct, and any materialization point fixes it —
            # bisected with per-placement probes on a v5e chip).  The
            # barrier is an identity, so gathered==whole-grid parity
            # holds bitwise.
            ghost_hi, ghost_lo = jax.lax.optimization_barrier(
                (ghost_hi, ghost_lo)
            )
            if self.subcell_pallas:
                from exahype_tpu.models.subcell_pallas import row_sweep_call

                s, g_lo, g_hi = row_sweep_call(self, d, s, ghost_lo, ghost_hi, dt)
            else:
                s, g_lo, g_hi = self._row_sweep_math(s, ghost_lo, ghost_hi, d, dt)
            g_fluxes.append((g_lo, g_hi))
        if sol.source_fn is not None:
            s = s + dt * sol.source_fn(s, va)
        return self._reconstruct_gathered(s), g_fluxes

    def _row_sweep_math(self, s, ghost_lo, ghost_hi, d, dt):
        """One directional Rusanov sweep on the gathered row batch
        ``[sub.., V, K, L]``, with the ghost layers already built: the
        shared math of the XLA path and the Pallas kernel body
        (``models/subcell_pallas.py`` wraps this very function, so the two
        paths cannot drift).  Returns ``(s_new, g_lo, g_hi)`` where the
        ``g``'s are the transverse-mean cell-boundary fluxes ``[V, K, L]``.
        Everything here is elementwise physics, leading-axis slicing and
        concatenation, and leading-axis mean reductions — all
        Mosaic-lowerable."""
        sol = self.solver
        n_sub = self.n_sub
        va = sol.var_axis
        D = sol.dim
        lam = dt / (sol._dxs[d] / n_sub)
        sub_ax = d

        def take(x, rng, _ax=sub_ax):
            sl = [slice(None)] * x.ndim
            sl[_ax] = rng
            return x[tuple(sl)]

        u_plus = jnp.concatenate(
            [take(s, slice(1, None)), ghost_hi], axis=sub_ax
        )
        u_minus = jnp.concatenate(
            [ghost_lo, take(s, slice(0, n_sub - 1))], axis=sub_ax
        )
        # One flux/eig sweep + shifted reuse (bitwise == evaluating on
        # the shifted states: the physics is elementwise).
        F = sol.flux_fn(s, d, va)
        F_plus = jnp.concatenate(
            [take(F, slice(1, None)), sol.flux_fn(ghost_hi, d, va)],
            axis=sub_ax,
        )
        F_minus = jnp.concatenate(
            [sol.flux_fn(ghost_lo, d, va), take(F, slice(0, n_sub - 1))],
            axis=sub_ax,
        )
        E = sol.max_eigenvalue_fn(s, d, va)
        E_plus = jnp.concatenate(
            [take(E, slice(1, None)), sol.max_eigenvalue_fn(ghost_hi, d, va)],
            axis=sub_ax,
        )
        E_minus = jnp.concatenate(
            [
                sol.max_eigenvalue_fn(ghost_lo, d, va),
                take(E, slice(0, n_sub - 1)),
            ],
            axis=sub_ax,
        )
        s_hi = jnp.expand_dims(jnp.maximum(E, E_plus), va)
        s_lo = jnp.expand_dims(jnp.maximum(E_minus, E), va)

        def masked_jump(dq):
            # Float-literal unrolled form of `_masked_jump`: identical
            # values, but no captured array constant (pallas_call rejects
            # captured consts; scalar-literal scaling is free in VMEM).
            m = sol.dissipation_mask
            if m is None:
                return dq
            parts = [
                float(mk)
                * jax.lax.index_in_dim(dq, k, va, keepdims=False)
                for k, mk in enumerate(m)
            ]
            return jnp.stack(parts, axis=va)

        fhat_hi = 0.5 * (F + F_plus) - 0.5 * s_hi * masked_jump(u_plus - s)
        fhat_lo = 0.5 * (F_minus + F) - 0.5 * s_lo * masked_jump(s - u_minus)
        if sol.ncp_fn is not None:
            half_hi = 0.5 * sol.ncp_fn(0.5 * (s + u_plus), u_plus - s, d, va)
            half_lo = 0.5 * sol.ncp_fn(0.5 * (u_minus + s), s - u_minus, d, va)
            ncp_fluct = half_hi + half_lo
        else:
            ncp_fluct = None
        other_sub = tuple(a for a in range(D) if a != d)
        g_hi = jnp.mean(
            jax.lax.index_in_dim(fhat_hi, n_sub - 1, sub_ax, keepdims=False),
            axis=tuple(a if a < d else a - 1 for a in other_sub),
        )
        g_lo = jnp.mean(
            jax.lax.index_in_dim(fhat_lo, 0, sub_ax, keepdims=False),
            axis=tuple(a if a < d else a - 1 for a in other_sub),
        )
        s = s - lam * (fhat_hi - fhat_lo)
        if ncp_fluct is not None:
            s = s - lam * ncp_fluct
        return s, g_lo, g_hi

    def _scatter_fallback_row(self, candidate, R, tables, troubled):
        """Merge the gathered rows back: gather the candidate's rows,
        select FV values on the troubled CELLS only, scatter the merged
        rows (contiguous lane tiles both ways)."""
        sol = self.solver
        lead = candidate.shape[: sol.dim + 1]
        L = candidate.shape[-1]
        flat = candidate.reshape(lead + (-1, L))
        cand_rows = jnp.take(flat, tables["row_safe"], axis=-2)
        t_rows = jnp.take(
            troubled.reshape(-1, L), tables["row_safe"], axis=0
        ).reshape((1,) * (sol.dim + 1) + (-1, L))
        merged = jnp.where(t_rows, R, cand_rows)
        out = flat.at[..., tables["row"], :].set(merged, mode="drop")
        return out.reshape(candidate.shape)

    def _scatter_face_fluxes_row(self, g_fluxes, tables, dtype):
        """Global high-face flux arrays ``[V, *grid]`` from the gathered
        row fluxes.  The last direction's faces are complete within each
        row; table directions also write the LO-face flux to the -d
        neighbour row's slot (identical values where both rows are
        gathered), skipping walls."""
        sol = self.solver
        grid = sol.grid_shape
        L = grid[-1]
        R_n = int(np.prod(grid[:-1]))
        out = []
        for d in range(sol.dim):
            g_lo, g_hi = g_fluxes[d]
            G = jnp.zeros((sol.n_vars, R_n, L), dtype)
            G = G.at[:, tables["row"], :].set(g_hi, mode="drop")
            if d < sol.dim - 1:
                drop = ~tables["active"] | tables["wall"][:, d, 0]
                tgt = jnp.where(drop, R_n, tables["nb_row"][:, d, 0])
                G = G.at[:, tgt, :].set(g_lo, mode="drop")
            out.append(G.reshape((sol.n_vars,) + grid))
        return out

    # -------------------------------------------------- second-order subcell

    def _sub_shift(self, x, sh, d, va, negate_ghost=False, grad_field=False):
        """Shift by one along the GLOBAL subcell index of direction ``d``
        (subcell axis within each cell + grid axis across cells, periodic
        across the domain).

        ``grad_field=True`` marks gradient/slope arrays: at
        prescribed-state walls (farfield/dirichlet) their ghost is ZERO
        (the ghost is a constant, and ``reflect_fn`` would wrongly
        broadcast the prescribed STATE into a gradient slot); at
        reflective/outflow walls the ghost is the mirror/copy of the
        interior value, negated when ``negate_ghost`` (the field is the
        wall-normal component — mirroring flips the normal direction)."""
        sol = self.solver
        sub_ax = sol.node_axis(d)
        grid_ax = sol.grid_axis(d)
        n_sub = self.n_sub

        def take(rng):
            sl = [slice(None)] * x.ndim
            sl[sub_ax] = rng
            return x[tuple(sl)]

        first = take(slice(0, 1))
        last = take(slice(n_sub - 1, n_sub))

        def ghost_of(row, side):
            if grad_field:
                if sol.boundary in ("farfield", "dirichlet"):
                    return jnp.zeros_like(row)
                g = sol.reflect_fn(row, d, va)
                return -g if negate_ghost else g
            if sol.boundary == "dirichlet":
                return self._ghost_sub(row, d, side, va)
            return sol.reflect_fn(row, d, va)

        if sh == -1:
            nxt = jnp.roll(first, shift=-1, axis=grid_ax)
            if self._wall_on(d):
                ghost = ghost_of(self._row(last, -1, grid_ax), 1)
                nxt = self._set_row(nxt, ghost, -1, grid_ax)
            return jnp.concatenate([take(slice(1, None)), nxt], axis=sub_ax)
        if sh == 1:
            prv = jnp.roll(last, shift=1, axis=grid_ax)
            if self._wall_on(d):
                ghost = ghost_of(self._row(first, 0, grid_ax), 0)
                prv = self._set_row(prv, ghost, 0, grid_ax)
            return jnp.concatenate([prv, take(slice(0, n_sub - 1))], axis=sub_ax)
        raise ValueError(f"shift must be +-1, got {sh}")

    def _slope(self, d_plus, d_minus):
        """Limited slope from forward/backward differences."""
        if self.fallback_slope == "central":
            return 0.5 * (d_plus + d_minus)
        same = (d_plus * d_minus) > 0.0
        if self.fallback_slope == "minmod":
            lim = jnp.where(
                jnp.abs(d_plus) < jnp.abs(d_minus), d_plus, d_minus
            )
            return jnp.where(same, lim, 0.0)
        # monotonized central
        lim = jnp.sign(d_plus) * jnp.minimum(
            jnp.abs(0.5 * (d_plus + d_minus)),
            2.0 * jnp.minimum(jnp.abs(d_plus), jnp.abs(d_minus)),
        )
        return jnp.where(same, lim, 0.0)

    def _muscl_sweep(self, s, dt, capture_fluxes: bool):
        """One unsplit MUSCL Rusanov stage on the subcell grid: returns
        ``s + dt·L(s)`` and (optionally) the per-direction transverse-mean
        cell-boundary fluxes.  Path-conservative NCP: face fluctuations from
        reconstructed interface states plus the in-cell term ``B(s)·σ``."""
        sol = self.solver
        va = sol.var_axis
        n_sub = self.n_sub
        out = s
        face_fluxes = []
        if sol.visc_flux_fn is not None:
            # Cell-centered central-difference gradients of the stage
            # state: direction-independent, computed once per stage.
            hs = [sol._dxs[e] / n_sub for e in range(sol.dim)]
            G = [
                (self._sub_shift(s, -1, e, va)
                 - self._sub_shift(s, 1, e, va)) / (2.0 * hs[e])
                for e in range(sol.dim)
            ]
        for d in range(sol.dim):
            lam = dt / (sol._dxs[d] / n_sub)
            sub_ax = sol.node_axis(d)

            u_plus = self._sub_shift(s, -1, d, va)
            u_minus = self._sub_shift(s, 1, d, va)
            sigma = self._slope(u_plus - s, s - u_minus)
            sigma_plus = self._sub_shift(
                sigma, -1, d, va, negate_ghost=True, grad_field=True)
            sigma_minus = self._sub_shift(
                sigma, 1, d, va, negate_ghost=True, grad_field=True)

            # Reconstructed interface states at my high and low faces.
            qL_hi = s + 0.5 * sigma
            qR_hi = u_plus - 0.5 * sigma_plus
            qL_lo = u_minus + 0.5 * sigma_minus
            qR_lo = s - 0.5 * sigma

            def rusanov(qL, qR):
                F = 0.5 * (sol.flux_fn(qL, d, va) + sol.flux_fn(qR, d, va))
                sp = jnp.expand_dims(
                    jnp.maximum(
                        sol.max_eigenvalue_fn(qL, d, va),
                        sol.max_eigenvalue_fn(qR, d, va),
                    ),
                    va,
                )
                return F - 0.5 * sp * self._masked_jump(qR - qL, va)

            fhat_hi = rusanov(qL_hi, qR_hi)
            fhat_lo = rusanov(qL_lo, qR_lo)
            if sol.visc_flux_fn is not None:
                # Same central-difference diffusive face fluxes as the
                # first-order path (the two-point normal derivative is
                # centered at the face — already 2nd order), evaluated on
                # the stage state; conservation telescopes identically.
                G_plus = [
                    self._sub_shift(G[e], -1, d, va,
                                    negate_ghost=(e == d), grad_field=True)
                    for e in range(sol.dim)
                ]
                G_minus = [
                    self._sub_shift(G[e], 1, d, va,
                                    negate_ghost=(e == d), grad_field=True)
                    for e in range(sol.dim)
                ]
                grads_hi = tuple(
                    (u_plus - s) / hs[d] if e == d
                    else 0.5 * (G[e] + G_plus[e])
                    for e in range(sol.dim)
                )
                grads_lo = tuple(
                    (s - u_minus) / hs[d] if e == d
                    else 0.5 * (G_minus[e] + G[e])
                    for e in range(sol.dim)
                )
                fhat_hi = fhat_hi + sol.visc_flux_fn(
                    0.5 * (s + u_plus), grads_hi, d, va
                )
                fhat_lo = fhat_lo + sol.visc_flux_fn(
                    0.5 * (u_minus + s), grads_lo, d, va
                )
            out = out - lam * (fhat_hi - fhat_lo)
            if sol.ncp_fn is not None:
                half_hi = 0.5 * sol.ncp_fn(
                    0.5 * (qL_hi + qR_hi), qR_hi - qL_hi, d, va
                )
                half_lo = 0.5 * sol.ncp_fn(
                    0.5 * (qL_lo + qR_lo), qR_lo - qL_lo, d, va
                )
                # In-cell reconstruction term: B(s)·σ — this is what lifts
                # the path-conservative fallback to second order.
                vol = sol.ncp_fn(s, sigma, d, va)
                out = out - lam * (half_hi + half_lo + vol)
            if capture_fluxes:
                boundary = jax.lax.index_in_dim(
                    fhat_hi, n_sub - 1, sub_ax, keepdims=False
                )
                other_sub_axes = tuple(
                    a if a < d else a - 1 for a in range(sol.dim) if a != d
                )
                face_fluxes.append(jnp.mean(boundary, axis=other_sub_axes))
        if sol.source_fn is not None:
            out = out + dt * sol.source_fn(s, va)
        return out, face_fluxes

    # --------------------------------------------------- interface matching

    def _admissibility_scale(self, out):
        """Post-step conservative admissibility guard (Zhang–Shu-style).

        The MOOD detection checks admissibility of the RAW DG candidate;
        :meth:`_match_interface_fluxes` then modifies cells ADJACENT to
        troubled ones — after detection — so a matched cell can leave the
        admissible set unseen, and the NEXT step's fallback then computes
        fluxes/eigenvalues from inadmissible nodal values (negative
        density/pressure → garbage wave speeds) and detonates instead of
        rescuing.  Measured: the strong walled blast
        (tests/test_limiter_walls.py) grows ±1e14 densities and NaNs by
        step ~270 without this guard, and runs clean with it; the
        periodic twin of the same blast dips to ρ_min ≈ 0.009 through
        the same mechanism and merely survives by luck.

        The guard contracts offending cells toward their own cell mean —
        ``mean + θ·(out − mean)`` over a fixed θ ladder (branch-free,
        largest admissible θ wins; θ=0 is the mean itself) — which
        preserves the quadrature cell mean EXACTLY, so conservation and
        the matched interface fluxes are untouched.  Cells whose mean is
        itself inadmissible cannot be fixed pointwise and keep the mean
        (contained; next step's detection flags them).  The whole guard
        runs under ``lax.cond`` on "any node inadmissible", so the common
        all-admissible step pays one admissibility evaluation."""
        sol = self.solver
        node_axes = tuple(range(sol.dim))

        def cell_ok(Q):
            return self.admissible(Q, sol.var_axis).all(axis=node_axes)

        def fix(o):
            means = self.cell_means(o)
            mb = self._broadcast_means(means, o)
            best = mb  # θ = 0: the mean (conservative floor)
            for th in (0.1, 0.25, 0.5, 1.0):
                cand = mb + th * (o - mb)
                okc = cell_ok(cand)
                m = okc.reshape((1,) * (sol.dim + 1) + okc.shape)
                best = jnp.where(m, cand, best)
            return best

        ok = cell_ok(out)
        return jax.lax.cond(ok.all(), lambda o: o, fix, out)

    def _match_interface_fluxes(self, candidate, dg_fluxes, fv_fluxes, troubled, dt):
        """Make mixed DG/FV faces single-valued: untroubled cells adjacent to
        a troubled neighbour replace their DG face flux with the (constant)
        transverse mean the troubled side actually used — restoring exact
        global conservation under limiting (first-order at those faces, as
        expected at a limiter boundary)."""
        sol = self.solver
        nn = sol.n_nodes
        out = candidate
        for d in range(sol.dim):
            lam = dt / sol._dxs[d]
            node_ax = sol.node_axis(d)
            face_grid_ax = sol.grid_axis(d) - 1
            grid_ax_mask = d  # axis within the [*grid] troubled mask
            fhat_dg = dg_fluxes[d]  # [nodes^(dim-1), V, *grid]
            G = jnp.expand_dims(fv_fluxes[d], tuple(range(sol.dim - 1)))
            # Face c|c+1 is mixed with me (c) untroubled, neighbour troubled.
            nbr_hi = jnp.roll(troubled, shift=-1, axis=grid_ax_mask)
            nbr_lo = jnp.roll(troubled, shift=1, axis=grid_ax_mask)
            if self._wall_on(d):
                # Wall faces have one owner — never a mixed DG/FV interface
                # (and the wrapped mask rows are meaningless).  Per-axis:
                # axes outside ``wall_axes`` stay periodic and their wrap
                # faces DO need matching.
                false_row = jnp.zeros_like(
                    self._row(nbr_hi, -1, grid_ax_mask)
                )
                nbr_hi = self._set_row(nbr_hi, false_row, -1, grid_ax_mask)
                nbr_lo = self._set_row(nbr_lo, false_row, 0, grid_ax_mask)
            mixed_hi = (~troubled) & nbr_hi
            mixed_lo = (~troubled) & nbr_lo

            def expand_mask(m, like):
                shape = (1,) * (like.ndim - m.ndim) + m.shape
                return m.reshape(shape)

            delta_hi = jnp.where(
                expand_mask(mixed_hi, fhat_dg), G - fhat_dg, 0.0
            )
            fhat_dg_lo = jnp.roll(fhat_dg, shift=1, axis=face_grid_ax)
            G_lo = jnp.roll(G, shift=1, axis=face_grid_ax)
            delta_lo = jnp.where(
                expand_mask(mixed_lo, fhat_dg_lo), G_lo - fhat_dg_lo, 0.0
            )

            shape_i = [1] * out.ndim
            shape_i[node_ax] = nn
            phi1_w = jnp.asarray(
                sol.ops.phi1 / sol.ops.weights, out.dtype
            ).reshape(shape_i)
            phi0_w = jnp.asarray(
                sol.ops.phi0 / sol.ops.weights, out.dtype
            ).reshape(shape_i)
            out = out - lam * (
                phi1_w * jnp.expand_dims(delta_hi, node_ax)
                - phi0_w * jnp.expand_dims(delta_lo, node_ax)
            )
        return out

    # -------------------------------------------------------------- step

    def step(self, u, dt, return_face_fluxes: bool = False,
             troubled_transform=None):
        """One limited step.

        ``return_face_fluxes=True`` additionally returns the per-direction
        EFFECTIVE high-face fluxes of the limited update: the (constant
        transverse-mean) subcell FV aggregate on every face touching a
        troubled cell — exactly what the interface matching made both
        sides use — and the nodal DG Rusanov flux elsewhere.  This is the
        contract the AMR refluxing consumes, letting a ``LimitedADERDG``
        serve as the fine solver of ``aderdg_amr`` / ``aderdg_pool``
        (``fine_factory=...``) with exact composite conservation.
        Requires the ``"subcell"`` fallback (the ``"means"`` fallback has
        no per-face flux accounting).

        **Wall-face convention** (reflective solvers): ``eff[d][..., c]``
        is the flux through cell ``c``'s HIGH face; the last slot holds the
        HIGH-WALL flux (the Riemann flux against the mirror ghost — the
        flux the wall-adjacent cell actually used: DG's if it is
        untroubled, the subcell FV aggregate if troubled).  The LOW-wall
        flux is not stored; by the mirror symmetry it is
        ``reflect_flux_fn`` of the first cell's low-face flux, and no AMR
        consumer reads it (wall faces have no refluxing partner — the
        pool's wall flags exclude them).  A wall face has a single owner,
        so — unlike the periodic wrap slot — it needs no
        single-valuedness matching, only consistent accounting."""
        stepper = self.accelerator if self.accelerator is not None else self.solver
        candidate, dg_fluxes = stepper.step(u, dt, return_face_fluxes=True)
        troubled = self.troubled_mask(u, candidate)  # [*grid]
        if troubled_transform is not None:
            # Host-structure hook (e.g. the AMR pool synchronising ghost-row
            # flags with the owning neighbour block so both sides of a
            # fine-fine face agree on the limiting decision).
            troubled = troubled_transform(troubled)
        if self.troubled_capacity is not None:
            # Gathered production path: FV only on the troubled slots.
            troubled_raw = troubled
            if self.troubled_granularity == "row":
                tables = self._gather_tables_row(troubled)
                troubled = tables["mask"]
                R, g_fluxes = self._gathered_subcell_step_row(u, dt, tables)
                fv_fluxes = self._scatter_face_fluxes_row(
                    g_fluxes, tables, u.dtype
                )
                candidate = self._match_interface_fluxes(
                    candidate, dg_fluxes, fv_fluxes, troubled, dt
                )
                out = self._scatter_fallback_row(
                    candidate, R, tables, troubled
                )
            else:
                tables = self._gather_tables(troubled)
                troubled = tables["mask"]
                R, g_fluxes = self._gathered_subcell_step(u, dt, tables)
                fv_fluxes = self._scatter_face_fluxes(g_fluxes, tables, u.dtype)
                candidate = self._match_interface_fluxes(
                    candidate, dg_fluxes, fv_fluxes, troubled, dt
                )
                out = self._scatter_fallback(candidate, R, tables)
            if self.overflow_fallback == "means":
                # Troubled units beyond the capacity: first-order
                # cell-mean FV instead of the (failed) DG candidate.
                # Measured necessity (v5e, the 256k-cell bench blast at
                # capacity 128): with the candidate degradation the
                # un-limited troubled cells radiate oscillations that
                # widen the flagged set every step — 248 rows at step 22,
                # 928 by step 30, negative densities by 32, NaN by ~35 —
                # in BOTH the XLA and Pallas fallback variants.  The means
                # update is unconditionally stable, so overflow degrades
                # accuracy (first order at the overflowed cells, approximate
                # flux accounting at their faces) instead of detonating.
                # lax.cond keeps the no-overflow common case free: the
                # means update + full-state select run only on steps
                # where demand actually exceeded the capacity.
                over = troubled_raw & ~troubled

                def _degrade_overflow(o):
                    fbm = self.fv_fallback(u, dt)
                    m = over.reshape(
                        (1,) * (self.solver.dim + 1) + over.shape
                    )
                    return jnp.where(m, fbm, o)

                out = jax.lax.cond(
                    over.any(), _degrade_overflow, lambda o: o, out
                )
            if self.admissible is not None and self.post_step_guard:
                out = self._admissibility_scale(out)
            if not return_face_fluxes:
                return out
            sol = self.solver
            eff = []
            for d in range(sol.dim):
                fhat_dg = dg_fluxes[d]
                G = jnp.expand_dims(fv_fluxes[d], tuple(range(sol.dim - 1)))
                either = troubled | jnp.roll(troubled, shift=-1, axis=d)
                if self._wall_on(d):
                    # The last slot is the HIGH-WALL face: single owner —
                    # the wrapped first-row flag is meaningless there.
                    either = self._set_row(
                        either, self._row(troubled, -1, d), -1, d
                    )
                shape = (1,) * (fhat_dg.ndim - either.ndim) + either.shape
                eff.append(
                    jnp.where(
                        either.reshape(shape),
                        jnp.broadcast_to(G, fhat_dg.shape),
                        fhat_dg,
                    )
                )
            return out, eff
        if self.fallback == "subcell":
            fb, fv_fluxes = self.subcell_fv_step(u, dt, return_face_fluxes=True)
            candidate = self._match_interface_fluxes(
                candidate, dg_fluxes, fv_fluxes, troubled, dt
            )
        else:
            if return_face_fluxes:
                raise ValueError(
                    "return_face_fluxes requires the 'subcell' fallback"
                )
            fb = self.fv_fallback(u, dt)
        mask = troubled.reshape((1,) * (self.solver.dim + 1) + troubled.shape)
        out = jnp.where(mask, fb, candidate)
        if (self.admissible is not None and self.fallback == "subcell"
                and self.post_step_guard):
            out = self._admissibility_scale(out)
        if not return_face_fluxes:
            return out
        sol = self.solver
        eff = []
        for d in range(sol.dim):
            fhat_dg = dg_fluxes[d]
            G = jnp.expand_dims(fv_fluxes[d], tuple(range(sol.dim - 1)))
            either = troubled | jnp.roll(troubled, shift=-1, axis=d)
            if self._wall_on(d):
                # High-wall face: single owner; ignore the wrapped flag.
                either = self._set_row(
                    either, self._row(troubled, -1, d), -1, d
                )
            shape = (1,) * (fhat_dg.ndim - either.ndim) + either.shape
            eff.append(
                jnp.where(
                    either.reshape(shape),
                    jnp.broadcast_to(G, fhat_dg.shape),
                    fhat_dg,
                )
            )
        return out, eff

    def run(self, u, n_steps: int, dt):
        def body(carry, _):
            return self.step(carry, dt), None

        out, _ = jax.lax.scan(body, u, None, length=n_steps)
        return out
