"""Curvilinear (mapped) meshes: ADER-DG on smoothly deformed grids.

The reference family's seismic application runs on curvilinear meshes to
fit surface topography (curvilinear ExaSeis).  The TPU-native version
keeps the solver Cartesian in REFERENCE coordinates ξ ∈ [0,L]^dim and
moves the geometry into the PHYSICS through the strong-conservation
curvilinear form

    ∂t (J q) + ∂_ξk ( J a^k_i F_i(q) ) = 0,      a^k_i = ∂ξ^k/∂x_i,

so the evolved state is the DENSITIZED field Q̃ = J·q and the flux along
reference axis k is the metric-weighted combination of the physical
fluxes.  The metric terms (J and the dim² contravariant entries J·a^k_i)
ride as FROZEN per-node variable slots — exactly the heterogeneous-
material mechanism the solver stack already supports everywhere
(predictor, corrector, limiter, pools, sharding), and for linear physics
the transformed flux stays linear HOMOGENEOUS in Q̃ given the metric
slots, so the Cauchy–Kovalewski linear kernels compose through
``ck_material_slots`` unchanged.

Discrete geometry: metrics are computed EXACTLY from the user's mapping
x(ξ) by forward-mode autodiff at every node (no finite differences).
The discrete metric identities ∂_ξk(J a^k_i) = 0 then hold only to
truncation order, so a constant state is preserved to scheme order, not
to rounding (free-stream error must CONVERGE, which is tested) — the
standard behavior of nodal DG with analytic metrics.  The identity
defect is O(h^N): in the 2-D tests it sits below the scheme error
(advection measured at N+1), in 3-D it is the visible floor (measured
≈ N).  The known refinement is Kopriva's conservative curl-form
discrete metrics (volume-exact identities), a candidate for a future
round; for the smooth moderate deformations topography needs, analytic
metrics at these rates are the documented trade.  Conservation is
exact in the densitized field: Σ w·Q̃ = ∫ q J dξ = ∫ q dx telescopes to
rounding on periodic domains.

Slot layout: ``[wave (n_wave), J, J·a^0_0 … J·a^0_{dim-1}, J·a^1_0, …]``
(k-major), total ``n_wave + 1 + dim²`` variables.

Reference: the curvilinear treatment mirrors what ExaHyPE's seismic
applications do on top of `/root/reference/exahype/KernelBuilder.py`-built
kernels; the reference repo itself bundles only Cartesian Euler
(`Unit test/Functions.cpp`), so this is a family capability.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def n_vars_curvilinear(n_wave: int, dim: int) -> int:
    return n_wave + 1 + dim * dim


def curvilinear_physics(flux: Callable, eig: Callable, dim: int,
                        n_wave: int):
    """Lift batch-native var-last ``(flux(q, normal), eig(q, normal))``
    physical callbacks onto the densitized curvilinear state.

    The returned eigenvalue is the Rusanov-safe bound
    ‖a^k‖₂ · max_i λ_i(q): exact for isotropic wave speeds (elastic,
    acoustics), an upper bound otherwise (more face dissipation, never
    instability).
    """

    def cflux(Q, normal):
        k = int(normal)
        J = Q[..., n_wave]
        q = Q[..., :n_wave] / J[..., None]
        rows = None
        for i in range(dim):
            Jak_i = Q[..., n_wave + 1 + k * dim + i]
            term = Jak_i[..., None] * flux(q, i)
            rows = term if rows is None else rows + term
        return jnp.concatenate(
            [rows, jnp.zeros_like(Q[..., n_wave:])], axis=-1
        )

    def ceig(Q, normal):
        k = int(normal)
        J = Q[..., n_wave]
        q = Q[..., :n_wave] / J[..., None]
        norm2 = None
        for i in range(dim):
            a = Q[..., n_wave + 1 + k * dim + i] / J
            norm2 = a * a if norm2 is None else norm2 + a * a
        lam = eig(q, 0)
        for i in range(1, dim):
            lam = jnp.maximum(lam, eig(q, i))
        return jnp.sqrt(norm2) * lam

    return cflux, ceig


def curvilinear_dissipation_mask(n_wave: int, dim: int) -> tuple:
    """Freeze the metric slots against Rusanov jump dissipation."""
    return (1,) * n_wave + (0,) * (1 + dim * dim)


def curvilinear_material_slots(n_wave: int, dim: int) -> tuple:
    """The frozen metric slots — pass as ``ck_material_slots`` for the CK
    linear kernels on curvilinear linear systems."""
    return tuple(range(n_wave, n_wave + 1 + dim * dim))


def metric_fields(solver, mapping: Callable):
    """Exact nodal metric slots and physical node coordinates for a
    smooth mapping ``x = mapping(ξ)`` (dim-vector → dim-vector).

    Returns ``(metric, xphys)``:

    - ``metric``: ndarray shaped like the solver state with the var axis
      of length ``1 + dim²`` — ``[J, J·a^k_i (k-major)]`` at every node,
      from forward-mode autodiff of the mapping (no finite differences).
    - ``xphys``: list of dim arrays (var axis squeezed) of physical node
      coordinates, for sampling initial data given in physical space.
    """
    dim = solver.dim
    coords = solver.nodes_meshgrid()
    no_var = tuple(
        s for e, s in enumerate(solver.state_shape)
        if e != solver.var_axis
    )
    xi = np.stack(
        [
            np.broadcast_to(
                np.squeeze(np.asarray(c), solver.var_axis), no_var
            )
            for c in coords
        ],
        axis=-1,
    ).reshape(-1, dim)

    jac_fn = jax.vmap(jax.jacfwd(lambda p: jnp.asarray(mapping(p))))
    A = np.asarray(jac_fn(jnp.asarray(xi)))          # [N, dim, dim] dx/dξ
    x = np.asarray(jax.vmap(lambda p: jnp.asarray(mapping(p)))(
        jnp.asarray(xi)
    ))
    J = np.linalg.det(A)
    if np.any(J <= 0):
        raise ValueError(
            "mapping must be orientation-preserving (det dx/dξ > 0 at "
            "every node)"
        )
    Ainv = np.linalg.inv(A)                          # [N, k, i] = ∂ξk/∂xi
    slots = [J] + [
        J * Ainv[:, k, i] for k in range(dim) for i in range(dim)
    ]
    metric = np.stack(slots, axis=-1).reshape(no_var + (1 + dim * dim,))
    metric = np.moveaxis(metric, -1, solver.var_axis)
    xphys = [
        x[:, d].reshape(no_var) for d in range(dim)
    ]
    return metric, xphys


def densitize(q_wave, metric, var_axis: int):
    """Assemble the solver state from physical wave variables and the
    metric slots: ``Q̃ = [J·q, J, J·a…]`` along ``var_axis``."""
    J = jnp.take(jnp.asarray(metric), jnp.asarray([0]), axis=var_axis)
    return jnp.concatenate(
        [jnp.asarray(q_wave) * J, jnp.asarray(metric)], axis=var_axis
    )


def undensitize(Q, n_wave: int, var_axis: int):
    """Physical wave variables q = Q̃_wave / J from the solver state."""
    Q = jnp.asarray(Q)
    wave = jnp.take(Q, jnp.arange(n_wave), axis=var_axis)
    J = jnp.take(Q, jnp.asarray([n_wave]), axis=var_axis)
    return wave / J
