"""Linear elasticity (velocity–stress form) — the seismic-wave model family.

Seismic wave propagation is one of the flagship ExaHyPE applications; the
2-D isotropic velocity–stress system is

    state Q = [v_x, v_y, σ_xx, σ_yy, σ_xy]           (5 variables)

    ρ ∂t v_x = ∂x σ_xx + ∂y σ_xy
    ρ ∂t v_y = ∂x σ_xy + ∂y σ_yy
    ∂t σ_xx = (λ+2μ) ∂x v_x + λ ∂y v_y
    ∂t σ_yy = λ ∂x v_x + (λ+2μ) ∂y v_y
    ∂t σ_xy = μ (∂y v_x + ∂x v_y)

written in conservation form ∂t Q + ∂x F_x + ∂y F_y = 0 with linear fluxes.
Wave speeds: c_p = sqrt((λ+2μ)/ρ), c_s = sqrt(μ/ρ).

Batch-native callbacks (variable axis last), usable with the FV spec
builder, the ADER-DG solver (via ``wrap_var_last``), and exact plane-wave
solutions for validation.
"""

from __future__ import annotations

from functools import partial
import math

import jax.numpy as jnp
import numpy as np


def _speeds(rho: float, lam: float, mu: float) -> tuple[float, float]:
    return math.sqrt((lam + 2 * mu) / rho), math.sqrt(mu / rho)


def elastic_flux(Q, normal, *, rho: float = 1.0, lam: float = 2.0, mu: float = 1.0):
    vx, vy = Q[..., 0], Q[..., 1]
    sxx, syy, sxy = Q[..., 2], Q[..., 3], Q[..., 4]
    n = int(normal)
    if n == 0:
        comps = [
            -sxx / rho,
            -sxy / rho,
            -(lam + 2 * mu) * vx,
            -lam * vx,
            -mu * vy,
        ]
    else:
        comps = [
            -sxy / rho,
            -syy / rho,
            -lam * vy,
            -(lam + 2 * mu) * vy,
            -mu * vx,
        ]
    return jnp.stack(comps, axis=-1)


def elastic_eigenvalue(Q, normal, *, rho: float = 1.0, lam: float = 2.0, mu: float = 1.0):
    cp, _ = _speeds(rho, lam, mu)
    return jnp.full(Q.shape[:-1], cp, Q.dtype)


def elastic(rho: float = 1.0, lam: float = 2.0, mu: float = 1.0):
    """(flux, max_eigenvalue) batch-native pair for 2-D elasticity."""
    return (
        partial(elastic_flux, rho=rho, lam=lam, mu=mu),
        partial(elastic_eigenvalue, rho=rho, lam=lam, mu=mu),
    )


def plane_p_wave(x, y, t, *, rho: float = 1.0, lam: float = 2.0, mu: float = 1.0,
                 k: float = 2 * np.pi, amplitude: float = 1e-3):
    """Exact P-wave travelling in +x: v_x = A sin(k(x - c_p t)).

    Returns the 5-variable state on the given coordinate arrays.
    """
    cp, _ = _speeds(rho, lam, mu)
    phase = k * (x - cp * t)
    vx = amplitude * np.sin(phase)
    vy = np.zeros_like(vx)
    # From the PDE: σ_xx = -ρ c_p v_x, σ_yy = -(λ/(λ+2μ)) ρ c_p v_x… derive:
    # travelling-wave ansatz gives σ_xx = -(λ+2μ)/c_p · v_x, σ_yy = -λ/c_p · v_x.
    sxx = -(lam + 2 * mu) / cp * vx
    syy = -lam / cp * vx
    sxy = np.zeros_like(vx)
    return np.stack([vx, vy, sxx, syy, sxy], axis=-1)


# ------------------------------------------------- heterogeneous materials
# State extended with per-cell material parameters carried as non-evolved
# variables: Q = [v_x, v_y, σ_xx, σ_yy, σ_xy, ρ, λ, μ]  (8 variables).
# The fluxes read the material locally and return zeros for the material
# slots, so any solver treats them as frozen fields — the real seismic
# use case (layered media, material interfaces).

N_VARS_HET = 8


def elastic_het_flux(Q, normal):
    vx, vy = Q[..., 0], Q[..., 1]
    sxx, syy, sxy = Q[..., 2], Q[..., 3], Q[..., 4]
    rho, lam, mu = Q[..., 5], Q[..., 6], Q[..., 7]
    inv_rho = 1.0 / rho
    n = int(normal)
    z = jnp.zeros_like(vx)
    if n == 0:
        comps = [
            -sxx * inv_rho,
            -sxy * inv_rho,
            -(lam + 2 * mu) * vx,
            -lam * vx,
            -mu * vy,
        ]
    else:
        comps = [
            -sxy * inv_rho,
            -syy * inv_rho,
            -lam * vy,
            -(lam + 2 * mu) * vy,
            -mu * vx,
        ]
    return jnp.stack(comps + [z, z, z], axis=-1)


def elastic_het_eigenvalue(Q, normal):
    rho, lam, mu = Q[..., 5], Q[..., 6], Q[..., 7]
    return jnp.sqrt((lam + 2 * mu) / rho)


def elastic_heterogeneous():
    """(flux, max_eigenvalue) for 2-D elasticity with per-cell materials."""
    return elastic_het_flux, elastic_het_eigenvalue
