"""Ideal MHD with GLM divergence cleaning — 9-variable model family.

Magnetohydrodynamics is the other flagship ExaHyPE application family.
State (3-D vectors regardless of spatial dim, the standard convention):

    Q = [ρ, ρu, ρv, ρw, E, Bx, By, Bz, ψ]

with the Dedner GLM cleaning field ψ transporting ∇·B errors at speed
``c_h``.  Fluxes follow the standard ideal-MHD form plus the GLM coupling
(F_B_n = ψ, F_ψ = c_h² B_n).  Fast magnetosonic speed bounds the spectrum.

Batch-native callbacks (variable axis last).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp


def mhd_flux(Q, normal, *, gamma: float = 5.0 / 3.0, c_h: float = 1.0):
    n = int(normal)
    rho = Q[..., 0]
    inv_rho = 1.0 / rho
    u = Q[..., 1] * inv_rho
    v = Q[..., 2] * inv_rho
    w = Q[..., 3] * inv_rho
    E = Q[..., 4]
    Bx, By, Bz = Q[..., 5], Q[..., 6], Q[..., 7]
    psi = Q[..., 8]

    vel = [u, v, w]
    B = [Bx, By, Bz]
    B2 = Bx * Bx + By * By + Bz * Bz
    kinetic = 0.5 * rho * (u * u + v * v + w * w)
    p_gas = (gamma - 1.0) * (E - kinetic - 0.5 * B2)
    p_tot = p_gas + 0.5 * B2

    un = vel[n]
    Bn = B[n]
    v_dot_B = u * Bx + v * By + w * Bz

    mom = []
    for k in range(3):
        f = rho * vel[k] * un - B[k] * Bn
        if k == n:
            f = f + p_tot
        mom.append(f)
    energy = (E + p_tot) * un - Bn * v_dot_B
    b_flux = []
    for k in range(3):
        if k == n:
            b_flux.append(psi)  # GLM coupling
        else:
            b_flux.append(B[k] * un - vel[k] * Bn)
    psi_flux = c_h * c_h * Bn

    return jnp.stack(
        [rho * un] + mom + [energy] + b_flux + [psi_flux], axis=-1
    )


def mhd_eigenvalue(Q, normal, *, gamma: float = 5.0 / 3.0, c_h: float = 1.0):
    """Fast magnetosonic bound |u_n| + c_f, floored by the cleaning speed."""
    n = int(normal)
    rho = Q[..., 0]
    inv_rho = 1.0 / jnp.abs(rho)
    u_n = Q[..., 1 + n] * inv_rho
    Bx, By, Bz = Q[..., 5], Q[..., 6], Q[..., 7]
    B2 = Bx * Bx + By * By + Bz * Bz
    kinetic = 0.5 * (Q[..., 1] ** 2 + Q[..., 2] ** 2 + Q[..., 3] ** 2) * inv_rho
    p_gas = (gamma - 1.0) * (Q[..., 4] - kinetic - 0.5 * B2)
    a2 = gamma * jnp.abs(p_gas) * inv_rho
    b2 = B2 * inv_rho
    bn2 = Q[..., 5 + n] ** 2 * inv_rho
    quad = a2 + b2
    c_f2 = 0.5 * (quad + jnp.sqrt(jnp.maximum(quad * quad - 4.0 * a2 * bn2, 0.0)))
    return jnp.maximum(jnp.abs(u_n) + jnp.sqrt(c_f2), c_h)


N_VARS = 9


def mhd(gamma: float = 5.0 / 3.0, c_h: float = 1.0):
    return (
        partial(mhd_flux, gamma=gamma, c_h=c_h),
        partial(mhd_eigenvalue, gamma=gamma, c_h=c_h),
    )
