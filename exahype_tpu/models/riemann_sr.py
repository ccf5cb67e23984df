"""Exact Riemann solver for 1-D special-relativistic hydrodynamics.

The relativistic counterpart of `models/riemann.py` (Toro's Newtonian
solver): given left/right primitive states ``(ρ, v, p)`` of an ideal-gas
SRHD fluid (c = 1), solves the star-region pressure where the velocities
behind the two nonlinear waves match — Martí & Müller's construction
(Living Reviews in Relativity, "Numerical Hydrodynamics in Special
Relativity") — and samples the self-similar solution ``W(x/t)``.

Used as the analytic ground truth for relativistic shock-tube validation
of the SRHD/RMHD solver family.  Correctness is machine-checked from
first principles rather than against literature tables: the tests assert
the lab-frame Rankine–Hugoniot conditions ``F(U_b) − F(U_a) =
V_s (U_b − U_a)`` across sampled shocks to 1e-10, constancy of pressure
and velocity across the contact, the isentrope along rarefaction fans,
and the acoustic limit for weak waves.

Everything is float64 NumPy (an oracle, not a compute path).

Wave relations (ideal gas, adiabatic index γ):

- **Shock** to pressure p (p > p_a): Taub adiabat + ideal gas give a
  quadratic for the post-shock enthalpy h_b; the mass flux is
  ``j² = −Δp / Δ(h/ρ)`` and the shock speed follows from the invariant
  ``j = ρ_a W_{sa} (V_s − v_a) W_a`` (lab frame).
- **Rarefaction** to pressure p (p < p_a): isentropic (p ∝ ρ^γ) with the
  relativistic Riemann invariant
  ``½ ln((1+v)/(1−v)) ± (1/√(γ−1)) ln[(√(γ−1)+c)/(√(γ−1)−c)]`` constant
  across the fan.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class PrimState:
    rho: float
    v: float
    p: float


# Martí & Müller's standard relativistic shock-tube ("Problem 1").
MM_LEFT = PrimState(10.0, 0.0, 13.33)
MM_RIGHT = PrimState(1.0, 0.0, 1e-6)


def _h(rho, p, gamma):
    return 1.0 + gamma / (gamma - 1.0) * p / rho


def _cs(rho, p, gamma):
    return np.sqrt(gamma * p / (rho * _h(rho, p, gamma)))


def _W(v):
    return 1.0 / np.sqrt(1.0 - v * v)


# ------------------------------------------------------------------- shocks


def _shock_state(s: PrimState, p: float, gamma: float, sign: int):
    """State behind a shock of the ``sign``-going family (+1 acts on the
    right state, −1 on the left) with post-shock pressure ``p > s.p``.
    Returns (rho_b, v_b, V_s)."""
    ha = _h(s.rho, s.p, gamma)
    dp = p - s.p
    # Taub adiabat + ideal gas: quadratic for h_b.
    a = 1.0 - (gamma - 1.0) * dp / (gamma * p)
    b = (gamma - 1.0) * dp / (gamma * p)
    c = -(ha * ha + ha * dp / s.rho)
    hb = (-b + np.sqrt(b * b - 4.0 * a * c)) / (2.0 * a)
    rho_b = gamma * p / ((gamma - 1.0) * (hb - 1.0))
    # Mass flux j² = −Δp/Δ(h/ρ); j carries the family's sign.
    j2 = -dp / (hb / rho_b - ha / s.rho)
    j = sign * np.sqrt(j2)
    # Shock speed from j = ρ_a W_a W_s (V_s − v_a):
    Wa = _W(s.v)
    A = s.rho * s.rho * Wa * Wa
    Vs = (A * s.v + j * np.sqrt(j2 + A * (1.0 - s.v * s.v))) / (A + j2)
    Ws = _W(Vs)
    # Post-shock velocity (Martí & Müller eq. for v_b behind the shock).
    v_b = (ha * Wa * s.v + Ws * dp / j) / (
        ha * Wa + dp * (Ws * s.v / j + 1.0 / (s.rho * Wa))
    )
    return rho_b, v_b, Vs


# ------------------------------------------------------------- rarefactions


def _invariant(v, cs, gamma, sign):
    """Riemann invariant constant across a ``sign``-family rarefaction."""
    sg = np.sqrt(gamma - 1.0)
    return 0.5 * np.log((1.0 + v) / (1.0 - v)) - sign / sg * np.log(
        (sg + cs) / (sg - cs)
    )


def _rarefaction_state(s: PrimState, p: float, gamma: float, sign: int):
    """State behind a ``sign``-family rarefaction to pressure ``p < s.p``.
    Returns (rho_b, v_b)."""
    rho_b = s.rho * (p / s.p) ** (1.0 / gamma)
    cs_b = _cs(rho_b, p, gamma)
    J = _invariant(s.v, _cs(s.rho, s.p, gamma), gamma, sign)
    sg = np.sqrt(gamma - 1.0)
    # Solve the invariant for v_b: ½ln((1+v)/(1−v)) = J + sign/sg·ln(...).
    t = 2.0 * (J + sign / sg * np.log((sg + cs_b) / (sg - cs_b)))
    v_b = np.tanh(0.5 * t)
    return rho_b, v_b


def _wave_velocity(s: PrimState, p: float, gamma: float, sign: int) -> float:
    """Flow velocity behind the ``sign``-family wave at pressure ``p``."""
    if p > s.p:
        return _shock_state(s, p, gamma, sign)[1]
    return _rarefaction_state(s, p, gamma, sign)[1]


# -------------------------------------------------------------- star region


def star_pressure(
    left: PrimState, right: PrimState, gamma: float = 5.0 / 3.0,
    tol: float = 1e-14, max_iter: int = 200,
) -> float:
    """Bisection on p*: the velocity behind the left (−) wave must equal
    the velocity behind the right (+) wave."""

    def dv(p):
        return _wave_velocity(left, p, gamma, -1) - _wave_velocity(
            right, p, gamma, +1
        )

    lo = 1e-14
    hi = max(left.p, right.p)
    # dv decreases in p; expand hi until dv(hi) < 0.
    while dv(hi) > 0.0:
        hi *= 4.0
        if hi > 1e14:
            raise RuntimeError("star-pressure bracket expansion failed")
    for _ in range(max_iter):
        mid = 0.5 * (lo + hi)
        if dv(mid) > 0.0:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol * hi:
            break
    return 0.5 * (lo + hi)


# ----------------------------------------------------------------- sampling


def _xi(v, cs, sign):
    """Characteristic speed (v ± c)/(1 ± v c) of the ``sign`` family."""
    return (v + sign * cs) / (1.0 + sign * v * cs)


def _sample_side(s: PrimState, p_star, v_star, gamma, sign, xi):
    """Sample at self-similar coordinate ``xi`` on one side (sign=−1 left,
    +1 right), given the star pressure/velocity."""
    if p_star > s.p:  # shock
        rho_b, v_b, Vs = _shock_state(s, p_star, gamma, sign)
        ahead = xi < Vs if sign < 0 else xi > Vs
        return s if ahead else PrimState(rho_b, v_star, p_star)
    # Rarefaction: fan between the head and tail characteristics.
    cs_a = _cs(s.rho, s.p, gamma)
    rho_t, _ = _rarefaction_state(s, p_star, gamma, sign)
    cs_t = _cs(rho_t, p_star, gamma)
    head = _xi(s.v, cs_a, sign)
    tail = _xi(v_star, cs_t, sign)
    if (xi < head if sign < 0 else xi > head):
        return s
    if (xi > tail if sign < 0 else xi < tail):
        return PrimState(rho_t, v_star, p_star)
    # Inside the fan: ξ(p) is monotone — bisect p ∈ [p*, p_a].
    lo, hi = min(p_star, s.p), max(p_star, s.p)
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        rho_m, v_m = _rarefaction_state(s, mid, gamma, sign)
        x_m = _xi(v_m, _cs(rho_m, mid, gamma), sign)
        # For the left fan ξ grows toward the tail as p decreases.
        if (x_m < xi) == (sign < 0):
            hi = mid
        else:
            lo = mid
    rho_m, v_m = _rarefaction_state(s, 0.5 * (lo + hi), gamma, sign)
    return PrimState(rho_m, v_m, 0.5 * (lo + hi))


def sample(
    left: PrimState, right: PrimState, xi, gamma: float = 5.0 / 3.0,
):
    """Solution ``(rho, v, p)`` at self-similar coordinates ``xi = x/t``
    (array-valued)."""
    p_star = star_pressure(left, right, gamma)
    v_star = 0.5 * (
        _wave_velocity(left, p_star, gamma, -1)
        + _wave_velocity(right, p_star, gamma, +1)
    )
    xi = np.atleast_1d(np.asarray(xi, np.float64))
    rho = np.empty_like(xi)
    v = np.empty_like(xi)
    p = np.empty_like(xi)
    for i, x in enumerate(xi):
        s = (
            _sample_side(left, p_star, v_star, gamma, -1, x)
            if x < v_star
            else _sample_side(right, p_star, v_star, gamma, +1, x)
        )
        rho[i], v[i], p[i] = s.rho, s.v, s.p
    return rho, v, p


def cons_and_flux(rho, v, p, gamma: float = 5.0 / 3.0):
    """Lab-frame conserved vector and flux (for RH verification)."""
    W = _W(v)
    h = _h(rho, p, gamma)
    D = rho * W
    S = rho * h * W * W * v
    tau = rho * h * W * W - p - D
    U = np.stack([D, S, tau])
    F = np.stack([D * v, S * v + p, S - D * v])
    return U, F
