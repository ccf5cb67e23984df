"""Exact Riemann solver for the 1-D Euler equations (Toro's algorithm).

Ground truth for shock-tube validation: given left/right states
``(ρ, u, p)``, solves the star-region pressure with Newton iteration and
samples the self-similar solution ``W(x/t)``.  Used by tests to validate the
FV and limited-DG solvers against the analytic Sod solution — the classic
CFD acceptance test.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class PrimState:
    rho: float
    u: float
    p: float


SOD_LEFT = PrimState(1.0, 0.0, 1.0)
SOD_RIGHT = PrimState(0.125, 0.0, 0.1)


def _sound_speed(s: PrimState, gamma: float) -> float:
    return np.sqrt(gamma * s.p / s.rho)


def _f_and_df(p: float, s: PrimState, gamma: float) -> tuple[float, float]:
    """Toro's pressure function for one side and its derivative."""
    a = _sound_speed(s, gamma)
    if p > s.p:  # shock
        A = 2.0 / ((gamma + 1.0) * s.rho)
        B = (gamma - 1.0) / (gamma + 1.0) * s.p
        sqrt_term = np.sqrt(A / (p + B))
        f = (p - s.p) * sqrt_term
        df = sqrt_term * (1.0 - 0.5 * (p - s.p) / (p + B))
    else:  # rarefaction
        f = (
            2.0 * a / (gamma - 1.0)
            * ((p / s.p) ** ((gamma - 1.0) / (2.0 * gamma)) - 1.0)
        )
        df = (1.0 / (s.rho * a)) * (p / s.p) ** (-(gamma + 1.0) / (2.0 * gamma))
    return f, df


def star_state(
    left: PrimState, right: PrimState, gamma: float = 1.4
) -> tuple[float, float]:
    """(p*, u*) via Newton iteration."""
    p = max(1e-8, 0.5 * (left.p + right.p))
    du = right.u - left.u
    for _ in range(60):
        fl, dfl = _f_and_df(p, left, gamma)
        fr, dfr = _f_and_df(p, right, gamma)
        delta = (fl + fr + du) / (dfl + dfr)
        p = max(1e-12, p - delta)
        if abs(delta) < 1e-14 * p:
            break
    fl, _ = _f_and_df(p, left, gamma)
    fr, _ = _f_and_df(p, right, gamma)
    u = 0.5 * (left.u + right.u) + 0.5 * (fr - fl)
    return p, u


def sample(
    xi: np.ndarray,
    left: PrimState = SOD_LEFT,
    right: PrimState = SOD_RIGHT,
    gamma: float = 1.4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Primitive solution (ρ, u, p) at similarity coordinates ξ = x/t."""
    p_star, u_star = star_state(left, right, gamma)
    xi = np.asarray(xi, dtype=float)
    rho = np.empty_like(xi)
    u = np.empty_like(xi)
    p = np.empty_like(xi)
    g = gamma

    for i, x in np.ndenumerate(xi):
        if x <= u_star:  # left of contact
            s = left
            a = _sound_speed(s, g)
            if p_star > s.p:  # left shock
                shock_speed = s.u - a * np.sqrt(
                    (g + 1.0) / (2.0 * g) * p_star / s.p + (g - 1.0) / (2.0 * g)
                )
                if x < shock_speed:
                    rho[i], u[i], p[i] = s.rho, s.u, s.p
                else:
                    ratio = p_star / s.p
                    gm = (g - 1.0) / (g + 1.0)
                    rho[i] = s.rho * (ratio + gm) / (gm * ratio + 1.0)
                    u[i], p[i] = u_star, p_star
            else:  # left rarefaction
                a_star = a * (p_star / s.p) ** ((g - 1.0) / (2.0 * g))
                head = s.u - a
                tail = u_star - a_star
                if x < head:
                    rho[i], u[i], p[i] = s.rho, s.u, s.p
                elif x > tail:
                    rho[i] = s.rho * (p_star / s.p) ** (1.0 / g)
                    u[i], p[i] = u_star, p_star
                else:  # inside the fan
                    u[i] = 2.0 / (g + 1.0) * (a + (g - 1.0) / 2.0 * s.u + x)
                    c = a - (g - 1.0) / 2.0 * (u[i] - s.u)
                    rho[i] = s.rho * (c / a) ** (2.0 / (g - 1.0))
                    p[i] = s.p * (c / a) ** (2.0 * g / (g - 1.0))
        else:  # right of contact (mirror)
            s = right
            a = _sound_speed(s, g)
            if p_star > s.p:  # right shock
                shock_speed = s.u + a * np.sqrt(
                    (g + 1.0) / (2.0 * g) * p_star / s.p + (g - 1.0) / (2.0 * g)
                )
                if x > shock_speed:
                    rho[i], u[i], p[i] = s.rho, s.u, s.p
                else:
                    ratio = p_star / s.p
                    gm = (g - 1.0) / (g + 1.0)
                    rho[i] = s.rho * (ratio + gm) / (gm * ratio + 1.0)
                    u[i], p[i] = u_star, p_star
            else:  # right rarefaction
                a_star = a * (p_star / s.p) ** ((g - 1.0) / (2.0 * g))
                head = s.u + a
                tail = u_star + a_star
                if x > head:
                    rho[i], u[i], p[i] = s.rho, s.u, s.p
                elif x < tail:
                    rho[i] = s.rho * (p_star / s.p) ** (1.0 / g)
                    u[i], p[i] = u_star, p_star
                else:
                    u[i] = 2.0 / (g + 1.0) * (-a + (g - 1.0) / 2.0 * s.u + x)
                    c = a + (g - 1.0) / 2.0 * (u[i] - s.u)
                    rho[i] = s.rho * (c / a) ** (2.0 / (g - 1.0))
                    p[i] = s.p * (c / a) ** (2.0 * g / (g - 1.0))
    return rho, u, p
