"""Nodal DG operators: Gauss-Legendre quadrature and Lagrange matrices.

Building blocks for the ADER-DG solver (the reference framework's headline
scheme; BASELINE.md north star is 3-D Euler ADER-DG order 3).  Everything is
nodal on Gauss-Legendre points of [0, 1] with collocation quadrature — the
ExaHyPE2 convention — so mass matrices are diagonal.

All matrices are computed in float64 NumPy at setup time (they are tiny,
(order+1)²) and cast to the state dtype when applied.
"""

from __future__ import annotations

import numpy as np


def gauss_legendre(n: int) -> tuple[np.ndarray, np.ndarray]:
    """``n`` Gauss-Legendre nodes and weights on [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)  # on [-1, 1]
    return (x + 1.0) / 2.0, w / 2.0


def lagrange_eval(nodes: np.ndarray, x: float) -> np.ndarray:
    """Values ℓ_i(x) of the Lagrange basis through ``nodes``."""
    n = len(nodes)
    out = np.ones(n)
    for i in range(n):
        for j in range(n):
            if j != i:
                out[i] *= (x - nodes[j]) / (nodes[i] - nodes[j])
    return out


def lagrange_diff_matrix(nodes: np.ndarray) -> np.ndarray:
    """D[i, j] = ℓ'_j(ξ_i): nodal derivative matrix."""
    n = len(nodes)
    D = np.zeros((n, n))
    for j in range(n):
        for i in range(n):
            if i == j:
                D[i, j] = sum(
                    1.0 / (nodes[j] - nodes[k]) for k in range(n) if k != j
                )
            else:
                num = 1.0
                for k in range(n):
                    if k != j and k != i:
                        num *= (nodes[i] - nodes[k]) / (nodes[j] - nodes[k])
                D[i, j] = num / (nodes[j] - nodes[i])
    return D


class DGOperators:
    """Precomputed 1-D operator set for a given order.

    - ``nodes``, ``weights``: GL points/weights on [0,1] (order+1 of each)
    - ``D``: nodal derivative matrix
    - ``phi0``, ``phi1``: basis values at the faces x=0, x=1
    - ``K1inv``: inverse space-time predictor matrix
      (K1[σ,τ] = θ_σ(1)θ_τ(1) − w_τ D[τ,σ], the weak-in-time operator)
    """

    def __init__(self, order: int):
        self.order = order
        self.n_nodes = order + 1
        self.nodes, self.weights = gauss_legendre(self.n_nodes)
        self.D = lagrange_diff_matrix(self.nodes)
        self.phi0 = lagrange_eval(self.nodes, 0.0)
        self.phi1 = lagrange_eval(self.nodes, 1.0)
        # Kp[σ,τ] = ∫ θ'_σ θ_τ = w_τ D[τ,σ] under GL collocation (exact:
        # the integrand has degree ≤ 2·order−1 < 2·order+1).
        Kp = self.weights[None, :] * self.D.T
        K1 = np.outer(self.phi1, self.phi1) - Kp
        self.K1inv = np.linalg.inv(K1)
        # Volume stiffness applied transposed: Kvol[i,j] = w_j D[j,i] / w_i.
        self.Kvol = (self.weights[None, :] * self.D.T) / self.weights[:, None]


def subcell_projection(order: int, n_sub: int | None = None) -> np.ndarray:
    """P[s, i] = mean of basis ℓ_i over subcell s of [0,1] (n_sub per axis).

    Computed with Gauss-Legendre quadrature inside each subcell — exact for
    the degree-``order`` basis.  Default n_sub = 2*order + 1 (the Dumbser
    subcell count, which makes one subcell-FV step at the DG CFL stable).
    """
    if n_sub is None:
        n_sub = 2 * order + 1
    nodes, weights = gauss_legendre(order + 1)
    P = np.zeros((n_sub, order + 1))
    cell_nodes, _ = gauss_legendre(order + 1)
    for s in range(n_sub):
        lo = s / n_sub
        for q, (xq, wq) in enumerate(zip(nodes, weights)):
            x = lo + xq / n_sub
            P[s] += wq * lagrange_eval(cell_nodes, x)
    return P


def subcell_reconstruction(order: int, n_sub: int | None = None) -> np.ndarray:
    """R = pseudo-inverse of the projection: R @ P = I on polynomials."""
    P = subcell_projection(order, n_sub)
    return np.linalg.pinv(P)


def refine_interpolation(order: int, factor: int) -> np.ndarray:
    """``P[k, i, j]`` = coarse basis ``ℓ_j`` evaluated at fine node ``i`` of
    fine subcell ``k`` (``factor`` fine cells per coarse cell).

    Exact polynomial interpolation — prolongation preserves the order of
    the scheme (piecewise-constant upsampling would clip it to 1).
    """
    n = order + 1
    nodes, _ = gauss_legendre(n)
    P = np.zeros((factor, n, n))
    for k in range(factor):
        for i, xi in enumerate(nodes):
            P[k, i] = lagrange_eval(nodes, (k + xi) / factor)
    return P


def refine_restriction(order: int, factor: int) -> np.ndarray:
    """``R[j, k, i]`` = L2-projection weights of the piecewise fine nodal
    solution onto the coarse basis: ``c_j = Σ_{k,i} R[j,k,i] f_{k,i}``.

    With the diagonal Gauss–Legendre mass matrix this is
    ``w_i ℓ_j(x_{k,i}) / (factor · w_j)``; it is a true projection —
    ``R · P = I`` (tested) — and conserves every moment up to the scheme's
    order, in particular the cell mean (mass).
    """
    n = order + 1
    _, weights = gauss_legendre(n)
    P = refine_interpolation(order, factor)
    R = np.zeros((n, factor, n))
    for j in range(n):
        for k in range(factor):
            for i in range(n):
                R[j, k, i] = weights[i] * P[k, i, j] / (factor * weights[j])
    return R
