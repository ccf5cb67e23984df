"""ADER-DG validation: convergence order, conservation, Euler smooth flow.

The reference has no executable ADER-DG (its DSL emits FV kernels for the
downstream framework); these tests validate our implementation from
mathematical first principles: an order-(N+1) scheme must converge at that
rate on smooth solutions and conserve the state exactly on periodic domains.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exahype_tpu.models import euler
from exahype_tpu.models.aderdg import ADERDGSolver


def advection_physics(velocity):
    a = np.asarray(velocity, dtype=np.float64)

    def flux(Q, axis):
        return a[axis] * Q

    def eig(Q, axis):
        return jnp.full(Q.shape[:-1], float(abs(a[axis])), Q.dtype)

    return flux, eig


def make_advection_solver(cells, order=3, dim=2, velocity=(1.0, 0.5)):
    flux, eig = advection_physics(velocity)
    return ADERDGSolver(
        dim=dim,
        order=order,
        n_vars=1,
        grid_shape=(cells,) * dim,
        flux_fn=flux,
        max_eigenvalue_fn=eig,
        dx=1.0 / cells,
    )


def advection_init(solver, velocity=(1.0, 0.5), t=0.0):
    coords = solver.nodes_meshgrid()
    phase = sum(
        c - v * t for c, v in zip(coords, velocity)
    )  # broadcast sum over dims
    u = np.sin(2 * np.pi * phase)
    u = np.broadcast_to(u, solver.state_shape[:-1])
    return jnp.asarray(u[..., None])


def l2_error(solver, u, u_exact):
    w = solver.ops.weights
    err2 = np.asarray((u - u_exact) ** 2)
    for d in reversed(range(solver.dim)):
        err2 = np.tensordot(w, err2, axes=([0], [solver.node_axis(d)]))
    return float(np.sqrt(err2.sum() * solver.dx**solver.dim))


@pytest.mark.parametrize("order,min_rate", [(2, 2.5), (3, 3.4)])
def test_advection_convergence_rate(order, min_rate):
    velocity = (1.0, 0.5)
    t_end = 0.1
    errors = []
    for cells in (4, 8):
        solver = make_advection_solver(cells, order=order, velocity=velocity)
        u0 = advection_init(solver, velocity)
        n_steps = 4 * cells  # fixed CFL across resolutions
        dt = t_end / n_steps
        u = solver.run(u0, n_steps, dt)
        exact = advection_init(solver, velocity, t=t_end)
        errors.append(l2_error(solver, u, exact))
    rate = np.log2(errors[0] / errors[1])
    assert rate > min_rate, f"order-{order} convergence rate {rate:.2f}, errors {errors}"


def test_advection_conservation():
    solver = make_advection_solver(6, order=3)
    u0 = advection_init(solver)
    mass0 = np.asarray(solver.total_mass(u0))
    u = solver.run(u0, 20, dt=1e-3)
    mass1 = np.asarray(solver.total_mass(u))
    np.testing.assert_allclose(mass1, mass0, rtol=0, atol=1e-12)


def euler_density_wave_solver(cells=6, order=3):
    dim = 2
    flux = lambda Q, axis: euler.flux_v(Q, axis, dim=dim, n_real=4)
    eig = lambda Q, axis: euler.max_eigenvalue_v(Q, axis, dim=dim)
    return ADERDGSolver(
        dim=dim,
        order=order,
        n_vars=4,
        grid_shape=(cells, cells),
        flux_fn=flux,
        max_eigenvalue_fn=eig,
        dx=1.0 / cells,
    )


def euler_density_wave_state(solver, t=0.0, vel=(1.0, 0.5), p=2.0, gamma=1.4):
    """Exact smooth Euler solution: density advects with uniform velocity."""
    coords = solver.nodes_meshgrid()
    phase = sum(c - v * t for c, v in zip(coords, vel))
    rho = 1.0 + 0.2 * np.sin(2 * np.pi * phase)
    rho = np.broadcast_to(rho, solver.state_shape[:-1])
    u, v = vel
    E = p / (gamma - 1.0) + 0.5 * rho * (u * u + v * v)
    Q = np.stack([rho, rho * u, rho * v, E], axis=-1)
    return jnp.asarray(Q)


def test_euler_density_wave():
    solver = euler_density_wave_solver(cells=6, order=3)
    Q0 = euler_density_wave_state(solver)
    t_end = 0.05
    n_steps = 50
    Q = solver.run(Q0, n_steps, dt=t_end / n_steps)
    exact = euler_density_wave_state(solver, t=t_end)
    err = l2_error(solver, Q[..., 0:1], exact[..., 0:1])
    # 6 cells of a full sine wave at order 3: O((1/6)^4) regime.
    assert err < 1e-4, f"density-wave L2 error {err}"
    # Conservation of all four variables.
    np.testing.assert_allclose(
        np.asarray(solver.total_mass(Q)),
        np.asarray(solver.total_mass(Q0)),
        rtol=0,
        atol=1e-10,
    )


def test_cfl_dt_positive():
    solver = euler_density_wave_solver()
    Q0 = euler_density_wave_state(solver)
    dt = solver.cfl_dt(Q0)
    assert 0 < float(dt) < 1.0


def test_aderdg_3d_runs():
    dim = 3
    flux = lambda Q, axis: euler.flux_v(Q, axis, dim=dim, n_real=5)
    eig = lambda Q, axis: euler.max_eigenvalue_v(Q, axis, dim=dim)
    solver = ADERDGSolver(
        dim=3,
        order=3,
        n_vars=5,
        grid_shape=(4, 4, 4),
        flux_fn=flux,
        max_eigenvalue_fn=eig,
        dx=0.25,
    )
    coords = solver.nodes_meshgrid()
    phase = coords[0] + coords[1] + coords[2]
    rho = 1.0 + 0.2 * np.sin(2 * np.pi * np.broadcast_to(phase, solver.state_shape[:-1]))
    Q = np.zeros(solver.state_shape)
    Q[..., 0] = rho
    Q[..., 1] = rho * 1.0
    Q[..., 2] = rho * 0.5
    Q[..., 3] = rho * 0.25
    Q[..., 4] = 2.0 / 0.4 + 0.5 * rho * (1.0 + 0.25 + 0.0625)
    out = solver.run(jnp.asarray(Q), 5, dt=1e-3)
    assert np.isfinite(np.asarray(out)).all()
