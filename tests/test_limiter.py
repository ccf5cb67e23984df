"""A-posteriori FV limiter tests.

The limiter must (a) fire nowhere on smooth flow — the high-order candidate
passes through untouched, preserving accuracy — and (b) keep a shocked Euler
state physically admissible where the unlimited scheme produces negative
pressure / NaN within a few steps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics
from exahype_tpu.models.limiter import LimitedADERDG, euler_admissible
from tests.test_aderdg import euler_density_wave_solver, euler_density_wave_state


def make_limited(cells=12, order=3):
    solver = ADERDGSolver(
        dim=2,
        order=order,
        n_vars=4,
        grid_shape=(cells, cells),
        flux_fn=euler_physics(dim=2, n_real=4)[0],
        max_eigenvalue_fn=euler_physics(dim=2, n_real=4)[1],
        dx=1.0 / cells,
    )
    return solver, LimitedADERDG(solver, admissible=euler_admissible(dim=2))


def sod_like_state(solver):
    """A strong pressure/density jump across half the domain."""
    coords = solver.nodes_meshgrid()
    x = np.broadcast_to(
        np.squeeze(coords[0], axis=solver.var_axis),
        solver.state_shape[: solver.var_axis] + solver.state_shape[solver.var_axis + 1 :],
    )
    left = x < 0.5
    rho = np.where(left, 1.0, 0.125)
    p = np.where(left, 1.0, 0.1)
    E = p / 0.4
    Q = np.stack([rho, np.zeros_like(rho), np.zeros_like(rho), E], axis=solver.var_axis)
    return jnp.asarray(Q)


def admissible_everywhere(solver, Q):
    ok = euler_admissible(dim=2)(Q, solver.var_axis)
    return bool(np.asarray(ok).all())


def test_limiter_inactive_on_smooth_flow():
    solver = euler_density_wave_solver(cells=6, order=3)
    limited = LimitedADERDG(solver, admissible=euler_admissible(dim=2))
    Q0 = euler_density_wave_state(solver)
    dt = 1e-3
    candidate = solver.step(Q0, dt)
    mask = np.asarray(limited.troubled_mask(Q0, candidate))
    assert not mask.any(), f"{mask.sum()} cells flagged on smooth flow"
    np.testing.assert_array_equal(np.asarray(limited.step(Q0, dt)), np.asarray(candidate))


def test_limiter_keeps_shock_admissible():
    solver, limited = make_limited(cells=12, order=3)
    Q0 = sod_like_state(solver)
    dt = 4e-3  # aggressive for the unlimited scheme at this jump

    unlimited = np.asarray(solver.run(Q0, 20, dt))
    lim = limited.run(Q0, 20, dt)
    assert admissible_everywhere(solver, lim), "limited run left admissible set"
    # The unlimited high-order scheme misbehaves on this setup (NaN or
    # inadmissible states); if it ever stops misbehaving, tighten the setup.
    assert (not np.isfinite(unlimited).all()) or (
        not admissible_everywhere(solver, jnp.asarray(unlimited))
    ), "unlimited scheme unexpectedly robust; strengthen the test shock"


def test_fallback_preserves_cell_means():
    """The nodal-broadcast FV fallback conserves the global integral."""
    solver, limited = make_limited(cells=8, order=2)
    Q0 = sod_like_state(solver)
    fb = limited.fv_fallback(Q0, 1e-3)
    np.testing.assert_allclose(
        np.asarray(solver.total_mass(fb)),
        np.asarray(solver.total_mass(Q0)),
        rtol=0,
        atol=1e-12,
    )


def test_subcell_projection_roundtrip_exact_on_polynomials():
    """reconstruct(project(u)) == u for nodal data (degree-N polynomials)."""
    solver, limited = make_limited(cells=4, order=3)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=solver.state_shape))
    rt = limited.reconstruct_subcells(limited.project_subcells(u))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(u), rtol=0, atol=1e-12)


def test_subcell_fallback_conserves_and_resolves():
    """The subcell FV fallback conserves the integral and is subcell-resolved
    (not constant per cell like the means fallback)."""
    solver, limited = make_limited(cells=8, order=3)
    Q0 = sod_like_state(solver)
    dt = 2e-3
    fb = limited.subcell_fv_step(Q0, dt)
    np.testing.assert_allclose(
        np.asarray(solver.total_mass(fb)),
        np.asarray(solver.total_mass(Q0)),
        rtol=0,
        atol=1e-12,
    )
    # Subcell structure survives: nodal values within shock-adjacent cells
    # are NOT constant (the means fallback would make them so).
    var = np.asarray(fb).std(axis=(0, 1))  # std over node axes, per [V, grid]
    assert var.max() > 1e-6


def test_subcell_vs_means_fallback_accuracy():
    """On a smooth-but-flagged state the subcell fallback must be closer to
    the true solution than the cell-mean fallback."""
    from exahype_tpu.models.aderdg import euler_physics

    solver, _ = make_limited(cells=8, order=3)
    lim_sub = LimitedADERDG(
        solver, admissible=euler_admissible(dim=2), fallback="subcell"
    )
    lim_mean = LimitedADERDG(
        solver, admissible=euler_admissible(dim=2), fallback="means"
    )
    Q0 = sod_like_state(solver)
    dt = 4e-3
    a = lim_sub.run(Q0, 20, dt)
    b = lim_mean.run(Q0, 20, dt)
    assert admissible_everywhere(solver, a)
    assert admissible_everywhere(solver, b)
    # Both robust; the subcell solution retains more structure (higher
    # total variation of density along x).
    rho_a = np.asarray(a)[..., 0, :, :].mean(axis=(0, 1))
    rho_b = np.asarray(b)[..., 0, :, :].mean(axis=(0, 1))
    tv = lambda g: np.abs(np.diff(g, axis=0)).sum()
    assert tv(rho_a) >= 0.8 * tv(rho_b)


def test_limiter_3d_smoke():
    from exahype_tpu.models.aderdg import euler_physics

    flux, eig = euler_physics(dim=3, n_real=5)
    solver = ADERDGSolver(
        dim=3, order=2, n_vars=5, grid_shape=(4, 4, 4),
        flux_fn=flux, max_eigenvalue_fn=eig, dx=0.25,
    )
    limited = LimitedADERDG(solver, admissible=euler_admissible(dim=3))
    coords = solver.nodes_meshgrid()
    no_var = solver.state_shape[:3] + solver.state_shape[4:]
    X = np.broadcast_to(np.squeeze(coords[0], axis=solver.var_axis), no_var)
    left = X < 0.5
    rho = np.where(left, 1.0, 0.125)
    p = np.where(left, 1.0, 0.1)
    z = np.zeros_like(rho)
    Q0 = jnp.asarray(np.stack([rho, z, z, z, p / 0.4], axis=solver.var_axis))
    Q = limited.run(Q0, 5, dt=2e-3)
    ok = euler_admissible(dim=3)(Q, solver.var_axis)
    assert bool(np.asarray(ok).all())


def test_limited_step_sharded_matches_single_device():
    """The full limited step (DG + detection + subcell fallback) under a
    sharded cell grid matches the unsharded run to 1 ulp."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from exahype_tpu.parallel import make_mesh

    solver, limited = make_limited(cells=8, order=2)
    Q0 = sod_like_state(solver)
    ref = np.asarray(jax.jit(limited.step)(Q0, 1e-3))

    mesh = make_mesh(8)
    ndim = len(solver.state_shape)
    spec_list = [None] * ndim
    spec_list[solver.grid_axis(0)] = "patches"
    sharding = NamedSharding(mesh, PartitionSpec(*spec_list))
    Qs = jax.device_put(Q0, sharding)
    stepped = jax.jit(limited.step, in_shardings=(sharding, None), out_shardings=sharding)
    np.testing.assert_allclose(
        np.asarray(stepped(Qs, 1e-3)), ref, rtol=1e-13, atol=1e-13
    )


def test_limited_step_exactly_conservative():
    """With DG/FV interface flux matching, the FULL limited step conserves
    mass and energy to machine precision on a strong shock (was ~0.4%
    drift over 20 steps without matching)."""
    solver, limited = make_limited(cells=12, order=3)
    Q0 = sod_like_state(solver)
    m0 = np.asarray(solver.total_mass(Q0))
    Q = limited.run(Q0, 20, 4e-3)
    m1 = np.asarray(solver.total_mass(Q))
    np.testing.assert_allclose(m1, m0, rtol=0, atol=1e-12)
    assert admissible_everywhere(solver, Q)


def test_limiter_accepts_source_ncp_anisotropic():
    """Sourced, NCP, and anisotropic-dx solvers are all accepted by the
    limiter; the scalar-dx path is bitwise preserved."""
    import jax.numpy as jnp

    from exahype_tpu.models.aderdg import ADERDGSolver
    from exahype_tpu.models.limiter import LimitedADERDG

    def flux(Q, axis, va):
        return Q

    def eig(Q, axis, va):
        shape = Q.shape[:va] + Q.shape[va + 1 :]
        return jnp.full(shape, 1.0, Q.dtype)

    base = dict(dim=2, order=2, n_vars=1, grid_shape=(4, 4), flux_fn=flux,
                max_eigenvalue_fn=eig, dx=0.25)
    LimitedADERDG(solver=ADERDGSolver(**base, source_fn=lambda Q, va: -Q))
    LimitedADERDG(solver=ADERDGSolver(
        **base, ncp_fn=lambda Q, dQ, axis, va: dQ))
    # anisotropic dx: a scalar-equal tuple is bitwise-identical to scalar
    import jax

    lim_t = LimitedADERDG(solver=ADERDGSolver(**{**base, "dx": (0.25, 0.25)}))
    lim_s = LimitedADERDG(solver=ADERDGSolver(**base))
    rng = np.random.default_rng(2)
    u0 = jnp.asarray(rng.random(lim_s.solver.state_shape))
    np.testing.assert_array_equal(
        np.asarray(lim_t.step(u0, 1e-3)), np.asarray(lim_s.step(u0, 1e-3))
    )


def test_limited_solver_with_source_decays():
    """The limited step applies the source in BOTH branches: a stiff-ish
    decay source shrinks the state even where cells are troubled."""
    from exahype_tpu.models.aderdg import ADERDGSolver
    from exahype_tpu.models.limiter import LimitedADERDG

    def flux(Q, axis, va):
        return (1.0 if axis == 0 else 0.5) * Q

    def eig(Q, axis, va):
        shape = Q.shape[:va] + Q.shape[va + 1 :]
        return jnp.full(shape, 1.0, Q.dtype)

    k = 3.0
    solver = ADERDGSolver(
        dim=2, order=2, n_vars=1, grid_shape=(8, 8), flux_fn=flux,
        max_eigenvalue_fn=eig, dx=1.0 / 8,
        source_fn=lambda Q, va: -k * Q,
    )
    limited = LimitedADERDG(solver=solver)
    # A square pulse: discontinuous, so cells WILL be flagged troubled.
    coords = solver.nodes_meshgrid()
    u0 = jnp.asarray(np.broadcast_to(
        np.where((np.asarray(coords[0]) > 0.3) & (np.asarray(coords[0]) < 0.6), 1.0, 0.1),
        solver.state_shape))
    n, dt = 40, 2e-3
    # the square pulse must actually trip the detector
    cand = solver.step(u0, dt)
    assert bool(np.asarray(limited.troubled_mask(u0, cand)).any())
    out = np.asarray(limited.run(u0, n, dt))
    assert np.isfinite(out).all()
    # amplitude decayed roughly like exp(-k t): max from 1.0 to ~e^{-0.24}
    expected = np.exp(-k * n * dt)
    assert np.max(out) < 1.5 * expected + 0.05
    assert np.max(out) > 0.2 * expected


def test_limited_swe_dam_break_conserves_water():
    """SWE dam break over bathymetry through the limiter: the FV fallback's
    path-conservative fluctuations keep the run finite, the bathymetry
    frozen, and the (conservative) water column exactly conserved."""
    from exahype_tpu.models.limiter import LimitedADERDG
    from exahype_tpu.models.swe import lake_at_rest, make_swe_solver

    solver = make_swe_solver(dim=2, order=2, grid_shape=(16, 4), dx=1.0 / 16)
    limited = LimitedADERDG(solver=solver)

    Q0 = lake_at_rest(solver, surface=1.0, amp=0.05)
    # dam break: +40% water depth on the left half
    coords = solver.nodes_meshgrid()
    step_up = jnp.where(jnp.asarray(coords[0]) < 0.5, 0.4, 0.0)
    sel = (slice(None),) * solver.var_axis + (slice(0, 1),)
    Q0 = Q0.at[sel].add(jnp.asarray(step_up, Q0.dtype))

    cand = solver.step(Q0, 2e-4)
    assert bool(np.asarray(limited.troubled_mask(Q0, cand)).any())

    m0 = np.asarray(solver.total_mass(Q0))
    Q = limited.run(Q0, 50, 2e-4)
    assert np.isfinite(np.asarray(Q)).all()
    m1 = np.asarray(solver.total_mass(Q))
    np.testing.assert_allclose(m1[0], m0[0], rtol=0, atol=1e-12)
    # the subcell project/reconstruct round-trip perturbs b only at
    # floating-point level (exact in exact arithmetic)
    bsel = (slice(None),) * solver.var_axis + (solver.dim + 1,)
    np.testing.assert_allclose(
        np.asarray(Q[bsel]), np.asarray(Q0[bsel]), rtol=0, atol=1e-13
    )


def make_limited_reflective(cells=8, order=2, **kw):
    from exahype_tpu.models.aderdg import euler_reflect, euler_reflect_flux

    flux, eig = euler_physics(dim=2, n_real=4)
    solver = ADERDGSolver(
        dim=2,
        order=order,
        n_vars=4,
        grid_shape=(cells, cells),
        flux_fn=flux,
        max_eigenvalue_fn=eig,
        dx=1.0 / cells,
        boundary="reflective",
        reflect_fn=euler_reflect(2),
        reflect_flux_fn=euler_reflect_flux(2),
    )
    return solver, LimitedADERDG(solver, admissible=euler_admissible(dim=2), **kw)


def wall_state(solver, seed=3):
    """Smooth positive state with directed velocity toward the x walls."""
    rng = np.random.default_rng(seed)
    no_var = (
        solver.state_shape[: solver.var_axis]
        + solver.state_shape[solver.var_axis + 1 :]
    )
    rho = 1.0 + 0.1 * rng.random(no_var)
    Q = np.stack(
        [rho, 0.3 * rho, 0.1 * rho, 5.0 + 0.5 * rho], axis=solver.var_axis
    )
    return jnp.asarray(Q)


def smooth_wall_state(solver):
    """Genuinely smooth wall-compatible flow (velocity zero at the walls)."""
    x, y = solver.nodes_meshgrid()
    x = np.asarray(x)
    y = np.asarray(y)
    rho = 1.0 + 0.05 * np.cos(np.pi * x) * np.cos(np.pi * y)
    u = 0.02 * np.sin(np.pi * x) * np.ones_like(y)
    v = 0.02 * np.sin(np.pi * y) * np.ones_like(x)
    p = np.ones_like(rho)
    E = p / 0.4 + 0.5 * rho * (u * u + v * v)
    return jnp.asarray(
        np.concatenate([rho, rho * u, rho * v, E], axis=solver.var_axis)
    )


def test_limiter_reflective_smooth_matches_base():
    """With no troubled cells the limited reflective step IS the base step
    (detection must not wrap the DMP neighbourhood around the walls)."""
    solver, limited = make_limited_reflective(cells=8, order=2)
    Q0 = smooth_wall_state(solver)
    dt = 2e-4
    candidate = solver.step(Q0, dt)
    mask = np.asarray(limited.troubled_mask(Q0, candidate))
    assert not mask.any(), f"{mask.sum()} cells flagged on smooth wall flow"
    np.testing.assert_array_equal(
        np.asarray(limited.step(Q0, dt)), np.asarray(candidate)
    )


@pytest.mark.parametrize(
    "fallback,fb_order",
    [("subcell", 1), ("subcell", 2), ("means", 1)],
)
def test_limiter_reflective_forced_fallback_conserves(fallback, fb_order):
    """Force EVERY cell through the FV fallback in a walled domain: the
    fallback must use wall ghosts (mirror + negated normal momentum), so
    mass and energy are conserved to rounding (round-1 advisory: periodic
    wraps silently leaked conserved quantities at the walls)."""
    solver, limited = make_limited_reflective(
        cells=8, order=2, fallback=fallback, fallback_order=fb_order
    )
    limited.admissible = lambda Q, va: jnp.zeros(
        Q.shape[:va] + Q.shape[va + 1 :], bool
    )  # nothing admissible -> all troubled
    Q0 = wall_state(solver)
    dt = 5e-4
    mass0 = np.asarray(solver.total_mass(Q0))
    Q = Q0
    for _ in range(3):
        Q = limited.step(Q, dt)
        assert np.asarray(
            limited.troubled_mask(Q0, solver.step(Q0, dt))
        ).all()  # the forcing really fires everywhere
    mass = np.asarray(solver.total_mass(Q))
    np.testing.assert_allclose(mass[0], mass0[0], rtol=1e-12)  # mass
    np.testing.assert_allclose(mass[3], mass0[3], rtol=1e-12)  # energy
    assert abs(mass[1] - mass0[1]) > 1e-8  # walls exert pressure


def test_limiter_reflective_mixed_interface_conserves():
    """Troubled region NOT touching the walls: mixed DG/FV interface
    matching plus wall faces together still conserve mass and energy."""
    solver, limited = make_limited_reflective(cells=8, order=2)

    def middle_troubled(Q, va):
        shape = Q.shape[:va] + Q.shape[va + 1 :]
        ok = np.ones(shape, bool)
        # node axes first, then grid: mark grid cells 3..4 x 3..4 inadmissible
        ok[..., 3:5, 3:5] = False
        return jnp.asarray(ok)

    limited.admissible = middle_troubled
    Q0 = wall_state(solver, seed=5)
    dt = 5e-4
    mass0 = np.asarray(solver.total_mass(Q0))
    candidate = solver.step(Q0, dt)
    mask = np.asarray(limited.troubled_mask(Q0, candidate))
    assert mask.any() and not mask.all()
    Q = limited.step(Q0, dt)
    mass = np.asarray(solver.total_mass(Q))
    np.testing.assert_allclose(mass[0], mass0[0], rtol=1e-12)
    np.testing.assert_allclose(mass[3], mass0[3], rtol=1e-12)


def test_limited_step_with_pallas_accelerator_matches():
    """The production config — limited ADER-DG with the fused Pallas
    predictor supplying candidate + face fluxes — must reproduce the plain
    limited step (same troubled cells, same fallback, same matching)."""
    from exahype_tpu.models.aderdg_pallas import PallasADERDG

    solver, limited = make_limited(cells=8, order=2)
    accel = PallasADERDG(solver, interpret=True, tile0=2)
    fast = LimitedADERDG(
        solver, admissible=euler_admissible(dim=2), accelerator=accel
    )
    Q0 = sod_like_state(solver)
    dt = 2e-3
    ref = np.asarray(limited.step(Q0, dt))
    got = np.asarray(fast.step(Q0, dt))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)

    # Multi-step (through lax.scan) as well.
    np.testing.assert_allclose(
        np.asarray(fast.run(Q0, 3, dt)),
        np.asarray(limited.run(Q0, 3, dt)),
        rtol=0,
        atol=1e-11,
    )


def test_limiter_accelerator_solver_mismatch_rejected():
    from exahype_tpu.models.aderdg_pallas import PallasADERDG

    solver, _ = make_limited(cells=8, order=2)
    other, _ = make_limited(cells=8, order=2)
    accel = PallasADERDG(other, interpret=True, tile0=2)
    with pytest.raises(ValueError):
        LimitedADERDG(solver, accelerator=accel)


def test_subcell_fallback_second_order_ncp_convergence():
    """VERDICT r1 item 6: a smooth pure-NCP problem (linear advection written
    as B·grad) under FORCED limiting must converge at >=2nd order with
    fallback_order=2 (MUSCL subcell reconstruction term + Heun), versus ~1st
    order for the piecewise-constant fallback."""
    a = 1.0

    def flux(Q, axis, va):
        return jnp.zeros_like(Q)

    def eig(Q, axis, va):
        shape = Q.shape[:va] + Q.shape[va + 1 :]
        return jnp.full(shape, a, Q.dtype)

    def ncp(Q, grad, axis, va):
        return a * grad if axis == 0 else jnp.zeros_like(grad)

    never = lambda Q, va: jnp.zeros(Q.shape[:va] + Q.shape[va + 1 :], bool)

    def run(cells, order_fb, slope):
        solver = ADERDGSolver(
            dim=2, order=2, n_vars=2, grid_shape=(cells, 2),
            flux_fn=flux, max_eigenvalue_fn=eig, dx=(1.0 / cells, 0.5),
            ncp_fn=ncp,
        )
        limited = LimitedADERDG(
            solver, admissible=never, fallback="subcell",
            fallback_order=order_fb, fallback_slope=slope,
        )
        x = np.asarray(solver.nodes_meshgrid()[0])
        q0 = 2.0 + np.sin(2 * np.pi * x)
        Q0 = jnp.asarray(
            np.broadcast_to(q0, solver.state_shape[:2] + (1,) + solver.state_shape[3:])
            * np.ones((1, 1, 2, 1, 1))
        )
        n_sub = limited.n_sub
        steps = cells
        dt = 0.3 / (cells * n_sub)
        Q = Q0
        for _ in range(steps):
            cand = solver.step(Q, dt)
            assert np.asarray(limited.troubled_mask(Q, cand)).all()
            Q = limited.step(Q, dt)
        t = steps * dt
        exact = 2.0 + np.sin(2 * np.pi * (x - a * t))
        err = np.asarray(Q)[:, :, 0] - np.broadcast_to(
            np.squeeze(exact, axis=2), np.asarray(Q)[:, :, 0].shape
        )
        w = np.asarray(solver.ops.weights)
        return float(np.sqrt(np.mean(err**2)))

    e2_c = run(8, 2, "central")
    e2_f = run(16, 2, "central")
    rate2 = np.log2(e2_c / e2_f)
    assert rate2 > 1.9, f"order-2 fallback rate {rate2:.2f} ({e2_c}, {e2_f})"

    e1_f = run(16, 1, "minmod")
    assert e2_f < 0.5 * e1_f, (e2_f, e1_f)

    # The TVD default is also clearly better than first order.
    e2m_c = run(8, 2, "minmod")
    e2m_f = run(16, 2, "minmod")
    rate_m = np.log2(e2m_c / e2m_f)
    assert rate_m > 1.4, f"minmod rate {rate_m:.2f}"


def test_limited_step_sharded_accelerator_matches():
    """The PRODUCTION multichip config: limited ADER-DG with the fused
    predictor under shard_map (ShardedPallasADERDG accelerator) while
    detection/fallback/matching GSPMD-partition around it — matches the
    single-device accelerated limited step to 1e-12."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from exahype_tpu.models.aderdg_pallas import PallasADERDG
    from exahype_tpu.parallel import make_mesh
    from exahype_tpu.parallel.shard import ShardedPallasADERDG

    solver, _ = make_limited(cells=8, order=2)
    ref_lim = LimitedADERDG(
        solver, admissible=euler_admissible(dim=2),
        accelerator=PallasADERDG(solver, interpret=True, tile0=2),
    )
    Q0 = sod_like_state(solver)
    dt = 2e-3
    ref = np.asarray(jax.jit(ref_lim.step)(Q0, dt))

    mesh = make_mesh(8)
    accel = ShardedPallasADERDG(solver, mesh, interpret=True, tile0=1)
    lim = LimitedADERDG(
        solver, admissible=euler_admissible(dim=2), accelerator=accel
    )
    ndim = len(solver.state_shape)
    spec = [None] * ndim
    spec[solver.grid_axis(0)] = "patches"
    sharding = NamedSharding(mesh, PartitionSpec(*spec))
    Qs = jax.device_put(Q0, sharding)
    stepped = jax.jit(lim.step, in_shardings=(sharding, None), out_shardings=sharding)
    got = np.asarray(stepped(Qs, dt))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)

    hlo = stepped.lower(Qs, dt).compile().as_text()
    assert "collective-permute" in hlo


def test_limiter_high_order_p5():
    """The MOOD limiter is order-generic: at p5 (11^2-subcell fallback)
    a shock run stays admissible with exact conservation, and the
    row-gathered production path composes too."""
    from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics

    flux, eig = euler_physics(dim=2, n_real=4)
    solver = ADERDGSolver(
        dim=2, order=5, n_vars=4, grid_shape=(8, 8),
        flux_fn=flux, max_eigenvalue_fn=eig, dx=1.0 / 8,
    )
    lim = LimitedADERDG(solver, admissible=euler_admissible(dim=2))
    x = np.squeeze(
        np.asarray(solver.nodes_meshgrid()[0]), axis=solver.var_axis
    )
    no_var = (
        solver.state_shape[: solver.var_axis]
        + solver.state_shape[solver.var_axis + 1 :]
    )
    x = np.broadcast_to(x, no_var)
    left = x < 0.5
    Q0 = jnp.asarray(np.stack(
        [np.where(left, 1.0, 0.125), np.zeros_like(x),
         np.zeros_like(x), np.where(left, 1.0, 0.1) / 0.4],
        axis=solver.var_axis,
    ))
    m0 = np.asarray(solver.total_mass(Q0))[0]
    Q = lim.run(Q0, 10, 2e-3)
    m1 = np.asarray(solver.total_mass(Q))[0]
    assert bool(jnp.isfinite(Q).all())
    assert bool(np.asarray(euler_admissible(dim=2)(Q, solver.var_axis)).all())
    np.testing.assert_allclose(m1, m0, rtol=1e-13)
    gathered = LimitedADERDG(
        solver, admissible=euler_admissible(dim=2),
        troubled_capacity=3, troubled_granularity="row",
    )
    Qg = gathered.run(Q0, 6, 2e-3)
    assert bool(jnp.isfinite(Qg).all())
