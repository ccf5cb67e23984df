"""Model-family tests: each hyperbolic system runs through both the FV
Rusanov spec pipeline (JAX backend vs NumPy oracle is covered elsewhere;
here JAX vs Pallas-interpret) and the ADER-DG solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from exahype_tpu.backends.jax_backend import JAXPrinter
from exahype_tpu.backends.pallas_backend import PallasPrinter
from exahype_tpu.models import hyperbolic
from exahype_tpu.models.aderdg import ADERDGSolver, wrap_var_last
from exahype_tpu.models.rusanov import build_rusanov_kernel


def state_for(name, shape, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.uniform(0.5, 1.0, size=shape)
    if name == "shallow_water":
        Q[..., 0] += 1.0  # positive water height
    return Q


CASES = [
    ("advection", dict(velocity=(1.0, 0.5)), 3),
    ("burgers", dict(), 2),
    ("shallow_water", dict(dim=2), 3),
    ("acoustic", dict(dim=2), 3),
]


@pytest.mark.parametrize("name,kwargs,n_vars", CASES)
def test_fv_rusanov_model_family(name, kwargs, n_vars):
    flux, eig = hyperbolic.REGISTRY[name](**kwargs)
    kb = build_rusanov_kernel(
        dim=2,
        patch_size=4,
        halo_size=1,
        n_real=n_vars,
        n_aux=0,
        n_patches=2,
        flux_impl=flux,
        eigenvalue_impl=eig,
    )
    Q0 = state_for(name, kb.item_shape("Q"))
    out_jax = np.asarray(JAXPrinter(kb).build()(Q0, 0.005))
    assert np.isfinite(out_jax).all()
    assert not np.array_equal(out_jax, Q0)
    # Pallas path (interpret) agrees via the auto-derived SoA-P adapter.
    fused = PallasPrinter(kb, interpret=True, tile_patches=1).build_aos()
    out_pallas = np.asarray(fused(Q0, 0.005))
    np.testing.assert_allclose(out_pallas, out_jax, rtol=0, atol=1e-13)


@pytest.mark.parametrize("name,kwargs,n_vars", CASES)
def test_aderdg_model_family(name, kwargs, n_vars):
    flux, eig = hyperbolic.REGISTRY[name](**kwargs)
    solver = ADERDGSolver(
        dim=2,
        order=2,
        n_vars=n_vars,
        grid_shape=(4, 4),
        flux_fn=wrap_var_last(flux),
        max_eigenvalue_fn=wrap_var_last(eig),
        dx=0.25,
    )
    Q0 = np.asarray(state_for(name, solver.state_shape, seed=1))
    if name == "shallow_water":
        sel = (slice(None),) * solver.var_axis + (0,)
        Q0[sel] += 1.0
    Q0 = jnp.asarray(Q0)
    out = solver.run(Q0, 3, dt=1e-3)
    assert np.isfinite(np.asarray(out)).all()
    # Conservation holds for every model on the periodic domain.
    np.testing.assert_allclose(
        np.asarray(solver.total_mass(out)),
        np.asarray(solver.total_mass(Q0)),
        rtol=0,
        atol=1e-11,
    )


def test_shallow_water_lake_at_rest():
    """Still water (h const, zero momentum) must stay exactly still."""
    flux, eig = hyperbolic.shallow_water(dim=2)
    kb = build_rusanov_kernel(
        dim=2, patch_size=4, halo_size=1, n_real=3, n_aux=0, n_patches=1,
        flux_impl=flux, eigenvalue_impl=eig,
    )
    Q0 = np.zeros(kb.item_shape("Q"))
    Q0[..., 0] = 2.0
    out = np.asarray(JAXPrinter(kb).build()(Q0, 0.01))
    np.testing.assert_allclose(out, Q0, rtol=0, atol=1e-13)
