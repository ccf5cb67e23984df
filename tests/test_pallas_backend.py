"""Pallas backend tests (interpret mode on CPU).

The fused VMEM kernel must agree with the JAX backend — which in turn agrees
with the NumPy oracle and the native C++ — on the same statement semantics.
"""

import numpy as np
import pytest

from exahype_tpu.backends.jax_backend import JAXPrinter
from exahype_tpu.backends.pallas_backend import (
    PallasPrinter,
    from_tpu_layout,
    to_tpu_layout,
)
from exahype_tpu.models.rusanov import build_rusanov_kernel
from exahype_tpu.utils.errors import LoweringError


def positive_init(shape, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.uniform(0.1, 1.0, size=shape)
    Q[..., 0] += 1.0
    Q[..., 3] += 5.0
    if Q.shape[-1] > 4:
        Q[..., 4] += 5.0
    return Q


def test_layout_roundtrip():
    Q = np.arange(2 * 3 * 3 * 4).reshape(2, 3, 3, 4).astype(np.float64)
    import jax.numpy as jnp

    t = to_tpu_layout(jnp.asarray(Q))
    assert t.shape == (3, 3, 4, 2)
    np.testing.assert_array_equal(np.asarray(from_tpu_layout(t)), Q)


@pytest.mark.parametrize("dim,patch,n_aux,n_patches", [(2, 4, 5, 4), (3, 3, 0, 2)])
def test_pallas_matches_jax_backend(dim, patch, n_aux, n_patches):
    kb = build_rusanov_kernel(
        dim=dim, patch_size=patch, halo_size=1, n_real=5, n_aux=n_aux,
        n_patches=n_patches,
    )
    Q0 = positive_init(kb.item_shape("Q"), seed=dim)
    want = np.asarray(JAXPrinter(kb).build()(Q0, 0.01))
    fused = PallasPrinter(kb, interpret=True, tile_patches=n_patches // 2).build_aos()
    got = np.asarray(fused(Q0, 0.01))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_pallas_tiling_divisibility_checked():
    kb = build_rusanov_kernel(n_patches=6)
    with pytest.raises(LoweringError):
        PallasPrinter(kb, tile_patches=4)


def test_pallas_multiple_tiles_equal_single_tile():
    kb = build_rusanov_kernel(n_patches=8)
    Q0 = positive_init(kb.item_shape("Q"), seed=9)
    one = PallasPrinter(kb, interpret=True, tile_patches=8).build_aos()
    four = PallasPrinter(kb, interpret=True, tile_patches=2).build_aos()
    np.testing.assert_array_equal(
        np.asarray(one(Q0, 0.02)), np.asarray(four(Q0, 0.02))
    )
