"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
(mesh + ppermute halo exchange) are exercised without TPU hardware, per the
standard JAX host-platform emulation recipe.  f64 is enabled for 1e-12
differential parity against the NumPy oracle.

Something in the environment may import jax before this conftest (pytest
plugins auto-load), so we both set the env vars and force the jax config
directly; the XLA flag only matters as long as no backend has been
initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
