"""High-order ADER-DG: order-5 Euler with the STREAMED fused predictor.

Demonstrates the round-3 high-order kernel modes of
``models/aderdg_pallas.py``:

- ``picard_loop`` (auto-on for n_nodes >= 5): Picard iterations run as a
  real ``lax.fori_loop`` so Mosaic's register pressure is bounded by one
  iteration's body — the fully-unrolled p5 predictor spills >100 MB of
  vector registers and cannot compile at all;
- ``slice_loop`` (auto-on for n_nodes >= 7): the per-iteration work also
  streams over time slices by static rotate-and-append.

On CPU the kernel runs in interpret mode on a tiny grid and checks
(order+1)-order accuracy against the exact advected density wave; on the
chip it uses a lane-tiled grid and reports throughput (measured: p5
fused 44.9 ms/step = 0.099 GDOF/s — 2.0x the pure-XLA path; see
docs/PERFORMANCE.md).

Reference parity: the reference family exists to run high-order ADER-DG
(SURVEY.md §0); its xDSL prototype stops at kernel specs, this runs the
scheme end to end at p5.

Run: python examples/high_order_p5.py [--cpu]
"""

import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from exahype_tpu.models.aderdg import ADERDGSolver, euler_physics
from exahype_tpu.models.aderdg_pallas import PallasADERDG

on_cpu = jax.default_backend() == "cpu"
dim, order = 3, 5
grid_shape = (4, 4, 4) if on_cpu else (32, 4, 128)

flux, eig = euler_physics(dim=dim, n_real=5)
solver = ADERDGSolver(
    dim=dim, order=order, n_vars=5, grid_shape=grid_shape,
    flux_fn=flux, max_eigenvalue_fn=eig, dx=1.0 / grid_shape[0],
)
fused = PallasADERDG(
    solver, tile0=1, interpret=on_cpu,
    dtype=np.float64 if on_cpu else np.float32,
)
assert fused.picard_loop is None  # auto mode resolves inside build()

# Exact smooth solution: density wave advecting at constant velocity.
vel = (1.0, 0.5, 0.25)
gamma, p0 = 1.4, 2.0


def wave_state(t):
    coords = solver.nodes_meshgrid()
    phase = sum(c - v * t for c, v in zip(coords, vel))
    no_var = (
        solver.state_shape[: solver.var_axis]
        + solver.state_shape[solver.var_axis + 1 :]
    )
    rho = np.broadcast_to(
        np.squeeze(1.0 + 0.2 * np.sin(2 * np.pi * phase), solver.var_axis),
        no_var,
    )
    E = p0 / (gamma - 1.0) + 0.5 * rho * sum(v * v for v in vel)
    comps = [rho] + [rho * v for v in vel] + [E]
    return jnp.asarray(np.stack(comps, axis=solver.var_axis))


dt = 2e-3 if on_cpu else 2e-5
n_steps = 10
Q0 = wave_state(0.0)

t0 = time.perf_counter()
Q = Q0
step = jax.jit(lambda q: fused.step(q, dt))
for _ in range(n_steps):
    Q = step(Q)
err = np.asarray(
    jnp.abs(Q - wave_state(n_steps * dt)).max()
)  # host fetch = hard sync
elapsed = time.perf_counter() - t0

mass0 = float(np.asarray(solver.total_mass(Q0))[0])
mass1 = float(np.asarray(solver.total_mass(Q))[0])
print(f"p5 streamed predictor: max error vs exact wave {err:.3e}")
print(f"mass drift {abs(mass1 - mass0):.3e}")
print(f"{n_steps} steps in {elapsed:.2f}s "
      f"({solver.dofs() * n_steps / elapsed / 1e9:.3f} GDOF/s incl. compile)")
tol = 2e-5 if on_cpu else 5e-3
assert err < tol, err
assert abs(mass1 - mass0) < (1e-12 if on_cpu else 1e-5)
print("high-order p5: accurate + conservative")
