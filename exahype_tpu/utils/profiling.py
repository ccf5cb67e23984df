"""Profiling and performance-analysis utilities.

The reference only *hooks into* external timing infrastructure (Peano's
``tarch/timing/{Measurement,Watch}.h`` includes and a ``Measurement&`` kernel
parameter, ``CPPPrinter.py:344-345``, ``examples/kernel-generator.py:9``).
Here the equivalents are first-class:

- :func:`time_fn` — wall-clock a jitted kernel with warmup + block_until_ready;
- :func:`trace` — context manager around ``jax.profiler`` for TensorBoard
  traces of the compiled kernel;
- :class:`KernelCost` / :func:`estimate_cost` — an analytical roofline model
  computed from the kernel spec itself (bytes moved and flops per statement,
  using the same bounds module the backends compile), so specs can be
  perf-triaged before ever running.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import sympy
from sympy.core.function import AppliedUndef

from exahype_tpu.frontend.bounds import DEFAULT_POLICY, Policy, statement_ranges
from exahype_tpu.frontend.kernel_builder import KernelBuilder
from exahype_tpu.frontend.statements import StatementKind


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free simple timing: seconds per call after warmup."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class KernelCost:
    """Analytical per-time-step cost of a kernel spec."""

    flops: int
    bytes_read: int
    bytes_written: int
    dof_updates: int

    @property
    def bytes_total(self) -> int:
        return self.bytes_read + self.bytes_written

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / max(self.bytes_total, 1)

    def roofline_seconds(
        self, peak_flops: float = 197e12, hbm_bw: float = 819e9
    ) -> float:
        """Lower-bound step time on a chip (defaults: TPU v5e bf16 peak,
        HBM bandwidth)."""
        return max(self.flops / peak_flops, self.bytes_total / hbm_bw)


def _expr_flops(expr, fn_flops: dict[str, int]) -> int:
    """Count scalar flops in an expression tree (calls via ``fn_flops``)."""
    if expr is None or expr.is_Number or isinstance(expr, (sympy.Symbol, sympy.Idx)):
        return 0
    if isinstance(expr, sympy.Indexed):
        return 0
    if isinstance(expr, AppliedUndef):
        inner = sum(_expr_flops(a, fn_flops) for a in expr.args)
        return inner + fn_flops.get(type(expr).__name__, 10)
    if isinstance(expr, (sympy.Add, sympy.Mul)):
        return (len(expr.args) - 1) + sum(_expr_flops(a, fn_flops) for a in expr.args)
    if isinstance(expr, sympy.Pow):
        return 1 + _expr_flops(expr.base, fn_flops)
    return 1 + sum(_expr_flops(a, fn_flops) for a in expr.args)


def _expr_reads(expr, itemsize: int, vb: int, kernel: KernelBuilder) -> int:
    """Bytes read per loop point by the expression's array accesses."""
    reads = 0
    if expr is None:
        return 0
    for access in expr.atoms(sympy.Indexed):
        name = str(access.base.label)
        struct = kernel.item_struct.get(name, 0)
        # Pointer args inside calls read the full struct slice; elementwise
        # reads touch one element per var iteration (approximated as 1).
        reads += itemsize
        del struct
    return reads


#: TPU v5e peaks for roofline fractions.  The ADER-DG kernels are
#: elementwise/unrolled (no matmuls), so the relevant compute ceiling is the
#: VPU, not the MXU: ~1.5 GHz × 8×128 lanes × 4 ALUs × 2 (FMA) ≈ 12.3e12
#: f32 FLOP/s.  MXU bf16 peak (197e12) and HBM bandwidth are the published
#: chip numbers.
V5E_PEAKS = {
    "mxu_bf16_flops": 197e12,
    "vpu_f32_fma_flops": 12.3e12,
    "hbm_bytes_per_s": 819e9,
}


def aderdg_step_cost(
    solver,
    flux_flops: int = 22,
    eig_flops: int = 12,
    itemsize: int = 4,
    fused: bool = True,
) -> KernelCost:
    """Analytical per-step cost of an ADER-DG solver (base or fused-Pallas).

    Counts the dominant terms of the fused step (1 mult + 1 add = 2 flops;
    the hardware fuses them, hence compare against the FMA peak):

    - Picard predictor, ``K`` iterations: per direction, flux evaluation
      over all ``S = n^(d+1)`` space-time points plus the ``D`` contraction
      (``2n`` flops per point-var) plus rhs accumulation; the ``K1inv``
      solve per iteration.  The iteration-0 dedup (all time slices equal)
      is credited.
    - Time averages, volume integral, face extrapolations, Rusanov solves.

    HBM bytes: the fused kernel streams ``u`` in and ``new`` out once plus
    4 face arrays per epilogue axis; the XLA epilogue re-reads/writes
    ``new`` and the faces.  (XLA's own ``cost_analysis()`` cannot see
    inside a ``pallas_call`` — its flops for the fused step are ~300×
    under-counted — so this model is the flop source for the roofline;
    prefer XLA's byte count when available, it reflects actual fusion.)
    """
    import math as _math

    n = solver.n_nodes
    V = solver.n_vars
    d = solver.dim
    K = solver.picard_iters
    cells = int(_math.prod(solver.grid_shape))
    S = n ** (d + 1)
    C = n**d
    F = n ** (d - 1)

    per_iter = d * (S * flux_flops + S * V * 2 * n + 2 * S * V) + S * V * (
        2 * n + 1
    )
    # Iteration 0 evaluates one time slice per direction (dedup).
    iter0_saving = d * ((S - S // n) * flux_flops + (S - S // n) * V * 2 * n)
    predictor = K * per_iter - iter0_saving
    averages = S * V * 2 + d * (S * flux_flops + S * V * 2)
    volume = d * C * V * 2 * n
    faces = d * (4 * F * V * 2 * n + 2 * F * eig_flops + F * V * 5 + 2 * C * V * 2)
    flops = cells * (predictor + averages + volume + faces)

    n_epi = 1 if fused else d
    kernel_bytes = C * V * 2 + n_epi * 4 * F * V
    epilogue_bytes = n_epi * (2 * C * V + 4 * F * V)
    bytes_total = cells * itemsize * (kernel_bytes + epilogue_bytes)
    return KernelCost(
        flops=int(flops),
        bytes_read=bytes_total // 2,
        bytes_written=bytes_total - bytes_total // 2,
        dof_updates=solver.dofs(),
    )


def estimate_cost(
    kernel: KernelBuilder,
    itemsize: int = 4,
    policy: Policy = DEFAULT_POLICY,
    fn_flops: Optional[dict[str, int]] = None,
) -> KernelCost:
    """Walk the statement list and sum loop-trip-count × per-point cost."""
    fn_flops = fn_flops or {}
    cfg = kernel.config
    flops = 0
    bytes_read = 0
    bytes_written = 0
    last_lhs = kernel.LHS[-1] if kernel.LHS else None
    for stmt in kernel.statements:
        if stmt.kind is StatementKind.CONST_ASSIGN:
            continue
        ranges = statement_ranges(
            cfg,
            stmt,
            kernel.item_struct,
            policy=policy,
            is_last_lhs=(last_lhs is not None and stmt.lhs == last_lhs),
        )
        trips = 1
        for lo, hi in ranges:
            trips *= hi - lo
        flops += trips * (
            _expr_flops(stmt.lhs, fn_flops) + _expr_flops(stmt.rhs, fn_flops)
        )
        bytes_read += trips * _expr_reads(stmt.rhs, itemsize, ranges[-1][1], kernel)
        bytes_written += trips * itemsize
    return KernelCost(
        flops=flops,
        bytes_read=bytes_read,
        bytes_written=bytes_written,
        dof_updates=cfg.dofs(),
    )
