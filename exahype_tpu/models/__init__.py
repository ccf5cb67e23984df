from exahype_tpu.models import euler, hyperbolic
from exahype_tpu.models.fv import build_fv_rusanov_kernel
from exahype_tpu.models.muscl import build_muscl_kernel
from exahype_tpu.models.rusanov import build_rusanov_kernel

__all__ = [
    "euler",
    "hyperbolic",
    "build_rusanov_kernel",
    "build_fv_rusanov_kernel",
    "build_muscl_kernel",
]


def __getattr__(name):
    # Lazy heavy solver modules.
    if name in ("aderdg", "aderdg_pallas", "aderdg_amr", "aderdg_pool",
                "limiter", "dg", "riemann", "elastic", "mhd", "swe", "srhd",
                "muscl", "tracers", "point_source", "rmhd", "grhd", "grmhd",
                "grhd_cfc", "grmhd_cfc", "michel", "navier_stokes",
                "riemann_sr", "z4", "rhs_pallas"):
        import importlib

        return importlib.import_module(f"exahype_tpu.models.{name}")
    raise AttributeError(f"module 'exahype_tpu.models' has no attribute {name!r}")
