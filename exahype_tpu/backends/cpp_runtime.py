"""Compile-and-load runtime for the C++ backend.

The native leg of the differential-test harness: where the reference compiles
its generated kernel with a SLURM batch script against a Peano checkout
(``Unit test/correctness_test.sbatch:20-24``), this module compiles the
generated source with the local toolchain into a shared object and loads
``time_step`` through ctypes, so native-vs-JAX parity runs inside pytest.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

from exahype_tpu.frontend.kernel_builder import KernelBuilder
from exahype_tpu.utils.errors import LoweringError

NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"


def _ctype_of(type_name: str):
    t = type_name.strip()
    if t.endswith("*"):
        base = _ctype_of(t[:-1])
        return ctypes.POINTER(base)
    if t == "double":
        return ctypes.c_double
    if t in ("int", "const int"):
        return ctypes.c_int
    raise LoweringError(f"unsupported C type {type_name!r}")


class NativeKernel:
    """A compiled, loadable generated kernel."""

    def __init__(self, kernel: KernelBuilder, lib_path: pathlib.Path, function_name: str):
        self._kernel = kernel
        self._lib = ctypes.CDLL(str(lib_path))
        self._fn = getattr(self._lib, function_name)
        self._fn.restype = None
        self._fn.argtypes = [_ctype_of(t) for t in kernel.input_types]

    def __call__(self, Q: np.ndarray, *scalars) -> np.ndarray:
        """Run the kernel; returns the updated copy of ``Q``."""
        out = np.array(Q, dtype=np.float64, copy=True, order="C")
        args = [out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))]
        for t, val in zip(self._kernel.input_types[1:], scalars):
            args.append(_ctype_of(t)(val))
        self._fn(*args)
        return out


def compile_kernel(
    kernel: KernelBuilder,
    code: str,
    function_name: str = "time_step",
    extra_sources: Sequence[pathlib.Path] = (),
    defines: Optional[dict] = None,
    workdir: Optional[pathlib.Path] = None,
) -> NativeKernel:
    """g++-compile generated code (+ physics sources) into a loadable kernel."""
    tmp = pathlib.Path(workdir) if workdir else pathlib.Path(tempfile.mkdtemp(prefix="exahype_tpu_"))
    tmp.mkdir(parents=True, exist_ok=True)
    src = tmp / "generated_kernel.cpp"
    src.write_text(code)
    lib = tmp / "kernel.so"
    # -ffp-contract=off: no FMA contraction, so native results are bitwise
    # reproducible against the oracle/JAX (1-ulp FMA drift otherwise).
    cmd = [
        "g++", "-O2", "-ffp-contract=off", "-shared", "-fPIC",
        f"-I{NATIVE_DIR}", "-o", str(lib), str(src),
    ]
    cmd += [str(s) for s in extra_sources]
    for key, val in (defines or {}).items():
        cmd.append(f"-D{key}={val}")
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise LoweringError(
            f"native compilation failed:\n{proc.stderr}\n--- source ---\n{code}"
        )
    return NativeKernel(kernel, lib, function_name)


def euler_sources() -> list[pathlib.Path]:
    return [NATIVE_DIR / "euler.cpp"]
