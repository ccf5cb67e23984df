"""MLIR backend tests: structure of the emitted standard-dialect module."""

from exahype_tpu.backends.mlir_backend import MLIRPrinter
from exahype_tpu.models.rusanov import build_rusanov_kernel


def test_mlir_module_structure():
    kb = build_rusanov_kernel()
    code = MLIRPrinter(kb).code
    assert code.startswith("builtin.module {")
    assert "func.func @time_step(%Q: memref<1x6x6x10xf64>, %dt: f64)" in code
    # Temps allocated and deallocated.
    assert "memref.alloc() : memref<1x6x6x10xf64>" in code  # Q_copy
    assert "memref.alloc() : memref<1x6x6x5xf64>" in code  # tmp_flux_*
    assert code.count("memref.dealloc") == 5  # Q_copy + 2 flux + 2 eigen
    # Ten loop nests over patch (the golden structure).
    assert code.count("scf.for %patch") == 10
    assert "scf.for %var" in code
    # Loads/stores and arithmetic.
    assert "memref.load" in code and "memref.store" in code
    assert "arith.mulf" in code and "arith.addf" in code
    # External physics declarations flushed at module end.
    assert "func.func private @Flux" in code
    assert "func.func private @maxEigenvalue" in code
    assert "func.call @maxEigenvalue" in code
    assert code.rstrip().endswith("}")


def test_mlir_balanced_braces_and_ssa_uniqueness():
    kb = build_rusanov_kernel(dim=3, patch_size=3, halo_size=1, n_real=5, n_aux=0)
    code = MLIRPrinter(kb).code
    assert code.count("{") == code.count("}")
    # Every SSA id is defined exactly once.
    import re

    defs = re.findall(r"^\s*(%\S+) = ", code, flags=re.M)
    assert len(defs) == len(set(defs))


def test_visitor_dispatch():
    from exahype_tpu.ir import kernel_ir
    from exahype_tpu.utils.visitor import Visitor, camel_to_snake

    assert camel_to_snake("LoopFunction") == "loop_function"

    from tests.test_ir import demo_kernel

    seen = []

    class Counter(Visitor):
        def visit_kernel(self, node):
            seen.append("kernel")

        def visit_patch(self, node):
            seen.append(node.name)

        def visit_call_expr(self, node):
            seen.append(node.func)

    Counter().traverse(demo_kernel())
    assert seen[0] == "kernel"
    assert seen.count("Qcopy") == 2
    assert "Flux_x" in seen and "Y_max_eigenvalues" in seen
