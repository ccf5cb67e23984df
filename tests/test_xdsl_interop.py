"""Third-party MLIR validation via xDSL (optional dependency).

The reference's dialect registers with xDSL so generic MLIR tooling can
consume its IR (``/root/reference/exahype/dialects/exahype.py:585-604``),
and its SymPy translator emits real xDSL standard-dialect modules
(``SymPyToMLIR.py:1282-1299``).  This repo self-verifies its MLIR artifacts
(``ir/mlir_text.py``) — these tests close the remaining gap by round-
tripping the SAME artifacts through the actual xDSL parser when it is
installed (``pip install -e .[mlir]``); they skip cleanly otherwise and CI
without xdsl reports them as skips, not passes.
"""

import pytest

xdsl = pytest.importorskip("xdsl")


def _xdsl_context(allow_unregistered: bool):
    """Context across xdsl API generations (Context vs MLContext)."""
    try:
        from xdsl.context import Context

        try:
            return Context(allow_unregistered=allow_unregistered)
        except TypeError:
            ctx = Context()
    except ImportError:
        from xdsl.ir import MLContext as Context

        try:
            return Context(allow_unregistered=allow_unregistered)
        except TypeError:
            ctx = Context()
    if hasattr(ctx, "allow_unregistered"):
        ctx.allow_unregistered = allow_unregistered
    return ctx


def _load_standard_dialects(ctx):
    from xdsl.dialects import arith, builtin, func, llvm, math, memref, scf

    for mod in (builtin, func, scf, arith, memref, llvm, math):
        dialect = getattr(
            mod, mod.__name__.rsplit(".", 1)[-1].capitalize(), None
        )
        if dialect is None:
            continue
        if hasattr(ctx, "load_dialect"):
            ctx.load_dialect(dialect)
        else:
            ctx.register_dialect(dialect)


def _parse(ctx, text):
    from xdsl.parser import Parser

    try:
        return Parser(ctx, text).parse_module()
    except AttributeError:
        return Parser(ctx, text).parse_op()


def _demo_kernel():
    from exahype_tpu.ir.builder import (
        FluxBuilder,
        PatchBuilder,
        StencilBuilder,
    )
    from exahype_tpu.ir.kernel_ir import Kernel

    patch = PatchBuilder.build("Qcopy", [4, 4], "f64")
    fx = FluxBuilder.build("flux_x", "Flux_x", [4, 4], halo=[1, 0, 0])
    fy = FluxBuilder.build("flux_y", "Flux_y", [4, 4], halo=[0, 1, 0])
    st = StencilBuilder.build(
        patch,
        [fx, fy],
        ["0[010],0[0-10]", "1[001],1[00-1]"],
        [[1, -1], [1, -1]],
    )
    k = Kernel()
    k.addStencil(st)
    return k


def test_generic_form_parses_in_real_xdsl():
    """print_mlir_generic claims 'any MLIR parser accepts it under
    --allow-unregistered-dialect' (ir/kernel_ir.py:219) — execute that
    claim against xdsl's parser instead of asserting it."""
    from exahype_tpu.ir.kernel_ir import print_mlir_generic

    text = print_mlir_generic(_demo_kernel())
    ctx = _xdsl_context(allow_unregistered=True)
    module = _parse(ctx, text)
    assert module is not None
    module.verify()
    # Structure survived: one kernel op wrapping stencil ops.
    names = [op.name for op in module.walk()]
    assert any("exahype.kernel" in n for n in names)
    assert any("exahype.stencil" in n for n in names)


def test_mlir_backend_module_parses_in_real_xdsl():
    """The standard-dialect module from MLIRPrinter must be valid MLIR by a
    third-party implementation, not only by our own verifier."""
    from exahype_tpu.backends.mlir_backend import MLIRPrinter
    from exahype_tpu.models.rusanov import build_rusanov_kernel

    kb = build_rusanov_kernel(
        dim=2, patch_size=4, halo_size=1, n_real=4, n_aux=0, n_patches=2
    )
    text = MLIRPrinter(kb).code
    ctx = _xdsl_context(allow_unregistered=True)
    _load_standard_dialects(ctx)
    module = _parse(ctx, text)
    assert module is not None
    module.verify()
