"""MLIR backend: emit standard-dialect MLIR text from a kernel spec.

Component parity with the reference's MLIR path (``MLIRPrinter`` +
``SymPyToMLIR``, ``exahype/SymPyToMLIR.py:1282-1299``): the same artifact — a
``builtin.module`` holding a ``func.func`` of nested ``scf.for`` loops over
``memref`` loads/stores with ``arith``/``math`` ops and external ``func.call``
declarations — generated without the reference's 1.3k-line wrapper-class
tree.  The statement list + bounds module (the same data the executable
backends compile) is printed directly in SSA form.

Type policy matches the reference (``SymPyToMLIR.py:353-400``): f64
throughout, arrays as memrefs (the reference round-trips ``llvm.ptr``
through ``UnrealizedConversionCast`` to ``memref``; we print the memref form
it casts into), indices as ``index``.

This backend exists for inspection, golden tests, and downstream
MLIR-toolchain interop; the JAX/Pallas backends are the executable path.
"""

from __future__ import annotations

from typing import Optional

import sympy
from sympy.core.function import AppliedUndef

from exahype_tpu.backends.base import CodePrinter
from exahype_tpu.frontend.bounds import DEFAULT_POLICY, Policy, statement_ranges
from exahype_tpu.frontend.kernel_builder import KernelBuilder
from exahype_tpu.frontend.statements import Statement, StatementKind
from exahype_tpu.utils.errors import LoweringError


class MLIRPrinter(CodePrinter):
    """Emit textual MLIR for a kernel spec (``.code`` holds the module)."""

    def __init__(
        self,
        kernel: KernelBuilder,
        function_name: str = "time_step",
        policy: Policy = DEFAULT_POLICY,
    ):
        super().__init__(kernel, function_name=function_name)
        self.policy = policy
        self._ssa = 0
        self._lines: list[str] = []
        self._indent = 0
        self._const_cache: dict[tuple, str] = {}
        self._extern_decls: dict[str, str] = {}
        self._emit_module()

    # --------------------------------------------------------------- helpers

    def _new(self, hint: str = "") -> str:
        self._ssa += 1
        return f"%{hint}{self._ssa}" if hint else f"%{self._ssa}"

    def _line(self, text: str) -> None:
        self._lines.append("  " * self._indent + text)

    def _memref_type(self, name: str) -> str:
        shape = self._kernel.item_shape(name)
        dims = "x".join(str(s) for s in shape)
        return f"memref<{dims}xf64>"

    def _const(self, value, type_: str) -> str:
        key = (str(value), type_)
        if key in self._const_cache:
            return self._const_cache[key]
        ssa = self._new("c" if type_ == "index" else "cst")
        if type_ == "index":
            self._line(f"{ssa} = arith.constant {int(value)} : index")
        else:
            self._line(f"{ssa} = arith.constant {float(value):.6e} : f64")
        self._const_cache[key] = ssa
        return ssa

    # ---------------------------------------------------------------- module

    def _emit_module(self) -> None:
        kb = self._kernel
        self._line("builtin.module {")
        self._indent += 1

        args = []
        for name, ctype in zip(kb.inputs, kb.input_types):
            ty = self._memref_type(name) if ctype.endswith("*") else "f64"
            args.append(f"%{name}: {ty}")
        self._line(
            f"func.func @{self.functionName()}({', '.join(args)}) {{"
        )
        self._indent += 1

        env: dict[str, str] = {name: f"%{name}" for name in kb.inputs}
        # Temp allocations (``memref.alloc``, cf. SymPyToMLIR.py:1102-1126).
        for name in kb.temp_items():
            ssa = self._new(name + "_")
            self._line(f"{ssa} = memref.alloc() : {self._memref_type(name)}")
            env[name] = ssa

        last_lhs = kb.LHS[-1] if kb.LHS else None
        for stmt in kb.statements:
            if stmt.kind is StatementKind.CONST_ASSIGN:
                env[str(stmt.lhs)] = self._const(float(stmt.rhs), "f64")
            else:
                self._emit_loop_nest(stmt, env, last_lhs)

        for name in kb.temp_items():
            self._line(f"memref.dealloc {env[name]} : {self._memref_type(name)}")
        self._line("func.return")
        self._indent -= 1
        self._line("}")
        # External function declarations, flushed at module end
        # (cf. SymPyToMLIR.py:1296-1297).
        for decl in self._extern_decls.values():
            self._line(decl)
        self._indent -= 1
        self._line("}")
        self.code = "\n".join(self._lines) + "\n"

    # ----------------------------------------------------------------- loops

    def _emit_loop_nest(self, stmt: Statement, env: dict, last_lhs) -> None:
        kb = self._kernel
        cfg = kb.config
        ranges = statement_ranges(
            cfg,
            stmt,
            kb.item_struct,
            policy=self.policy,
            is_last_lhs=(last_lhs is not None and stmt.lhs == last_lhs),
        )
        loop_env = dict(env)
        opened = 0
        for (lo, hi), idx in zip(ranges, cfg.index_names):
            lo_ssa = self._const(lo, "index")
            hi_ssa = self._const(hi, "index")
            step = self._const(1, "index")
            self._line(
                f"scf.for %{idx} = {lo_ssa} to {hi_ssa} step {step} {{"
            )
            self._indent += 1
            loop_env[idx] = f"%{idx}"
            opened += 1

        vb = ranges[-1][1]
        if isinstance(stmt.lhs, AppliedUndef):
            self._emit_call(stmt.lhs, loop_env, store_to=None)
        else:
            value = self._emit_expr(stmt.rhs, loop_env)
            self._emit_store(stmt.lhs, value, loop_env)

        for _ in range(opened):
            self._indent -= 1
            self._line("}")

    # ------------------------------------------------------------- accesses

    def _emit_indices(self, access: sympy.Indexed, env: dict) -> list[str]:
        out = []
        for idx_expr in access.indices:
            if isinstance(idx_expr, (sympy.Symbol, sympy.Idx)):
                out.append(env[str(idx_expr)])
            else:
                syms = list(idx_expr.free_symbols)
                if len(syms) != 1:
                    raise LoweringError(f"unsupported index {idx_expr}")
                offset = int(sympy.simplify(idx_expr - syms[0]))
                base = env[str(syms[0])]
                off = self._const(abs(offset), "index")
                ssa = self._new("i")
                op = "arith.addi" if offset > 0 else "arith.subi"
                self._line(f"{ssa} = {op} {base}, {off} : index")
                out.append(ssa)
        return out

    def _emit_load(self, access: sympy.Indexed, env: dict) -> str:
        name = str(access.base.label)
        idxs = self._emit_indices(access, env)
        ssa = self._new()
        self._line(
            f"{ssa} = memref.load {env[name]}[{', '.join(idxs)}] : "
            f"{self._memref_type(name)}"
        )
        return ssa

    def _emit_store(self, access: sympy.Indexed, value: str, env: dict) -> None:
        name = str(access.base.label)
        idxs = self._emit_indices(access, env)
        self._line(
            f"memref.store {value}, {env[name]}[{', '.join(idxs)}] : "
            f"{self._memref_type(name)}"
        )

    # ------------------------------------------------------------------ expr

    def _emit_call(self, call: AppliedUndef, env: dict, store_to) -> Optional[str]:
        kb = self._kernel
        fname = type(call).__name__
        arg_ssas = []
        arg_types = []
        for a in call.args:
            if isinstance(a, sympy.Indexed):
                # Pointer argument: pass the memref plus the linear position
                # is implicit in the reference ABI; here we pass the memref
                # view (reference passes llvm.ptr, SymPyToMLIR.py:357-359).
                name = str(a.base.label)
                arg_ssas.append(env[name])
                arg_types.append(self._memref_type(name))
            else:
                arg_ssas.append(self._emit_expr(a, env))
                arg_types.append("f64")
        typed = kb.functions.get(fname)
        has_result = typed is not None and str(typed.return_type) not in ("none",)
        ret = "f64" if has_result else ""
        sig = f"({', '.join(arg_types)}) -> {ret if ret else '()'}"
        if fname not in self._extern_decls:
            self._extern_decls[fname] = (
                f"func.func private @{fname}{sig.replace(' -> ()', ' -> ()')}"
            )
        if has_result:
            ssa = self._new()
            self._line(
                f"{ssa} = func.call @{fname}({', '.join(arg_ssas)}) : {sig}"
            )
            return ssa
        self._line(f"func.call @{fname}({', '.join(arg_ssas)}) : {sig}")
        return None

    def _emit_expr(self, expr, env: dict) -> str:
        if expr is None:
            raise LoweringError("missing RHS")
        if expr.is_Number:
            return self._const(float(expr), "f64")
        if isinstance(expr, sympy.Indexed):
            return self._emit_load(expr, env)
        if isinstance(expr, (sympy.Symbol, sympy.Idx)):
            name = str(expr)
            if name in env:
                return env[name]
            if name in self._kernel.literal_values:
                return self._const(float(self._kernel.literal_values[name]), "f64")
            raise LoweringError(f"unbound symbol {name!r}")
        if isinstance(expr, AppliedUndef):
            out = self._emit_call(expr, env, store_to=None)
            if out is None:
                raise LoweringError(
                    f"void call {expr} used as a value"
                )
            return out
        if isinstance(expr, sympy.Add):
            terms = [self._emit_expr(t, env) for t in expr.as_ordered_terms()]
            return self._fold("arith.addf", terms)
        if isinstance(expr, sympy.Mul):
            factors = [self._emit_expr(f, env) for f in expr.as_ordered_factors()]
            return self._fold("arith.mulf", factors)
        if isinstance(expr, sympy.Pow):
            base = self._emit_expr(expr.base, env)
            if expr.exp == sympy.Integer(-1):
                one = self._const(1.0, "f64")
                ssa = self._new()
                self._line(f"{ssa} = arith.divf {one}, {base} : f64")
                return ssa
            if expr.exp == sympy.Integer(2):
                return self._fold("arith.mulf", [base, base])
            if expr.exp == sympy.Rational(1, 2):
                ssa = self._new()
                self._line(f"{ssa} = math.sqrt {base} : f64")
                return ssa
            exp = self._emit_expr(expr.exp, env)
            ssa = self._new()
            self._line(f"{ssa} = math.powf {base}, {exp} : f64")
            return ssa
        if isinstance(expr, (sympy.Max, sympy.Min)):
            op = "arith.maximumf" if isinstance(expr, sympy.Max) else "arith.minimumf"
            args = [self._emit_expr(a, env) for a in expr.args]
            return self._fold(op, args)
        if isinstance(expr, sympy.Abs):
            inner = self._emit_expr(expr.args[0], env)
            ssa = self._new()
            self._line(f"{ssa} = math.absf {inner} : f64")
            return ssa
        raise LoweringError(f"MLIR printer cannot emit {type(expr).__name__}: {expr}")

    def _fold(self, op: str, ssas: list[str]) -> str:
        out = ssas[0]
        for nxt in ssas[1:]:
            ssa = self._new()
            self._line(f"{ssa} = {op} {out}, {nxt} : f64")
            out = ssa
        return out
