from exahype_tpu.backends.base import CodePrinter

__all__ = ["CodePrinter"]


def __getattr__(name):
    if name == "JAXPrinter":
        from exahype_tpu.backends.jax_backend import JAXPrinter

        return JAXPrinter
    if name == "CPPPrinter":
        from exahype_tpu.backends.cpp_backend import CPPPrinter

        return CPPPrinter
    if name == "run_oracle":
        from exahype_tpu.backends.numpy_oracle import run_oracle

        return run_oracle
    raise AttributeError(f"module 'exahype_tpu.backends' has no attribute {name!r}")
