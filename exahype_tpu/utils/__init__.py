from exahype_tpu.utils.config import KernelConfig
from exahype_tpu.utils.errors import LoweringError, SemanticError, VerifyError
from exahype_tpu.utils.list_ops import flatten

__all__ = ["KernelConfig", "SemanticError", "VerifyError", "LoweringError", "flatten"]
