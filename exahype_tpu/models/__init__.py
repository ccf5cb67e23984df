from exahype_tpu.models import euler
from exahype_tpu.models.rusanov import build_rusanov_kernel

__all__ = ["euler", "build_rusanov_kernel"]
