"""Reflective IR visitor (parity with ``exahype/util/visitor.py:22-38``).

Dispatches ``visit_<snake_case>`` / ``traverse_<snake_case>`` methods by node
class name over the Kernel IR and Loop IR trees; unmatched nodes recurse into
their children.  ``traverse_*`` takes control of recursion; ``visit_*`` is
called and recursion continues.
"""

from __future__ import annotations

import re
from typing import Any


def camel_to_snake(name: str) -> str:
    """CamelCase → snake_case (``exahype/util/visitor.py:6-8``)."""
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


#: Child attributes per known IR node class name.
_CHILD_ATTRS = {
    "Kernel": ("stencils",),
    "Stencil": ("patch", "fluxes"),
    "Flux": ("call",),
    "LoopFunction": ("allocs", "body"),
    "Loop": ("body",),
}


class Visitor:
    """Subclass and define ``visit_kernel``, ``traverse_loop``, etc."""

    def traverse(self, node: Any) -> None:
        name = camel_to_snake(type(node).__name__)
        traverse_method = getattr(self, f"traverse_{name}", None)
        if traverse_method is not None:
            traverse_method(node)
            return
        visit_method = getattr(self, f"visit_{name}", None)
        if visit_method is not None:
            visit_method(node)
        self.generic_traverse(node)

    def generic_traverse(self, node: Any) -> None:
        for attr in _CHILD_ATTRS.get(type(node).__name__, ()):
            child = getattr(node, attr, None)
            if child is None:
                continue
            if isinstance(child, (list, tuple)):
                for c in child:
                    self.traverse(c)
            else:
                self.traverse(child)
