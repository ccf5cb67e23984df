"""Small list helpers (parity with ``exahype/util/list_ops.py:1-2``)."""

from __future__ import annotations

from typing import Iterable


def flatten(nested: Iterable) -> list:
    """Flatten one level of nesting, passing non-iterables through.

    Unlike the reference one-liner, strings are treated as atoms.
    """
    out: list = []
    for item in nested:
        if isinstance(item, (list, tuple)):
            out.extend(item)
        else:
            out.append(item)
    return out
