"""Checkpoint / resume of the time-integration state.

Absent from the reference (delegated to Peano's ``DataRepository``,
SURVEY.md §5); here a small orbax-backed store of the solver state pytree
``{step, t, dt, Q}`` with a NumPy fallback when orbax is unavailable.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np


def _to_host(tree: dict) -> dict:
    return {k: np.asarray(v) for k, v in tree.items()}


class CheckpointManager:
    """Versioned checkpoints under ``directory/step_<n>``; keeps the newest
    ``max_to_keep``."""

    def __init__(self, directory: str, max_to_keep: int = 3, use_orbax: bool = True):
        self.directory = pathlib.Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._orbax = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._orbax = ocp.PyTreeCheckpointer()
            except Exception:  # pragma: no cover - orbax always in this image
                self._orbax = None

    # ----------------------------------------------------------------- save

    def save(self, step: int, state: dict) -> pathlib.Path:
        path = self.directory / f"step_{step:010d}"
        host_state = _to_host(state)
        if self._orbax is not None:
            self._orbax.save(path.resolve(), host_state, force=True)
        else:
            path.mkdir(parents=True, exist_ok=True)
            np.savez(path / "state.npz", **host_state)
        self._gc()
        return path

    # -------------------------------------------------------------- restore

    def steps(self) -> list[int]:
        out = []
        for p in self.directory.glob("step_*"):
            try:
                out.append(int(p.name.split("_")[1]))
            except (IndexError, ValueError):
                continue
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None) -> Optional[dict]:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        path = self.directory / f"step_{step:010d}"
        if self._orbax is not None and not (path / "state.npz").exists():
            return dict(self._orbax.restore(path.resolve()))
        data = np.load(path / "state.npz")
        return {k: data[k] for k in data.files}

    def _gc(self) -> None:
        steps = self.steps()
        for old in steps[: -self.max_to_keep]:
            path = self.directory / f"step_{old:010d}"
            import shutil

            shutil.rmtree(path, ignore_errors=True)
