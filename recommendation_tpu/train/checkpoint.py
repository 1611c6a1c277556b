"""Disk checkpoints (orbax) — a capability the reference lacks entirely.

The reference's "save" is an in-memory snapshot of best embeddings
(`selfcf.py:577-579`, `ncl.py:386-388`); ``saveModel/loadModel`` are empty
stubs (`univariate/diffnet.py:250-254`). SURVEY.md §5 mandates: checkpoint of
(sharded) tables + optimizer state + RNG + epoch, with resume for tuner
sweeps.

Uses orbax's PyTreeCheckpointer, which handles sharded jax.Arrays natively —
a checkpoint written from a sharded multi-chip run restores under the same
mesh layout.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, payload: Dict[str, Any], force: bool = True) -> None:
    """Save a pytree payload (params/opt_state/state/rng/epoch) to ``path``."""
    path = os.path.abspath(path)
    _checkpointer().save(path, payload, force=force)


def load_checkpoint(path: str) -> Dict[str, Any]:
    return _checkpointer().restore(os.path.abspath(path))


class CheckpointManager:
    """Keep-last-N rolling checkpoints + best tracking for a training run."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, payload: Dict[str, Any]) -> str:
        path = self._step_dir(step)
        save_checkpoint(path, payload)
        self._gc()
        return path

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def all_steps(self):
        if not os.path.isdir(self.directory):
            return []
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_")[1]))
                except (IndexError, ValueError):
                    pass
        return sorted(steps)

    def restore_latest(self) -> Optional[Dict[str, Any]]:
        step = self.latest_step()
        if step is None:
            return None
        return load_checkpoint(self._step_dir(step))

    def _gc(self):
        import shutil

        steps = self.all_steps()
        for s in steps[: -self.keep]:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)


def restore_into(template: Any, restored: Any) -> Any:
    """Rebuild ``restored`` (which orbax returns as plain dicts/lists) into
    the exact pytree structure of ``template`` (e.g. optax namedtuple
    states). Leaf order is the canonical pytree order of both trees."""
    leaves = jax.tree_util.tree_leaves(restored)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def rng_to_saveable(rng: jax.Array) -> np.ndarray:
    return np.asarray(jax.random.key_data(rng)) if jax.dtypes.issubdtype(
        rng.dtype, jax.dtypes.prng_key
    ) else np.asarray(rng)
