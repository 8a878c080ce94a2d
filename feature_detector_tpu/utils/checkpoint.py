"""Orbax checkpoint / resume for model params and SLAM back-end state.

The reference has no checkpointing at all (SURVEY.md §5: stateless library;
incremental detection state lives in the caller).  For the new framework's
distributed back-end, checkpoint/resume is first-class: Flax model params
(SuperPoint/DISK) and BA solver state (poses, landmarks) are saved as orbax
PyTree checkpoints so multi-host jobs restart deterministically.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any, *, force: bool = True) -> None:
    """Save any JAX pytree (Flax params, BAProblem, optimizer state) at path."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; pass ``template`` (a matching pytree of arrays or
    ShapeDtypeStructs) to get the exact structure/dtypes/shardings back."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            template = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape")
                else x,
                template,
            )
            return ckptr.restore(path, template)
        return ckptr.restore(path)


class CheckpointManager:
    """Step-numbered checkpoints with retention, for training / BA solves.

    Thin wrapper over ``orbax.checkpoint.CheckpointManager`` exposing the
    save/restore-latest cycle the back-end needs for elastic restart.
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            template,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
