"""Checkpoint / resume for the whole SLAM session.

The reference's persistence is ad-hoc file dumps (keyframe PCDs + pose.txt,
SURVEY §5.4) with no live-session resume.  Here the entire engine state is an
explicit pytree, so checkpointing is exact and total: serialize
(SlamState, LoopState, step counter) with orbax and resume mid-run — also the
basis for the localization-in-prior-map mode (cfg.map_update=False), which
restores a mapped session's keyframe store and keeps it frozen.
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np


def save(path: str, state: Any, step: int = 0) -> None:
    """Save a state pytree to ``path`` (directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    leaves, treedef = jax.tree.flatten(state)
    ckptr.save(
        os.path.join(path, "state"),
        {"leaves": [np.asarray(l) for l in leaves], "step": step},
        force=True,
    )


def restore(path: str, like: Any) -> Tuple[Any, int]:
    """Restore a pytree with the same structure as ``like``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.join(path, "state"))
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = payload["leaves"]
    assert len(new_leaves) == len(leaves), (
        f"checkpoint has {len(new_leaves)} leaves, expected {len(leaves)}"
    )
    restored = jax.tree.unflatten(
        treedef,
        [
            jax.numpy.asarray(nl).astype(l.dtype).reshape(l.shape)
            for nl, l in zip(new_leaves, leaves)
        ],
    )
    return restored, int(payload["step"])
