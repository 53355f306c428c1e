"""Checkpoint save / restore with true step-resume.

The reference only ever torch-saves state_dicts mid-stage and can resume
only at stage granularity by reloading the previous stage's file
(`/root/reference/learning_repo_cleanup/utils/utils.py:30-32`,
`spherical_domain_sampling.py:43,126-129`). Here a checkpoint is the full
training state — params, optimizer state, step — so a killed run resumes at
the exact iteration.

Format: one `.npz` per checkpoint; pytree leaves stored under their
jax.tree_util key-path string, structure recovered on load by matching
against a template pytree. Self-contained (no orbax server/async machinery
needed for kB-scale MLPs), atomic via write-to-temp + rename.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def save_pytree(path: str, tree: Any, step: int = 0) -> None:
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    payload = {_path_str(p): np.asarray(v) for p, v in leaves_with_paths}
    payload["__step__"] = np.asarray(step)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, template: Any):
    """Restore a pytree with `template`'s structure. Returns (tree, step)."""
    with np.load(path) as data:
        step = int(data["__step__"])
        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, tpl in paths_and_leaves:
            arr = data[_path_str(p)]
            if hasattr(tpl, "dtype"):
                arr = arr.astype(tpl.dtype)
            leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves), step


def latest_step(path: str) -> int:
    """Step stored in a checkpoint file, or -1 if absent."""
    if not os.path.exists(path):
        return -1
    with np.load(path) as data:
        return int(data["__step__"])
