"""Device mesh + sharding setup.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed,
no NCCL — `.to("cuda")` everywhere, e.g.
`/root/reference/learning_repo_cleanup/disk_domain_sampling.py:16`). This
module introduces the multi-chip axis as a first-class concept: one `Mesh`
with a `"data"` axis for batch/ray sharding (training batches and render
wavefronts are both embarrassingly batch-parallel; parameters are tiny
≤6x64 MLPs and are replicated). Gradients cross chips via a single `psum`
riding ICI; nothing else communicates until the film reduction.

All helpers work identically on real TPU slices and on the virtual
8-device CPU mesh used by tests / `dryrun_multichip`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh; trailing dims replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = DATA_AXIS):
    """Device-put a pytree of (N, ...) arrays batch-sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh (params, opt state)."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
