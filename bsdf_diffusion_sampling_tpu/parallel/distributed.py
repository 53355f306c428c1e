"""Multi-host initialization and cross-host reductions.

The communication backend the reference never had (SURVEY.md §2.3): on a
multi-host TPU slice, call `init_distributed()` once at process start —
`jax.distributed.initialize` wires the hosts together, after which
`jax.devices()` spans the whole slice, `make_mesh()` builds a global mesh,
and the same jitted train/render programs run SPMD with XLA inserting
ICI/DCN collectives (gradient psum in training, film all-reduce in
rendering). On a single host (or under the tests' virtual CPU mesh) it is
a no-op, so every entry point can call it unconditionally.

Per-host RNG discipline: `host_fold(key)` folds the process index into a
key so stochastic data generation (MCMC walkers, ray jitter) decorrelates
across hosts deterministically — the multi-host replacement for the
reference's per-pass seed increments (`brdf_measured_disk.py:149-155`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; returns True if
    a multi-host runtime was set up.

    Auto-detects the standard TPU pod environment (JAX reads the TPU
    metadata itself when no arguments are given); explicit arguments serve
    GPU/CPU clusters or tests. Safe to call twice and on single hosts.

    Order matters: the env-var / explicit-args decision happens BEFORE any
    jax API that instantiates backends (jax.process_count() would start
    the local backend, after which jax.distributed.initialize refuses with
    "must be called before backends are initialized"). Call this first
    thing in every entry point.
    """
    explicit = coordinator_address is not None
    in_pod_env = any(
        v in os.environ
        for v in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not (explicit or in_pod_env):
        # no multi-host signal; process_count() may now safely start the
        # local backend (covers runtimes that pre-initialized distributed)
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e)
        if "already" in msg:
            pass  # idempotent second call
        elif "before" in msg and explicit:
            # backends were instantiated before an EXPLICIT multi-host
            # bring-up; this is a caller bug — surface it instead of
            # silently running single-host on a multi-host job
            raise RuntimeError(
                "init_distributed() must run before any jax API that "
                "initializes backends (jax.devices/process_count/first op)"
            ) from e
        elif not explicit:
            # auto-detect path on a single-host dev box: either the
            # coordinator lookup failed, or backends are already up under
            # stray pod env vars (the axon PJRT plugin exports
            # TPU_WORKER_HOSTNAMES even on one host) — trust
            # process_count() / report non-distributed
            if "before" in msg:
                return jax.process_count() > 1
            return False
        else:
            raise
    return jax.process_count() > 1


def host_fold(key: jax.Array) -> jax.Array:
    """Decorrelate a PRNG key across hosts (deterministic per process)."""
    return jax.random.fold_in(key, jax.process_index())


def global_batch_slice(n_global: int) -> tuple[int, int]:
    """(start, size) of this host's contiguous shard of a global batch."""
    per = n_global // jax.process_count()
    return jax.process_index() * per, per
