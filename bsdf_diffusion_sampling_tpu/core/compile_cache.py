"""Persistent XLA compilation cache for the CLI entry points.

Every fresh process pays the full Mosaic/XLA compile bill (~25-40 s for
the render pass programs, measured on the tunneled v5e — see
benchmarks/results/testtiers_r05.md, post-restart revalidation). JAX's
persistent cache amortizes that across processes: a probe on the same
backend compiled a mid-size scanned program in 0.76 s cold and 0.05 s in
a second process. The reference has no equivalent (CUDA-graph capture is
in-process only); this is the TPU-native replacement for "the binary you
already built": the *compiled programs* are the build products.

Opt-out / redirect with BSDF_TPU_COMPILE_CACHE:
  unset          -> ~/.cache/bsdf_diffusion_sampling_tpu/xla
  a path         -> that directory
  empty string   -> disabled
Call `enable_compilation_cache()` BEFORE the first jit execution; it is a
no-op (with a warning) afterwards because jax ignores cache-config changes
once programs have been compiled.
"""

from __future__ import annotations

import os
import pathlib


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache. Returns the
    directory used, or None when disabled via BSDF_TPU_COMPILE_CACHE=""."""
    env = os.environ.get("BSDF_TPU_COMPILE_CACHE")
    if env is not None and env == "":
        return None
    cache_dir = path or env or str(
        pathlib.Path.home() / ".cache" / "bsdf_diffusion_sampling_tpu" / "xla"
    )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program: the CLIs are dominated by a handful of large
    # Pallas/scan programs, and small entries are cheap
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
