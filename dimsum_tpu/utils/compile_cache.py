"""Persistent XLA compilation cache for the CLI entry points.

Each CLI process (train.py / sample.py / sample_ddp.py / bench.py) pays the
full XLA compile of its jitted program (a 250-step CFG sampling loop over a
16-block DiM compiles in minutes on this host).  JAX ships a persistent
on-disk compilation cache that makes the second process-level run of the
same program near-instant; the reference gets the same effect implicitly
from torch eager + cached CUDA kernels, so enabling it here is protocol-
neutral (it only removes recompiles, never changes the compiled program).

Opt out with DIMSUM_JAX_CACHE=0; point elsewhere with DIMSUM_JAX_CACHE=dir.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    Returns the cache directory, or None if disabled/unavailable.
    """
    spec = os.environ.get("DIMSUM_JAX_CACHE", "")
    if spec == "0":
        return None
    cache_dir = spec or os.path.join(
        os.path.expanduser("~"), ".cache", "dimsum_tpu", "xla_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Keep JAX's default min-compile-time threshold (1 s): the
        # multi-minute sampler/train compiles are what the cache is for, and
        # a 0 s threshold would accumulate unbounded tiny entries (the dir
        # has no eviction).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # pragma: no cover - old jax / unwritable HOME
        import warnings

        warnings.warn(
            f"dimsum_tpu: persistent XLA compile cache disabled ({exc!r}); "
            "cold compiles will not be reused across processes"
        )
        return None
    return cache_dir
