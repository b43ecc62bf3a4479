"""Persistent XLA compilation cache for every intentbev entry point.

On the tunneled dev TPU backend, EVERY XLA compile pays a ~5-minute RPC
round (measured: 282 s for a trivial jitted matmul, 1.5 s on the second
process with this cache enabled) — so a segmented training run
(tools/train_segments.sh), an eval CLI, or bench.py re-paid multiple
5-minute compiles per process. On production hosts the cache still
saves the (smaller) real compile time of the flagship programs.

Enabled by every CLI/bench entry (train, evaluate, bench.py,
tools/bench_train.py, __graft_entry__). Opt out with
``INTENTBEV_NO_COMPILE_CACHE=1``; relocate with
``INTENTBEV_COMPILE_CACHE=/path``. Cache keys include platform, XLA
flags, and program fingerprint, so one directory serves CPU and TPU
safely (upstream jax.experimental.compilation_cache semantics).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotently point JAX's persistent compilation cache at
    ``cache_dir`` (default ``~/.cache/intentbev_xla``, override with
    ``INTENTBEV_COMPILE_CACHE``; disable with
    ``INTENTBEV_NO_COMPILE_CACHE=1``)."""
    global _ENABLED
    if _ENABLED or os.environ.get("INTENTBEV_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "INTENTBEV_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "intentbev_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the tunnel makes even small programs minutes; cache everything
    # that takes >2 s to compile, at any artifact size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED = True
