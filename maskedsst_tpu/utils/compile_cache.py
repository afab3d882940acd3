"""Persistent XLA compilation cache for the driver scripts.

The first compile of the full fused train step costs ~40-50 s on the TPU
backend here — and minutes when the remote-compile service is congested
(CLAUDE.md). JAX's on-disk compilation cache removes that cost for every
process after the first: executables are keyed by HLO + compile options +
backend version, so re-running a driver with unchanged shapes starts in
seconds. Verified working through the tunneled TPU backend (cross-process
cache hits observed via jax._src.compiler debug logs).

The reference has no equivalent concern: PyTorch eager pays no ahead-of-
time compile (its cost shows up per-op at runtime instead).

Opt out (e.g. when benchmarking compile time itself) with
``MASKEDSST_COMPILE_CACHE=0``; point it elsewhere by setting the variable
to a directory path.
"""

from __future__ import annotations

import os

# repo-/install-local by default (next to the package) so driver runs stay
# self-contained; point MASKEDSST_COMPILE_CACHE at a shared location to
# reuse one cache across checkouts
_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache; returns the dir (or None
    when disabled via ``MASKEDSST_COMPILE_CACHE=0``/``none``).

    Call before the first ``jit`` execution; later calls are harmless.

    Unlike JAX's default policy (persist only compiles >1 s), everything is
    persisted: on this backend compilation is a *remote* service call, so
    even a trivial convert/threefry dispatch program costs ~0.4 s — and
    minutes under congestion — and a driver startup issues dozens of them.
    A warm `pretrain.py --synthetic` start re-reads all ~19 programs from
    disk with zero compile-service calls (verified via
    jax._src.compiler debug logs; wall time still varies with shared-chip
    load, which the cache cannot help).
    """
    env = os.environ.get("MASKEDSST_COMPILE_CACHE")
    if env is not None and env.strip().lower() in ("0", "none", "off", ""):
        return None
    path = cache_dir or (env if env else _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
