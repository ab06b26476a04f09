"""Process-wide JAX runtime configuration for the proving framework.

Call ``init()`` once before proving. It enables the persistent compilation
cache (TPU-tunnel compiles are slow and variable — measured 9s-280s cold,
~0.7s on cache hit; see .claude/skills/verify/SKILL.md) and optionally pins
the platform (the environment's sitecustomize force-registers the 'axon' TPU
platform ahead of CPU, overriding the JAX_PLATFORMS env var).
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def sanity_enabled() -> bool:
    """HYPERGRECO_SANITY=1 enables internal-equality checks in the prover
    (parity with the reference's `sanity-check` cargo feature,
    lasso/Cargo.toml:27-28): collation claim vs direct evaluation
    (lasso.rs:265-267), grand-product root cross-check (prover.rs:207-211),
    and multiset-hash balance (prover.rs:136-141)."""
    return os.environ.get("HYPERGRECO_SANITY") == "1"


def init(platform: str | None = None, cache_dir: str | None = None):
    global _INITIALIZED
    if platform:
        jax.config.update("jax_platforms", platform)
    if _INITIALIZED:
        return
    if cache_dir is None:
        cache_dir = os.environ.get(
            "HYPERGRECO_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _INITIALIZED = True
