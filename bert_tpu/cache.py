"""Persistent XLA compilation cache setup.

TPU compiles of the bucketed encode graphs take tens of seconds; caching
them on disk makes every process after the first start instantly (the
TPU-native analogue of the reference's absent warm-start story — its only
artifact is the model .bin, SURVEY.md §5.4)."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/bert_tpu/xla")
_initialized = False


def enable_compilation_cache(cache_dir: str = None) -> None:
    global _initialized
    if _initialized:
        return
    import jax

    cache_dir = cache_dir or os.environ.get("BERT_TPU_CACHE_DIR",
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _initialized = True
