"""Persistent XLA compilation cache setup.

TPU compiles of the bucketed encode graphs take tens of seconds; caching
them on disk makes every process after the first start instantly (the
TPU-native analogue of the reference's absent warm-start story — its only
artifact is the model .bin, SURVEY.md §5.4)."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/bert_tpu/xla")
_active_dir: str = None


def enable_compilation_cache(cache_dir: str = None) -> None:
    global _active_dir
    requested = cache_dir or os.environ.get("BERT_TPU_CACHE_DIR",
                                            _DEFAULT_DIR)
    if _active_dir is not None:
        if cache_dir is not None and requested != _active_dir:
            # honor an explicit re-point (jax allows updating the config);
            # implicit (default) calls never move an established cache
            import jax

            os.makedirs(requested, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", requested)
            _active_dir = requested
        return
    import jax

    os.makedirs(requested, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", requested)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _active_dir = requested
