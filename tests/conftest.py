"""Test config: force the CPU backend with 8 virtual devices BEFORE any jax
backend initialization, so multi-chip sharding tests run anywhere
(SURVEY.md §4: multi-device tests via xla_force_host_platform_device_count).

Note: this machine sets JAX_PLATFORMS=axon (TPU tunnel); the env var alone
does not reliably override the plugin, so we also use jax.config.update.
"""

import os
import sys

# BERT_TPU_REAL_TPU=1 keeps the real TPU backend for the on-chip
# compiled-kernel parity gate (tests/test_kernels_tpu.py — run it as its
# own pytest invocation; see the verify skill). Default: forced 8-device
# virtual CPU so the whole suite runs anywhere.
_REAL_TPU = os.environ.get("BERT_TPU_REAL_TPU") == "1"

if not _REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache for the WHOLE suite (not just tests that
# construct a BertTPU): the compile-heavy tests (graft entry, goldens,
# checkpoint round-trip) dominate suite wall time on a cold run and are
# near-free on every run after the first (VERDICT r2 #7).
from bert_tpu.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU chip (run with BERT_TPU_REAL_TPU=1)")
    config.addinivalue_line(
        "markers", "smoke: fast end-to-end gate (<60 s cold): tokenizer "
        "goldens + quant round-trip + one forward — `pytest -m smoke`")
    if not _REAL_TPU:
        assert jax.default_backend() == "cpu", (
            "tests must run on the virtual-CPU backend, got "
            + jax.default_backend()
        )


# The cheap always-run gate (VERDICT r4 #8): a cold full suite can exceed
# 9.5 min on this box (first-touch page faults), so drivers need a <60 s
# smoke set. Selection lives here (not as per-file marks) so the set stays
# auditable in one place. None = every test in the file.
_SMOKE = {
    "test_tokenizer.py": None,                  # reference goldens, no jax
    "test_quant.py": {"test_q4_0_roundtrip_error", "test_q4_1_roundtrip_error",
                      "test_ggml_stream_roundtrip"},
    "test_model.py": {"test_output_shape_and_norm"},  # one jitted forward
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        names = _SMOKE.get(os.path.basename(str(item.fspath)), False)
        if names is None or (names and item.originalname in names):
            item.add_marker(pytest.mark.smoke)
