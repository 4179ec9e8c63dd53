"""Probe-compiled Mosaic support envelope for the fused attention kernel.

Round 2 established (docs/PERF.md, ops/fused_attention.py) that big
(T, H, d_head) combinations crash the Mosaic kernel compiler itself — a
remote ``tpu_compile_helper`` process exit, not a catchable Python error —
and that the failure boundary is irregular in H, defeating analytic VMEM
formulas. Round 2 shipped a hardcoded table of probe measurements; this
module (VERDICT r2 #1) replaces trust in that table with:

 1. a **toolchain key** (jax / jaxlib / libtpu versions + TPU kind): the
    measured table is authoritative only for toolchains it was measured on
    (``MEASURED_TOOLCHAINS``);
 2. on any other toolchain, a **subprocess probe**: attempt to AOT-compile
    the exact kernel configuration in a child process (so a compiler crash
    can't take the serving process down), with a known-good canary shape to
    distinguish "Mosaic rejected this shape" from "the environment is
    broken" (device busy, tunnel outage) — environment failures fall back
    to the measured table rather than pessimizing everything;
 3. a **persistent verdict cache** (``~/.cache/bert_tpu/mosaic_envelope.json``
    keyed by toolchain) so each shape is probed once per toolchain ever,
    not once per process.

Env knobs:
  ``BERT_TPU_MOSAIC_PROBE``  "1" (default) probe on unknown toolchains;
                             "0" never probe (table only);
                             "force" probe even on measured toolchains.
  ``BERT_TPU_CACHE_DIR``     cache directory (default ~/.cache/bert_tpu).

The reference analog is its runtime ISA dispatch (CMakeLists.txt:164-177:
the build adapts to whatever AVX level the host has) — portability across
toolchain versions is part of parity, and here the "ISA" is whatever the
installed Mosaic compiler can lower.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import tempfile
import threading
from typing import Dict, Optional, Tuple

logger = logging.getLogger(__name__)

# Toolchains on which the fused_attention.fused_attn_table envelope was
# measured by actually compiling shapes on a real chip (round 2, v5e).
# The table is trusted as-is on these; anything else gets probe-compiled.
MEASURED_TOOLCHAINS = (
    "jax0.9.0-jaxlib0.9.0-libtpu0.0.34-TPU v5 lite",
)

# A shape every Mosaic version must compile (MiniLM bucket, far inside every
# measured envelope). If the canary fails, the probe environment is broken
# and verdicts are unusable.
_CANARY = (64, 12, 32, "bfloat16")

_PROBE_TIMEOUT_S = float(os.environ.get("BERT_TPU_PROBE_TIMEOUT", "300"))

# Probe protocol version: bump when the probe's compile setup changes in a
# way that invalidates old verdicts (v2: two-grid-step probe — v1 measured
# without double-buffering and over-admitted shapes).
_PROBE_VERSION = 2

_lock = threading.Lock()
_mem_cache: Dict[str, bool] = {}      # this process
_disk_cache: Optional[Dict[str, bool]] = None
_env_broken = False                    # canary failed: stop probing
_toolchain: Optional[str] = None


def toolchain_key() -> str:
    """Version fingerprint of everything that decides Mosaic lowerability."""
    global _toolchain
    if _toolchain is not None:
        return _toolchain
    import jax
    import jaxlib

    parts = [f"jax{jax.__version__}", f"jaxlib{jaxlib.__version__}"]
    try:
        import libtpu

        parts.append(f"libtpu{getattr(libtpu, '__version__', '?')}")
    except ImportError:
        parts.append("libtpu-none")
    try:
        kind = jax.devices()[0].device_kind
    except Exception:  # backend init failure: key on versions only
        kind = "unknown"
    _toolchain = "-".join(parts) + "-" + kind
    return _toolchain


def _cache_scope() -> str:
    return f"{toolchain_key()}|v{_PROBE_VERSION}"


def _cache_path() -> str:
    base = os.environ.get("BERT_TPU_CACHE_DIR",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "bert_tpu"))
    return os.path.join(base, "mosaic_envelope.json")


def _shape_key(seq: int, n_head: int, d_head: int, dtype_name: str,
               pairwise: bool) -> str:
    return f"{seq},{n_head},{d_head},{dtype_name},{int(pairwise)}"


def _load_disk_cache() -> Dict[str, bool]:
    global _disk_cache
    if _disk_cache is not None:
        return _disk_cache
    try:
        with open(_cache_path(), encoding="utf-8") as f:
            data = json.load(f)
        _disk_cache = dict(data.get(_cache_scope(), {}))
    except (OSError, ValueError, TypeError):
        _disk_cache = {}
    return _disk_cache


def _store_verdict(key: str, ok: bool) -> None:
    """Persist one probe verdict (atomic read-modify-write-rename)."""
    _load_disk_cache()[key] = ok
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
            if not isinstance(data, dict):
                data = {}
        except (OSError, ValueError):
            data = {}
        data.setdefault(_cache_scope(), {})[key] = ok
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, path)
    except OSError as exc:  # read-only home: keep the in-memory verdict
        logger.debug("could not persist mosaic envelope cache: %r", exc)


_PROBE_SCRIPT = r"""
import sys
seq, n_head, d_head, dtype_name, pairwise = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5] == "1")
import jax
import jax.numpy as jnp
from bert_tpu.ops.fused_attention import fused_qkv_attention, pick_group

dtype = jnp.dtype(dtype_name)
g = pick_group(n_head, seq)
d = n_head * d_head
# TWO grid steps along the batch axis: a single-step grid skips Mosaic's
# block double-buffering and under-reports scoped VMEM by ~2x (measured:
# (512,16,32,bf16) compiles at one step, blows the 16 MB limit at four) —
# production batches always run multi-step, so the probe must too.
bp = 2 * g
qkv = jax.ShapeDtypeStruct((bp, seq, 3 * d), dtype)
bias = jax.ShapeDtypeStruct((bp, seq, seq) if pairwise else (bp, seq),
                            jnp.float32)

def f(qkv, bias):
    return fused_qkv_attention(qkv, bias, n_head=n_head, d_head=d_head,
                               scale=0.125, head_chunk=n_head)

lowered = jax.jit(f).lower(qkv, bias)
# Everything environmental (imports, backend/device acquisition, tracing)
# is done; only the Mosaic/XLA compile itself remains. The parent uses
# this marker to classify a failure after it as a definitive compile
# verdict rather than a broken environment.
print("MOSAIC_PROBE_READY", flush=True)
lowered.compile()
print("MOSAIC_PROBE_OK")
"""


def _run_probe(seq: int, n_head: int, d_head: int, dtype_name: str,
               pairwise: bool) -> Optional[bool]:
    """AOT-compile the kernel config in a child process.

    Returns True/False for a definitive verdict, None for an environment
    failure (timeout, import error, device unavailable) that must NOT be
    cached or treated as "unsupported"."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    # APPEND: replacing PYTHONPATH can drop a site dir that registers the
    # TPU plugin (observed with the axon backend)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-c", _PROBE_SCRIPT, str(seq), str(n_head),
           str(d_head), dtype_name, "1" if pairwise else "0"]
    try:
        res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=_PROBE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        logger.warning("mosaic probe (%d,%d,%d,%s) timed out after %.0fs — "
                       "not caching", seq, n_head, d_head, dtype_name,
                       _PROBE_TIMEOUT_S)
        return None
    except OSError as exc:
        logger.warning("mosaic probe could not launch: %r", exc)
        return None
    if "MOSAIC_PROBE_OK" in res.stdout:
        return True
    tail = (res.stderr or res.stdout or "").strip().splitlines()[-3:]
    if "MOSAIC_PROBE_READY" not in res.stdout:
        # never reached the compile step: import error, device acquisition
        # (e.g. an exclusive-libtpu runtime where the parent holds the
        # lock), backend init — environmental, must not become a verdict
        logger.warning("mosaic probe (%d,%d,%d,%s) failed before compile "
                       "rc=%d (environment, not caching): %s", seq, n_head,
                       d_head, dtype_name, res.returncode, " | ".join(tail))
        return None
    logger.info("mosaic probe (%d,%d,%d,%s,pairwise=%s) failed rc=%d: %s",
                seq, n_head, d_head, dtype_name, pairwise, res.returncode,
                " | ".join(tail))
    return False


def _canary_ok() -> bool:
    """One known-good compile distinguishes 'Mosaic rejects the shape' from
    'probing is impossible here'. Memoized per process; also persisted so a
    healthy toolchain never re-pays it."""
    global _env_broken
    key = _shape_key(*_CANARY, False)
    cache = _load_disk_cache()
    if cache.get(key) is True:
        return True
    with _lock:
        if _env_broken:
            return False
        verdict = _run_probe(*_CANARY, False)
        if verdict is True:
            _store_verdict(key, True)
            return True
        _env_broken = True
        logger.warning(
            "mosaic canary probe failed — probe environment unusable "
            "(device busy / tunnel down?); falling back to the measured "
            "table for all shapes this process")
        return False


def _recheck_canary() -> bool:
    """Fresh canary run (bypasses the cached True) used to validate a
    just-observed compile FAILURE: if the canary no longer compiles, the
    environment broke mid-session and the failure is not a verdict."""
    global _env_broken
    if _run_probe(*_CANARY, False) is True:
        return True
    with _lock:
        _env_broken = True
    logger.warning("mosaic canary stopped compiling mid-session — "
                   "environment broke; discarding the failure verdict and "
                   "falling back to the measured table")
    return False


def probe_mode() -> str:
    return os.environ.get("BERT_TPU_MOSAIC_PROBE", "1")


def fused_attn_ok(seq: int, n_head: int, d_head: int, dtype,
                  pairwise: bool = False, table_fn=None) -> bool:
    """Is the fused attention kernel compilable at this config?

    ``table_fn(seq, n_head, d_head, dtype)`` is the measured-table prior
    (ops/fused_attention.fused_attn_table). Decision order:

      * non-TPU backends (CPU tests, interpret mode): table — nothing to
        probe, and interpret mode cannot crash Mosaic;
      * probing disabled (mode "0") or canary-broken environment: table;
      * persistent/memory cache hit: the cached verdict;
      * measured toolchain (unless probing is forced): table-True is
        trusted as-is (zero probe cost on the hot known-good paths, and
        the compiled TPU gate executes them every round) — but
        table-False is **probed**: the table is deliberately
        conservative, and round-3 probing on the same toolchain showed
        several "measured-fail" shapes compile AND execute fine (e.g.
        bert-base (512, 12, 64) whole-kernel), so probing reclaims fused
        routes the table would leave on the slow path;
      * unknown toolchain: probe everything (the table is not evidence
        about a Mosaic version it never saw).
    """
    import jax
    import jax.numpy as jnp

    dtype_name = jnp.dtype(dtype).name
    table = (table_fn(seq, n_head, d_head, dtype)
             if table_fn is not None else False)
    if jax.default_backend() != "tpu":
        return table
    mode = probe_mode()
    if mode == "0":
        return table
    # explicit verdicts (including ones recorded under "force" on a
    # measured toolchain) outrank the table's optimism — check caches
    # BEFORE the measured-toolchain short-circuit
    key = _shape_key(seq, n_head, d_head, dtype_name, pairwise)
    if key in _mem_cache:
        return _mem_cache[key]
    cached = _load_disk_cache().get(key)
    if cached is not None:
        _mem_cache[key] = cached
        return cached
    # the measured table (fused_attn_table) was built with KEY-SIDE bias
    # shapes only — a pairwise (packed) config carries a (g, t, t) bias
    # block, a strictly larger working set the table never measured, so
    # pairwise configs must probe-compile even on a measured toolchain
    # (verdict cached; one subprocess compile per shape, ever)
    if (mode != "force" and table and not pairwise
            and toolchain_key() in MEASURED_TOOLCHAINS):
        return True
    if not _canary_ok():
        return table
    verdict = _run_probe(seq, n_head, d_head, dtype_name, pairwise)
    if verdict is None:  # transient environment failure: don't cache
        return table
    if verdict is False and not _recheck_canary():
        # the environment may have broken MID-SESSION (tunnel drop during
        # the compile step looks identical to a compiler rejection): a
        # fresh canary failing means the False verdict is untrustworthy
        return table
    logger.info("mosaic probe verdict (%d,%d,%d,%s,pairwise=%s): %s",
                seq, n_head, d_head, dtype_name, pairwise,
                "supported" if verdict else "unsupported")
    _mem_cache[key] = verdict
    _store_verdict(key, verdict)
    return verdict


def reset_for_tests() -> None:
    """Clear process-level state (tests monkeypatch versions/probes)."""
    global _mem_cache, _disk_cache, _env_broken, _toolchain
    with _lock:
        _mem_cache = {}
        _disk_cache = None
        _env_broken = False
        _toolchain = None


# -- introspection -----------------------------------------------------------
def envelope_report(config=None) -> Dict[str, object]:
    """Summary for logs/diagnostics: toolchain, mode, cache contents."""
    return {
        "toolchain": toolchain_key(),
        "measured": toolchain_key() in MEASURED_TOOLCHAINS,
        "probe_mode": probe_mode(),
        "cached_verdicts": dict(_load_disk_cache()),
        "cache_path": _cache_path(),
    }
