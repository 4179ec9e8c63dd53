"""Tracing, timing and roofline accounting.

The reference's observability is µs wall timers + optional per-op graph
timing (GGML_PERF; SURVEY.md §5.1). The TPU-native equivalents:

  * :class:`PhaseTimers` — cheap host-side accumulators for the engine's
    phases (tokenize / pad / dispatch / gather) and per-bucket counts,
    surfaced via ``BertTPU.stats()``;
  * :func:`trace` — ``jax.profiler`` wrapper producing TensorBoard/XProf
    traces with per-kernel device timelines (the deep equivalent of
    ggml_graph_print);
  * :func:`roofline` — analytic FLOPs/bytes/speed-of-light accounting for
    an encode step, for comparing measured step time against the hardware
    ceiling (the BASELINE.json "speed-of-light" requirement).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Optional

# v5e per-chip peaks (public numbers)
V5E_BF16_FLOPS = 197e12
V5E_HBM_BW = 819e9


class PhaseTimers:
    """Accumulates wall time per named phase + per-bucket execution counts.

    Thread-safe: the server's ``--pipeline-depth > 1`` runs evals in
    concurrent executor threads, and unsynchronized ``+=`` on the
    accumulators loses updates (review r4)."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.bucket_counts: Dict[tuple, int] = defaultdict(int)
        self.sentences = 0

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def record_bucket(self, batch: int, seq: int, kind: str = "") -> None:
        with self._lock:
            self.bucket_counts[(batch, seq, kind)] += 1

    def add_sentences(self, n: int) -> None:
        with self._lock:
            self.sentences += n

    def summary(self) -> Dict:
        return {
            "sentences": self.sentences,
            "phases": {
                k: {"total_s": round(v, 4), "count": self.counts[k]}
                for k, v in sorted(self.totals.items())
            },
            "buckets": {
                f"{b}x{s}" + (f" {kind}" if kind else ""): c
                for (b, s, kind), c in sorted(self.bucket_counts.items())
            },
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self.bucket_counts.clear()
        self.sentences = 0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device/host profile viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RooflineEstimate:
    flops: float
    weight_bytes: float
    activation_bytes: float
    sol_compute_s: float
    sol_memory_s: float
    sol_s: float
    arithmetic_intensity: float
    notes: str = ""

    def utilization(self, measured_s: float) -> float:
        return self.sol_s / measured_s if measured_s > 0 else 0.0


def roofline(config, batch: int, seq: int, *,
             quantized: bool = True,
             act_bytes_per_el: int = 2,
             peak_flops: float = V5E_BF16_FLOPS,
             peak_bw: float = V5E_HBM_BW) -> RooflineEstimate:
    """Analytic cost of one encode step at (batch, seq).

    FLOPs: QKV/out projections 4·D², FFN 2·D·F both ways, attention
    2·T·D per token for scores + context (×2 matmuls). Weight traffic:
    whole model once per step (small-batch regime lower bound); activation
    traffic: a few residual-stream passes (approximation — XLA fusion makes
    the exact count layout-dependent).
    """
    d, f, layers, t = (config.n_embd, config.n_intermediate,
                       config.n_layer, seq)
    tokens = batch * t
    per_token = layers * (4 * d * d + 2 * d * f) * 2  # matmul MACs → FLOPs
    attn = layers * 2 * (2 * t * d) * tokens  # scores + context
    flops = per_token * tokens + attn

    wbits = 4.5 if quantized else 16  # q4: 4b codes + scales overhead
    n_weights = layers * (4 * d * d + 2 * d * f)
    weight_bytes = n_weights * wbits / 8 + config.n_vocab * d * act_bytes_per_el
    act_bytes = tokens * d * act_bytes_per_el * layers * 6

    sol_c = flops / peak_flops
    sol_m = (weight_bytes + act_bytes) / peak_bw
    return RooflineEstimate(
        flops=flops,
        weight_bytes=weight_bytes,
        activation_bytes=act_bytes,
        sol_compute_s=sol_c,
        sol_memory_s=sol_m,
        sol_s=max(sol_c, sol_m),
        arithmetic_intensity=flops / max(weight_bytes + act_bytes, 1),
        notes="embedding-table traffic counted in weight_bytes; "
              "activation traffic approximated at 6 stream passes/layer",
    )
