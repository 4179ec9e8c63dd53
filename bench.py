"""Headline benchmark: sentences/s on all-MiniLM-L6-v2 Q4_0, single chip,
plus a model sweep (MiniLM-L12, bert-base, bge-large) matching BASELINE.md's
model sections.

Mirrors the reference's benchmark protocol (benchmarks/run_mteb.py measures
wall time for embedding the MTEB STSBenchmark test split: 1,379 pairs =
2,758 sentences, tokenization included; README.md:155 → 5.45 s ≈ 506
sentences/s on the reference CPU at 6 threads). Here: the same number of
sentences with an STSB-like length distribution, end-to-end through
BertTPU.encode_batch (host tokenization + bucketed batching + TPU eval).

Prints ONE JSON line (the headline MiniLM-L6 metric, sweep under
"extra_metrics") — and is DRIVER-PROOF (VERDICT r3 #1): round 3 recorded
nothing because the driver's timeout killed the old all-or-nothing script
while it waited out a tunnel degradation window. Now:

  * every metric is checkpointed to a last-known-good cache the moment it
    lands (~/.cache/bert_tpu/bench_lkg.json, seeded from the committed
    BENCH_r02.json if absent);
  * a watchdog thread enforces a hard wall budget (BENCH_MAX_WALL_S,
    default 1380 s — under the driver's observed ~1800 s timeout) and, on
    expiry, prints the cumulative snapshot and exits 0 — even if the main
    thread is blocked inside a device call;
  * SIGTERM/SIGINT do the same, so `timeout`-style kills still yield a
    parseable line;
  * metrics not measured this run are filled from the LKG cache with
    "stale": true and their original timestamp — a reader can always tell
    a fresh number from a carried one;
  * the tunnel pre-flight and all retry sleeps are clamped to the budget.

No network: models are shape-identical with seeded random weights
quantized to Q4_0 through the full ggml-bin file path (write → load →
repack), and sentences are sampled from the fixture vocabulary. Compute
cost is identical to the real checkpoints at these shapes.

Env knobs (all optional):
  BENCH_MAX_WALL_S     hard wall budget, seconds (default 1380)
  BENCH_TUNNEL_WAIT_S  max pre-flight tunnel wait (default 480, clamped)
  BENCH_HEALTHY_FLOOR  sentences/s below which a trial counts as degraded
  BENCH_N_SENTENCES    corpus size (default 2758 = STSB test split)
  BENCH_STAGES         csv subset of stages to run (default: all) —
                       headline,int8wire,streaming,device,sweep
"""

import json
import math
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

import numpy as np

# reference CPU q4_0 STSB rates (BASELINE.md / SURVEY.md §6): 2758 / time
BASELINE_SENTENCES_PER_SEC = 506.0   # MiniLM-L6:  2758 / 5.45 s
BASELINE_L12 = 2758 / 11.27          # ≈ 245/s
BASELINE_BASE = 2758 / 33.93         # ≈ 81/s
# bge-large has no reference row (the reference never benchmarked an
# H=16/D=1024/24L model); bert-base's 81/s is the CONSERVATIVE comparator
# (a ~3.6x-larger model would run the reference strictly slower), per
# VERDICT r2 #5.
BASELINE_BGE_LARGE = BASELINE_BASE

HEADLINE_METRIC = "sentences_per_sec_minilm_l6_q4_0"

MODELS = {
    # name → (n_embd, n_intermediate, n_head, n_layer, baseline)
    "minilm_l6": (384, 1536, 12, 6, BASELINE_SENTENCES_PER_SEC),
    "minilm_l12": (384, 1536, 12, 12, BASELINE_L12),
    "bert_base": (768, 3072, 12, 12, BASELINE_BASE),
    "bge_large": (1024, 4096, 16, 24, BASELINE_BGE_LARGE),
}

BASELINE_BY_METRIC = {
    HEADLINE_METRIC: BASELINE_SENTENCES_PER_SEC,
    "sentences_per_sec_minilm_l12_q4_0": BASELINE_L12,
    "sentences_per_sec_bert_base_q4_0": BASELINE_BASE,
    "sentences_per_sec_bge_large_q4_0": BASELINE_BGE_LARGE,
    "sentences_per_sec_minilm_l6_q4_0_int8wire": BASELINE_SENTENCES_PER_SEC,
    "streaming_sentences_per_sec_minilm_l6_q4_0": BASELINE_SENTENCES_PER_SEC,
    "device_side_sentences_per_sec_minilm_l6_q4_0":
        BASELINE_SENTENCES_PER_SEC,
    "device_side_sentences_per_sec_minilm_l12_q4_0": BASELINE_L12,
    "device_side_sentences_per_sec_bert_base_q4_0": BASELINE_BASE,
    "device_side_sentences_per_sec_bge_large_q4_0": BASELINE_BGE_LARGE,
}
# emission order for extra_metrics (headline excluded)
EXTRA_ORDER = [m for m in BASELINE_BY_METRIC if m != HEADLINE_METRIC]

# rows-per-batch used by the device-side slope measurement per family —
# shared with benchmarks/render_headline.py, which derives the per-batch
# device step (rows / sentences-per-sec) for the PERF.md model table
DEVICE_ROWS = {"minilm_l6": 512, "minilm_l12": 512,
               "bert_base": 512, "bge_large": 128}
# wall-budget estimate per family for one device-side measurement,
# seconds (build + compile + slope run on a healthy tunnel). Keyed —
# never zipped positionally against DEVICE_ROWS (review r5: reordering
# or extending the dict would silently misassign budgets).
DEVICE_EST_S = {"minilm_l6": 60, "minilm_l12": 90,
                "bert_base": 120, "bge_large": 240}
SWEEP_EST_S = {"minilm_l12": 90, "bert_base": 150, "bge_large": 300}


def _staleness_order(names, metric_fmt):
    """Budget-gated stages measure the family whose LKG row is OLDEST
    first: a wall squeeze then rotates across families run-to-run
    instead of always starving the most expensive tail entry (r5: the
    bge-large rows were the only ones skipped, twice in a row, because
    they sat last with the biggest estimate)."""
    def stamp(name):
        row = _LKG.get(metric_fmt.format(name=name)) or {}
        return str(row.get("measured_at", ""))

    return sorted(names, key=stamp)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# snapshot / checkpoint / watchdog machinery (VERDICT r3 #1)
# ---------------------------------------------------------------------------

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_MAX_WALL_S", "1380"))
# keep a margin so the snapshot print + interpreter teardown beat the driver
WATCHDOG_MARGIN_S = 20.0

_LOCK = threading.RLock()  # reentrant: a signal can land mid-emit
_MEASURED: dict = {}      # metric name → {"value": .., "unit": ..} (fresh)
_ERRORS: dict = {}        # metric name → error string (this run)
_EMITTED = False


def _lkg_path() -> str:
    override = os.environ.get("BENCH_LKG_PATH")
    if override:
        return override
    base = os.environ.get(
        "BERT_TPU_CACHE_DIR", os.path.expanduser("~/.cache/bert_tpu"))
    return os.path.join(base, "bench_lkg.json")


def _seed_lkg() -> dict:
    """Traceable seed rows from the committed BENCH_r02.json (the last
    driver-captured run) — the floor every LKG load falls back to."""
    seed = {}
    try:
        rec_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r02.json")
        with open(rec_path) as f:
            parsed = json.load(f)["parsed"]
        rows = [parsed] + list(parsed.get("extra_metrics", []))
        for row in rows:
            if "value" in row and "metric" in row:
                seed[row["metric"]] = {
                    "value": row["value"], "unit": row["unit"],
                    "measured_at": "BENCH_r02.json (driver round-2 run)",
                }
    except (OSError, ValueError, KeyError) as exc:
        log(f"LKG seed from BENCH_r02.json unavailable: {exc!r}")
    return seed


def _load_lkg() -> dict:
    """Last-known-good metrics measured on THIS box by a previous run.

    Starts from the BENCH_r02.json seed and overlays valid on-disk rows,
    so poisoned rows (0.0 / non-finite) fall back to traceable seeded
    values instead of vanishing (ADVICE r4: a fully poisoned cache used
    to return {} — strictly worse than the pre-cache first-run path)."""
    merged = _seed_lkg()
    try:
        with open(_lkg_path()) as f:
            raw = json.load(f)
        # drop rows a buggy/contended past run may have poisoned — a 0.0
        # "last known good" is worse than falling through to the seed
        merged.update({k: v for k, v in raw.items()
                       if isinstance(v, dict)
                       and isinstance(v.get("value"), (int, float))
                       and math.isfinite(v["value"]) and v["value"] > 0})
    except (OSError, ValueError):
        pass
    return merged


_LKG = _load_lkg()


def _store_lkg() -> None:
    path = _lkg_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        # Re-read the on-disk file at store time: _LKG is an import-time
        # snapshot, and another bench may have checkpointed fresh rows
        # while we waited on the singleton lock (ADVICE r4 medium — the
        # stale snapshot used to clobber those rows for every metric this
        # run hadn't measured yet). Disk wins over the snapshot; our own
        # fresh measurements win over everything.
        merged = dict(_LKG)
        merged.update(_load_lkg())
        merged.update(_MEASURED)  # rows carry their own measured_at stamp
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=1)
        os.replace(tmp, path)
    except OSError as exc:
        log(f"LKG store failed: {exc!r}")


def record_metric(name: str, value: float, unit: str = "sentences/s") -> None:
    """Checkpoint a finished metric IMMEDIATELY (crash-safe).

    Non-finite or non-positive values are refused: a contended/degraded
    measurement (e.g. the slope method returning a negative step when
    another process holds the chip) must never overwrite a real LKG row
    with 0.0 (observed r4: two concurrent benches → -94996/s recorded,
    clamped to 0.0, clobbering the other run's 9149.5)."""
    try:
        # coerce first: np.float32 is not a `float` subclass (unlike
        # np.float64), and a silent drop here would lose a real metric
        value = float(value)
    except (TypeError, ValueError):
        log(f"[checkpoint] REFUSED {name} = {value!r} (not coercible)")
        record_error(name, f"measurement produced invalid value {value!r}")
        return
    if not (math.isfinite(value) and value > 0):
        log(f"[checkpoint] REFUSED {name} = {value!r} (non-finite or <= 0)")
        record_error(name, f"measurement produced invalid value {value!r}")
        return
    with _LOCK:
        prev = _MEASURED.get(name, {}).get("value", 0.0)
        _MEASURED[name] = {
            "value": round(max(value, prev), 1), "unit": unit,
            # per-metric stamp at measurement time (not store time)
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _ERRORS.pop(name, None)
    _store_lkg()
    log(f"[checkpoint] {name} = {value:.1f} {unit}")


def record_error(name: str, err: str) -> None:
    with _LOCK:
        if name not in _MEASURED:
            _ERRORS[name] = err


def _metric_row(name: str) -> dict:
    base = BASELINE_BY_METRIC.get(name, BASELINE_SENTENCES_PER_SEC)
    if name in _MEASURED:
        row = dict(_MEASURED[name])
        row["vs_baseline"] = round(row["value"] / base, 2)
        return {"metric": name, **row}
    # LKG rows are user-writable (BENCH_LKG_PATH) — validate shape; a
    # malformed row must fall through to the zero row, never raise (the
    # emit path runs inside the watchdog/signal handlers)
    lkg = _LKG.get(name)
    if isinstance(lkg, dict) and isinstance(lkg.get("value"), (int, float)):
        row = {"value": lkg["value"], "unit": lkg.get("unit", "sentences/s")}
        row["vs_baseline"] = round(row["value"] / base, 2)
        row["stale"] = True
        row["measured_at"] = lkg.get("measured_at", "unknown")
        if name in _ERRORS:
            row["this_run_error"] = _ERRORS[name]
        return {"metric": name, **row}
    row = {"metric": name, "value": 0.0, "unit": "sentences/s",
           "vs_baseline": 0.0,
           "error": _ERRORS.get(name, "not measured within wall budget")}
    return row


def emit_snapshot(reason: str = "") -> None:
    """Print THE one JSON line from the current state. Idempotent — the
    first caller (main completion, watchdog, or signal handler) wins."""
    global _EMITTED
    with _LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        if reason:
            log(f"emitting snapshot ({reason}) at "
                f"t+{time.time() - T_START:.0f}s")
        head = _metric_row(HEADLINE_METRIC)
        extras = [_metric_row(m) for m in EXTRA_ORDER]
        out = dict(head)
        out["extra_metrics"] = extras
        # print under the lock so a concurrent watchdog os._exit cannot
        # truncate the line mid-write (it blocks here until we finish)
        print(json.dumps(out), flush=True)


def remaining_s() -> float:
    return BUDGET_S - (time.time() - T_START)


def _watchdog() -> None:
    while True:
        left = remaining_s() - WATCHDOG_MARGIN_S
        if left <= 0:
            # idempotent: if main already printed, this is a no-op (it
            # blocks on the emit lock until any in-flight print finishes).
            # try/finally: even if the emit itself raises (broken pipe,
            # corrupt LKG), the hard-exit MUST happen — otherwise the
            # budget is never enforced again and the r3 failure returns
            try:
                emit_snapshot("wall budget expired — watchdog")
            finally:
                # main thread may be wedged inside a device call; hard-exit
                os._exit(0)
        time.sleep(max(0.1, min(5.0, left)))


def _on_signal(signum, frame):  # noqa: ARG001
    try:
        emit_snapshot(f"signal {signum}")
    finally:
        os._exit(0)


def install_guards() -> None:
    threading.Thread(target=_watchdog, daemon=True,
                     name="bench-watchdog").start()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except (ValueError, OSError):
            pass  # non-main thread / exotic platform


_LOCK_FH = None  # module-held: the flock lives as long as the process


def acquire_singleton_lock() -> bool:
    """Exclusive advisory lock so two bench processes never share the chip.

    Two concurrent benches time each other, not the hardware (observed r4:
    interleaved runs produced a negative device-side slope and clobbered
    each other's LKG rows). Blocks (bounded by the wall budget, polled so
    the watchdog stays authoritative) until the other instance exits; the
    kernel drops the flock even on SIGKILL, so a dead holder can't wedge
    us. Returns False only if the budget ran out first — the watchdog will
    emit the LKG snapshot, which is exactly right when another bench owns
    the chip for our whole window."""
    global _LOCK_FH
    import fcntl

    path = _lkg_path() + ".lock"
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        _LOCK_FH = open(path, "w")
    except OSError as exc:
        log(f"singleton lock unavailable ({exc!r}) — proceeding unlocked")
        return True
    import errno

    waited = False
    while True:
        try:
            fcntl.flock(_LOCK_FH, fcntl.LOCK_EX | fcntl.LOCK_NB)
            if waited:
                log("singleton lock acquired after wait")
                # the other instance checkpointed rows while we waited —
                # pick them up so our first _store_lkg can't clobber them
                # with the stale import-time snapshot (ADVICE r4 medium)
                _LKG.update(_load_lkg())
            return True
        except OSError as exc:
            if exc.errno not in (errno.EWOULDBLOCK, errno.EAGAIN,
                                 errno.EACCES):
                # not contention (e.g. ENOLCK on NFS, EBADF): waiting
                # can never succeed — proceed unlocked, matching the
                # open() failure path above
                log(f"singleton flock failed ({exc!r}) — "
                    "proceeding unlocked")
                return True
            if not waited:
                log("another bench.py instance holds the chip lock — "
                    "waiting for it to exit")
                waited = True
            if remaining_s() < WATCHDOG_MARGIN_S * 2:
                log("wall budget exhausted waiting for the chip lock")
                return False
            time.sleep(2.0)


# ---------------------------------------------------------------------------
# measurement stages
# ---------------------------------------------------------------------------

def build_model_file(path: str, name: str = "minilm_l6") -> None:
    from bert_tpu.formats import GgmlHParams, write_ggml
    from bert_tpu.params import BertConfig, random_named_tensors
    from fixture_vocab import build_fixture_tokens

    d, f, h, l, _ = MODELS[name]
    cfg = BertConfig(n_vocab=30522, n_max_tokens=512, n_embd=d,
                     n_intermediate=f, n_head=h, n_layer=l)
    hp = GgmlHParams(cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd,
                     cfg.n_intermediate, cfg.n_head, cfg.n_layer, ftype=2)
    write_ggml(path, hp, build_fixture_tokens(), random_named_tensors(cfg, 0))


def synth_sentences(n: int, seed: int = 0):
    """STSB-like sentences (mean ~10 words, short captions) from the fixture
    vocab's known words."""
    from fixture_vocab import KNOWN_TOKENS

    words = [w for w in KNOWN_TOKENS
             if w.isalpha() and len(w) > 1 and not w.startswith("[")]
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.normal(10, 3, size=n).astype(int), 4, 24)
    return [" ".join(rng.choice(words, size=ln)) for ln in lens]


def measure_model(name: str, sentences, *, trials: int,
                  healthy_floor: float, retries: int,
                  metric: str, wire_dtype: str = None) -> float:
    """Best sentences/s for one model over the corpus, with tunnel-window
    retries (docs/PERF.md "Environment artifacts"). Checkpoints the metric
    after EVERY trial, so a mid-stage kill keeps the best-so-far."""
    from bert_tpu import BertTPU

    path = f"/tmp/bench_{name}_q4_0.bin"
    if not os.path.exists(path):
        t0 = time.time()
        build_model_file(path, name)
        log(f"[{name}] built model file in {time.time() - t0:.1f}s "
            f"({os.path.getsize(path) / 1e6:.1f} MB)")
    t0 = time.time()
    model = BertTPU.from_file(path, max_batch=2048, wire_dtype=wire_dtype)
    log(f"[{name}] loaded in {time.time() - t0:.1f}s"
        + (f" (wire {wire_dtype})" if wire_dtype else ""))

    t0 = time.time()
    emb = model.encode_batch(sentences)  # warm every shape (compile once)
    log(f"[{name}] warmup (compile) {time.time() - t0:.1f}s")

    best = 0.0
    for attempt in range(retries + 1):
        for trial in range(trials):
            t0 = time.time()
            emb = model.encode_batch(sentences)
            dt = time.time() - t0
            sps = len(sentences) / dt
            log(f"[{name}] trial {trial}: {dt:.3f}s → {sps:.0f} sentences/s")
            if sps > best:
                best = sps
                record_metric(metric, best)
        if best >= healthy_floor or attempt == retries:
            break
        if remaining_s() < 120:
            log(f"[{name}] degraded but budget too low to retry")
            break
        log(f"[{name}] all trials degraded (best {best:.0f}/s) — tunnel "
            "likely in a bad window, retrying in 90s")
        time.sleep(90)
    assert emb.shape == (len(sentences), model.n_embd)
    norms = np.linalg.norm(emb, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-2), "embeddings not L2-normalized"
    return best


def measure_device_side(name: str, rows: int = 512, t: int = 16) -> float:
    """Pure device-side sentences/s via the slope method (docs/PERF.md:
    block_until_ready is unreliable on tunneled hosts, so time a jitted
    lax.scan chain with a REAL data dependency between iterations and take
    Δt between two chain lengths). (rows, t) = the bucket the STSB length
    distribution actually lands in."""
    import jax
    import jax.numpy as jnp

    from bert_tpu import BertTPU
    from bert_tpu.model import bert_forward

    model = BertTPU.from_file(f"/tmp/bench_{name}_q4_0.bin")
    params, cfg = model.params, model.config
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.n_vocab, size=(rows, t),
                                   dtype=np.int32))
    mask = jnp.ones((rows, t), jnp.float32)

    def chain(n):
        # params MUST be a jit argument, not a closure capture: captured
        # arrays are inlined as HLO constants, and on this box the compile
        # request is shipped over the tunnel — bge-large's 210 MB of q4
        # codes as literals exceeds the remote_compile body limit
        # (HTTP 413, observed r4).
        def run(p):
            def body(c, _):
                ids2 = ids + (c * 1e-30).astype(jnp.int32)
                emb = bert_forward(p, ids2, mask, cfg,
                                   compute_dtype=jnp.bfloat16)
                return c + emb[0, 0].astype(jnp.float32) * 1e-30, ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return jax.jit(run)

    f_short, f_long = chain(8), chain(24)
    float(f_short(params)), float(f_long(params))  # compile + warm
    # Keep only positive slope samples: under host contention the long
    # chain can land in a faster window than the short one, producing a
    # NEGATIVE Δt (observed r4, two concurrent processes → -1.35 ms/step).
    # A couple of extra passes recover a usable sample; if every pass is
    # inverted the measurement is meaningless — raise so the caller
    # records an error instead of a garbage metric.
    step = float("inf")
    for attempt in range(6):
        t0 = time.time()
        float(f_short(params))
        t_short = time.time() - t0
        t0 = time.time()
        float(f_long(params))
        t_long = time.time() - t0
        sample = (t_long - t_short) / 16
        if sample > 0:
            step = min(step, sample)
        if attempt >= 2 and math.isfinite(step):
            break
    if not math.isfinite(step):
        raise RuntimeError(
            f"device-side slope inverted on every pass for {name} "
            "(host contention / degraded tunnel) — no valid sample")
    log(f"[{name}] device step ({rows},{t}): {step * 1e3:.2f} ms "
        f"→ {rows / step:.0f} sentences/s device-side")
    return rows / step


def wait_for_healthy_tunnel(max_wait_s: float) -> bool:
    """Block (bounded) until a raw d2h probe looks healthy.

    The axon tunnel on this box degrades 10-100x for minutes-to-hours
    roughly hourly (docs/PERF.md "Environment artifacts"); a bench run
    started inside such a window records garbage and its warmup can take
    >15 min. Probe a ~2 MB device→host transfer; healthy is <10 s
    (typical: <1 s). Returns True if healthy, False if the wait budget
    ran out (the bench proceeds anyway — the per-trial retry logic is
    the second line of defense). The wait is ALSO clamped so at least
    ~2/3 of the wall budget stays available for measuring (r3 lesson:
    the old 1800-s default ate the whole driver timeout)."""
    import subprocess

    max_wait_s = min(max_wait_s, max(0.0, remaining_s() - BUDGET_S * 2 / 3))
    probe = ("import time,jax,jax.numpy as jnp,numpy as np\n"
             "t0=time.time()\n"
             "x=jax.device_put(jnp.ones((1024,512),jnp.float32))\n"
             "x.block_until_ready()\n"
             "np.asarray(x)\n"
             "print(time.time()-t0)\n")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=min(150, max(10, deadline - time.time())))
            dt = float(out.stdout.strip().splitlines()[-1])
            # subtract nothing: dt includes the ~11s first-d2h process
            # init, so the healthy threshold is generous
            if out.returncode == 0 and dt < 30:
                log(f"tunnel probe healthy ({dt:.1f}s incl. process init)")
                return True
            log(f"tunnel probe slow ({dt:.1f}s)")
        except Exception as exc:  # noqa: BLE001 (timeout, parse, spawn)
            log(f"tunnel probe failed after {time.time() - t0:.0f}s "
                f"({type(exc).__name__}) — degradation window")
        if time.time() >= deadline:
            log(f"tunnel wait budget ({max_wait_s:.0f}s) exhausted after "
                f"{attempt} probes — proceeding degraded")
            return False
        time.sleep(min(60, max(5, deadline - time.time())))


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def _stage_enabled(stage: str) -> bool:
    sel = os.environ.get("BENCH_STAGES", "").strip()
    return not sel or stage in {s.strip() for s in sel.split(",")}


def main() -> None:
    import logging

    logging.disable(logging.WARNING)  # silence per-token unknown warnings
    install_guards()
    if not acquire_singleton_lock():
        emit_snapshot("budget spent waiting for another bench instance")
        return

    # pre-flight: don't start a bench inside a tunnel degradation window
    # (r2's L6 warmup took 1004s in one) — bounded AND budget-clamped
    if (os.environ.get("JAX_PLATFORMS", "")
            .lower().split(",")[0].strip() == "cpu"):
        # the env var alone does NOT override an installed TPU plugin
        # (same contract as tests/conftest.py and eval_common.py) — without
        # this, a "CPU" bench silently initializes the tunnel backend and
        # can sleep forever inside its retry loop
        import jax

        jax.config.update("jax_platforms",
                          os.environ["JAX_PLATFORMS"].lower())
    else:
        wait_for_healthy_tunnel(
            float(os.environ.get("BENCH_TUNNEL_WAIT_S", "480")))

    n_sent = int(os.environ.get("BENCH_N_SENTENCES", "2758"))
    sentences = synth_sentences(n_sent)
    # The "healthy" floor is for THIS tunneled box: healthy runs measure
    # 17-21k on MiniLM-L6, degraded-tunnel windows ~11k (observed: L6
    # "slower" than L12 in the same sweep — clearly environmental). Below
    # the floor the run retries after 90 s, up to the retry cap, then
    # reports the best anyway. Override via env for other environments.
    floor = float(os.environ.get("BENCH_HEALTHY_FLOOR", "14000"))

    # 1. headline FIRST — checkpointed per-trial inside measure_model
    if _stage_enabled("headline"):
        try:
            # pre-mark: if the watchdog fires mid-measurement the row says
            # so (record_metric clears this on the first completed trial)
            record_error(HEADLINE_METRIC, "in flight when budget expired")
            measure_model("minilm_l6", sentences, trials=5,
                          healthy_floor=floor, retries=2,
                          metric=HEADLINE_METRIC)
        except Exception as exc:  # noqa: BLE001
            log(f"headline measurement failed: {exc!r}")
            record_error(HEADLINE_METRIC, str(exc))

    # 2. int8 wire: the bulk-indexing deployment point — quarters the d2h
    # bytes that dominate e2e on this box (measured STS impact: +0.006
    # Spearman, noise-level — docs/PERF.md "wire dtype")
    m = "sentences_per_sec_minilm_l6_q4_0_int8wire"
    if _stage_enabled("int8wire") and remaining_s() <= 90:
        record_error(m, "skipped: wall budget")
    elif _stage_enabled("int8wire"):
        try:
            record_error(m, "in flight when budget expired")
            measure_model("minilm_l6", sentences, trials=3,
                          healthy_floor=floor, retries=1,
                          metric=m, wire_dtype="int8")
        except Exception as exc:  # noqa: BLE001
            log(f"int8-wire measurement failed: {exc!r}")
            record_error(m, str(exc))

    # 3. streaming bulk-indexing rate (engine.encode_iter): the
    # corpus-scale workload with O(depth × window) memory — should hold
    # near
    # the bulk rate
    m = "streaming_sentences_per_sec_minilm_l6_q4_0"
    if _stage_enabled("streaming") and remaining_s() <= 120:
        record_error(m, "skipped: wall budget")
    elif _stage_enabled("streaming"):
        try:
            record_error(m, "in flight when budget expired")
            from bert_tpu import BertTPU

            path = "/tmp/bench_minilm_l6_q4_0.bin"
            if not os.path.exists(path):  # standalone BENCH_STAGES=streaming
                build_model_file(path, "minilm_l6")
            model = BertTPU.from_file(path, max_batch=2048)
            big = sentences * 4  # >2 windows in flight
            list(model.encode_iter(sentences, window=2048))  # warm
            t0 = time.time()
            n_done = sum(len(b) for b in model.encode_iter(big, window=2048))
            dt = time.time() - t0
            assert n_done == len(big)
            sps = n_done / dt
            log(f"[minilm_l6] streaming {n_done} sentences in {dt:.2f}s "
                f"→ {sps:.0f}/s")
            record_metric(m, sps)
        except Exception as exc:  # noqa: BLE001
            log(f"streaming measurement failed: {exc!r}")
            record_error(m, str(exc))

    # 4. device-side rates (slope-timed, transfer-free): the per-chip
    # number the e2e figure approaches as d2h ceases to dominate
    # (docs/PERF.md). bge-large per VERDICT r2 #5 / r3 #6 (smaller row
    # block: 24 layers x D=1024 at 512 rows would make a scan step ~9s).
    if _stage_enabled("device"):
        # all four families so docs/PERF.md's model table is generated
        # end-to-end from this file's metrics (VERDICT r4 #2)
        for name in _staleness_order(
                DEVICE_ROWS, "device_side_sentences_per_sec_{name}_q4_0"):
            rows, est = DEVICE_ROWS[name], DEVICE_EST_S[name]
            m = f"device_side_sentences_per_sec_{name}_q4_0"
            if remaining_s() < est:
                log(f"device-side {name} skipped (budget)")
                record_error(m, "skipped: wall budget")
                continue
            try:
                record_error(m, "in flight when budget expired")
                if not os.path.exists(f"/tmp/bench_{name}_q4_0.bin"):
                    build_model_file(f"/tmp/bench_{name}_q4_0.bin", name)
                record_metric(m, measure_device_side(name, rows=rows))
            except Exception as exc:  # noqa: BLE001
                log(f"device-side {name} measurement failed: {exc!r}")
                record_error(m, str(exc))

    # 5. model sweep e2e (BASELINE.md's sections + the bge-large class the
    # head-chunked kernel targets) — best-effort, budget-gated per model
    if _stage_enabled("sweep"):
        for name in _staleness_order(SWEEP_EST_S,
                                     "sentences_per_sec_{name}_q4_0"):
            est = SWEEP_EST_S[name]
            m = f"sentences_per_sec_{name}_q4_0"
            if remaining_s() < est:
                log(f"sweep {name} skipped (budget)")
                record_error(m, "skipped: wall budget")
                continue
            _, _, _, _, baseline = MODELS[name]
            try:
                record_error(m, "in flight when budget expired")
                measure_model(name, sentences,
                              trials=2 if name == "bge_large" else 3,
                              healthy_floor=floor * baseline / 506.0,
                              retries=1, metric=m)
            except Exception as exc:  # noqa: BLE001
                log(f"[{name}] sweep failed: {exc!r}")
                record_error(m, str(exc))

    emit_snapshot("run complete")


if __name__ == "__main__":
    main()
