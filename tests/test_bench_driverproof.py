"""bench.py must yield a parseable JSON result no matter WHEN it is killed
(VERDICT r3 #1: round 3's driver run timed out inside the tunnel pre-flight
and recorded nothing, because the old bench printed its one JSON line only
after every metric completed).

Three layers are covered here:
  * unit: the snapshot/LKG bookkeeping (fresh vs stale rows, idempotent
    emission, checkpoint persistence);
  * watchdog: a subprocess whose wall budget expires before ANY metric
    lands still prints a full JSON line (stale rows from the seeded
    last-known-good cache) and exits 0;
  * SIGTERM: a subprocess killed right after its first per-trial
    checkpoint prints a JSON line whose headline is FRESH (not stale).

Reference anchor: the reference's evidence standard is the measured
eval-time table at /root/reference/README.md:150-180 — a bench round that
records nothing breaks the whole claim structure.
"""

import importlib
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _bench_env(tmp_path, **extra):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",          # skip the tunnel pre-flight
        "BENCH_LKG_PATH": str(tmp_path / "lkg.json"),
        "BENCH_N_SENTENCES": "8",
        "BENCH_HEALTHY_FLOOR": "1",      # no degraded-window retry sleeps
    })
    env.update(extra)
    return env


def _parse_result(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected exactly ONE JSON line, got {lines!r}"
    return json.loads(lines[0])


# ---------------------------------------------------------------------------
# unit layer (in-process)
# ---------------------------------------------------------------------------

@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_LKG_PATH", str(tmp_path / "lkg.json"))
    sys.path.insert(0, REPO)
    import bench

    mod = importlib.reload(bench)  # re-run module init under the new env
    yield mod
    importlib.reload(bench)


def test_snapshot_rows_fresh_vs_stale(bench_mod, capsys):
    b = bench_mod
    # nothing measured: headline comes from the BENCH_r02.json seed, stale
    row = b._metric_row(b.HEADLINE_METRIC)
    assert row["stale"] is True and row["value"] > 0
    assert "BENCH_r02" in row["measured_at"]

    # a fresh measurement replaces the stale row and keeps the max
    b.record_metric(b.HEADLINE_METRIC, 123.4)
    b.record_metric(b.HEADLINE_METRIC, 99.0)  # worse trial: keep 123.4
    row = b._metric_row(b.HEADLINE_METRIC)
    assert row["value"] == 123.4 and "stale" not in row
    assert row["vs_baseline"] == round(123.4 / 506.0, 2)

    # checkpoint landed on disk immediately (crash-safe)
    with open(os.environ["BENCH_LKG_PATH"]) as f:
        lkg = json.load(f)
    assert lkg[b.HEADLINE_METRIC]["value"] == 123.4
    assert "measured_at" in lkg[b.HEADLINE_METRIC]

    # errors only annotate metrics that never landed this run
    b.record_error(b.HEADLINE_METRIC, "boom")        # ignored: measured
    b.record_error("sentences_per_sec_bert_base_q4_0", "skipped: budget")
    row = b._metric_row("sentences_per_sec_bert_base_q4_0")
    assert row["stale"] is True and row["this_run_error"] == "skipped: budget"

    # emission is idempotent: exactly one line, ever
    b.emit_snapshot()
    b.emit_snapshot()
    out = capsys.readouterr().out
    parsed = _parse_result(out)
    assert parsed["metric"] == b.HEADLINE_METRIC
    assert parsed["value"] == 123.4
    names = [m["metric"] for m in parsed["extra_metrics"]]
    assert names == b.EXTRA_ORDER  # full sweep always present


def test_record_metric_refuses_invalid_values(bench_mod):
    """A contended/degraded measurement (negative slope, NaN) must never
    land in the LKG — observed r4: two concurrent benches produced
    -94996/s which the old max(value, prev) clamped to 0.0, clobbering the
    other run's real row."""
    b = bench_mod
    m = "device_side_sentences_per_sec_bge_large_q4_0"
    for bad in (-94996.2, 0.0, float("nan"), float("inf"), -1):
        b.record_metric(m, bad)
    assert m not in b._MEASURED
    assert "invalid value" in b._ERRORS[m]
    # on disk: nothing fresh was stored for the metric
    if os.path.exists(os.environ["BENCH_LKG_PATH"]):
        with open(os.environ["BENCH_LKG_PATH"]) as f:
            assert m not in json.load(f)
    # a real value still lands (and clears the error)
    b.record_metric(m, 9149.5)
    assert b._MEASURED[m]["value"] == 9149.5
    assert m not in b._ERRORS
    # and a later invalid value cannot degrade it
    b.record_metric(m, -5.0)
    assert b._MEASURED[m]["value"] == 9149.5


def test_lkg_loader_drops_poisoned_rows(tmp_path, monkeypatch):
    """Rows a past buggy/contended run wrote with value<=0 (or garbage
    shapes) are filtered at load AND backfilled from the BENCH_r02.json
    seed (ADVICE r4: a fully poisoned cache must degrade to traceable
    seeded values, not to an empty dict / 0.0 snapshot rows)."""
    lkg = tmp_path / "lkg.json"
    lkg.write_text(json.dumps({
        "good": {"value": 123.0, "unit": "sentences/s"},
        # poison the HEADLINE metric too: it must come back from the seed
        "sentences_per_sec_minilm_l6_q4_0":
            {"value": 0.0, "unit": "sentences/s"},
        "neg": {"value": -94996.2, "unit": "sentences/s"},
        "shape": ["not", "a", "row"],
    }))
    monkeypatch.setenv("BENCH_LKG_PATH", str(lkg))
    sys.path.insert(0, REPO)
    import bench

    mod = importlib.reload(bench)
    # valid on-disk rows survive; poisoned/garbage rows are gone
    assert mod._LKG["good"]["value"] == 123.0
    assert "neg" not in mod._LKG and "shape" not in mod._LKG
    # the poisoned headline row fell back to the seed, not 0.0
    head = mod._LKG[mod.HEADLINE_METRIC]
    assert head["value"] > 0
    assert "BENCH_r02" in head["measured_at"]
    importlib.reload(bench)


def test_singleton_lock_excludes_second_instance(bench_mod, tmp_path):
    """Two bench processes must never time each other instead of the chip:
    while another holder owns the flock, acquire waits and gives up (False)
    when the wall budget runs out; once released it acquires (True)."""
    import fcntl

    b = bench_mod
    holder = open(b._lkg_path() + ".lock", "w")
    fcntl.flock(holder, fcntl.LOCK_EX | fcntl.LOCK_NB)
    # budget nearly spent → the waiter must bail out quickly with False
    b.BUDGET_S = (time.time() - b.T_START) + b.WATCHDOG_MARGIN_S
    assert b.acquire_singleton_lock() is False
    # holder exits → a fresh attempt (with budget) acquires immediately
    fcntl.flock(holder, fcntl.LOCK_UN)
    holder.close()
    b.BUDGET_S = 10_000.0
    assert b.acquire_singleton_lock() is True


def test_lkg_seed_handles_missing_record(tmp_path, monkeypatch):
    """No LKG cache and no readable BENCH_r02.json → zero-value rows with
    an honest error, never a crash."""
    monkeypatch.setenv("BENCH_LKG_PATH", str(tmp_path / "lkg.json"))
    sys.path.insert(0, REPO)
    import bench

    mod = importlib.reload(bench)
    monkeypatch.setattr(mod, "_LKG", {})
    row = mod._metric_row(mod.HEADLINE_METRIC)
    assert row["value"] == 0.0 and "error" in row
    importlib.reload(bench)


# ---------------------------------------------------------------------------
# subprocess layer (the actual kill scenarios)
# ---------------------------------------------------------------------------

def test_watchdog_budget_expiry_emits_stale_snapshot(tmp_path):
    """Budget expires before any metric lands (the exact r3 failure shape:
    all time eaten before measurement) → still ONE parseable JSON line,
    exit 0, rows marked stale."""
    env = _bench_env(tmp_path, BENCH_MAX_WALL_S="21")  # margin 20 → ~1s
    out = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    parsed = _parse_result(out.stdout)
    assert parsed["metric"] == "sentences_per_sec_minilm_l6_q4_0"
    assert parsed.get("stale") is True          # nothing measured this run
    assert parsed["value"] > 0                   # seeded from BENCH_r02.json
    assert "watchdog" in out.stderr


def test_sigterm_after_first_checkpoint_keeps_fresh_headline(tmp_path):
    """Kill bench mid-run, right after its first per-trial checkpoint: the
    emitted line must carry the FRESH headline value, not the stale seed."""
    env = _bench_env(tmp_path, BENCH_STAGES="headline")
    proc = subprocess.Popen(
        [sys.executable, BENCH], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)
    try:
        # reader thread + Event: a bench that wedges SILENTLY (no stderr
        # at all) must FAIL this test at the deadline, not hang it — a
        # bare `for line in proc.stderr` blocks forever in readline
        import threading

        saw_checkpoint = threading.Event()

        def scan():
            for line in proc.stderr:
                if "[checkpoint]" in line:
                    saw_checkpoint.set()
                    return

        t = threading.Thread(target=scan, daemon=True)
        t.start()
        assert saw_checkpoint.wait(timeout=300), "no checkpoint within 300s"
        proc.send_signal(signal.SIGTERM)
        stdout, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0
    parsed = _parse_result(stdout)
    assert parsed["metric"] == "sentences_per_sec_minilm_l6_q4_0"
    assert "stale" not in parsed, "headline should be fresh, not LKG"
    assert parsed["value"] > 0
    # the fresh value also hit the LKG cache before the kill
    with open(env["BENCH_LKG_PATH"]) as f:
        lkg = json.load(f)
    assert lkg["sentences_per_sec_minilm_l6_q4_0"]["value"] == parsed["value"]
