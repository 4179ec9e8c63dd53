"""Probe-compiled Mosaic envelope (ops/mosaic_probe.py, VERDICT r2 #1).

The table of measured verdicts (ops/fused_attention.fused_attn_table) is
only trusted on the toolchains it was measured on; these tests pin the
machinery around it: probe dispatch, persistent caching, the canary
environment guard, and fallback routing when a shape is unsupported —
all with the probe subprocess monkeypatched (CPU suite; the real
subprocess compile is exercised by the TPU gate / a toolchain bump).
"""

import jax
import jax.numpy as jnp
import pytest

from bert_tpu.ops import mosaic_probe as mp
from bert_tpu.ops.fused_attention import (
    fused_attn_supported,
    fused_attn_table,
    pick_head_chunk,
)


@pytest.fixture(autouse=True)
def fresh_state(tmp_path, monkeypatch):
    monkeypatch.setenv("BERT_TPU_CACHE_DIR", str(tmp_path))
    mp.reset_for_tests()
    yield
    mp.reset_for_tests()


@pytest.fixture
def on_tpu(monkeypatch):
    """Make mosaic_probe believe it runs on a TPU backend."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def _fake_toolchain(monkeypatch, key="jax9.9.9-test-toolchain"):
    monkeypatch.setattr(mp, "_toolchain", key)


def test_cpu_backend_uses_table():
    # the whole suite runs on CPU: supported() must equal the table with
    # no probe subprocess involved
    assert fused_attn_supported(128, 12, 32, jnp.bfloat16) == \
        fused_attn_table(128, 12, 32, jnp.bfloat16)
    assert fused_attn_supported(512, 16, 64, jnp.bfloat16) == \
        fused_attn_table(512, 16, 64, jnp.bfloat16)


def test_measured_toolchain_trusts_table_true_probes_false(on_tpu,
                                                           monkeypatch):
    _fake_toolchain(monkeypatch, mp.MEASURED_TOOLCHAINS[0])
    calls = []

    def fake_probe(*a):
        calls.append(a)
        return True

    monkeypatch.setattr(mp, "_run_probe", fake_probe)
    # table-True on the measured toolchain: answered with zero probe cost
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is True
    assert calls == []
    # table-False: PROBED — the conservative table can be overridden by a
    # real compile verdict (the reclaim path, round-3 finding)
    assert fused_attn_supported(512, 16, 32, jnp.bfloat16) is True
    assert any(a[:3] == (512, 16, 32) for a in calls)


def test_unknown_toolchain_probes_and_caches(on_tpu, monkeypatch, tmp_path):
    _fake_toolchain(monkeypatch)
    calls = []

    def fake_probe(seq, n_head, d_head, dtype_name, pairwise):
        calls.append((seq, n_head, d_head))
        return (seq, n_head, d_head) == mp._CANARY[:3] or seq <= 128

    monkeypatch.setattr(mp, "_run_probe", fake_probe)
    # measured-table says True for (512,12,32,bf16); the new toolchain's
    # probe says no → must be False (mis-routing fixed, not inherited)
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is False
    assert fused_attn_supported(128, 12, 32, jnp.bfloat16) is True
    n_calls = len(calls)
    # repeat: served from memory, no new probes
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is False
    assert len(calls) == n_calls

    # fresh process (reset): served from the persistent cache
    mp.reset_for_tests()
    _fake_toolchain(monkeypatch)
    calls2 = []
    monkeypatch.setattr(mp, "_run_probe",
                        lambda *a, **k: calls2.append(a) or True)
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is False
    assert calls2 == []
    assert (tmp_path / "mosaic_envelope.json").exists()


def test_probe_miss_routes_to_fallback(on_tpu, monkeypatch):
    """A shape the new toolchain cannot compile must route to the
    per-(batch, head) kernel (pick_head_chunk → None/smaller chunk), not
    crash — the VERDICT r2 'done when' condition."""
    _fake_toolchain(monkeypatch)
    monkeypatch.setattr(
        mp, "_run_probe",
        lambda seq, h, dh, dt, pw: (seq, h, dh) == mp._CANARY[:3])
    # nothing compiles on this fake toolchain → no fused route at all
    assert pick_head_chunk(512, 16, 64, jnp.bfloat16) is None
    # engine still functions: model.py simply takes the unfused branch
    from bert_tpu.ops.attention import multi_head_attention  # noqa: F401


def test_canary_failure_falls_back_to_table(on_tpu, monkeypatch, tmp_path):
    """Broken probe environment (device busy / tunnel outage): verdicts
    would be garbage, so the measured table stays authoritative and
    nothing is cached."""
    _fake_toolchain(monkeypatch)
    monkeypatch.setattr(mp, "_run_probe", lambda *a, **k: False)
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is \
        fused_attn_table(512, 12, 32, jnp.bfloat16)
    # canary verdict (False) must not have been persisted as a shape verdict
    assert mp._load_disk_cache() == {}


def test_transient_probe_failure_not_cached(on_tpu, monkeypatch):
    _fake_toolchain(monkeypatch)

    def flaky(seq, h, dh, dt, pw):
        if (seq, h, dh) == mp._CANARY[:3]:
            return True
        return None  # timeout / env failure

    monkeypatch.setattr(mp, "_run_probe", flaky)
    # transient failure → table fallback, nothing cached
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is \
        fused_attn_table(512, 12, 32, jnp.bfloat16)
    key = mp._shape_key(512, 12, 32, "bfloat16", False)
    assert key not in mp._load_disk_cache()
    # recovery: next call probes again and gets a real verdict (the canary
    # must keep passing or the False would be discarded as environmental)
    monkeypatch.setattr(
        mp, "_run_probe",
        lambda seq, h, dh, dt, pw: (seq, h, dh) == mp._CANARY[:3])
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is False


def test_false_verdict_requires_live_canary(on_tpu, monkeypatch):
    """A compile FAILURE observed while the environment is dying (tunnel
    drop mid-probe looks identical to a Mosaic rejection) must not be
    cached: the fresh canary recheck discards it and routes by table."""
    _fake_toolchain(monkeypatch)
    stage = {"canary_done": False}

    def probe(seq, h, dh, dt, pw):
        if (seq, h, dh) == mp._CANARY[:3]:
            if not stage["canary_done"]:
                stage["canary_done"] = True  # initial canary: healthy
                return True
            return False  # recheck: environment has died
        return False  # the shape "failed to compile"

    monkeypatch.setattr(mp, "_run_probe", probe)
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is \
        fused_attn_table(512, 12, 32, jnp.bfloat16)
    key = mp._shape_key(512, 12, 32, "bfloat16", False)
    assert key not in mp._load_disk_cache()  # garbage verdict not persisted


def test_cached_verdict_outranks_measured_table(on_tpu, monkeypatch):
    """An explicit cached verdict (e.g. recorded via BERT_TPU_MOSAIC_PROBE=
    force) must be honored on the measured toolchain too — the table-True
    short-circuit may not shadow a real observed compile failure."""
    _fake_toolchain(monkeypatch, mp.MEASURED_TOOLCHAINS[0])
    key = mp._shape_key(512, 12, 32, "bfloat16", False)
    assert fused_attn_table(512, 12, 32, jnp.bfloat16) is True
    mp._store_verdict(key, False)
    boom = lambda *a, **k: (_ for _ in ()).throw(AssertionError("probed"))
    monkeypatch.setattr(mp, "_run_probe", boom)
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is False


def test_run_probe_classifies_environment_failures(monkeypatch):
    """Child died BEFORE the compile step (no READY marker): environmental
    → None. Died after READY: definitive compile failure → False."""
    import subprocess as sp

    class R:
        def __init__(self, stdout, rc):
            self.stdout, self.stderr, self.returncode = stdout, "boom", rc

    monkeypatch.setattr(sp, "run", lambda *a, **k: R("", 1))
    assert mp._run_probe(128, 12, 32, "bfloat16", False) is None
    monkeypatch.setattr(sp, "run",
                        lambda *a, **k: R("MOSAIC_PROBE_READY\n", 1))
    assert mp._run_probe(128, 12, 32, "bfloat16", False) is False
    monkeypatch.setattr(
        sp, "run",
        lambda *a, **k: R("MOSAIC_PROBE_READY\nMOSAIC_PROBE_OK\n", 0))
    assert mp._run_probe(128, 12, 32, "bfloat16", False) is True


def test_probe_disabled_env(on_tpu, monkeypatch):
    _fake_toolchain(monkeypatch)
    monkeypatch.setenv("BERT_TPU_MOSAIC_PROBE", "0")
    boom = lambda *a, **k: (_ for _ in ()).throw(AssertionError("probed"))
    monkeypatch.setattr(mp, "_run_probe", boom)
    assert fused_attn_supported(512, 12, 32, jnp.bfloat16) is \
        fused_attn_table(512, 12, 32, jnp.bfloat16)


def test_pairwise_keyed_separately(on_tpu, monkeypatch):
    _fake_toolchain(monkeypatch)
    seen = []

    def fake_probe(seq, h, dh, dt, pw):
        seen.append((seq, h, dh, pw))
        return True

    monkeypatch.setattr(mp, "_run_probe", fake_probe)
    fused_attn_supported(256, 12, 32, jnp.bfloat16, pairwise=False)
    fused_attn_supported(256, 12, 32, jnp.bfloat16, pairwise=True)
    probed = [s for s in seen if s[:3] != mp._CANARY[:3]]
    assert (256, 12, 32, False) in probed and (256, 12, 32, True) in probed


def test_envelope_report_shape():
    rep = mp.envelope_report()
    assert {"toolchain", "measured", "probe_mode",
            "cached_verdicts"} <= set(rep)


def test_pairwise_never_short_circuits_measured_table(on_tpu, monkeypatch):
    """The measured envelope was built with KEY-SIDE bias shapes; a packed
    (pairwise) config has a (g,t,t) bias block the table never measured —
    it must probe-compile even on the measured toolchain (review r4)."""
    _fake_toolchain(monkeypatch, mp.MEASURED_TOOLCHAINS[0])
    calls = []

    def fake_probe(seq, n_head, d_head, dtype_name, pairwise):
        calls.append((seq, n_head, d_head, pairwise))
        return False  # suppose the bigger bias block does NOT compile

    monkeypatch.setattr(mp, "_run_probe", fake_probe)
    monkeypatch.setattr(mp, "_canary_ok", lambda: True)
    monkeypatch.setattr(mp, "_recheck_canary", lambda: True)
    # table-True shape: key-side short-circuits with zero probes...
    assert fused_attn_supported(256, 16, 64, jnp.bfloat16) is True
    assert calls == []
    # ...but the SAME shape pairwise must probe and honor the verdict
    assert fused_attn_supported(256, 16, 64, jnp.bfloat16,
                                pairwise=True) is False
    assert calls == [(256, 16, 64, True)]
    # and the pairwise verdict is cached (no second probe)
    assert fused_attn_supported(256, 16, 64, jnp.bfloat16,
                                pairwise=True) is False
    assert len(calls) == 1


def test_probe_force_run_accounting(on_tpu, monkeypatch, tmp_path):
    """benchmarks/probe_force_run.py: per-probe timing, drift detection,
    and the report shape — with the child compile stubbed (the real run
    is a chip-session artifact, benchmarks/results/probe_force.json)."""
    import benchmarks.probe_force_run as pfr

    _fake_toolchain(monkeypatch)
    monkeypatch.setenv("BERT_TPU_MOSAIC_PROBE", "force")
    # table says MiniLM (H12/dh32) is fused at EVERY bucket; a stub that
    # fails T=512 must therefore show up as routing drift
    monkeypatch.setattr(
        mp, "_run_probe",
        lambda seq, n_head, d_head, dtype_name, pairwise: seq < 512)
    out = tmp_path / "probe_force.json"
    monkeypatch.setattr(
        "sys.argv",
        ["probe_force_run.py", "--families", "minilm", "--skip-pairwise",
         "--out", str(out)])
    assert pfr.main() == 0

    import json as _json
    report = _json.loads(out.read_text())
    assert report["probe_mode"] == "force"
    assert len(report["rows"]) == len(pfr.BUCKETS)
    drift = report["routing_drift_vs_table"]
    assert [(r["seq"], r["table"], r["probed"]) for r in drift] == \
        [(512, True, False)]
    # every row paid a real (stubbed) child probe, each with a wall time
    assert report["child_probes_run"] >= len(pfr.BUCKETS)
    assert all(p["wall_s"] >= 0 for p in report["probes"])
    assert report["probe_wall_s"]["total"] >= 0
