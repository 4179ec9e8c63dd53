"""Drift + splice guard for the CPU<->TPU quality delta block (round 5).

docs/MTEB.md's Tier 2.5-TPU tables are GENERATED from the committed
result JSONs by benchmarks/quality_delta.py --write-docs (same anti-drift
contract as render_headline.py). This test fails the suite when a hand
edit — or a results regeneration without a re-render — makes the
committed block drift from the generator's output, and unit-tests the
splice/gate mechanics on scratch files."""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import quality_delta  # noqa: E402


def _committed_block():
    with open(quality_delta.MTEB_MD) as f:
        doc = f.read()
    assert quality_delta.BEGIN in doc and quality_delta.END in doc
    return doc.split(quality_delta.BEGIN, 1)[1].split(
        quality_delta.END, 1)[0].strip()


def test_committed_block_matches_generator():
    scores = quality_delta.load_scores()
    models, lines, _, _ = quality_delta.render(scores, threshold=0.005)
    assert models, "no @tpu result dirs — the TPU tier went missing"
    assert _committed_block() == "\n".join(lines).rstrip(), (
        "docs/MTEB.md quality-delta block drifted from the generator — "
        "run: python benchmarks/quality_delta.py --write-docs")


def test_write_docs_splices_and_is_idempotent(tmp_path, monkeypatch):
    doc = tmp_path / "MTEB.md"
    doc.write_text("before\n" + quality_delta.BEGIN + "\nstale\n" +
                   quality_delta.END + "\nafter\n")
    monkeypatch.setattr(quality_delta, "MTEB_MD", str(doc))
    quality_delta.write_docs(["| a |", "| b |"])
    first = doc.read_text()
    assert "stale" not in first
    assert first.startswith("before\n") and first.endswith("\nafter\n")
    assert "| a |\n| b |" in first
    quality_delta.write_docs(["| a |", "| b |"])
    assert doc.read_text() == first


def test_write_docs_requires_markers(tmp_path, monkeypatch):
    doc = tmp_path / "MTEB.md"
    doc.write_text("no markers here\n")
    monkeypatch.setattr(quality_delta, "MTEB_MD", str(doc))
    with pytest.raises(SystemExit):
        quality_delta.write_docs(["| a |"])


def test_gate_flags_above_threshold():
    scores = {
        ("m", "cpu"): {"q4_0": {"T": 0.70}},
        ("m", "tpu"): {"q4_0": {"T": 0.72}},
    }
    models, lines, worst, flagged = quality_delta.render(scores, 0.005)
    assert models == ["m"]
    assert worst == pytest.approx(0.02)
    assert flagged == [("m", "q4_0", "T", pytest.approx(0.02))]
    assert any("⚠" in ln for ln in lines)


def test_gate_passes_within_threshold():
    scores = {
        ("m", "cpu"): {"f32": {"T": 0.700}},
        ("m", "tpu"): {"f32": {"T": 0.701}},
    }
    _, lines, worst, flagged = quality_delta.render(scores, 0.005)
    assert not flagged
    assert worst == pytest.approx(0.001)
    assert not any("⚠" in ln for ln in lines)
