"""Results-directory plumbing (VERDICT r1 #5): eval outputs land in a
layout print_tables.py renders, including the committed example run."""

import contextlib
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import print_tables  # noqa: E402


def _render(results_dir):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_tables.main(results_dir)
    return buf.getvalue()


def test_render_synthetic_tree(tmp_path):
    d = tmp_path / "minilm_q4_0"
    d.mkdir()
    (d / "STSBenchmark.json").write_text(json.dumps({
        "test": {"cos_sim": {"spearman": 0.8175},
                 "evaluation_time": 5.45}}))
    d2 = tmp_path / "minilm_sbert"
    d2.mkdir()
    (d2 / "STSBenchmark.json").write_text(json.dumps({
        "test": {"main_score": 0.8203, "evaluation_time": 2.74}}))
    out = _render(str(tmp_path))
    assert "### minilm" in out
    assert "0.8175" in out and "5.45" in out
    assert "0.8203" in out and "sbert" in out
    # q4_0 must not be mis-split as model 'minilm_q4' mode '0'
    assert "minilm_q4" not in out


def test_committed_example_results_render():
    """The committed benchmarks/results/ example (fixture model, offline
    STS protocol — docs/MTEB.md Tier 2) renders with all three modes."""
    results = os.path.join(REPO, "benchmarks", "results")
    out = _render(results)
    assert "fixture-minilm-l6" in out
    for mode in ("f32", "q4_0", "q4_1"):
        assert f"| {mode} " in out, out
    assert "STSLocal" in out


def test_committed_results_scores_sane():
    results = os.path.join(REPO, "benchmarks", "results")
    for name in os.listdir(results):
        path = os.path.join(results, name, "STSLocal.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        rho = data["test"]["cos_sim"]["spearman"]
        assert 0.5 < rho <= 1.0, (name, rho)
