"""Drift guard for the generated headline docs (VERDICT r4 #2).

Round 4 shipped three hand-maintained copies of the headline numbers that
diverged ~7% (README 21,332 vs BENCH_r04's 21,806.7; PERF "~147k" vs
137.9k). The fix: README's headline block and PERF.md's model table are
GENERATED from benchmarks/results/headline_metrics.json by
benchmarks/render_headline.py, and this test fails the suite whenever a
hand edit (or a forgotten re-render after a bench run) makes the
committed docs drift from the generator's output."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks",
                                      "render_headline.py"), *args],
        capture_output=True, text=True, cwd=REPO)


def test_committed_docs_match_generator():
    out = _run("--check")
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "match the generator" in out.stdout


def test_snapshot_numbers_are_the_rendered_numbers():
    """The README block must carry the snapshot's exact headline value
    (comma-formatted, zero decimals) — the r4 drift class."""
    with open(os.path.join(REPO, "benchmarks", "results",
                           "headline_metrics.json")) as f:
        snap = json.load(f)
    head = snap["metrics"]["sentences_per_sec_minilm_l6_q4_0"]["value"]
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    assert f"**{head:,.0f} sentences/s**" in readme


def test_check_detects_hand_edit(tmp_path):
    """--check must fail when the generated block is hand-edited."""
    import re
    import shutil

    # work on copies: patch the module's path constants via env-free CLI
    # is not possible, so exercise the splice/check logic in-process
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    import render_headline as rh

    readme_copy = tmp_path / "README.md"
    perf_copy = tmp_path / "PERF.md"
    shutil.copy(rh.README, readme_copy)
    shutil.copy(rh.PERF, perf_copy)
    text = readme_copy.read_text()
    drifted = re.sub(r"\*\*([\d,]+) sentences/s\*\*",
                     "**99,999 sentences/s**", text, count=1)
    assert drifted != text
    readme_copy.write_text(drifted)

    old_readme, old_perf = rh.README, rh.PERF
    old_argv = sys.argv
    try:
        rh.README, rh.PERF = str(readme_copy), str(perf_copy)
        sys.argv = ["render_headline.py", "--check"]
        try:
            rh.main()
            raise AssertionError("--check passed on a hand-edited block")
        except SystemExit as exc:
            assert exc.code == 1
    finally:
        rh.README, rh.PERF = old_readme, old_perf
        sys.argv = old_argv


def test_check_covers_latency_sweep_tables(tmp_path):
    """The PERF.md latency-sweep tables are generator-owned too (round 5):
    --check must fail when a sweep table row is hand-edited."""
    import re
    import shutil

    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    import render_headline as rh

    readme_copy = tmp_path / "README.md"
    perf_copy = tmp_path / "PERF.md"
    shutil.copy(rh.README, readme_copy)
    shutil.copy(rh.PERF, perf_copy)
    text = perf_copy.read_text()
    begin = rh.BEGIN.format(tag="latency-tpu")
    assert begin in text, "latency-tpu markers missing from PERF.md"
    block_start = text.index(begin)
    # flip one digit inside the generated TPU table
    m = re.search(r"\| (\d+\.\d+) \|", text[block_start:])
    assert m
    pos = block_start + m.start(1)
    drifted = text[:pos] + "9999.9" + text[pos + len(m.group(1)):]
    perf_copy.write_text(drifted)

    old_readme, old_perf = rh.README, rh.PERF
    old_argv = sys.argv
    try:
        rh.README, rh.PERF = str(readme_copy), str(perf_copy)
        sys.argv = ["render_headline.py", "--check"]
        try:
            rh.main()
            raise AssertionError("--check passed on a hand-edited "
                                 "latency table")
        except SystemExit as exc:
            assert exc.code == 1
    finally:
        rh.README, rh.PERF = old_readme, old_perf
        sys.argv = old_argv
