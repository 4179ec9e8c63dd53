"""Shared helpers for the benchmark result renderers.

One copy each of the score extraction, the `<model>_<mode>` result-dir
parsing, and the marker-splice logic — print_tables.py, quality_delta.py
and render_headline.py all render from the same committed artifacts, and
review r5 flagged their private copies as a drift risk.
"""
import json


def extract_score(path):
    """(score, evaluation_time) for one stored task JSON.

    The reference's extraction rule (its benchmarks/print_tables.py:17-25):
    ``cos_sim.spearman`` for STS-style results, ``main_score`` otherwise.
    """
    with open(path) as f:
        data = json.load(f)
    test = data.get("test", data)
    if "cos_sim" in test and "spearman" in test.get("cos_sim", {}):
        score = test["cos_sim"]["spearman"]
    else:
        score = test.get("main_score")
    return score, test.get("evaluation_time")


def split_model_mode(dirname, modes):
    """``<model>_<mode>`` → (model, mode) for the longest matching known
    mode suffix; None when no known mode matches. Pass modes longest
    first where one is a suffix of another."""
    for m in modes:
        if dirname.endswith("_" + m):
            return dirname[: -len(m) - 1], m
    return None


def splice_markers(path, begin, end, body):
    """Replace the ``begin``..``end`` block in ``path`` with ``body`` —
    the anti-drift contract: generated blocks are byte-identical to the
    generator's output, hand-edits inside them are overwritten. Returns
    True when the file changed; raises SystemExit when the markers are
    missing (a silent no-op would hide a broken pipeline)."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if begin not in text or end not in text:
        raise SystemExit(f"{path}: markers not found "
                         f"(expected {begin!r} ... {end!r})")
    head, rest = text.split(begin, 1)
    _, tail = rest.split(end, 1)
    new = head + begin + "\n" + body.rstrip("\n") + "\n" + end + tail
    if new == text:
        return False
    with open(path, "w", encoding="utf-8") as f:
        f.write(new)
    return True
