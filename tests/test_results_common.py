"""Unit tests for benchmarks/results_common.py — the ONE copy of score
extraction, result-dir parsing, and marker splicing that print_tables,
quality_delta, and render_headline all share (review r5: their private
copies had already diverged)."""
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from results_common import (  # noqa: E402
    extract_score,
    splice_markers,
    split_model_mode,
)


def test_extract_score_sts_and_classification(tmp_path):
    sts = tmp_path / "sts.json"
    sts.write_text(json.dumps({"test": {
        "cos_sim": {"spearman": 0.8175, "pearson": 0.81},
        "evaluation_time": 5.45}}))
    assert extract_score(str(sts)) == (0.8175, 5.45)

    clf = tmp_path / "clf.json"
    clf.write_text(json.dumps({"test": {
        "main_score": 0.3911, "evaluation_time": 10.63}}))
    assert extract_score(str(clf)) == (0.3911, 10.63)

    # flat layout (no "test" wrapper) and a cos_sim without spearman
    flat = tmp_path / "flat.json"
    flat.write_text(json.dumps({"cos_sim": {"pearson": 0.5},
                                "main_score": 0.42}))
    assert extract_score(str(flat)) == (0.42, None)


def test_split_model_mode_longest_suffix_wins():
    modes = ("sbert-batchless", "sbert", "q4_0", "q4_1", "f32", "f16")
    assert split_model_mode("minilm-l6_q4_0", modes) == ("minilm-l6", "q4_0")
    assert split_model_mode("m_sbert-batchless", modes) == \
        ("m", "sbert-batchless")
    assert split_model_mode("fixture@tpu_f16", modes) == \
        ("fixture@tpu", "f16")
    assert split_model_mode("no-known-mode_int8", modes) is None


def test_splice_markers_roundtrip_and_missing(tmp_path):
    doc = tmp_path / "doc.md"
    doc.write_text("head\n<!-- B -->\nold body\n<!-- E -->\ntail\n")
    assert splice_markers(str(doc), "<!-- B -->", "<!-- E -->", "new body")
    assert doc.read_text() == \
        "head\n<!-- B -->\nnew body\n<!-- E -->\ntail\n"
    # idempotent: same body → no change reported
    assert not splice_markers(str(doc), "<!-- B -->", "<!-- E -->",
                              "new body")
    with pytest.raises(SystemExit):
        splice_markers(str(doc), "<!-- MISSING -->", "<!-- E -->", "x")
