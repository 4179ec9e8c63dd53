"""Golden-embedding regression anchor (VERDICT r1 #5): the committed
fixtures in tests/goldens/ must be bit-tolerance-stable across rounds.

A failing test here means model numerics CHANGED — either a bug, or a
deliberate kernel/precision change that must be acknowledged by re-running
`python tests/make_goldens.py` and committing the new fixtures."""

import os

import numpy as np
import pytest

from make_goldens import GOLDEN_DIR, compute_goldens

GOLDEN_PATH = os.path.join(GOLDEN_DIR, "fixture_embeddings.npz")

# f32 paths must reproduce almost exactly on the same backend; bf16 CPU
# emulation gets a little room for op-reordering across jax releases.
TOLS = {"f32": 2e-5, "q4_0": 2e-5, "q4_1": 2e-5, "bf16": 5e-3}


@pytest.fixture(scope="module")
def current():
    return compute_goldens()


def test_goldens_exist():
    assert os.path.exists(GOLDEN_PATH), \
        "run python tests/make_goldens.py and commit tests/goldens/"


@pytest.mark.parametrize("variant", ["f32", "q4_0", "q4_1", "bf16"])
def test_embeddings_match_goldens(current, variant):
    with np.load(GOLDEN_PATH) as z:
        golden = z[variant]
        np.testing.assert_array_equal(current["token_ids"], z["token_ids"])
    np.testing.assert_allclose(current[variant], golden, atol=TOLS[variant],
                               err_msg=f"{variant} numerics drifted — if "
                               "deliberate, regenerate tests/goldens/")


def test_variants_are_distinct(current):
    """Sanity: the four variants are genuinely different computations."""
    assert np.abs(current["f32"] - current["q4_0"]).max() > 1e-4
    assert np.abs(current["q4_0"] - current["q4_1"]).max() > 1e-4


def test_golden_sensitivity():
    """The anchor actually trips on a small deliberate perturbation."""
    with np.load(GOLDEN_PATH) as z:
        g = z["f32"]
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(g + 1e-3, g, atol=TOLS["f32"])
