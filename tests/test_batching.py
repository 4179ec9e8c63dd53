"""Bucketed-batching cost model: padded-row waste is bounded and batch
buckets stay on the shared size_bucket shape set (VERDICT r1 #7)."""

import pytest

from bert_tpu.batching import (
    default_seq_buckets,
    pick_bucket,
    plan_batch_sizes,
    plan_buckets,
    size_bucket,
)


def test_size_bucket_shape_set():
    assert [size_bucket(n) for n in (1, 5, 8, 9, 33, 64)] == \
        [8, 8, 8, 16, 64, 64]
    assert size_bucket(65) == 80  # eighth-of-pow2 above 64
    assert size_bucket(100) == 112
    assert size_bucket(2, minimum=2) == 2


def test_65_splits_instead_of_pow2_padding():
    """The VERDICT case: 65 sentences with max_batch=128 must run as
    64 + a small tail, not one 128-row batch."""
    sizes = plan_batch_sizes(65, 128)
    assert sizes == [64, 1]
    assert sum(sizes) <= 80  # vs 128 before
    assert plan_batch_sizes(65, 128, min_batch=8) == [64, 8]


def test_small_remainders_do_not_oversplit():
    # 5 rows: one padded 8-bucket beats 4 + 1 (dispatch penalty)
    assert plan_batch_sizes(5, 128) == [8]
    assert plan_batch_sizes(9, 128) == [8, 1]


def test_exact_and_full_chunks():
    assert plan_batch_sizes(256, 128) == [128, 128]
    assert plan_batch_sizes(300, 128) == [128, 128, 32, 16]  # 44-row tail
    assert sum(plan_batch_sizes(300, 128)) >= 300


def test_padding_waste_bound():
    """Across all n ≤ 512: padded rows ≤ 1.35 × n + smallest bucket."""
    for max_batch in (64, 128, 512):
        for n in range(1, 513):
            sizes = plan_batch_sizes(n, max_batch)
            total = sum(sizes)
            assert total >= n
            assert total <= max(1.35 * n, n + 8), (n, max_batch, sizes)
            assert all(s <= max_batch for s in sizes)


def test_min_batch_divisibility():
    """Every batch bucket is a multiple of the DP degree."""
    for dp in (2, 4, 8):
        for n in range(1, 300):
            for s in plan_batch_sizes(n, 128, min_batch=dp):
                assert s % dp == 0, (n, dp, s)


def test_plan_buckets_groups_cover_all_indices():
    lengths = [4, 30, 12, 100, 64, 7, 7, 7, 200, 12] * 13  # 130 inputs
    buckets = default_seq_buckets(512)
    plan = plan_buckets(lengths, buckets, max_batch=64)
    seen = []
    for seq_b, batch_b, idxs in plan.groups:
        assert len(idxs) <= batch_b
        assert all(lengths[i] <= seq_b for i in idxs)
        seen.extend(idxs)
    assert sorted(seen) == list(range(len(lengths)))


def test_plan_buckets_respects_min_batch():
    plan = plan_buckets([10] * 65, [16], max_batch=128, min_batch=8)
    for _, batch_b, _ in plan.groups:
        assert batch_b % 8 == 0
    assert [g[1] for g in plan.groups] == [64, 8]


def test_min_batch_divisibility_large_dp():
    """Review finding (r2): every planned batch size must be a multiple of
    min_batch for ANY pow2 min_batch (the DP degree) — dp=32/64 included.
    The old size_bucket granularity (p//8) broke this above 64 rows."""
    for min_batch in (1, 2, 4, 8, 16, 32, 64):
        for n in list(range(1, 200)) + [256, 300, 511, 1000]:
            for max_batch in (128, 256):
                if max_batch % min_batch:
                    continue
                sizes = plan_batch_sizes(n, max_batch, min_batch)
                assert sum(sizes) >= n
                for s in sizes:
                    assert s % min_batch == 0, (n, max_batch, min_batch,
                                                sizes)
    # the reproduced cases
    assert all(s % 32 == 0 for s in plan_batch_sizes(80, 128, 32))
    assert all(s % 64 == 0 for s in plan_batch_sizes(100, 128, 64))


def test_size_bucket_respects_minimum_above_64():
    assert size_bucket(80, minimum=32) % 32 == 0
    assert size_bucket(100, minimum=64) % 64 == 0
    assert size_bucket(65, minimum=8) == 80  # unchanged small-min behavior
