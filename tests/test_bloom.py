"""Bloom filter: no false negatives ever, false-positive rate near
the design target, OR-merge equals union."""

import numpy as np

from event_deduplication_ray.functions.bloom import (
    bloom_build,
    bloom_contains,
    bloom_merge,
    bloom_params,
)


def test_no_false_negatives():
    keys = np.arange(50_000, dtype=np.int64) * 7 - 123
    m, k = bloom_params(len(keys), fpr=0.01)
    bf = bloom_build(keys, m, k)
    assert bloom_contains(bf, keys, k).all()


def test_false_positive_rate_near_target():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**62, 20_000).astype(np.int64)
    m, k = bloom_params(len(keys), fpr=0.01)
    bf = bloom_build(keys, m, k)
    probe = rng.integers(2**62, 2**63 - 1, 100_000).astype(np.int64)  # disjoint
    fpr = bloom_contains(bf, probe, k).mean()
    assert fpr < 0.02, fpr       # 2x the 1% design point


def test_merge_is_union():
    a = np.arange(0, 3_000, dtype=np.int64)
    b = np.arange(2_000, 6_000, dtype=np.int64)
    m, k = bloom_params(6_000, fpr=0.01)
    merged = bloom_merge([bloom_build(a, m, k), bloom_build(b, m, k)])
    union = bloom_build(np.union1d(a, b), m, k)
    assert np.array_equal(merged, union)
    assert bloom_contains(merged, np.union1d(a, b), k).all()


def test_empty_filter_rejects_everything():
    m, k = bloom_params(100)
    bf = bloom_build(np.empty(0, np.int64), m, k)
    assert not bloom_contains(bf, np.arange(1_000, dtype=np.int64), k).any()
    assert len(bloom_contains(bf, np.empty(0, np.int64), k)) == 0
